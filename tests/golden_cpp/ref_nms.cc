// Test-only driver around the reference's OWN CPU non-max suppression
// (libs/spconv/include/spconv/nms.h:30-76 non_max_suppression_cpu, the
// function behind spconv.utils.non_max_suppression_cpu), included UNMODIFIED
// with py::array_t / boost::geometry stubbed (stubs/; the CPU function
// touches neither — boost is only named by the rotated-box templates, which
// are never instantiated here).
//
// tests/test_golden_nms.py drives this against dcl_net_tpu/ops/extras.nms.

#include <cstdint>
#include <iostream>  // transitively provided by real pybind11 headers
#include <vector>

#include <spconv/nms.h>

extern "C" int ref_nms_cpu(const float *boxes, int n, const int *order,
                           float thresh, float eps, int *keep_out) {
  pybind11::array_t<float> b(const_cast<float *>(boxes), {n, 4});
  pybind11::array_t<int> o(const_cast<int *>(order), {n});
  std::vector<int> keep =
      spconv::non_max_suppression_cpu<float>(b, o, thresh, eps);
  for (size_t i = 0; i < keep.size(); ++i) keep_out[i] = keep[i];
  return (int)keep.size();
}
