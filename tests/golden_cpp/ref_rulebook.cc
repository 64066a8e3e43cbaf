// Test-only driver around the reference's OWN CPU rulebook construction.
//
// Compiles /root/reference/libs/spconv/include/spconv/geometry.h UNMODIFIED
// (the exact templates the reference's indice.cc instantiates for its CPU
// path, reference libs/spconv/src/spconv/indice.cc:23-66) and exposes the
// three entry points over a C ABI for ctypes. Nothing is copied into this
// repo: the reference headers are included from the read-only checkout at
// build time, with only a cuda_runtime_api.h stub on the include path
// (stubs/) so tensorview.h compiles on a CUDA-less host.
//
// tests/test_golden_rulebook.py drives this against our dense-masked-grid
// sparse conv ops to pin active-set and contribution semantics to the
// reference's own code rather than a transcribed oracle.

#include <cstdint>

#include <spconv/geometry.h>

using Index = int;
constexpr unsigned NDim = 3;

extern "C" int ref_get_indice_pairs(
    int mode,                 // 0 = conv, 1 = deconv, 2 = subm
    const int *indices_in,    // [num_act_in, 4] rows (batch, x, y, z)
    int num_act_in,
    int *indices_out,         // [out_capacity, 4]; untouched for subm
    int *grids_out,           // [batch * prod(out_shape)], pre-filled -1
    int *indice_pairs,        // [kernel_volume, 2, pair_capacity], pre-filled -1
    int *indice_num,          // [kernel_volume], pre-zeroed
    const int *kernel, const int *stride, const int *padding,
    const int *dilation, const int *out_shape,
    int batch, int pair_capacity, int out_capacity) {
  Index kernel_volume = kernel[0] * kernel[1] * kernel[2];
  Index volume = out_shape[0] * out_shape[1] * out_shape[2];
  tv::TensorView<const Index> t_in(indices_in, {num_act_in, (int)(NDim + 1)});
  tv::TensorView<Index> t_out(indices_out, {out_capacity, (int)(NDim + 1)});
  tv::TensorView<Index> t_grid(grids_out, {batch * volume});
  tv::TensorView<Index> t_pairs(indice_pairs, {kernel_volume, 2, pair_capacity});
  tv::TensorView<Index> t_num(indice_num, {kernel_volume});
  if (mode == 2) {
    return spconv::getIndicePairsSubM<Index, Index, NDim>(
        t_in, t_grid, t_pairs, t_num, kernel, stride, padding, dilation,
        out_shape);
  }
  if (mode == 1) {
    return spconv::getIndicePairsDeConv<Index, Index, NDim>(
        t_in, t_out, t_grid, t_pairs, t_num, kernel, stride, padding, dilation,
        out_shape);
  }
  return spconv::getIndicePairsConv<Index, Index, NDim>(
      t_in, t_out, t_grid, t_pairs, t_num, kernel, stride, padding, dilation,
      out_shape);
}
