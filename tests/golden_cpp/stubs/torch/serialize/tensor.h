// Parse-only at::Tensor stub. The reference's voxelize.cpp defines template
// functions over at::Tensor (voxelize_idx / voxelize_fp / ...) that the
// golden test never instantiates — only voxelize_inputmap (raw pointers) is
// called — but the definitions must still parse. Mirrors the Python-side
// torch/spconv stubbing in tests/test_golden_reference.py.
#pragma once
#include <cstdint>
#include <initializer_list>

namespace at {

class Tensor {
 public:
  long ndimension() const { return 0; }
  long size(long) const { return 0; }
  template <class T>
  T *data() const { return nullptr; }
  template <class T>
  T *data_ptr() const { return nullptr; }
  void resize_(std::initializer_list<long>) {}
  void zero_() {}
};

}  // namespace at
