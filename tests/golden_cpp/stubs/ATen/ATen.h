// Stub <ATen/ATen.h> for compiling reference CUDA sources host-side.
// at::Half only needs to SUPPORT INSTANTIATION of the reference's kernel
// templates (avgpool.cu instantiates its functors for float/double/Half at
// file scope); the golden tests only ever CALL the float ones. A 2-byte
// integral type satisfies sizeof-based vector-load selection
// (std::conditional on int2) and compiles the arithmetic.
#pragma once
#include <torch/serialize/tensor.h>

namespace at {
using Half = short;
}  // namespace at
