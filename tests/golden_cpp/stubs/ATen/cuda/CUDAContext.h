// Stub: provides only the names the reference's CPU paths mention but never
// execute (real CUDAContext.h supplies cudaStream_t transitively).
#pragma once
#include <cuda_runtime_api.h>

namespace at {
namespace cuda {
inline cudaStream_t getCurrentCUDAStream() { return nullptr; }
}  // namespace cuda
}  // namespace at
