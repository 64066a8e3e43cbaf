// Stub <cuda.h> for compiling reference CUDA sources on a CUDA-less host.
// Everything needed lives in the cuda_runtime_api.h stub / cuda_serial.h.
#pragma once
#include <cuda_runtime_api.h>
