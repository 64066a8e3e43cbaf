// Minimal CUDA-runtime stub so the reference's header-only tensorview /
// geometry code compiles on a CUDA-less host. Test scaffolding only —
// mirrors the Python-side spconv/libs stubs in tests/test_golden_reference.py.
// The CPU rulebook templates (spconv/geometry.h) never call into CUDA; the
// tensorview header merely references these names.
#pragma once

typedef int cudaError_t;
typedef void *cudaStream_t;
enum { cudaSuccess = 0 };
inline cudaError_t cudaGetLastError() { return cudaSuccess; }
