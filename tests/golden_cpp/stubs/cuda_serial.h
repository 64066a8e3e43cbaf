// Serial CUDA-execution shim: compiles the reference's .cu kernels as plain
// C++ and runs them on the host, one (blockIdx, threadIdx) at a time.
//
// Test scaffolding only. Soundness argument, kernel by kernel, lives in the
// tests that use it (tests/test_golden_pointnet.py, test_golden_voxelize.py):
// every reference kernel driven through this shim is thread-independent
// (each thread's writes are disjoint or atomicAdd accumulations, and no
// thread reads another's writes), so ANY serial execution order is
// bit-faithful to the CUDA semantics up to float accumulation order. The one
// exception — the FPS __shared__-memory reduction — is driven at its
// block_size=1 template instantiation, where the reduction tree vanishes.
//
// The `kernel<<<grid, block, smem, stream>>>(args)` launch syntax cannot be
// parsed by g++; tests/ref_tools.py:serialize_cuda_source rewrites exactly
// that token sequence to `CUDA_LAUNCH(grid, block, smem, stream)(kernel,
// args)` and nothing else — kernel bodies and launch configurations stay
// byte-identical to the reference checkout.
#pragma once

#include <cstddef>

#include <cuda_runtime_api.h>  // the stub: cudaError_t / cudaStream_t / ...

#define __global__
#define __device__
#define __host__
#define __forceinline__ inline
#define __shared__ static

struct dim3 {
  unsigned x, y, z;
  dim3(unsigned x_ = 1, unsigned y_ = 1, unsigned z_ = 1)
      : x(x_), y(y_), z(z_) {}
};

// CUDA vector types (avgpool.cu uses them as reinterpret_cast load widths).
struct int2 {
  int x, y;
};
struct int4 {
  int x, y, z, w;
};

// Mutable launch state the kernel bodies read. One kernel at a time — the
// drivers are single-threaded ctypes calls.
static dim3 gridDim, blockDim, blockIdx, threadIdx;

inline void __syncthreads() {}  // sound only because blocks run 1 thread
                                // deep (see file comment)

inline const char *cudaGetErrorString(cudaError_t) { return "no error"; }

template <typename T>
inline T atomicAdd(T *addr, T val) {
  T old = *addr;
  *addr += val;
  return old;
}

// CUDA device builtins used unqualified by the reference kernels
// (cuda_utils.h opt_n_threads, sampling_gpu.cu __update).
inline int max(int a, int b) { return a > b ? a : b; }
inline int min(int a, int b) { return a < b ? a : b; }
inline float max(float a, float b) { return a > b ? a : b; }
inline float min(float a, float b) { return a < b ? a : b; }
inline double max(double a, double b) { return a > b ? a : b; }
inline double min(double a, double b) { return a < b ? a : b; }

struct _CudaSerialLaunch {
  dim3 g, b;
  _CudaSerialLaunch(dim3 grid, dim3 block, size_t /*smem*/ = 0,
                    cudaStream_t /*stream*/ = 0)
      : g(grid), b(block) {}

  template <typename F, typename... Args>
  void operator()(F kernel, Args... args) {
    gridDim = g;
    blockDim = b;
    for (unsigned bz = 0; bz < g.z; ++bz)
      for (unsigned by = 0; by < g.y; ++by)
        for (unsigned bx = 0; bx < g.x; ++bx)
          for (unsigned tz = 0; tz < b.z; ++tz)
            for (unsigned ty = 0; ty < b.y; ++ty)
              for (unsigned tx = 0; tx < b.x; ++tx) {
                blockIdx = dim3(bx, by, bz);
                threadIdx = dim3(tx, ty, tz);
                kernel(args...);
              }
  }
};

#define CUDA_LAUNCH _CudaSerialLaunch
