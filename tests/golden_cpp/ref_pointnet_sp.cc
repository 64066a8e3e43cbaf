// Test-only driver around the reference's OWN pointnet_sp CUDA kernels
// (libs/pointnet_sp/src/interpolate_gpu.cu — the batch-aware flattened
// (N,4)-bxyz 3-NN + interpolation behind the model's multi-scale
// voxel->point feature path, models/Modules.py:213-227), compiled as serial
// C++ via stubs/cuda_serial.h (launch syntax rewritten by
// tests/ref_tools.py:serialize_cuda_source; kernel bodies byte-identical).
//
// All three kernels are thread-independent (one output row per thread /
// atomicAdd accumulation), so serial execution is exact.
//
// Separate .so from ref_pointnet_lib: the two reference extensions reuse
// the same kernel names (three_nn_kernel_fast, ...), exactly like their
// separate CUDA modules do.

#include <cuda_serial.h>

#include <pointnet_sp_interpolate_gpu.cu.inc>

extern "C" {

void ref_sp_three_nn(int n, int m, const float *unknown, const float *known,
                     float *dist2, int *idx) {
  three_nn_kernel_launcher_fast(n, m, unknown, known, dist2, idx, 0);
}

void ref_sp_three_interpolate(int c, int m, int n, const float *points,
                              const int *idx, const float *weight,
                              float *out) {
  three_interpolate_kernel_launcher_fast(c, m, n, points, idx, weight, out,
                                         0);
}

void ref_sp_three_interpolate_grad(int c, int n, int m, const float *grad_out,
                                   const int *idx, const float *weight,
                                   float *grad_points) {
  three_interpolate_grad_kernel_launcher_fast(c, n, m, grad_out, idx, weight,
                                              grad_points, 0);
}

}  // extern "C"
