// Test-only driver around the reference's OWN pointnet_lib CUDA kernels
// (libs/pointnet_lib/src/{interpolate,sampling,ball_query,group_points}_gpu
// .cu), compiled as serial C++ via stubs/cuda_serial.h. The kernels are
// included through tests/ref_tools.py:serialize_cuda_source, which rewrites
// ONLY the `<<<...>>>` launch syntax; bodies are byte-identical.
//
// Thread-independence (what makes serial execution exact):
// - knn/three_nn (interpolate_gpu.cu:9-124): each thread owns one
//   (batch, point) row of dist2/idx; reads are input-only.
// - three_interpolate fwd (:149-169): one output element per thread.
// - three_interpolate grad (:192-214): atomicAdd accumulation only.
// - gather fwd/grad (sampling_gpu.cu:8-63): disjoint writes / atomicAdd.
// - ball_query (ball_query_gpu.cu:9-45): one idx row per thread.
// - group_points fwd/grad (group_points_gpu.cu): disjoint / atomicAdd.
// - FPS (sampling_gpu.cu:93-209) is NOT thread-independent (block-wide
//   __shared__ reduction); it is exposed at its block_size=1 template
//   instantiation, where the reduction tree degenerates and the kernel is
//   the bare sequential algorithm. For distinct distances the block size
//   only affects tie-breaking, so <1> is exact on generic inputs.
//
// The launchers (and their grid geometry) run as-is for everything
// non-FPS, so the DIVUP/THREADS_PER_BLOCK bounds checks are exercised too.

#include <cuda_serial.h>

#include <pointnet_lib_interpolate_gpu.cu.inc>
#include <pointnet_lib_sampling_gpu.cu.inc>
#include <pointnet_lib_ball_query_gpu.cu.inc>
#include <pointnet_lib_group_points_gpu.cu.inc>

extern "C" {

void ref_knn(int b, int n, int m, int k, const float *unknown,
             const float *known, float *dist2, int *idx) {
  knn_kernel_launcher_fast(b, n, m, k, unknown, known, dist2, idx, 0);
}

void ref_three_nn(int b, int n, int m, const float *unknown,
                  const float *known, float *dist2, int *idx) {
  three_nn_kernel_launcher_fast(b, n, m, unknown, known, dist2, idx, 0);
}

void ref_three_interpolate(int b, int c, int m, int n, const float *points,
                           const int *idx, const float *weight, float *out) {
  three_interpolate_kernel_launcher_fast(b, c, m, n, points, idx, weight,
                                         out, 0);
}

void ref_three_interpolate_grad(int b, int c, int n, int m,
                                const float *grad_out, const int *idx,
                                const float *weight, float *grad_points) {
  three_interpolate_grad_kernel_launcher_fast(b, c, n, m, grad_out, idx,
                                              weight, grad_points, 0);
}

void ref_gather_points(int b, int c, int n, int npoints, const float *points,
                       const int *idx, float *out) {
  gather_points_kernel_launcher_fast(b, c, n, npoints, points, idx, out, 0);
}

void ref_gather_points_grad(int b, int c, int n, int npoints,
                            const float *grad_out, const int *idx,
                            float *grad_points) {
  gather_points_grad_kernel_launcher_fast(b, c, n, npoints, grad_out, idx,
                                          grad_points, 0);
}

void ref_ball_query(int b, int n, int m, float radius, int nsample,
                    const float *new_xyz, const float *xyz, int *idx) {
  ball_query_kernel_launcher_fast(b, n, m, radius, nsample, new_xyz, xyz,
                                  idx, 0);
}

void ref_group_points(int b, int c, int n, int npoints, int nsample,
                      const float *points, const int *idx, float *out) {
  group_points_kernel_launcher_fast(b, c, n, npoints, nsample, points, idx,
                                    out, 0);
}

void ref_group_points_grad(int b, int c, int n, int npoints, int nsample,
                           const float *grad_out, const int *idx,
                           float *grad_points) {
  group_points_grad_kernel_launcher_fast(b, c, n, npoints, nsample, grad_out,
                                         idx, grad_points, 0);
}

// FPS at block_size=1 (see header comment); temp must be caller-filled with
// 1e10 exactly like the python wrapper (pointnet2_utils.py:27).
void ref_fps_block1(int b, int n, int m, const float *dataset, float *temp,
                    int *idxs) {
  CUDA_LAUNCH(dim3(b), dim3(1))(furthest_point_sampling_kernel<1>, b, n, m,
                                dataset, temp, idxs);
}

}  // extern "C"
