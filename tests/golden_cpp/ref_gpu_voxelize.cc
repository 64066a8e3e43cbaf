// Test-only driver around the reference's OWN GPU voxelization scatter
// (libs/pointgroup_ops/src/voxelize/voxelize.cu:9-53 — the kernels behind
// pointgroup_ops.voxelization fwd/bwd AND point_recover, which the model
// runs per forward at models/DCL_Net.py:174,178), compiled as serial C++
// via stubs/cuda_serial.h (launch syntax rewritten by
// tests/ref_tools.py:serialize_cuda_source; kernel bodies byte-identical).
//
// Thread model: rows stride over blockIdx.x, feature planes over
// threadIdx.x, accumulation is atomicAdd — thread-independent, so serial
// execution is exact up to float summation order.
//
// average flag: the reference's C++ wrapper passes `mode == 4`
// (voxelize.cpp:166,177); point_recover runs voxelize_bp_cuda with
// average=false as its forward (voxelize.cpp:189).

#include <cstdint>

#include <cuda_serial.h>

#include <pointgroup_voxelize_gpu.cu.inc>

extern "C" {

// feats [n_in, c] -> out [n_out, c] over rules [n_out, 1 + max_active]
// (the rulebook rows voxelize_inputmap builds: count, then member point
// ids). Caller zero-initializes out, like the python wrapper.
void ref_voxelize_fp(int n_out, int max_active, int c, const float *feats,
                     float *out, const int32_t *rules, int average) {
  voxelize_fp_cuda<float>((Int)n_out, (Int)max_active, (Int)c,
                          const_cast<float *>(feats), out,
                          const_cast<Int *>(rules), average != 0);
}

// d_out [n_out, c] -> d_feats [n_in, c] (caller-zeroed), same rulebook.
void ref_voxelize_bp(int n_out, int max_active, int c, const float *d_out,
                     float *d_feats, const int32_t *rules, int average) {
  voxelize_bp_cuda<float>((Int)n_out, (Int)max_active, (Int)c,
                          const_cast<float *>(d_out), d_feats,
                          const_cast<Int *>(rules), average != 0);
}

}  // extern "C"
