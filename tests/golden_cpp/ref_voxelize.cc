// Test-only driver around the reference's OWN CPU voxelization.
//
// Includes /root/reference/libs/pointgroup_ops/src/voxelize/voxelize.cpp
// UNMODIFIED (plus datatype.cpp for the SparseGrid constructor) and exposes
// `voxelize_inputmap<3>` — the hash-map rulebook builder the reference's
// dataloaders run on the host (reference
// libs/pointgroup_ops/functions/pointgroup_ops.py voxelization_idx) — over a
// C ABI for ctypes. Torch / CUDA / sparsehash are stubbed (stubs/), which the
// called code never touches: voxelize_inputmap works on raw pointers and STL.
//
// tests/test_golden_voxelize.py drives this against ops/voxelize.py and the
// native host voxelizer (csrc/voxelizer.cpp) to pin voxel-id assignment
// order, point->voxel maps, and ALL mode-0..4 rulebook semantics to the
// reference's own code. NOTE the reference's mode table comment
// (voxelize.cpp:51 "1=last 2=first") contradicts its code (:129 front(),
// :135 back()); the compiled code is the ground truth here.

#include <cassert>  // transitively provided by real torch headers
#include <cstdint>
#include <limits>   // transitively provided by real torch headers

#include "datatype/datatype.cpp"
#include "voxelize/voxelize.cpp"

extern "C" int ref_voxelize_inputmap(
    const long *coords,   // [n_rows, n_cols] int64 (batch, x, y, z)
    int n_rows, int n_cols, int batch_size, int mode,
    int *input_map,       // [n_rows] out: point -> voxel id
    int *rules_header,    // [4] out: mode, maxActive, nInputRows, nOutputRows
    int *rule_rows,       // [rule_cap] out: rules[1] flattened
    int rule_cap) {
  SparseGrids<3> sgs;
  RuleBook rules;
  Int n_active = 0;
  voxelize_inputmap<3>(sgs, input_map, rules, n_active,
                       const_cast<long *>(coords), n_rows, n_cols, batch_size,
                       mode);
  for (int i = 0; i < 4; ++i) rules_header[i] = rules[0][i];
  if ((int)rules[1].size() > rule_cap) return -1;
  for (int i = 0; i < (int)rules[1].size(); ++i) rule_rows[i] = rules[1][i];
  return n_active;
}
