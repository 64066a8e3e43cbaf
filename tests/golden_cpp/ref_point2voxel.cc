// Test-only driver around the reference's OWN points_to_voxel_3d_np
// (libs/spconv/include/spconv/point2voxel.h:30-95, the compiled core of
// spconv.utils.points_to_voxel / VoxelGenerator), included UNMODIFIED with
// only the py::array_t plumbing stubbed (stubs/pybind11/ — plain strided
// indexing, semantics-identical).
//
// tests/test_golden_point2voxel.py drives this against
// dcl_net_tpu/ops/extras.py's points_to_voxel / VoxelGenerator.

#include <cstdint>
#include <vector>

#include <spconv/point2voxel.h>

extern "C" int ref_points_to_voxel_3d(
    float *points, int n, int num_features,
    float *voxels,            // [max_voxels, max_points, num_features] zeroed
    int *coors,               // [max_voxels, 3] zeroed
    int *num_points_per_voxel,  // [max_voxels] zeroed
    int *coor_to_voxelidx,    // [gz, gy, gx] pre-filled -1 (zyx like ref)
    const float *voxel_size, const float *coors_range,
    int max_points, int max_voxels, int gz, int gy, int gx) {
  pybind11::array_t<float> p(points, {n, num_features});
  pybind11::array_t<float> v(voxels, {max_voxels, max_points, num_features});
  pybind11::array_t<int> c(coors, {max_voxels, 3});
  pybind11::array_t<int> np_(num_points_per_voxel, {max_voxels});
  pybind11::array_t<int> grid(coor_to_voxelidx, {gz, gy, gx});
  std::vector<float> vs(voxel_size, voxel_size + 3);
  std::vector<float> cr(coors_range, coors_range + 6);
  return spconv::points_to_voxel_3d_np<float, 3>(p, v, c, np_, grid, vs, cr,
                                                 max_points, max_voxels);
}
