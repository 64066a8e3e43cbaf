"""Golden parity for points_to_voxel / VoxelGenerator vs the reference's OWN
compiled points_to_voxel_3d_np (libs/spconv/include/spconv/point2voxel.h:30-95,
the core of spconv.utils points_to_voxel, spconv/utils/__init__.py:21-64),
included unmodified via tests/golden_cpp/ref_point2voxel.cc with only the
py::array_t plumbing stubbed (plain strided indexing).

Pins: voxel-id assignment order (first-encounter), zyx coordinate order,
out-of-range point dropping, per-voxel point capping, and the exact
max_voxels overflow behavior (the reference BREAKS the scan entirely once
max_voxels new voxels exist — it stops filling existing voxels too).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np
import pytest

from dcl_net_tpu.ops.extras import VoxelGenerator, points_to_voxel
from tests.ref_tools import compile_reference_driver

REF_INCLUDE = Path("/root/reference/libs/spconv/include")
SRC_DIR = Path(__file__).parent / "golden_cpp"


@pytest.fixture(scope="session")
def p2v_lib(tmp_path_factory):
    lib = compile_reference_driver(
        tmp_path_factory, SRC_DIR / "ref_point2voxel.cc", [REF_INCLUDE],
        "ref_point2voxel")
    lib.ref_points_to_voxel_3d.restype = ctypes.c_int
    return lib


def ref_points_to_voxel(lib, points, voxel_size, coors_range, max_points,
                        max_voxels):
    points = np.ascontiguousarray(points, np.float32)
    n, c = points.shape
    voxel_size = np.asarray(voxel_size, np.float32)
    coors_range = np.asarray(coors_range, np.float32)
    grid = np.round((coors_range[3:] - coors_range[:3]) / voxel_size
                    ).astype(np.int32)
    gx, gy, gz = grid  # reference grid map is indexed zyx
    voxels = np.zeros((max_voxels, max_points, c), np.float32)
    coors = np.zeros((max_voxels, 3), np.int32)
    counts = np.zeros(max_voxels, np.int32)
    vmap = np.full((gz, gy, gx), -1, np.int32)

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    m = lib.ref_points_to_voxel_3d(
        fp(points), n, c, fp(voxels), ip(coors), ip(counts), ip(vmap),
        fp(voxel_size), fp(coors_range), max_points, max_voxels,
        int(gz), int(gy), int(gx))
    return voxels[:m], coors[:m], counts[:m]


def random_points(rng, n, c=4, lo=-0.2, hi=1.2):
    # some points deliberately out of the [0,1] range to exercise dropping
    pts = rng.rand(n, c).astype(np.float32) * (hi - lo) + lo
    return pts


def test_points_to_voxel_matches_reference(p2v_lib, rng):
    pts = random_points(rng, 300)
    vs, cr = [0.1, 0.1, 0.1], [0, 0, 0, 1, 1, 1]
    for max_points in (1, 3, 35):
        rv, rc, rn = ref_points_to_voxel(p2v_lib, pts, vs, cr, max_points, 2000)
        ov, oc, on = points_to_voxel(pts, vs, cr, max_points, 2000)
        np.testing.assert_array_equal(oc, rc, err_msg=f"mp={max_points}")
        np.testing.assert_array_equal(on, rn)
        np.testing.assert_allclose(ov, rv, atol=0)


def test_points_to_voxel_overflow_matches_reference(p2v_lib, rng):
    """max_voxels overflow: the reference breaks the WHOLE scan (point2voxel
    .h:73-74), so later points stop filling even existing voxels."""
    pts = random_points(rng, 400, lo=0.0, hi=1.0)
    vs, cr = [0.25, 0.25, 0.25], [0, 0, 0, 1, 1, 1]  # 64 possible voxels
    for max_voxels in (1, 7, 33):
        rv, rc, rn = ref_points_to_voxel(p2v_lib, pts, vs, cr, 5, max_voxels)
        ov, oc, on = points_to_voxel(pts, vs, cr, 5, max_voxels)
        assert len(oc) == len(rc) <= max_voxels
        np.testing.assert_array_equal(oc, rc, err_msg=f"mv={max_voxels}")
        np.testing.assert_array_equal(on, rn)
        np.testing.assert_allclose(ov, rv, atol=0)


def test_voxel_generator_matches_reference(p2v_lib, rng):
    pts = random_points(rng, 200)
    gen = VoxelGenerator([0.2, 0.1, 0.25], [0, 0, 0, 1, 1, 1],
                         max_num_points=4, max_voxels=100)
    ov, oc, on = gen.generate(pts)
    rv, rc, rn = ref_points_to_voxel(
        p2v_lib, pts, [0.2, 0.1, 0.25], [0, 0, 0, 1, 1, 1], 4, 100)
    np.testing.assert_array_equal(oc, rc)
    np.testing.assert_array_equal(on, rn)
    np.testing.assert_allclose(ov, rv, atol=0)
