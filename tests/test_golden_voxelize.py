"""Golden voxelize parity: the reference's OWN compiled CPU voxelization vs
our in-graph scatter (ops/voxelize.py) and native host voxelizer
(csrc/voxelizer.cpp via ops/cpu_voxelizer.py).

`voxelize_inputmap<3>` — the hash-map rulebook builder the reference's
dataloaders run on the host (reference
libs/pointgroup_ops/src/voxelize/voxelize.cpp:58-152, exposed as
pointgroup_ops.voxelization_idx) — is compiled UNMODIFIED from
/root/reference via tests/golden_cpp/ref_voxelize.cc (torch/CUDA/sparsehash
stubbed; the called code touches none of them). Its rulebook then drives the
scatter semantics of pointgroup_ops.voxelization (voxelize.cu:9-54: modes
0-2 copy the chosen row, 3 sums, 4 means) in numpy.

This caught a REAL bug: the reference's mode-table comment (voxelize.cpp:51
"1=last item(overwrite) 2=first item(keep)") contradicts its code (mode 1
takes outputRows.front() at :129, mode 2 takes .back() at :135). Our modes
1/2 had followed the comment; they now follow the compiled behavior.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from dcl_net_tpu.ops import cpu_voxelizer
from dcl_net_tpu.ops.voxelize import voxelize_dense
from tests.ref_tools import compile_reference_driver

REF_SRC = Path("/root/reference/libs/pointgroup_ops/src")
SRC_DIR = Path(__file__).parent / "golden_cpp"


@pytest.fixture(scope="session")
def voxelize_lib(tmp_path_factory):
    lib = compile_reference_driver(
        tmp_path_factory, SRC_DIR / "ref_voxelize.cc", [REF_SRC],
        "ref_voxelize")
    lib.ref_voxelize_inputmap.restype = ctypes.c_int
    return lib


def ref_voxelize(lib, coords, batch_size, mode):
    """Run the reference's voxelize_inputmap; return (input_map, rows) where
    rows[v] is the ordered list of input indices in voxel id v."""
    coords = np.ascontiguousarray(coords, dtype=np.int64)
    n, ncols = coords.shape
    input_map = np.full(n, -1, np.int32)
    header = np.zeros(4, np.int32)
    cap = 4 * n + 64
    rule = np.zeros(cap, np.int32)

    def iptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    num_act = lib.ref_voxelize_inputmap(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n, ncols,
        batch_size, mode, iptr(input_map), iptr(header), iptr(rule), cap)
    assert num_act >= 0, "rule capacity overflow"
    ref_mode, max_active, n_in, n_out = header
    assert ref_mode == mode and n_in == n and n_out == num_act
    rows = []
    if mode in (3, 4):
        table = rule[: num_act * (max_active + 1)].reshape(num_act, -1)
        for r in table:
            rows.append(list(r[1 : 1 + r[0]]))
    else:
        table = rule[: num_act * 2].reshape(num_act, 2)
        for r in table:
            assert r[0] == 1
            rows.append([r[1]])
    return input_map, rows


def make_coords(rng, batch, n, d, unique=False):
    if unique:
        pts = np.stack([np.stack(np.unravel_index(
            rng.choice(d ** 3, n, replace=False), (d, d, d)), -1)
            for _ in range(batch)])
    else:
        pts = rng.randint(0, d, size=(batch, n, 3))
    bcol = np.repeat(np.arange(batch)[:, None, None], n, axis=1)
    flat = np.concatenate([bcol, pts], -1).reshape(batch * n, 4)
    return pts, flat.astype(np.int64)


def test_host_voxelizer_matches_reference_idx_order(voxelize_lib, rng):
    """csrc/voxelizer.cpp (and its numpy fallback) reproduce the reference's
    voxel-id assignment ORDER, point->voxel map, and counts exactly."""
    batch, n, d = 3, 40, 5
    _, flat = make_coords(rng, batch, n, d)
    ref_map, ref_rows = ref_voxelize(voxelize_lib, flat, batch, 4)

    out_coords, our_map, counts = cpu_voxelizer.voxelization_idx(flat)
    np.testing.assert_array_equal(our_map, ref_map)
    assert len(counts) == len(ref_rows)
    np.testing.assert_array_equal(counts, [len(r) for r in ref_rows])
    # voxel v's coords == coords of any of its reference member points
    for v, members in enumerate(ref_rows):
        np.testing.assert_array_equal(out_coords[v], flat[members[0]])

    # mode-4 feature scatter through the native path vs the reference rows
    c = 6
    feats = rng.randn(batch * n, c).astype(np.float32)
    out = cpu_voxelizer.voxelization(feats, our_map, counts, mode=4)
    expect = np.stack([feats[m].mean(0) for m in ref_rows])
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_host_voxelizer_numpy_fallback_matches_reference(voxelize_lib, rng):
    batch, n, d = 2, 30, 4
    _, flat = make_coords(rng, batch, n, d)
    ref_map, ref_rows = ref_voxelize(voxelize_lib, flat, batch, 4)
    old = cpu_voxelizer._LIB, cpu_voxelizer._LIB_FAILED
    try:
        cpu_voxelizer._LIB, cpu_voxelizer._LIB_FAILED = None, True
        _, our_map, counts = cpu_voxelizer.voxelization_idx(flat)
    finally:
        cpu_voxelizer._LIB, cpu_voxelizer._LIB_FAILED = old
    np.testing.assert_array_equal(our_map, ref_map)
    np.testing.assert_array_equal(counts, [len(r) for r in ref_rows])


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4])
def test_voxelize_dense_matches_reference_rulebook(voxelize_lib, rng, mode):
    """Our one-scatter dense voxelization == the reference rulebook + its
    voxelize.cu scatter semantics, per voxel coordinate, for every mode."""
    batch, n, d, c = 2, 36, 4, 5
    pts, flat = make_coords(rng, batch, n, d, unique=(mode == 0))
    ref_map, ref_rows = ref_voxelize(voxelize_lib, flat, batch, mode)
    feats = rng.randn(batch, n, c).astype(np.float32)
    flat_feats = feats.reshape(batch * n, c)

    grid, count = voxelize_dense(
        jnp.asarray(feats), jnp.asarray(pts.astype(np.int32)), (d, d, d),
        mode=mode)
    grid, count = np.asarray(grid), np.asarray(count)

    occupied = set()
    for v, members in enumerate(ref_rows):
        bi, x, y, z = flat[members[0]]
        occupied.add((bi, x, y, z))
        vals = flat_feats[members]
        if mode == 3:
            expect = vals.sum(0)
        elif mode == 4:
            expect = vals.mean(0)
        elif mode == 2:
            expect = vals[-1]  # reference code: .back() == LAST point
        else:  # 0 unique, 1 first: reference code .front()
            expect = vals[0]
        np.testing.assert_allclose(
            grid[bi, x, y, z], expect, rtol=1e-5, atol=1e-6,
            err_msg=f"mode {mode} voxel {(bi, x, y, z)}")
    # empty voxels stay zero; occupancy counts match
    for bi in range(batch):
        for x in range(d):
            for y in range(d):
                for z in range(d):
                    if (bi, x, y, z) not in occupied:
                        assert count[bi, x, y, z] == 0
                        assert np.all(grid[bi, x, y, z] == 0)


# ------------------------------------------------- the GPU scatter kernels
# voxelize.cu:9-53 — pointgroup_ops.voxelization fwd/bwd and point_recover,
# which the MODEL runs in every forward (models/DCL_Net.py:174,178) — is
# compiled from the reference via ref_gpu_voxelize.cc (serial CUDA shim,
# stubs/cuda_serial.h; only the launch syntax is rewritten). The rulebook
# feeding it comes from the reference's own voxelize_inputmap above, so this
# pins the full reference voxelization pipeline end to end.


@pytest.fixture(scope="session")
def gpu_voxelize_lib(tmp_path_factory):
    from tests.ref_tools import compile_cuda_driver
    return compile_cuda_driver(
        tmp_path_factory, SRC_DIR / "ref_gpu_voxelize.cc",
        {"pointgroup_voxelize_gpu.cu.inc":
             REF_SRC / "voxelize" / "voxelize.cu"},
        [REF_SRC / "voxelize", REF_SRC], "ref_gpu_voxelize")


def _rules_array(ref_rows):
    max_active = max(len(r) for r in ref_rows)
    rules = np.zeros((len(ref_rows), 1 + max_active), np.int32)
    for v, members in enumerate(ref_rows):
        rules[v, 0] = len(members)
        rules[v, 1: 1 + len(members)] = members
    return rules, max_active


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


@pytest.mark.parametrize("mode", [3, 4])
def test_gpu_scatter_fwd_and_bwd_match_reference(voxelize_lib,
                                                 gpu_voxelize_lib, rng, mode):
    """voxelize_dense forward AND its jax.vjp == the reference's
    voxelize_fp_cuda / voxelize_bp_cuda over the reference's own rulebook
    (average = mode==4, reference voxelize.cpp:166,177)."""
    import jax

    batch, n, d, c = 2, 36, 4, 5
    pts, flat = make_coords(rng, batch, n, d)
    _, ref_rows = ref_voxelize(voxelize_lib, flat, batch, mode)
    rules, max_active = _rules_array(ref_rows)
    m = len(ref_rows)
    feats = rng.randn(batch, n, c).astype(np.float32)
    flat_feats = np.ascontiguousarray(feats.reshape(batch * n, c))

    ref_out = np.zeros((m, c), np.float32)
    gpu_voxelize_lib.ref_voxelize_fp(m, max_active, c, _fptr(flat_feats),
                                     _fptr(ref_out), _iptr(rules),
                                     1 if mode == 4 else 0)

    f = lambda ft: voxelize_dense(ft, jnp.asarray(pts.astype(np.int32)),
                                  (d, d, d), mode=mode)[0]
    grid, vjp = jax.vjp(f, jnp.asarray(feats))
    grid = np.asarray(grid)
    for v, members in enumerate(ref_rows):
        bi, x, y, z = flat[members[0]]
        np.testing.assert_allclose(grid[bi, x, y, z], ref_out[v], rtol=1e-5,
                                   atol=1e-6)

    # backward: a voxel-space cotangent routed back to points
    d_grid = np.zeros((batch, d, d, d, c), np.float32)
    d_out = rng.randn(m, c).astype(np.float32)
    for v, members in enumerate(ref_rows):
        bi, x, y, z = flat[members[0]]
        d_grid[bi, x, y, z] = d_out[v]
    ref_dfeats = np.zeros((batch * n, c), np.float32)
    gpu_voxelize_lib.ref_voxelize_bp(m, max_active, c,
                                     _fptr(np.ascontiguousarray(d_out)),
                                     _fptr(ref_dfeats), _iptr(rules),
                                     1 if mode == 4 else 0)
    (our_dfeats,) = vjp(jnp.asarray(d_grid))
    np.testing.assert_allclose(np.asarray(our_dfeats).reshape(batch * n, c),
                               ref_dfeats, rtol=1e-5, atol=1e-6)


def test_point_recover_matches_reference_bp_kernel(voxelize_lib,
                                                   gpu_voxelize_lib, rng):
    """point_recover's forward IS voxelize_bp_cuda with average=false in the
    reference (voxelize.cpp:189); ours must gather the same rows."""
    from dcl_net_tpu.ops.voxelize import point_recover

    batch, n, d, c = 2, 30, 4, 6
    pts, flat = make_coords(rng, batch, n, d)
    _, ref_rows = ref_voxelize(voxelize_lib, flat, batch, 4)
    rules, max_active = _rules_array(ref_rows)
    m = len(ref_rows)

    voxel_feats = rng.randn(m, c).astype(np.float32)
    ref_point_feats = np.zeros((batch * n, c), np.float32)
    gpu_voxelize_lib.ref_voxelize_bp(m, max_active, c,
                                     _fptr(np.ascontiguousarray(voxel_feats)),
                                     _fptr(ref_point_feats), _iptr(rules), 0)

    grid = np.zeros((batch, d, d, d, c), np.float32)
    for v, members in enumerate(ref_rows):
        bi, x, y, z = flat[members[0]]
        grid[bi, x, y, z] = voxel_feats[v]
    ours = point_recover(jnp.asarray(grid), jnp.asarray(pts.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours).reshape(batch * n, c),
                               ref_point_feats, rtol=1e-6, atol=1e-7)
