"""Kernel-vs-oracle tests, spconv twin-data style (ref test_utils.py:141-190)."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from dcl_net_tpu.ops import (
    voxelize_dense,
    point_recover,
    dilate_mask,
    sparse_avg_pool,
    sparse_max_pool,
    masked_batch_norm_stats,
    dense_to_sparse,
    knn,
    three_nn,
    nearest_neighbor_interpolate,
    furthest_point_sample,
    ball_query,
    grouping_operation,
    gather_operation,
)
from dcl_net_tpu.ops.voxelize import point_to_voxel_index

from tests import oracles


def _sparse_grid(rng, b=2, d=8, c=5, n_occ=20):
    """Random sparse grid twins: dense feats + mask."""
    mask = np.zeros((b, d, d, d), np.float32)
    feats = np.zeros((b, d, d, d, c), np.float32)
    for bi in range(b):
        flat = rng.choice(d ** 3, size=n_occ, replace=False)
        for f in flat:
            i, j, k = np.unravel_index(f, (d, d, d))
            mask[bi, i, j, k] = 1
            feats[bi, i, j, k] = rng.randn(c)
    return feats, mask


def test_voxelize_mean_oracle(rng):
    b, n, c, d = 2, 64, 7, 8
    feats = rng.randn(b, n, c).astype(np.float32)
    vidx = rng.randint(0, d, size=(b, n, 3))
    mask = rng.rand(b, n) > 0.2
    grid, cnt = voxelize_dense(
        jnp.asarray(feats), jnp.asarray(vidx), (d, d, d), mode=4,
        point_mask=jnp.asarray(mask),
    )
    egrid, ecnt = oracles.np_voxelize_mean(feats, vidx, (d, d, d), mask)
    np.testing.assert_allclose(np.asarray(grid), egrid, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cnt), ecnt, atol=1e-5)


def test_voxelize_grad_flows(rng):
    """The scatter-mean must be differentiable w.r.t. features (the CUDA
    backward at voxelize.cu:33-54 comes free here)."""
    b, n, c, d = 1, 16, 3, 4
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    vidx = jnp.asarray(rng.randint(0, d, size=(b, n, 3)))

    def f(x):
        g, _ = voxelize_dense(x, vidx, (d, d, d), mode=4)
        return jnp.sum(g ** 2)

    g = jax.grad(f)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_point_recover(rng):
    b, n, c, d = 2, 32, 4, 8
    feats = rng.randn(b, n, c).astype(np.float32)
    vidx = rng.randint(0, d, size=(b, n, 3))
    grid, _ = voxelize_dense(jnp.asarray(feats), jnp.asarray(vidx), (d, d, d), mode=3)
    rec = point_recover(grid, jnp.asarray(vidx))
    # points mapping to the same voxel share the summed value
    flat = vidx[:, :, 0] * 64 + vidx[:, :, 1] * 8 + vidx[:, :, 2]
    for bi in range(b):
        for ni in range(n):
            same = flat[bi] == flat[bi, ni]
            expect = feats[bi][same].sum(0)
            np.testing.assert_allclose(np.asarray(rec)[bi, ni], expect, atol=1e-4)


def test_point_to_voxel_index():
    unit = [0.006, 0.006, 0.006]
    limit = [64, 64, 64]
    pts = jnp.asarray([[[0.0, 0.0, 0.0], [-0.191, 0.1919, 0.0031]]])
    idx = np.asarray(point_to_voxel_index(pts, unit, limit))
    # torch: ((p + 0.192) / 0.006).long()
    expect = np.floor((np.asarray(pts) + 0.192) / 0.006).astype(np.int64)
    expect = np.clip(expect, 0, 63)
    np.testing.assert_array_equal(idx, expect)


def test_dilate_mask_oracle(rng):
    feats, mask = _sparse_grid(rng, b=1, d=8, c=1, n_occ=10)
    out = np.asarray(dilate_mask(jnp.asarray(mask), kernel=3))
    # oracle: any neighbor within chebyshev distance 1
    expect = np.zeros_like(mask)
    occ = np.argwhere(mask[0] > 0)
    for i, j, k in occ:
        expect[0,
               max(i - 1, 0) : i + 2,
               max(j - 1, 0) : j + 2,
               max(k - 1, 0) : k + 2] = 1
    np.testing.assert_array_equal(out, expect)


def test_sparse_avg_pool_oracle(rng):
    feats, mask = _sparse_grid(rng, b=2, d=8, c=5, n_occ=25)
    out, new_mask = sparse_avg_pool(jnp.asarray(feats), jnp.asarray(mask), 3, 2)
    for bi in range(2):
        eo, em = oracles.np_sparse_avg_pool(feats[bi], mask[bi], 3, 2)
        np.testing.assert_allclose(np.asarray(out)[bi], eo, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(new_mask)[bi], em)


def test_sparse_max_pool_ignores_empty(rng):
    feats, mask = _sparse_grid(rng, b=1, d=4, c=2, n_occ=5)
    feats = feats - 5.0 * mask[..., None]  # make all occupied values negative
    # reference semantics (default): indiceMaxPool's zeros init clamps
    # all-negative receptive fields at 0 (pool_ops.h:37, golden-pinned by
    # tests/test_golden_maxpool.py)
    out, nm = sparse_max_pool(jnp.asarray(feats * mask[..., None]), jnp.asarray(mask), 3, 2)
    out, nm = np.asarray(out), np.asarray(nm)
    assert (out[nm == 0] == 0).all()
    assert (out[nm == 1] == 0).all()  # clamped, not negative
    # zero_init=False: true max over occupied voxels (negative preserved)
    out_t, _ = sparse_max_pool(
        jnp.asarray(feats * mask[..., None]), jnp.asarray(mask), 3, 2,
        zero_init=False)
    out_t = np.asarray(out_t)
    assert (out_t[nm == 0] == 0).all()
    assert (out_t[nm == 1] < 0).all()


def test_sparse_max_pool_grad_with_bool_mask(rng):
    """custom_vjp must hand non-float masks a float0 cotangent — a bool
    occupancy mask (valid public-API usage) must differentiate cleanly and
    match the float-mask gradient."""
    feats, mask = _sparse_grid(rng, b=1, d=4, c=2, n_occ=5)
    f = jnp.asarray(feats * mask[..., None])

    def loss(x, m):
        return sparse_max_pool(x, m, 3, 2)[0].sum()

    g_bool = jax.grad(loss)(f, jnp.asarray(mask, bool))
    g_float = jax.grad(loss)(f, jnp.asarray(mask, np.float32))
    np.testing.assert_allclose(np.asarray(g_bool), np.asarray(g_float))


def test_masked_batch_norm_stats(rng):
    feats, mask = _sparse_grid(rng, b=2, d=8, c=5, n_occ=30)
    mean, var = masked_batch_norm_stats(jnp.asarray(feats), jnp.asarray(mask))
    rows = feats[mask > 0]  # [M, C] exactly the sparse feature rows
    np.testing.assert_allclose(np.asarray(mean), rows.mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), rows.var(0), atol=1e-5)


def test_dense_to_sparse(rng):
    feats, mask = _sparse_grid(rng, b=2, d=8, c=5, n_occ=20)
    coords, vfeats, vmask = dense_to_sparse(jnp.asarray(feats), jnp.asarray(mask), capacity=32)
    coords, vfeats, vmask = map(np.asarray, (coords, vfeats, vmask))
    for bi in range(2):
        assert vmask[bi].sum() == 20
        got = {tuple(c) for c, m in zip(coords[bi], vmask[bi]) if m}
        expect = {tuple(c) for c in np.argwhere(mask[bi] > 0)}
        assert got == expect
        for c, f, m in zip(coords[bi], vfeats[bi], vmask[bi]):
            if m:
                np.testing.assert_allclose(f, feats[bi][tuple(c)], atol=1e-6)


def test_three_nn_oracle(rng):
    q = rng.randn(2, 40, 3).astype(np.float32)
    r = rng.randn(2, 30, 3).astype(np.float32)
    m = (rng.rand(2, 30) > 0.3).astype(np.float32)
    d2, idx = three_nn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(m))
    ed2, eidx = oracles.np_three_nn(q, r, m)
    np.testing.assert_allclose(np.asarray(d2), ed2, rtol=1e-4, atol=1e-5)
    # indices can differ on exact ties; distances must match
    got_d = np.take_along_axis(((q[:, :, None] - r[:, None]) ** 2).sum(-1), np.asarray(idx), axis=2)
    np.testing.assert_allclose(got_d, ed2, rtol=1e-4, atol=1e-5)


def test_nearest_neighbor_interpolate_weights(rng):
    """Weights use inverse SQUARED distance (ref Modules.py:221-224 feeds
    three_nn's dist2 into 1/(d+1e-8))."""
    q = rng.randn(1, 10, 3).astype(np.float32)
    r = rng.randn(1, 20, 3).astype(np.float32)
    f = rng.randn(1, 20, 6).astype(np.float32)
    out = np.asarray(nearest_neighbor_interpolate(jnp.asarray(q), jnp.asarray(r), jnp.asarray(f)))
    d2, idx = oracles.np_three_nn(q, r)
    recip = 1.0 / (d2 + 1e-8)
    w = recip / recip.sum(-1, keepdims=True)
    expect = (f[0][idx[0]] * w[0][..., None]).sum(1)
    np.testing.assert_allclose(out[0], expect, rtol=1e-4, atol=1e-5)


def test_knn_matches_sorted(rng):
    q = rng.randn(1, 15, 3).astype(np.float32)
    r = rng.randn(1, 25, 3).astype(np.float32)
    d2, idx = knn(5, jnp.asarray(q), jnp.asarray(r))
    full = ((q[:, :, None] - r[:, None]) ** 2).sum(-1)
    expect = np.sort(full, axis=-1)[:, :, :5]
    np.testing.assert_allclose(np.asarray(d2), expect, rtol=1e-4, atol=1e-5)


def test_fps_oracle(rng):
    xyz = rng.randn(2, 50, 3).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8))
    expect = oracles.np_fps(xyz, 8)
    np.testing.assert_array_equal(idx, expect)


def test_ball_query_semantics(rng):
    xyz = rng.randn(1, 40, 3).astype(np.float32)
    centers = xyz[:, :5] + 0.01
    idx = np.asarray(ball_query(0.5, 8, jnp.asarray(xyz), jnp.asarray(centers)))
    d2 = ((centers[0][:, None] - xyz[0][None]) ** 2).sum(-1)
    for s in range(5):
        inside = np.where(d2[s] < 0.25)[0]
        k = min(len(inside), 8)
        np.testing.assert_array_equal(idx[0, s, :k], inside[:k])
        if len(inside) < 8 and len(inside) > 0:
            assert (idx[0, s, k:] == inside[0]).all()


def test_gather_and_grouping(rng):
    f = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 6))
    out = np.asarray(gather_operation(jnp.asarray(f), jnp.asarray(idx)))
    for bi in range(2):
        np.testing.assert_allclose(out[bi], f[bi][idx[bi]])
    gidx = rng.randint(0, 10, size=(2, 6, 3))
    gout = np.asarray(grouping_operation(jnp.asarray(f), jnp.asarray(gidx)))
    for bi in range(2):
        np.testing.assert_allclose(gout[bi], f[bi][gidx[bi]])


def test_cpu_voxelizer_native_vs_oracle(rng):
    """Native C++ voxelizer == numpy fallback == reference semantics."""
    from dcl_net_tpu.ops import cpu_voxelizer as cv

    coords = np.concatenate([
        rng.randint(0, 2, (200, 1)),  # batch ids
        rng.randint(0, 6, (200, 3)),
    ], axis=1).astype(np.int64)
    feats = rng.randn(200, 5).astype(np.float32)

    out_coords, imap, counts = cv.voxelization_idx(coords)
    # every point maps to a slot with its own coords
    np.testing.assert_array_equal(out_coords[imap], coords)
    assert counts.sum() == 200
    # first-seen order: slot ids increase with first occurrence
    seen = {}
    for i, c in enumerate(map(tuple, coords)):
        if c not in seen:
            seen[c] = imap[i]
    assert sorted(seen.values()) == list(range(len(seen)))

    vox = cv.voxelization(feats, imap, counts, mode=4)
    for s in range(len(counts)):
        expect = feats[imap == s].mean(axis=0)
        np.testing.assert_allclose(vox[s], expect, atol=1e-5)

    rec = cv.point_recover(vox, imap)
    np.testing.assert_allclose(rec, vox[imap], atol=1e-6)

    if cv.have_native():
        # cross-check native against the numpy fallback path explicitly
        lib = cv._LIB
        cv._LIB = None
        try:
            oc2, im2, ct2 = cv.voxelization_idx(coords)
        finally:
            cv._LIB = lib
        np.testing.assert_array_equal(out_coords, oc2)
        np.testing.assert_array_equal(imap, im2)
        np.testing.assert_array_equal(counts, ct2)


def test_local_grid_interpolate_matches_exact(rng):
    """Windowed 3-NN off the dense grid must match the global exact path on
    realistic (surface-like) data, including the scale-quirk levels."""
    from dcl_net_tpu.ops.grid_interp import local_grid_interpolate
    from dcl_net_tpu.ops.sparse_conv import dense_to_sparse, voxel_centers
    from dcl_net_tpu.ops.voxelize import voxelize_dense, point_to_voxel_index

    B, N, D, C = 2, 200, 16, 6
    unit = np.array([0.024, 0.024, 0.024], np.float32)
    offset = -0.5 * unit * D
    # surface-like cloud
    v = rng.randn(B, N, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jnp.asarray(v * 0.12)
    vidx = point_to_voxel_index(pts, unit, [D] * 3)
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    grid, cnt = voxelize_dense(feats, vidx, (D, D, D), mode=4)
    mask = (cnt > 0).astype(jnp.float32)

    # downsample grid to stride-2 level (like pyramid level 0) by avg pool
    from dcl_net_tpu.ops.sparse_conv import sparse_avg_pool

    g1, m1 = sparse_avg_pool(grid, mask, 3, 2)

    for scale in (2.0, 3.0):  # 3.0 on the stride-2 grid mimics the 6-on-8 quirk
        exact_coords, exact_feats, exact_mask = dense_to_sparse(g1, m1, (D // 2) ** 3)
        centers = voxel_centers(exact_coords, unit, scale, offset)
        from dcl_net_tpu.ops.knn import nearest_neighbor_interpolate

        exact = np.asarray(nearest_neighbor_interpolate(pts, centers, exact_feats, exact_mask))
        local = np.asarray(local_grid_interpolate(pts, g1, m1, unit, scale, offset, window=5))
        # agreement on nearly all points (window misses only pathological gaps)
        err = np.abs(local - exact).max(axis=-1)
        agree = (err < 1e-4).mean()
        assert agree > 0.97, f"scale {scale}: agreement {agree}"


def test_pallas_interp_matches_xla(rng):
    """Pallas fused 3-NN kernel (interpret mode on CPU) vs the XLA path."""
    from dcl_net_tpu.ops.pallas_interp import pallas_nn_interpolate

    B, N, V, C = 2, 128, 256, 8
    pts = jnp.asarray((rng.rand(B, N, 3).astype(np.float32) - 0.5) * 0.3)
    ctr = jnp.asarray((rng.rand(B, V, 3).astype(np.float32) - 0.5) * 0.3)
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    mask = jnp.asarray((rng.rand(B, V) > 0.3).astype(np.float32))

    ref = nearest_neighbor_interpolate(pts, ctr, feats, mask)
    out = pallas_nn_interpolate(pts, ctr, feats, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    g = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    gp = jax.grad(lambda f: jnp.sum(pallas_nn_interpolate(pts, ctr, f, mask) * g))(feats)
    gx = jax.grad(lambda f: jnp.sum(nearest_neighbor_interpolate(pts, ctr, f, mask) * g))(feats)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)


def test_pallas_compaction_matches_dense_to_sparse(rng):
    """Stream-compaction kernel (interpret on CPU) vs the top_k path: same
    occupied set, coords, and features; only padding-row placement differs."""
    from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse

    B, D, C = 2, 8, 6
    feats, mask = np.zeros((B, D, D, D, C), np.float32), np.zeros((B, D, D, D), np.float32)
    for bi in range(B):
        occ = rng.choice(D ** 3, 40, replace=False)
        for f in occ:
            i, j, k = np.unravel_index(f, (D, D, D))
            mask[bi, i, j, k] = 1
            feats[bi, i, j, k] = rng.randn(C)

    cap = 64
    ref_coords, ref_feats, ref_mask = dense_to_sparse(
        jnp.asarray(feats), jnp.asarray(mask), cap
    )
    got_coords, got_feats, got_mask = pallas_dense_to_sparse(
        jnp.asarray(feats), jnp.asarray(mask), cap
    )
    for bi in range(B):
        ref_set = {
            tuple(c): tuple(f) for c, f, m in zip(
                np.asarray(ref_coords[bi]), np.asarray(ref_feats[bi]),
                np.asarray(ref_mask[bi])) if m
        }
        got_set = {
            tuple(c): tuple(f) for c, f, m in zip(
                np.asarray(got_coords[bi]), np.asarray(got_feats[bi]),
                np.asarray(got_mask[bi])) if m
        }
        assert set(got_set) == set(ref_set)
        for k in ref_set:
            np.testing.assert_allclose(got_set[k], ref_set[k], atol=1e-5)
    # invalid rows carry zero features
    gm = np.asarray(got_mask)
    gf = np.asarray(got_feats)
    assert np.abs(gf[gm == 0]).max() == 0.0


def test_pallas_compaction_vjp_matches_dense_to_sparse(rng):
    """The compaction custom VJP (transposed one-hot matmul) must agree with
    autodiff through the top_k extraction path — this is what makes
    interp_mode='pallas' valid under jax.grad for training (reference
    backward: libs/pointnet_sp/src/interpolate_gpu.cu:124-146)."""
    from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse

    B, D, C = 2, 8, 6
    feats = rng.randn(B, D, D, D, C).astype(np.float32)
    mask = (rng.rand(B, D, D, D) > 0.7).astype(np.float32)
    feats = feats * mask[..., None]
    cap = 64
    g = rng.randn(B, cap, C).astype(np.float32)

    def loss_pallas(f):
        _, vfeats, vmask = pallas_dense_to_sparse(f, jnp.asarray(mask), cap)
        return jnp.sum(vfeats * jnp.asarray(g) * vmask[..., None])

    def loss_exact(f):
        # dense_to_sparse orders by linear index too, but pads differently:
        # project both to a canonical per-voxel sum so the comparison is
        # placement-independent.
        _, vfeats, vmask = dense_to_sparse(f, jnp.asarray(mask), cap)
        return jnp.sum(vfeats * jnp.asarray(g) * vmask[..., None])

    # padding placement differs between the two paths, so compare against a
    # hand-built oracle instead: grad of sum(vfeats*g) routes g-rows back to
    # their source voxels.
    gp = jax.grad(loss_pallas)(jnp.asarray(feats))
    coords, _, vmask = pallas_dense_to_sparse(jnp.asarray(feats), jnp.asarray(mask), cap)
    want = np.zeros_like(feats)
    for bi in range(B):
        for v in range(cap):
            if np.asarray(vmask)[bi, v]:
                i, j, k = np.asarray(coords)[bi, v]
                want[bi, i, j, k] += g[bi, v]
    np.testing.assert_allclose(np.asarray(gp), want, atol=1e-5)

    # and the total-loss gradients of both paths agree where both are valid
    ge = jax.grad(loss_exact)(jnp.asarray(feats))
    # same occupied set in the same linear order at identical g-rows only if
    # placement matches; instead compare a placement-independent functional:
    def mean_feat(path_fn):
        def f(x):
            _, vfeats, vmask = path_fn(x, jnp.asarray(mask), cap)
            return jnp.sum(vfeats * vmask[..., None])
        return jax.grad(f)(jnp.asarray(feats))

    np.testing.assert_allclose(
        np.asarray(mean_feat(pallas_dense_to_sparse)),
        np.asarray(mean_feat(dense_to_sparse)),
        atol=1e-5,
    )
    del ge


def test_pallas_compaction_capacity_waste_bound(rng):
    """The 8-aligned per-chunk layout consumes ceil(count/8)*8 slots per
    non-empty chunk, so worst-case effective capacity is
    capacity - 7*n_nonempty_chunks (ops/pallas_compact.py docstring).
    Uniform single-voxel chunks must degrade by dropping the HIGHEST-index
    chunks gracefully; clustered occupancy must keep everything."""
    from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse, _CHUNK

    d, c = 16, 4  # G = 4096 -> 8 chunks of 512
    g = d ** 3
    n_chunks = g // min(_CHUNK, g)
    assert n_chunks >= 8, "test needs a multi-chunk grid"

    # one voxel per chunk: 8 slots consumed each -> cap 32 holds 4 chunks
    mask = np.zeros((1, d, d, d), np.float32)
    feats = np.zeros((1, d, d, d, c), np.float32)
    chunk = min(_CHUNK, g)
    for ci in range(n_chunks):
        lin = ci * chunk + 7  # arbitrary cell inside chunk ci
        i, j, k = np.unravel_index(lin, (d, d, d))
        mask[0, i, j, k] = 1
        feats[0, i, j, k] = ci + 1
    cap = 32
    co, vf, vm = pallas_dense_to_sparse(
        jnp.asarray(feats), jnp.asarray(mask), cap)
    kept = int(np.asarray(vm).sum())
    assert kept == cap // 8, kept  # 4 lowest-index chunks survive
    vals = sorted(np.asarray(vf)[0, np.asarray(vm)[0] > 0][:, 0].tolist())
    assert vals == [1.0, 2.0, 3.0, 4.0], vals  # linear-order priority

    # clustered: same 8 voxels all inside chunk 0 -> nothing dropped
    mask2 = np.zeros((1, d, d, d), np.float32)
    feats2 = np.zeros((1, d, d, d, c), np.float32)
    for v in range(8):
        i, j, k = np.unravel_index(v * 3, (d, d, d))
        mask2[0, i, j, k] = 1
        feats2[0, i, j, k] = v + 1
    _, vf2, vm2 = pallas_dense_to_sparse(
        jnp.asarray(feats2), jnp.asarray(mask2), cap)
    assert int(np.asarray(vm2).sum()) == 8


@pytest.mark.slow
def test_pallas_interp_mode_grad_matches_exact_end_to_end(rng):
    """Full-model gradient: interp_mode='pallas' (compaction + fused 3-NN,
    both custom-VJP) vs interp_mode='exact' — training may default to the
    fast path only if gradients match."""
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet, dcl_losses

    grid, unit, n = (16, 16, 16), (0.024, 0.024, 0.024), 128
    ds = SyntheticPoseDataset(
        n_objects=2, n_points=n, unit_voxel_extent=unit, voxel_num_limit=grid,
        seed=3,
    )
    batch = make_batch([ds[i] for i in range(2)]).to_dict()

    grads = {}
    outs = {}
    for mode in ("exact", "pallas"):
        model = DCLNet(
            unit_voxel_extent=unit, voxel_num_limit=grid, n_inp=n, n_tmp=n,
            capacities=(256, 64, 16, 8), interp_mode=mode,
        )
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)

        def loss(params):
            pred, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            return dcl_losses(pred, batch)["loss_all"]

        outs[mode] = float(loss(variables["params"]))
        grads[mode] = jax.grad(loss)(variables["params"])

    np.testing.assert_allclose(outs["pallas"], outs["exact"], rtol=1e-4)
    # the two paths compute the same math with different f32 accumulation
    # orders (kernel matmuls vs XLA gathers); softmax attention amplifies
    # that to ~1e-3 absolute on isolated elements, so elementwise rtol is
    # flaky. A per-leaf relative-L2 bound is robust noise-wise and still
    # catches routing bugs hard: one flipped 3-NN neighbor shifts whole
    # gradient rows, pushing relative L2 to O(0.1).
    paths_e = jax.tree_util.tree_flatten_with_path(grads["exact"])[0]
    flat_p = jax.tree.leaves(grads["pallas"])
    for (path, a), b in zip(paths_e, flat_p):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-8)
        assert rel < 5e-3, (jax.tree_util.keystr(path), rel)


def test_voxelize_modes_first_last_unique_oracle(rng):
    """Modes 0/1/2 (unique / first-keep / last-overwrite) vs a numpy oracle —
    full surface parity with reference voxelize.cpp:119-138 (the reference's
    :51 comment swaps 1/2 vs its own code; tests/test_golden_voxelize.py pins
    these modes against the compiled reference code itself)."""
    b, n, c, d = 2, 32, 4, 4
    feats = rng.randn(b, n, c).astype(np.float32)
    vidx = rng.randint(0, d, size=(b, n, 3))
    mask = rng.rand(b, n) > 0.2

    def oracle(mode):
        grid = np.zeros((b, d, d, d, c), np.float32)
        seen = np.zeros((b, d, d, d), bool)
        order = range(n) if mode == 1 else range(n - 1, -1, -1)  # first/last
        for bi in range(b):
            for pi in order:
                if not mask[bi, pi]:
                    continue
                i, j, k = vidx[bi, pi]
                if not seen[bi, i, j, k]:
                    grid[bi, i, j, k] = feats[bi, pi]
                    seen[bi, i, j, k] = True
        return grid

    for mode in (1, 2):
        grid, cnt = voxelize_dense(
            jnp.asarray(feats), jnp.asarray(vidx), (d, d, d), mode=mode,
            point_mask=jnp.asarray(mask),
        )
        np.testing.assert_allclose(np.asarray(grid), oracle(mode), atol=1e-6,
                                   err_msg=f"mode {mode}")
        # counts are occupancy counts regardless of mode
        assert (np.asarray(cnt) > 0).sum() == (oracle(mode) != 0).any(-1).sum()

    # mode 0: caller guarantees unique voxels; equals first/last/sum then
    uni_idx = np.stack([np.unravel_index(
        rng.choice(d ** 3, n, replace=False), (d, d, d)) for _ in range(b)],
    ).transpose(0, 2, 1).astype(np.int32)
    g0, _ = voxelize_dense(jnp.asarray(feats), jnp.asarray(uni_idx), (d, d, d), mode=0)
    g1, _ = voxelize_dense(jnp.asarray(feats), jnp.asarray(uni_idx), (d, d, d), mode=1)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)


def test_knn_large_k_matches_sorted(rng):
    """k>8 runs the scanned iterated-argmin path (the reference knn supports
    k<=200, libs/pointnet_lib/pointnet2_utils.py:78-108) — no lax.top_k."""
    q = rng.randn(2, 10, 3).astype(np.float32)
    r = rng.randn(2, 60, 3).astype(np.float32)
    d2, idx = knn(20, jnp.asarray(q), jnp.asarray(r))
    full = ((q[:, :, None] - r[:, None]) ** 2).sum(-1)
    expect = np.sort(full, axis=-1)[:, :, :20]
    np.testing.assert_allclose(np.asarray(d2), expect, rtol=1e-4, atol=1e-5)
    # indices consistent with distances
    take = np.take_along_axis(full, np.asarray(idx), axis=-1)
    np.testing.assert_allclose(take, expect, rtol=1e-4, atol=1e-5)


def test_pallas_voxelize_matches_scatter(rng):
    """Matmul voxelizer (interpret on CPU) vs the exact XLA scatter path:
    same grid and counts for mean and sum modes, with masked points."""
    from dcl_net_tpu.ops.pallas_voxelize import pallas_voxelize
    from dcl_net_tpu.ops.voxelize import (
        voxelize_dense, MODE_MEAN, MODE_SUM,
    )

    B, N, C = 2, 100, 7  # N deliberately not 128-divisible (pad path)
    grid_size = (8, 8, 8)
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 8, size=(B, N, 3)).astype(np.int32))
    mask = jnp.asarray((rng.rand(B, N) > 0.2).astype(np.float32))

    for mode in (MODE_MEAN, MODE_SUM):
        ref_grid, ref_cnt = voxelize_dense(
            feats, idx, grid_size, mode=mode, point_mask=mask)
        got_grid, got_cnt = pallas_voxelize(
            feats, idx, grid_size, mode=mode, point_mask=mask)
        np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(ref_cnt))
        np.testing.assert_allclose(
            np.asarray(got_grid), np.asarray(ref_grid), atol=1e-5)


def test_pallas_voxelize_bf16_payload(rng):
    """bf16 payload path (the production configuration): counts stay exact
    f32; the grid matches a scatter of bf16-rounded features to bf16 rtol."""
    from dcl_net_tpu.ops.pallas_voxelize import pallas_voxelize
    from dcl_net_tpu.ops.voxelize import voxelize_dense, MODE_MEAN

    B, N, C = 2, 256, 7
    grid_size = (16, 16, 16)
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 16, size=(B, N, 3)).astype(np.int32))

    got_grid, got_cnt = pallas_voxelize(
        feats, idx, grid_size, mode=MODE_MEAN, out_dtype=jnp.bfloat16)
    assert got_grid.dtype == jnp.bfloat16
    ref_grid, ref_cnt = voxelize_dense(
        feats.astype(jnp.bfloat16).astype(jnp.float32), idx, grid_size,
        mode=MODE_MEAN)
    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(ref_cnt))
    np.testing.assert_allclose(
        np.asarray(got_grid, np.float32), np.asarray(ref_grid),
        rtol=1e-2, atol=1e-2)


def test_pallas_voxelize_vjp_matches_scatter(rng):
    """Custom VJP (per-point gather of the voxel cotangent) vs autodiff
    through the scatter path — makes the matmul voxelizer valid for training
    (reference backward: libs/pointgroup_ops/src/voxelize/voxelize.cu:33-54)."""
    from dcl_net_tpu.ops.pallas_voxelize import pallas_voxelize
    from dcl_net_tpu.ops.voxelize import voxelize_dense, MODE_MEAN

    B, N, C = 2, 64, 5
    grid_size = (4, 4, 4)
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 4, size=(B, N, 3)).astype(np.int32))
    mask = jnp.asarray((rng.rand(B, N) > 0.3).astype(np.float32))
    g = jnp.asarray(rng.randn(B, 4, 4, 4, C).astype(np.float32))

    def loss_pallas(f):
        grid, _ = pallas_voxelize(
            f, idx, grid_size, mode=MODE_MEAN, point_mask=mask)
        return jnp.sum(grid * g)

    def loss_scatter(f):
        grid, _ = voxelize_dense(
            f, idx, grid_size, mode=MODE_MEAN, point_mask=mask)
        return jnp.sum(grid * g)

    gp = jax.grad(loss_pallas)(feats)
    gs = jax.grad(loss_scatter)(feats)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), atol=1e-5)
