"""Tests for parity components: Wigner-D, PointNet++ modules, spconv extras."""

import numpy as np
import jax
import jax.numpy as jnp

from dcl_net_tpu.geometry import wigner


def test_wigner_l0_and_l1():
    # l=0 is always [[1]]
    d = wigner.wigner_D(0, 0.3, 0.7, -0.2)
    np.testing.assert_allclose(d, [[1.0]], atol=1e-12)
    # l=1 real Wigner D is orthogonal and conjugate to the rotation matrix:
    # same trace and determinant
    a, b, g = 0.4, 1.1, -0.8
    d1 = wigner.wigner_D(1, a, b, g)
    r = wigner.zyz_to_matrix(a, b, g)
    np.testing.assert_allclose(d1 @ d1.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.trace(d1), np.trace(r), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(d1), 1.0, atol=1e-10)


def test_wigner_composition():
    """D(R1 R2) == D(R1) D(R2) — the defining representation property."""
    rng = np.random.RandomState(0)
    for l in (1, 2, 3):
        a1, b1, g1 = rng.uniform(-np.pi, np.pi, 3) * [1, 0.5, 1]
        a2, b2, g2 = rng.uniform(-np.pi, np.pi, 3) * [1, 0.5, 1]
        b1, b2 = abs(b1), abs(b2)
        r1 = wigner.zyz_to_matrix(a1, b1, g1)
        r2 = wigner.zyz_to_matrix(a2, b2, g2)
        d12 = wigner.D_from_matrix(l, r1 @ r2)
        d1 = wigner.wigner_D(l, a1, b1, g1)
        d2 = wigner.wigner_D(l, a2, b2, g2)
        np.testing.assert_allclose(d12, d1 @ d2, atol=1e-8)


def test_wigner_orthogonal_higher_l():
    for l in (2, 4):
        d = wigner.wigner_D(l, 0.3, 0.9, 1.2)
        np.testing.assert_allclose(d @ d.T, np.eye(2 * l + 1), atol=1e-9)


def test_wigner_matches_reference_constants():
    """Cross-check geometry/wigner.py against the reference's own Wigner-D
    machinery (reference utils/transform3D.py:156-397 + the shipped
    utils/new_constants.pt J-matrices, loaded with CPU torch).

    The two use different real-SH conventions (the reference follows e3nn's
    Y-is-polar-axis ordering; ours is the standard Z-polar complex-to-real
    transform), so entrywise equality is not expected. The meaningful claim
    is REPRESENTATION EQUIVALENCE: for each degree l there is one fixed
    orthogonal intertwiner P_l, independent of the rotation, with
    D_ref(R) = P_l @ D_ours(R) @ P_l.T for every R. By Schur's lemma the
    intertwiner space of an irreducible real representation of this type is
    1-dimensional, so we (a) solve for P_l from a few sample rotations,
    (b) assert the nullspace is exactly 1-dimensional and P_l orthogonal,
    (c) verify the conjugation on FRESH rotations to 1e-8. Any error in the
    small-d formula or basis transform that is not itself a global fixed
    basis change fails this test.
    """
    import importlib.util
    import os

    import pytest

    ref_path = "/root/reference/utils/transform3D.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")

    spec = importlib.util.spec_from_file_location("ref_transform3D", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.RandomState(7)

    def random_rotation():
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        return q

    def d_ref(l, r):
        rt = torch.as_tensor(r, dtype=torch.float64)[None]
        return ref.D_from_matrix(rt, l)[0].numpy()

    fit_rots = [random_rotation() for _ in range(3)]
    test_rots = [random_rotation() for _ in range(3)]

    for l in (0, 1, 2, 3, 4):
        n = 2 * l + 1
        eye = np.eye(n)
        # D_ref(R) P - P D_ours(R) = 0, row-major vec:
        # (D_ref ⊗ I - I ⊗ D_ours^T) vec(P) = 0
        rows = [
            np.kron(d_ref(l, r), eye) - np.kron(eye, wigner.D_from_matrix(l, r).T)
            for r in fit_rots
        ]
        _, s, vt = np.linalg.svd(np.concatenate(rows, axis=0))
        # 1-dimensional nullspace (Schur): smallest singular value ~0,
        # second-smallest bounded away from 0
        assert s[-1] < 1e-10
        if n > 1:
            assert s[-2] > 1e-3
        p = vt[-1].reshape(n, n)
        p *= np.sqrt(n) / np.linalg.norm(p)  # normalize to orthogonal
        np.testing.assert_allclose(p @ p.T, eye, atol=1e-8)
        for r in test_rots:
            np.testing.assert_allclose(
                d_ref(l, r), p @ wigner.D_from_matrix(l, r) @ p.T, atol=1e-8
            )


def test_wigner_jax_matches_numpy():
    """wigner_D_jax / D_from_matrix_jax track the numpy path to f32 eps —
    the jit/grad/vmap-capable equivalent of the reference's torch-autograd
    Wigner machinery (utils/transform3D.py:156-397)."""
    rng = np.random.RandomState(3)
    for l in range(4):
        for _ in range(3):
            a, b, g = rng.uniform(-np.pi, np.pi, 3)
            dn = wigner.wigner_D(l, a, b, g)
            dj = np.asarray(wigner.wigner_D_jax(l, a, b, g))
            np.testing.assert_allclose(dj, dn, atol=2e-6)
            r = wigner.zyz_to_matrix(a, b, g)
            dm = np.asarray(
                wigner.D_from_matrix_jax(l, jnp.asarray(r, jnp.float32)))
            np.testing.assert_allclose(
                dm, wigner.D_from_matrix(l, r), atol=5e-6)
    # gimbal: identity rotation goes through the branchless arctan2 select
    np.testing.assert_allclose(
        np.asarray(wigner.D_from_matrix_jax(2, jnp.eye(3))),
        wigner.D_from_matrix(2, np.eye(3)), atol=5e-6)


def test_wigner_jax_jit_vmap_grad():
    """The capability claim itself: jit + vmap compile, gradients match
    finite differences, and the beta=0 / x**0 corner stays finite."""
    f = jax.jit(lambda abg: wigner.wigner_D_jax(2, abg[0], abg[1], abg[2]))
    abgs = jnp.asarray(
        np.random.RandomState(5).uniform(-3, 3, (4, 3)), jnp.float32)
    batched = jax.vmap(f)(abgs)
    assert batched.shape == (4, 5, 5)
    # every D is orthogonal
    eye = jnp.eye(5)
    gram = jnp.einsum("bij,bkj->bik", batched, batched)
    np.testing.assert_allclose(np.asarray(gram), np.tile(eye, (4, 1, 1)),
                               atol=1e-5)

    w = jnp.arange(25.0).reshape(5, 5)

    def loss(abg):
        return jnp.sum(wigner.wigner_D_jax(2, abg[0], abg[1], abg[2]) * w)

    x0 = np.array([0.3, 0.7, -0.2])
    g = np.asarray(jax.grad(loss)(jnp.asarray(x0, jnp.float32)))
    eps = 1e-3
    fd = np.array([
        (loss(jnp.asarray(x0 + eps * np.eye(3)[i], jnp.float32))
         - loss(jnp.asarray(x0 - eps * np.eye(3)[i], jnp.float32))) / (2 * eps)
        for i in range(3)
    ])
    np.testing.assert_allclose(g, fd, atol=2e-2)

    # beta=0: plain x**0 backprop would emit nan via 0 * 0**-1
    gb = jax.grad(lambda b: jnp.sum(wigner.small_d_jax(2, b) * w))(
        jnp.float32(0.0))
    assert bool(jnp.isfinite(gb))
    # gradient through the matrix entries (away from the gimbal set)
    gm = jax.grad(lambda r: jnp.sum(
        wigner.D_from_matrix_jax(1, r) * jnp.arange(9.0).reshape(3, 3)))(
        jnp.asarray(wigner.zyz_to_matrix(0.3, 0.7, -0.2), jnp.float32))
    assert np.isfinite(np.asarray(gm)).all()


def test_pointnet_sa_and_fp_modules(rng):
    from dcl_net_tpu.ops.pointnet_modules import (
        PointnetSAModuleMSG,
        PointnetFPModule,
        query_and_group,
        group_all,
    )

    B, N = 2, 128
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.1)
    feats = jnp.asarray(rng.randn(B, N, 8).astype(np.float32))

    sa = PointnetSAModuleMSG(
        npoint=32, radii=[0.1, 0.2], nsamples=[8, 16],
        mlps=[[16, 16], [16, 32]],
    )
    vs = sa.init(jax.random.PRNGKey(0), xyz, feats, True)
    (new_xyz, new_feats), _ = sa.apply(vs, xyz, feats, True, mutable=["batch_stats"])
    assert new_xyz.shape == (B, 32, 3)
    assert new_feats.shape == (B, 32, 48)  # 16 + 32 concat

    fp = PointnetFPModule(mlp=[32, 16])
    vs2 = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feats, new_feats, True)
    out, _ = fp.apply(vs2, xyz, new_xyz, feats, new_feats, True, mutable=["batch_stats"])
    assert out.shape == (B, N, 16)

    g = query_and_group(xyz, new_xyz, 0.2, 8, feats)
    assert g.shape == (B, 32, 8, 11)
    ga = group_all(xyz, feats)
    assert ga.shape == (B, 1, N, 11)


def test_nms():
    from dcl_net_tpu.ops.extras import nms

    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # overlaps box 0 heavily
        [20, 20, 30, 30],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, iou_threshold=0.5)
    np.testing.assert_array_equal(sorted(keep), [0, 2])


def test_voxel_generator():
    from dcl_net_tpu.ops.extras import VoxelGenerator

    gen = VoxelGenerator([0.1, 0.1, 0.1], [0, 0, 0, 1, 1, 1], max_num_points=3)
    pts = np.array([
        [0.05, 0.05, 0.05, 1.0],
        [0.06, 0.04, 0.05, 2.0],
        [0.95, 0.95, 0.95, 3.0],
        [5.0, 5.0, 5.0, 4.0],    # out of range
    ], np.float32)
    voxels, coords, counts = gen.generate(pts)
    assert len(voxels) == 2
    np.testing.assert_array_equal(counts, [2, 1])
    np.testing.assert_array_equal(coords[0], [0, 0, 0])  # zyx


def test_sparse_field_max_pool(rng):
    from dcl_net_tpu.ops.extras import sparse_field_max_pool

    B, D, F, C = 1, 4, 2, 3
    feats = np.zeros((B, D, D, D, F, C), np.float32)
    mask = np.zeros((B, D, D, D), np.float32)
    # two occupied voxels in one pooling window with different norms
    feats[0, 0, 0, 0, 0] = [1.0, 0, 0]
    feats[0, 0, 0, 1, 0] = [0, 3.0, 0]     # larger norm, must win whole field
    feats[0, 0, 0, 0, 1] = [0, 0, 5.0]     # field 1: first voxel wins
    feats[0, 0, 0, 1, 1] = [0.1, 0, 0]
    mask[0, 0, 0, 0] = 1
    mask[0, 0, 0, 1] = 1
    out, new_mask = sparse_field_max_pool(jnp.asarray(feats), jnp.asarray(mask), 3, 2)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0, 0, 0, 0], [0, 3.0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 0, 0, 0, 1], [0, 0, 5.0], atol=1e-6)
    assert np.asarray(new_mask)[0, 0, 0, 0] == 1


def test_sec_reductions(rng):
    from dcl_net_tpu.ops.extras import sec_mean, sec_min, sec_max

    feats = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    offsets = jnp.asarray([0, 3, 7, 10])
    m = np.asarray(sec_mean(feats, offsets, 3))
    np.testing.assert_allclose(m[0], np.asarray(feats)[:3].mean(0), atol=1e-5)
    np.testing.assert_allclose(m[2], np.asarray(feats)[7:].mean(0), atol=1e-5)
    mn = np.asarray(sec_min(feats, offsets, 3))
    np.testing.assert_allclose(mn[1], np.asarray(feats)[3:7].min(0), atol=1e-6)
    mx = np.asarray(sec_max(feats, offsets, 3))
    np.testing.assert_allclose(mx[1], np.asarray(feats)[3:7].max(0), atol=1e-6)


def test_pointgroup_leftovers(rng):
    from dcl_net_tpu.ops.extras import (
        ballquery_batch_p, bfs_cluster, roipool, get_iou,
    )
    import jax.numpy as jnp

    # two separated clusters in one batch + one in a second batch
    xyz = np.concatenate([
        rng.randn(10, 3) * 0.01,
        rng.randn(10, 3) * 0.01 + 5.0,
        rng.randn(5, 3) * 0.01,
    ]).astype(np.float32)
    offsets = np.array([0, 20, 25])
    idx, start_len = ballquery_batch_p(xyz, offsets, radius=0.5, mean_active=20)
    # batch separation: no neighbor crosses the batch boundary
    for i in range(20):
        s, l = start_len[i]
        assert (idx[s:s+l] < 20).all()
    for i in range(20, 25):
        s, l = start_len[i]
        assert (idx[s:s+l] >= 20).all()

    labels = np.zeros(25, np.int32)  # single semantic class
    cluster_idx, cluster_off = bfs_cluster(labels, idx, start_len, threshold=3)
    n_clusters = len(cluster_off) - 1
    assert n_clusters == 3  # two in batch 0, one in batch 1
    sizes = np.diff(cluster_off)
    assert sorted(sizes.tolist()) == [5, 10, 10]

    feats = jnp.asarray(rng.randn(25, 4).astype(np.float32))
    pooled = np.asarray(roipool(feats, jnp.asarray([0, 20, 25])))
    np.testing.assert_allclose(pooled[0], np.asarray(feats)[:20].max(0), atol=1e-6)

    inst_labels = np.array([0] * 10 + [1] * 10 + [0] * 5)
    prop_idx = np.stack([np.zeros(20, np.int64), np.arange(20)], 1)
    ious = get_iou(prop_idx, np.array([0, 20]), inst_labels, np.array([15, 10]))
    # proposal covers inst0: inter 10, union 15+20-10=25
    np.testing.assert_allclose(ious[0, 0], 10 / 25, atol=1e-6)


def test_quaternion_compose_and_translate_rotate(rng):
    import jax.numpy as jnp
    from dcl_net_tpu.geometry.rotation import (
        quaternion_multiply, quaternion_to_matrix, translate_rotate,
    )

    q1 = rng.randn(4, 4).astype(np.float32)
    q2 = rng.randn(4, 4).astype(np.float32)
    r12 = np.asarray(quaternion_to_matrix(jnp.asarray(
        np.asarray(quaternion_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    )))
    r1r2 = np.asarray(quaternion_to_matrix(jnp.asarray(q1))) @ \
        np.asarray(quaternion_to_matrix(jnp.asarray(q2)))
    np.testing.assert_allclose(r12, r1r2, atol=1e-5)

    pts = jnp.asarray(rng.randn(2, 10, 3).astype(np.float32))
    t = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    r = quaternion_to_matrix(jnp.asarray(q1[:2]))
    out = np.asarray(translate_rotate(pts, t, r))
    expect = np.einsum("bnj,bkj->bnk", np.asarray(pts) + np.asarray(t)[:, None], np.asarray(r))
    np.testing.assert_allclose(out, expect, atol=1e-5)
