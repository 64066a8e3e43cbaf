"""DCL-Net model tests: shapes, determinism, gradient flow, tiny overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dcl_net_tpu.models import DCLNet, dcl_losses, Refiner, refiner_losses
from dcl_net_tpu.models.refiner import refine_pose
from dcl_net_tpu.geometry.rotation import random_rotation
from dcl_net_tpu.ops.voxelize import point_to_voxel_index

GRID = (16, 16, 16)
UNIT = (0.024, 0.024, 0.024)  # same 0.384m total extent as the 64^3 config
N = 64


def _make_batch(rng, b=2, n=N, symmetric=False):
    """Synthetic pose batch: template cloud + transformed observed cloud."""
    key = jax.random.PRNGKey(rng.randint(1 << 30))
    tmp = (rng.rand(b, n, 3).astype(np.float32) - 0.5) * 0.15
    rot = np.asarray(random_rotation(key, (b,)))
    trans = (rng.rand(b, 3).astype(np.float32) - 0.5) * 0.05
    inp = np.einsum("bnj,bkj->bnk", tmp, rot) + trans[:, None]
    rgb_i = rng.rand(b, n, 3).astype(np.float32) - 0.5
    rgb_t = rng.rand(b, n, 3).astype(np.float32) - 0.5

    feats_inp = np.concatenate([np.ones((b, n, 1), np.float32), rgb_i, inp], -1)
    feats_tmp = np.concatenate([np.ones((b, n, 1), np.float32), rgb_t, tmp], -1)
    vi = np.asarray(point_to_voxel_index(jnp.asarray(inp), UNIT, GRID))
    vt = np.asarray(point_to_voxel_index(jnp.asarray(tmp), UNIT, GRID))
    return {
        "inp": {"feats": jnp.asarray(feats_inp), "voxel_idx": jnp.asarray(vi)},
        "tmp": {"feats": jnp.asarray(feats_tmp), "voxel_idx": jnp.asarray(vt)},
        "labels": {
            "rot_gt": jnp.asarray(rot.astype(np.float32)),
            "trans_gt": jnp.asarray(trans),
            "obj_idx": jnp.zeros((b,), jnp.int32),
        },
        "sym_flag": jnp.full((b,), 1.0 if symmetric else 0.0),
        "valid": jnp.ones((b,)),
    }


def _model():
    return DCLNet(
        unit_voxel_extent=UNIT,
        voxel_num_limit=GRID,
        n_inp=N,
        n_tmp=N,
        capacities=(256, 64, 16, 8),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    rng = np.random.RandomState(0)
    batch = _make_batch(rng)
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    return model, variables, batch


def test_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out, _ = model.apply(
        variables, batch, train=True, mutable=["batch_stats"]
    )
    b = 2
    assert out["rot_pred"].shape == (b, 3, 3)
    assert out["trans_pred"].shape == (b, 3)
    assert out["conf"].shape == (b, 2 * N)
    assert out["F_Xo_p"].shape == (b, N, 256)
    assert out["Xo_pred"].shape == (b, N, 3)
    assert out["Yc_pred"].shape == (b, N, 3)
    r = np.asarray(out["rot_pred"])
    np.testing.assert_allclose(
        r @ r.swapaxes(-1, -2), np.broadcast_to(np.eye(3), r.shape), atol=1e-4
    )
    conf = np.asarray(out["conf"])
    assert (conf > 0).all() and (conf < 1).all()


def test_losses_finite_and_positive(model_and_vars):
    model, variables, batch = model_and_vars
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    losses = dcl_losses(out, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_pose"]) > 0
    # sym branch also works
    rng = np.random.RandomState(3)
    batch_sym = _make_batch(rng, symmetric=True)
    out2, _ = model.apply(variables, batch_sym, train=True, mutable=["batch_stats"])
    losses2 = dcl_losses(out2, batch_sym)
    assert np.isfinite(float(losses2["loss_all"]))


def test_eval_mode_uses_running_stats(model_and_vars):
    model, variables, batch = model_and_vars
    out1 = model.apply(variables, batch, train=False)
    out2 = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(
        np.asarray(out1["trans_pred"]), np.asarray(out2["trans_pred"]), atol=0
    )


def test_valid_masking_zeroes_padded_rows():
    """A padded row (valid=0) must not change the loss value."""
    rng = np.random.RandomState(1)
    batch = _make_batch(rng, b=2)
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    # mark sample 1 invalid: loss must equal the single-sample loss of row 0
    batch_masked = dict(batch)
    batch_masked["valid"] = jnp.asarray([1.0, 0.0])
    l_masked = dcl_losses(out, batch_masked)

    per_sample = dcl_losses(
        jax.tree.map(lambda x: x[:1], out),
        jax.tree.map(lambda x: x[:1], batch),
    )
    np.testing.assert_allclose(
        float(l_masked["loss_pose"]), float(per_sample["loss_pose"]), rtol=2e-4
    )


@pytest.mark.slow
def test_overfit_single_batch():
    """Loss must drop substantially on a fixed tiny batch — end-to-end
    gradient flow through voxelization, backbone, attention and SVD."""
    rng = np.random.RandomState(2)
    batch = _make_batch(rng, b=2)
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch, train=True, mutable=["batch_stats"],
            )
            return dcl_losses(out, batch)["loss_all"], mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    losses = []
    for _ in range(30):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], losses


def test_refiner_shapes_and_loss():
    rng = np.random.RandomState(4)
    b, n = 2, N
    feats = jnp.asarray(rng.randn(b, n, 259).astype(np.float32))
    conf = jnp.asarray(rng.rand(b, 2 * n).astype(np.float32))
    refiner = Refiner(n_inp=n)
    variables = refiner.init(
        jax.random.PRNGKey(0), {"input_features": feats, "conf": conf}
    )
    out = refiner.apply(variables, {"input_features": feats, "conf": conf})
    assert out["rot_pred"].shape == (b, 3, 3)
    assert out["trans_pred"].shape == (b, 3)

    tmp = jnp.asarray((rng.rand(b, 100, 3) - 0.5).astype(np.float32))
    rot_gt = random_rotation(jax.random.PRNGKey(1), (b,))
    trans_gt = jnp.asarray(rng.randn(b, 3).astype(np.float32) * 0.01)
    losses = refiner_losses(
        out, trans_gt, rot_gt, tmp, jnp.zeros((b,)), rot_gt, trans_gt
    )
    assert np.isfinite(float(losses["loss_all"]))

    # full refinement loop
    pts = jnp.asarray((rng.rand(b, n, 3) - 0.5).astype(np.float32))
    fxo = jnp.asarray(rng.randn(b, n, 256).astype(np.float32))
    rot, trans = refine_pose(
        refiner.apply, variables, pts, fxo, conf,
        rot_gt, trans_gt, iterations=2,
    )
    r = np.asarray(rot)
    np.testing.assert_allclose(
        r @ r.swapaxes(-1, -2), np.broadcast_to(np.eye(3), r.shape), atol=1e-4
    )

    # the bf16 production model emits bf16 trans_pred/F_Xo_p; the pose-
    # composition scan must carry f32 regardless (a mixed-dtype carry used
    # to fail lax.scan's type check on TPU stage-2 eval)
    rot_b, trans_b = refine_pose(
        refiner.apply, variables, pts, fxo.astype(jnp.bfloat16), conf,
        rot_gt, trans_gt.astype(jnp.bfloat16), iterations=2,
    )
    assert rot_b.dtype == jnp.float32 and trans_b.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(trans_b), np.asarray(trans), atol=5e-3
    )


def test_template_cache_equivalence():
    """encode_observed + cached encode_template + fuse must equal __call__."""
    rng = np.random.RandomState(7)
    batch = _make_batch(rng, b=2)
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)

    full = model.apply(variables, batch, train=False)
    obs = model.apply(variables, batch, train=False,
                      method=model.encode_observed)
    tmp = model.apply(variables, batch, train=False,
                      method=model.encode_template)
    fused = model.apply(variables, obs, tmp, train=False, method=model.fuse)
    for k in ("trans_pred", "rot_pred", "conf", "Xo_pred"):
        np.testing.assert_allclose(
            np.asarray(full[k]), np.asarray(fused[k]), atol=1e-6
        )


@pytest.mark.slow
def test_bf16_compute_pose_drift_bounded():
    """model.compute_dtype=bfloat16 (the fast path: +5% eval, 1.75x train
    step on v5e, docs/PERF.md) must stay metrically indistinguishable from
    f32: the geometry/SVD path is pinned to f32 HIGHEST, so only feature
    compute varies. Bounds are ~20x below the ADD-S thresholds (2cm / 0.1d)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet

    grid, unit, n = (16, 16, 16), (0.024, 0.024, 0.024), 128
    ds = SyntheticPoseDataset(
        n_objects=2, n_points=n, unit_voxel_extent=unit, voxel_num_limit=grid,
        seed=5,
    )
    batch = jax.tree.map(jnp.asarray, make_batch([ds[i] for i in range(4)]).to_dict())
    outs = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        model = DCLNet(
            unit_voxel_extent=unit, voxel_num_limit=grid, n_inp=n, n_tmp=n,
            capacities=(256, 64, 16, 8), dtype=dt,
        )
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        outs[name] = model.apply(v, batch, train=False)

    ra = np.asarray(outs["f32"]["rot_pred"])
    rb = np.asarray(outs["bf16"]["rot_pred"])
    ta = np.asarray(outs["f32"]["trans_pred"])
    tb = np.asarray(outs["bf16"]["trans_pred"])
    trace = np.clip((np.einsum("bij,bij->b", ra, rb) - 1.0) / 2.0, -1.0, 1.0)
    rot_deg = np.degrees(np.arccos(trace))
    trans_mm = np.linalg.norm(ta - tb, axis=1) * 1000.0
    assert rot_deg.max() < 1.0, rot_deg
    assert trans_mm.max() < 0.5, trans_mm


@pytest.mark.slow
def test_remat_matches_baseline_loss_and_grads():
    """model.remat=True (backbone rematerialization for large-batch training,
    models/dcl_net.py) must be a pure memory/compute trade: identical loss
    and gradients to the non-remat model."""
    rng = np.random.RandomState(7)
    batch = _make_batch(rng)

    results = {}
    for remat in (False, True):
        model = DCLNet(
            unit_voxel_extent=UNIT, voxel_num_limit=GRID, n_inp=N, n_tmp=N,
            capacities=(256, 64, 16, 8), remat=remat,
        )
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)

        def loss(params):
            pred, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            return dcl_losses(pred, batch)["loss_all"]

        results[remat] = (float(loss(variables["params"])),
                          jax.grad(loss)(variables["params"]))

    assert results[False][0] == results[True][0]
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_default_capacities_have_margin_over_real_occupancy():
    """The default per-level extraction budgets must hold >=2x the pyramid
    occupancy actually produced at the production shapes (1024-pt surface
    clouds, 64^3 grid) — guards the right-sized capacities in DCLNet against
    model or data changes that would silently overflow them."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet
    from dcl_net_tpu.ops.voxelize import voxelize_dense

    grid, unit, n = (64, 64, 64), (0.006, 0.006, 0.006), 1024
    ds = SyntheticPoseDataset(
        n_objects=4, n_points=n, unit_voxel_extent=unit, voxel_num_limit=grid,
        seed=0,
    )
    batch = jax.tree.map(jnp.asarray, make_batch([ds[i] for i in range(4)]).to_dict())
    model = DCLNet(unit_voxel_extent=unit, voxel_num_limit=grid, n_inp=n, n_tmp=n)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def occ(mdl, bb, branch):
        g, cnt = voxelize_dense(bb[branch]["feats"], bb[branch]["voxel_idx"], grid, mode=4)
        mask = (cnt > 0).astype(bb[branch]["feats"].dtype)
        backbone = mdl.backbone_inp if branch == "inp" else mdl.backbone_tmp
        return [jnp.max(jnp.sum(m, axis=(1, 2, 3))) for _, m in backbone(g, mask, False)]

    for branch in ("inp", "tmp"):
        maxima = model.apply(variables, batch, branch, method=occ)
        for level, mx in enumerate(maxima):
            cap = model.capacities[level]
            assert 2 * float(mx) <= cap or cap >= np.prod(grid) // (8 ** (level + 1)), (
                f"{branch} level {level}: occupancy {float(mx)} vs capacity {cap}"
            )


def test_matmul_voxelizer_matches_scatter_poses(model_and_vars):
    """voxelize_impl='matmul' (Pallas one-hot matmul, the TPU eval default)
    vs the exact scatter path: identical f32 voxel grids up to summation
    order, so pose outputs must agree tightly."""
    model, variables, batch = model_and_vars
    mm = DCLNet(
        unit_voxel_extent=UNIT, voxel_num_limit=GRID, n_inp=N, n_tmp=N,
        capacities=(256, 64, 16, 8), voxelize_impl="matmul",
    )
    ref = model.apply(variables, batch, train=False)
    got = mm.apply(variables, batch, train=False)
    np.testing.assert_allclose(
        np.asarray(got["rot_pred"]), np.asarray(ref["rot_pred"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["trans_pred"]), np.asarray(ref["trans_pred"]),
        atol=1e-5)
