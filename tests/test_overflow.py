"""Capacity-overflow observability.

The fixed-capacity voxel extraction (ops/sparse_conv.py dense_to_sparse /
ops/pallas_compact.py) silently drops the highest-index occupied voxels when
a sample's occupancy exceeds the static per-level budget. The reference's
spconv ASSERTS/crashes on rulebook overflow (reference
libs/spconv/include/spconv/spconv_ops.h); we degrade instead — but must
SIGNAL. These tests feed an over-capacity (uniformly scattered) cloud and
check the per-sample `overflow` flag reaches every product surface:

1. the model forward output dict,
2. Solver train-step metrics (overflow_frac),
3. Evaluator results (n_overflow),
4. stage-2 train-step metrics,
5. serving artifacts.

A compact (in-budget) cloud must see the flag all-clear, and flag plumbing
must not perturb poses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dcl_net_tpu.models import DCLNet
from dcl_net_tpu.models.dcl_net import dcl_losses
from dcl_net_tpu.ops.voxelize import point_to_voxel_index

GRID = (16, 16, 16)
UNIT = (0.024, 0.024, 0.024)
N = 64
TINY_CAPS = (8, 8, 8, 8)       # guaranteed to overflow on scattered clouds
ROOMY_CAPS = (4096, 512, 64, 8)  # full grids at every level — never overflows


def _clouds(rng, b, scattered: bool):
    """scattered=True spreads points over the whole metric volume (dilates to
    far more than TINY_CAPS occupied voxels); False clusters them into a
    corner blob occupying only a few cells."""
    if scattered:
        pts = (rng.rand(b, N, 3).astype(np.float32) - 0.5) * 0.35
    else:
        pts = (rng.rand(b, N, 3).astype(np.float32)) * 0.02 + 0.05
    rgb = rng.rand(b, N, 3).astype(np.float32) - 0.5
    feats = np.concatenate([np.ones((b, N, 1), np.float32), rgb, pts], -1)
    vi = np.asarray(point_to_voxel_index(jnp.asarray(pts), UNIT, GRID))
    return feats, vi


def _batch(rng, b, scattered: bool):
    feats, vi = _clouds(rng, b, scattered)
    tfeats, tvi = _clouds(rng, b, scattered)
    return {
        "inp": {"feats": jnp.asarray(feats), "voxel_idx": jnp.asarray(vi)},
        "tmp": {"feats": jnp.asarray(tfeats), "voxel_idx": jnp.asarray(tvi)},
        "labels": {
            "rot_gt": jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
            "trans_gt": jnp.zeros((b, 3)),
            "obj_idx": jnp.zeros((b,), jnp.int32),
        },
        "sym_flag": jnp.zeros((b,)),
        "valid": jnp.ones((b,)),
    }


def _model(caps):
    return DCLNet(unit_voxel_extent=UNIT, voxel_num_limit=GRID,
                  n_inp=N, n_tmp=N, capacities=caps)


def test_forward_flags_overflow_and_clears_in_budget():
    # NOTE: conv dilation spreads even a one-voxel blob across deeper pyramid
    # levels, so "in budget" is asserted with roomy capacities rather than a
    # compact cloud under the tiny ones.
    rng = np.random.RandomState(0)
    over = _batch(rng, 2, scattered=True)
    model = _model(TINY_CAPS)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), over, train=False)

    out_over = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, over)
    assert out_over["overflow"].dtype == jnp.bool_
    assert bool(np.all(np.asarray(out_over["overflow"])))
    assert np.isfinite(np.asarray(out_over["rot_pred"])).all()

    # the same scattered input under roomy capacities flags nothing
    model2 = _model(ROOMY_CAPS)
    variables2 = jax.jit(model2.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), over, train=False)
    out2 = jax.jit(lambda v, b: model2.apply(v, b, train=False))(variables2, over)
    assert not bool(np.any(np.asarray(out2["overflow"])))


def test_solver_train_step_reports_overflow_frac():
    from dcl_net_tpu.train.solver import init_train_state, make_train_step

    rng = np.random.RandomState(1)
    model = _model(TINY_CAPS)
    tx = optax.adam(1e-3)
    over = _batch(rng, 2, scattered=True)
    state = init_train_state(model, tx, over)
    step = jax.jit(make_train_step(model, tx, dcl_losses))
    _, metrics = step(state, over)
    assert float(metrics["overflow_frac"]) == 1.0

    model2 = _model(ROOMY_CAPS)
    state2 = init_train_state(model2, tx, over)
    step2 = jax.jit(make_train_step(model2, tx, dcl_losses))
    _, metrics2 = step2(state2, over)
    assert float(metrics2["overflow_frac"]) == 0.0


def test_evaluator_reports_n_overflow():
    from dcl_net_tpu.eval.evaluator import Evaluator

    rng = np.random.RandomState(2)
    model = _model(TINY_CAPS)
    over = _batch(rng, 4, scattered=True)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(2), over, train=False)
    model_points = rng.rand(1, 32, 3).astype(np.float32) * 0.05
    ev = Evaluator(model, variables, model_points, protocol="adds_auc")
    res = ev.evaluate(iter([over]))
    assert res["n_overflow"] == 4

    model2 = _model(ROOMY_CAPS)
    variables2 = jax.jit(model2.init, static_argnames=("train",))(
        jax.random.PRNGKey(2), over, train=False)
    ev2 = Evaluator(model2, variables2, model_points, protocol="adds_auc")
    res2 = ev2.evaluate(iter([over]))
    assert res2["n_overflow"] == 0


def test_stage2_train_step_reports_overflow_frac():
    from dcl_net_tpu.models.refiner import Refiner
    from dcl_net_tpu.train.solver import TrainState
    from dcl_net_tpu.train.stage2 import make_stage2_train_step

    rng = np.random.RandomState(3)
    model = _model(TINY_CAPS)
    over = _batch(rng, 2, scattered=True)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(3), over, train=False)

    refiner = Refiner(n_inp=N)
    init_inp = {
        "input_features": jnp.zeros((2, N, 259)),
        "conf": jnp.zeros((2, 2 * N)),
    }
    rvars = jax.jit(refiner.init)(jax.random.PRNGKey(4), init_inp)
    tx = optax.adam(1e-4)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=rvars["params"],
                       batch_stats={}, opt_state=tx.init(rvars["params"]))
    model_points = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32) * 0.05)
    step = jax.jit(make_stage2_train_step(model, variables, refiner, tx,
                                          iterations=2,
                                          model_points=model_points))
    _, metrics = step(state, over)
    assert float(metrics["overflow_frac"]) == 1.0


def test_pallas_alignment_band_overflow():
    """The Pallas compaction stores each non-empty 512-cell chunk at an
    8-ALIGNED offset, so it can drop voxels with raw occupancy <= capacity
    (up to 7 wasted slots per non-empty chunk). The overflow flag must use
    the kernel's effective-consumption predicate on that path — the plain
    occupancy test silently misses the whole alignment-waste band."""
    from dcl_net_tpu.ops.pallas_compact import (
        capacity_overflow,
        pallas_dense_to_sparse,
    )
    from dcl_net_tpu.ops.sparse_conv import dense_to_sparse

    cap = 16
    mask = np.zeros((2, 16, 16, 16), np.float32)
    flat0 = mask[0].reshape(-1)
    # sample 0: one voxel in each of 3 distinct chunks -> 3*8 = 24 aligned
    # slots > cap although occ = 3 <= cap: the third voxel is dropped
    flat0[0] = flat0[2 * 512] = flat0[5 * 512] = 1.0
    # sample 1: 3 voxels in ONE chunk -> 8 aligned slots, well in budget
    flat1 = mask[1].reshape(-1)
    flat1[7] = flat1[8] = flat1[9] = 1.0
    feats = np.random.RandomState(0).rand(2, 16, 16, 16, 4).astype(np.float32)

    ovf = np.asarray(capacity_overflow(jnp.asarray(mask), cap))
    assert ovf.tolist() == [True, False]

    # the kernel REALLY drops a voxel for sample 0 (2 of 3 survive)...
    _, _, vmask = pallas_dense_to_sparse(
        jnp.asarray(feats), jnp.asarray(mask), cap)
    vm = np.asarray(vmask)
    assert float(vm[0].sum()) == 2.0
    assert float(vm[1].sum()) == 3.0
    # ...while the XLA top_k path keeps all 3, so ITS flag correctly stays
    # the plain occupancy test
    _, _, vmask_x = dense_to_sparse(jnp.asarray(feats), jnp.asarray(mask), cap)
    assert float(np.asarray(vmask_x)[0].sum()) == 3.0


def test_point_feats_overflow_flag_matches_interp_path():
    """Flag routing: the same alignment-band pyramid flags overflow under
    interp_mode='pallas' (voxels actually dropped) and stays clear under
    'exact' (top_k extraction keeps all occ <= cap voxels)."""
    from dcl_net_tpu.models.backbone import MultiScalePointFeatures

    rng = np.random.RandomState(7)
    mask = np.zeros((1, 16, 16, 16), np.float32)
    flat = mask[0].reshape(-1)
    flat[0] = flat[2 * 512] = flat[5 * 512] = 1.0
    gfeats = rng.rand(1, 16, 16, 16, 8).astype(np.float32)
    pyramid = [(jnp.asarray(gfeats), jnp.asarray(mask))]
    points = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32) * 0.3 - 0.15)

    flags = {}
    for mode in ("exact", "pallas"):
        mod = MultiScalePointFeatures(
            unit_voxel_extent=UNIT, voxel_num_limit=GRID,
            scale_list=(1,), capacities=(16,), interp_mode=mode)
        _, ovf = mod.apply({}, points, pyramid)
        flags[mode] = bool(np.asarray(ovf)[0])
    assert flags == {"exact": False, "pallas": True}


def test_serving_artifact_carries_overflow():
    from dcl_net_tpu.serving import export_serve, load_serve

    rng = np.random.RandomState(5)
    model = _model(TINY_CAPS)
    b = 2
    feats, vi = _clouds(rng, b, scattered=True)
    bank_feats, bank_vi = _clouds(rng, 1, scattered=False)
    bank = {"feats": bank_feats, "voxel_idx": bank_vi}
    init_batch = {
        "inp": {"feats": jnp.asarray(feats), "voxel_idx": jnp.asarray(vi)},
        "tmp": {"feats": jnp.asarray(bank_feats[[0] * b]),
                "voxel_idx": jnp.asarray(bank_vi[[0] * b])},
    }
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(5), init_batch, train=False)
    data = export_serve(model, variables, bank, batch_size=b,
                        platforms=["cpu"])
    got = load_serve(data)(jnp.asarray(feats), jnp.asarray(vi),
                           jnp.zeros((b,), jnp.int32))
    assert bool(np.all(np.asarray(got["overflow"])))
