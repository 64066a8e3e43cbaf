"""Metric and evaluator tests against hand-computed oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcl_net_tpu.eval.metrics import (
    voc_ap,
    auc_and_acc,
    per_class_auc_acc,
    success_at_diameter,
    add_batch,
    add_s_batch,
)
from dcl_net_tpu.geometry.rotation import random_rotation


def test_voc_ap_perfect():
    # all distances 0 -> recall curve jumps to 1 at 0 -> AUC == 1.0 (x10 cap)
    d = np.zeros(100)
    auc, acc = auc_and_acc(d)
    assert abs(auc - 100.0) < 1e-6
    assert acc == 100.0


def test_voc_ap_all_lost():
    auc, acc = auc_and_acc([np.inf] * 10)
    assert auc == 0.0 and acc == 0.0


def test_auc_uniform_distances():
    """Uniform distances on [0, 0.1]: accuracy rises linearly -> AUC ~ 50."""
    d = np.linspace(1e-6, 0.0999, 2000)
    auc, acc = auc_and_acc(d)
    assert 48.0 < auc < 52.0
    assert abs(acc - 20.0) < 2.0  # 2cm/10cm of the mass


def test_auc_half_lost():
    d = np.concatenate([np.zeros(50), np.full(50, np.inf)])
    auc, _ = auc_and_acc(d)
    assert abs(auc - 50.0) < 1.0


def test_per_class_report():
    d = [0.0] * 10 + [np.inf] * 10
    c = [0] * 10 + [1] * 10
    out = per_class_auc_acc(d, c, num_classes=2)
    assert abs(out["auc_per_class"][0] - 100.0) < 1e-6
    assert out["auc_per_class"][1] == 0.0
    assert abs(out["auc_mean"] - 50.0) < 1e-6


def test_success_at_diameter():
    d = [0.005, 0.02, 0.005, 0.5]
    c = [0, 0, 1, 1]
    diam = [0.01, 0.01]  # already scaled by 0.1 as in reference
    out = success_at_diameter(d, c, diam)
    assert out["success_per_class"][0] == 0.5
    assert out["success_per_class"][1] == 0.5
    assert out["success_mean"] == 0.5
    # LMO-style lost counting
    out2 = success_at_diameter(d, c, diam, num_lost_per_class=[2, 0])
    assert out2["success_per_class"][0] == 0.25


def test_add_and_adds_batch(rng):
    pts = jnp.asarray((rng.rand(3, 200, 3).astype(np.float32) - 0.5) * 0.1)
    rot = random_rotation(jax.random.PRNGKey(0), (3,))
    trans = jnp.asarray(rng.randn(3, 3).astype(np.float32) * 0.01)
    # identical poses -> both metrics 0
    add = np.asarray(add_batch(pts, rot, trans, rot, trans))
    adds = np.asarray(add_s_batch(pts, rot, trans, rot, trans))
    np.testing.assert_allclose(add, 0, atol=1e-5)
    np.testing.assert_allclose(adds, 0, atol=1e-5)
    # pure translation offset d -> ADD == d, ADD-S <= d
    t2 = trans + jnp.asarray([0.02, 0.0, 0.0])
    add = np.asarray(add_batch(pts, rot, t2, rot, trans))
    adds = np.asarray(add_s_batch(pts, rot, t2, rot, trans))
    np.testing.assert_allclose(add, 0.02, atol=1e-5)
    assert (adds <= add + 1e-6).all()


def test_evaluator_end_to_end(rng):
    """Fake-model evaluator: perfect poses on valid rows, lost rows -> inf."""
    from dcl_net_tpu.eval.evaluator import Evaluator

    class FakeModel:
        def apply(self, variables, batch, train=False):
            return {
                "rot_pred": batch["labels"]["rot_gt"],
                "trans_pred": batch["labels"]["trans_gt"],
            }

    num_classes, P, B = 3, 64, 4
    model_points = (rng.rand(num_classes, P, 3).astype(np.float32) - 0.5) * 0.1
    ev = Evaluator(FakeModel(), {}, model_points, protocol="adds_auc")

    def loader():
        for _ in range(3):
            rot = np.asarray(random_rotation(jax.random.PRNGKey(1), (B,)))
            batch = {
                "labels": {
                    "rot_gt": jnp.asarray(rot.astype(np.float32)),
                    "trans_gt": jnp.zeros((B, 3)),
                    "obj_idx": jnp.asarray(np.arange(B) % num_classes, jnp.int32),
                },
                "sym_flag": jnp.zeros((B,)),
                "valid": jnp.asarray([1.0, 1.0, 1.0, 0.0]),
            }
            yield batch

    out = ev.evaluate(loader())
    # classes 0..2 appear as valid rows with perfect poses; class 0 also
    # collects the lost row (valid=0 -> inf)
    assert out["auc_per_class"][1] > 99.9
    assert out["auc_per_class"][2] > 99.9
    assert out["auc_per_class"][0] < 99.0  # dragged down by lost detections


def test_add_distance_gated_by_protocol(rng):
    """adds_auc scores every row ADD-S (reference tools/test_YCBV_stage1.py:
    192-199), so the jitted eval graph must not compute/fetch the plain ADD
    there; the add_0.1d protocol needs both for its sym selection rule."""
    from dcl_net_tpu.eval.evaluator import Evaluator

    class FakeModel:
        def apply(self, variables, batch, train=False):
            return {
                "rot_pred": batch["labels"]["rot_gt"],
                "trans_pred": batch["labels"]["trans_gt"],
            }

    num_classes, P, B = 2, 32, 4
    model_points = (rng.rand(num_classes, P, 3).astype(np.float32) - 0.5) * 0.1
    batch = {
        "labels": {
            "rot_gt": jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * B)),
            "trans_gt": jnp.zeros((B, 3)),
            "obj_idx": jnp.asarray(np.arange(B) % num_classes, jnp.int32),
        },
        "sym_flag": jnp.zeros((B,)),
        "valid": jnp.ones((B,)),
    }

    ev_aucs = Evaluator(FakeModel(), {}, model_points, protocol="adds_auc")
    res = ev_aucs._run(ev_aucs.variables, batch)
    assert "add" not in res and "adds" in res
    out = ev_aucs.evaluate(iter([batch]))
    assert out["auc_mean"] > 99.9

    ev_add = Evaluator(FakeModel(), {}, model_points, protocol="add_0.1d",
                       diameters=[0.1] * num_classes)
    res = ev_add._run(ev_add.variables, batch)
    assert "add" in res and "adds" in res
    out = ev_add.evaluate(iter([batch]))
    assert out["success_mean"] > 0.999  # 0-1 fraction (success rate)


def test_padding_rows_not_scored_as_lost(rng):
    """Synthetic fill rows (pad=1) exist only to make batches rectangular:
    they must be skipped by scoring entirely, while genuine invalid rows
    (valid=0, pad=0 — lost detections) still score inf under adds_auc."""
    from dcl_net_tpu.eval.evaluator import Evaluator

    class FakeModel:
        def apply(self, variables, batch, train=False):
            return {
                "rot_pred": batch["labels"]["rot_gt"],
                "trans_pred": batch["labels"]["trans_gt"],
            }

    P = 16
    model_points = (rng.rand(1, P, 3).astype(np.float32) - 0.5) * 0.1
    ev = Evaluator(FakeModel(), {}, model_points, protocol="adds_auc")
    rot = np.broadcast_to(np.eye(3, dtype=np.float32), (4, 3, 3))
    batch = {
        "labels": {
            "rot_gt": jnp.asarray(rot.copy()),
            "trans_gt": jnp.zeros((4, 3)),
            "obj_idx": jnp.zeros((4,), jnp.int32),
        },
        "sym_flag": jnp.zeros((4,)),
        "valid": jnp.asarray([1.0, 1.0, 0.0, 0.0]),
        "pad": jnp.asarray([0.0, 0.0, 0.0, 1.0]),  # row 2: lost; row 3: fill
    }
    out = ev.evaluate(iter([batch]))
    # 2 perfect + 1 inf scored; VOCap over [0,0,inf] ~= 66.7; a scored pad
    # row would drag it to 50
    assert 60.0 < out["auc_per_class"][0] < 70.0, out["auc_per_class"]

    # make_batch marks fill rows itself
    from dcl_net_tpu.data.schema import make_batch

    sample = {
        "inp_feats": np.zeros((8, 7), np.float32),
        "inp_voxel_idx": np.zeros((8, 3), np.int32),
        "tmp_feats": np.zeros((8, 7), np.float32),
        "tmp_voxel_idx": np.zeros((8, 3), np.int32),
        "rot_gt": np.eye(3, dtype=np.float32),
        "trans_gt": np.zeros(3, np.float32),
        "obj_idx": np.int32(0), "sym_flag": np.float32(0.0), "valid": 1.0,
    }
    lost = dict(sample, valid=0.0)
    b = make_batch([sample, lost], pad_to=4)
    np.testing.assert_array_equal(b.pad, [0.0, 0.0, 1.0, 1.0])
    np.testing.assert_array_equal(b.valid, [1.0, 0.0, 0.0, 0.0])
    # pad_to smaller than the sample count must raise, not truncate
    import pytest

    with pytest.raises(ValueError):
        make_batch([sample, lost, sample], pad_to=2)


@pytest.mark.slow
def test_production_config_both_stages(rng):
    """The TPU production configuration (bf16 compute + pallas interp +
    template cache) through BOTH evaluator stages and a train step, on CPU
    interpret mode at tiny shapes. Guards the dtype-interaction bug class:
    stage-2 refinement once crashed on TPU because the bf16 model's
    trans_pred hit refine_pose's f32 scan carry — a path no f32-only CPU
    test exercised."""
    import jax.numpy as jnp

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.eval.evaluator import Evaluator, Stage2Evaluator
    from dcl_net_tpu.models import DCLNet, Refiner, dcl_losses
    from dcl_net_tpu.train.solver import (
        build_optimizer, init_train_state, make_train_step,
    )
    from tests.test_model import _make_batch, GRID, UNIT, N

    nprng = np.random.RandomState(11)
    batch = _make_batch(nprng, b=2)
    model = DCLNet(
        unit_voxel_extent=UNIT, voxel_num_limit=GRID, n_inp=N, n_tmp=N,
        capacities=(256, 64, 16, 8), interp_mode="pallas",
        dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)

    num_classes, P = 1, 32
    model_points = (nprng.rand(num_classes, P, 3).astype(np.float32) - 0.5) * 0.1
    bank = {
        "feats": np.asarray(batch["tmp"]["feats"][:1]),
        "voxel_idx": np.asarray(batch["tmp"]["voxel_idx"][:1]),
    }

    ev = Evaluator(model, variables, model_points, template_bank=bank)
    out1 = ev.evaluate(iter([batch]))
    assert np.isfinite(out1["auc_mean"])

    refiner = Refiner(n_inp=N)
    s1 = model.apply(variables, batch, train=False)
    rvars = refiner.init(
        jax.random.PRNGKey(1),
        {"input_features": jnp.concatenate(
            [s1["points_inp"], s1["F_Xo_p"].astype(jnp.float32)], -1),
         "conf": s1["conf"]},
    )
    ev2 = Stage2Evaluator(
        model, variables, refiner, rvars, model_points,
        iterations=2, template_bank=bank,
    )
    out2 = ev2.evaluate(iter([batch]))
    assert np.isfinite(out2["auc_mean"])

    # bf16 + pallas train step runs and stays finite
    tx, _ = build_optimizer(Config({
        "optimizer": {"type": "Adam", "lr": 1e-3,
                      "betas": [0.5, 0.999], "eps": 1e-6}}))
    state = init_train_state(model, tx, batch)
    step = make_train_step(model, tx, dcl_losses)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_all"]))
    assert float(metrics.get("skipped_nonfinite", 0.0)) == 0.0


def test_update_variables_refreshes_template_cache():
    """update_variables must re-encode the per-class template cache from the
    NEW weights: results after update == a fresh Evaluator built with those
    weights (a stale cache would silently score with old template features)."""
    import jax
    import jax.numpy as jnp

    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.eval.evaluator import Evaluator
    from dcl_net_tpu.models import DCLNet

    kw = dict(unit_voxel_extent=(0.024,) * 3, voxel_num_limit=(16,) * 3)
    ds = SyntheticPoseDataset(n_objects=2, n_points=64, **kw, length=8)
    batch = jax.tree.map(jnp.asarray, make_batch([ds[i] for i in range(4)]).to_dict())
    model = DCLNet(n_inp=64, n_tmp=64, capacities=(256, 64, 16, 8), **kw)
    va = model.init(jax.random.PRNGKey(0), batch, train=False)
    vb = model.init(jax.random.PRNGKey(1), batch, train=False)

    bank = {}
    per_class = {}
    for i in range(len(ds)):
        s = ds[i]
        per_class.setdefault(int(s["obj_idx"]), s)
    bank = {k: np.stack([per_class[c][f"tmp_{k}"] for c in range(2)])
            for k in ("feats", "voxel_idx")}
    mp = np.stack([ds.model_points(c, 32) for c in range(2)])

    ev = Evaluator(model, va, mp, protocol="adds_auc", template_bank=bank)
    res_a = np.asarray(ev._run(ev.variables, batch)["adds"])
    ev.update_variables(vb)
    res_b = np.asarray(ev._run(ev.variables, batch)["adds"])

    fresh_b = Evaluator(model, vb, mp, protocol="adds_auc", template_bank=bank)
    res_fresh = np.asarray(fresh_b._run(fresh_b.variables, batch)["adds"])
    np.testing.assert_allclose(res_b, res_fresh, rtol=1e-5, atol=1e-6)
    assert not np.allclose(res_a, res_fresh)  # weights actually differ
