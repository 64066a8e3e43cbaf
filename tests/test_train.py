"""Solver-layer tests: AutoClip, LR schedules, checkpoint roundtrip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from dcl_net_tpu.config import Config
from dcl_net_tpu.train.solver import (
    autoclip,
    build_lr_schedule,
    build_optimizer,
    cyclic_lr,
    step_lr,
)


def test_autoclip_matches_reference_semantics(rng):
    """Reference AutoClip (tools/train_YCBV_stage1.py:212-231): clip the
    current grad to the percentile of ALL norms seen (incl. current)."""
    clip = autoclip(percentile=50.0, history_len=64)
    params = {"w": jnp.zeros(3)}
    state = clip.init(params)

    norms_seen = []
    for i in range(20):
        g = rng.randn(3).astype(np.float32) * (i + 1)  # growing norms
        updates = {"w": jnp.asarray(g)}
        norm = float(np.linalg.norm(g))
        norms_seen.append(norm)
        clipped, state = clip.update(updates, state)
        clip_value = np.percentile(norms_seen, 50.0)
        expect = g * min(1.0, clip_value / norm)
        np.testing.assert_allclose(np.asarray(clipped["w"]), expect, rtol=1e-5)


def test_cyclic_lr_matches_torch():
    """torch CyclicLR triangular: rises to max at step_size_up, falls back."""
    sched = cyclic_lr(1e-6, 1e-3, 100, 100)
    assert abs(float(sched(0)) - 1e-6) < 1e-9
    assert abs(float(sched(100)) - 1e-3) < 1e-9
    assert abs(float(sched(200)) - 1e-6) < 1e-9
    assert abs(float(sched(50)) - (1e-6 + (1e-3 - 1e-6) * 0.5)) < 1e-9
    # periodic
    assert abs(float(sched(250)) - float(sched(50))) < 1e-12


def test_step_lr():
    sched = step_lr(1e-3, 10, 0.5)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(9)) - 1e-3) < 1e-9
    assert abs(float(sched(10)) - 5e-4) < 1e-9
    assert abs(float(sched(25)) - 2.5e-4) < 1e-9


def test_build_lr_schedule_from_config():
    cfg_cyc = Config({"optimizer": {"lr": 1e-3},
                      "lr_scheduler_cyc": {"base_lr": 1e-6, "max_lr": 1e-3,
                                           "step_size_up": 63105}})
    s = build_lr_schedule(cfg_cyc, steps_per_epoch=100)
    assert abs(float(s(63105)) - 1e-3) < 1e-9

    cfg_step = Config({"optimizer": {"lr": 1e-3},
                       "lr_scheduler": {"type": "StepLR", "step_size": 60,
                                        "gamma": 0.5}})
    s2 = build_lr_schedule(cfg_step, steps_per_epoch=10)
    assert abs(float(s2(600)) - 5e-4) < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    from dcl_net_tpu.train.checkpoints import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    from dcl_net_tpu.train.solver import TrainState

    state = TrainState(
        step=jnp.asarray(42),
        params={"layer": {"w": jnp.arange(6.0).reshape(2, 3)}},
        batch_stats={"bn": {"mean": jnp.ones(3)}},
        opt_state={"momentum": jnp.zeros(3)},
    )
    path = save_checkpoint(str(tmp_path), state, epoch=7)
    assert latest_checkpoint(str(tmp_path)) == path
    loaded = load_checkpoint(path)
    assert loaded["epoch"] == 7
    assert loaded["step"] == 42
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["layer"]["w"]),
        np.arange(6.0).reshape(2, 3),
    )
    save_checkpoint(str(tmp_path), state, epoch=12)
    assert latest_checkpoint(str(tmp_path)).endswith("epoch_12")


def test_restore_pre_meta_checkpoint_with_target(tmp_path):
    """Checkpoints written BEFORE the mid-epoch-resume schema (no 'meta'
    subtree) must still restore against the current full target — the
    missing keys are filled from the target's defaults instead of failing
    orbax's tree-structure match."""
    import orbax.checkpoint as ocp

    from dcl_net_tpu.train.checkpoints import load_checkpoint

    old_payload = {  # what the pre-upgrade save_checkpoint wrote
        "params": {"layer": {"w": np.arange(6.0).reshape(2, 3)}},
        "batch_stats": {"bn": {"mean": np.ones(3)}},
        "opt_state": {"momentum": np.zeros(3)},
        "step": 42,
        "epoch": 7,
    }
    path = str(tmp_path / "epoch_7")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, old_payload, force=True)

    target = {
        "params": {"layer": {"w": np.zeros((2, 3))}},
        "batch_stats": {"bn": {"mean": np.zeros(3)}},
        "opt_state": {"momentum": np.zeros(3)},
        "step": 0,
        "epoch": 0,
        "meta": {"consumed_batches": 0},
    }
    loaded = load_checkpoint(path, target=target)
    assert loaded["epoch"] == 7
    assert loaded["meta"]["consumed_batches"] == 0  # default injected
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["layer"]["w"]),
        np.arange(6.0).reshape(2, 3),
    )


def test_nonfinite_gradient_guard(rng):
    """A NaN-producing batch must leave params/opt-state untouched and set
    the skipped_nonfinite metric."""
    from dcl_net_tpu.train.solver import TrainState, make_train_step

    tx = optax.adam(1e-3)

    class TinyModel:
        def apply(self, variables, batch, train, mutable):
            p = variables["params"]["w"]
            pred = {"out": p * batch["x"]}
            return pred, {"batch_stats": variables["batch_stats"]}

    def loss_fn(pred, batch):
        return {"loss_all": jnp.sum(pred["out"])}

    params = {"w": jnp.ones(3)}
    state = TrainState(step=jnp.asarray(0), params=params, batch_stats={},
                       opt_state=tx.init(params))
    step = make_train_step(TinyModel(), tx, loss_fn)

    good = {"x": jnp.ones(3)}
    state1, m1 = step(state, good)
    assert float(m1["skipped_nonfinite"]) == 0.0
    assert not np.allclose(np.asarray(state1.params["w"]), 1.0)

    bad = {"x": jnp.asarray([1.0, np.nan, 1.0])}
    state2, m2 = step(state1, bad)
    assert float(m2["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(state2.params["w"]), np.asarray(state1.params["w"])
    )
    assert int(state2.step) == int(state1.step) + 1

    # training continues cleanly after the skipped step
    state3, m3 = step(state2, good)
    assert float(m3["skipped_nonfinite"]) == 0.0


def test_solver_eval_hook(tmp_path):
    """eval_fn runs every per_val epochs and its scalars reach the writer."""
    from dcl_net_tpu.config import Config as Cfg
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet, dcl_losses
    from dcl_net_tpu.train.solver import Solver

    ds = SyntheticPoseDataset(
        n_objects=2, n_points=64, unit_voxel_extent=(0.024,) * 3,
        voxel_num_limit=(16,) * 3, length=8,
    )
    loader = BatchLoader(ds, batch_size=4, num_workers=2)
    model = DCLNet(unit_voxel_extent=(0.024,) * 3, voxel_num_limit=(16,) * 3,
                   n_inp=64, n_tmp=64, capacities=(256, 64, 16, 8))
    calls = []

    def eval_fn(state, epoch):
        calls.append(epoch)
        return {"dummy_metric": float(epoch)}

    cfg = Cfg({"optimizer": {"type": "Adam", "lr": 1e-3}, "max_epoch": 2,
               "per_val": 1, "per_write": 1000, "per_save": 1000})
    solver = Solver(model, dcl_losses, cfg, loader, eval_fn=eval_fn)
    solver.initialize(next(iter(loader)))
    solver.solve()
    assert calls == [1, 2]


@pytest.mark.slow
def test_mid_epoch_resume_reproduces_uninterrupted_run(tmp_path):
    """Kill training mid-epoch, resume from the mid-epoch checkpoint, and the
    concatenated metric stream must equal the uninterrupted run's — i.e. the
    resume restores the exact position in the (seeded) epoch data order, not
    just the epoch boundary."""
    from dcl_net_tpu.config import Config as Cfg
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet, dcl_losses
    from dcl_net_tpu.train.checkpoints import latest_checkpoint
    from dcl_net_tpu.train.solver import Solver

    kw = dict(n_objects=2, n_points=64, unit_voxel_extent=(0.024,) * 3,
              voxel_num_limit=(16,) * 3, length=16)

    class InterruptingLoader(BatchLoader):
        """Simulated preemption: die before yielding batch `interrupt_after`."""

        interrupt_after = None

        def __iter__(self):
            count = 0
            for b in super().__iter__():
                if self.interrupt_after is not None and count >= self.interrupt_after:
                    raise KeyboardInterrupt
                yield b
                count += 1

    def build(ckpt_dir, interrupt_after=None):
        ds = SyntheticPoseDataset(**kw)
        loader = InterruptingLoader(ds, batch_size=4, num_workers=2, seed=0)
        loader.interrupt_after = interrupt_after
        model = DCLNet(unit_voxel_extent=(0.024,) * 3, voxel_num_limit=(16,) * 3,
                       n_inp=64, n_tmp=64, capacities=(256, 64, 16, 8))
        cfg = Cfg({"optimizer": {"type": "Adam", "lr": 1e-3}, "max_epoch": 2,
                   "per_write": 1000, "per_save": 1000, "per_save_steps": 2})
        solver = Solver(model, dcl_losses, cfg, loader,
                        checkpoint_dir=str(ckpt_dir) if ckpt_dir else None)
        init_batch = make_batch([ds[i] for i in range(4)]).to_dict()
        solver.initialize(init_batch, seed=0)
        losses = []
        orig = solver.train_step

        def wrapped(state, batch):
            state, m = orig(state, batch)
            losses.append(float(m["loss_all"]))
            return state, m

        solver.train_step = wrapped
        return solver, losses

    # A: uninterrupted, 2 epochs x 4 steps
    solver_a, losses_a = build(None)
    solver_a.solve()
    assert len(losses_a) == 8

    # B: killed after 3 steps of epoch 0 (mid-epoch ckpt at step idx 2,
    # consumed=3)
    import pytest as _pytest

    solver_b, losses_b = build(tmp_path, interrupt_after=3)
    with _pytest.raises(KeyboardInterrupt):
        solver_b.solve()
    assert len(losses_b) == 3
    ckpt = latest_checkpoint(str(tmp_path))
    assert ckpt is not None

    # C: fresh process, restore, run to completion
    solver_c, losses_c = build(None)
    solver_c.restore(ckpt)
    assert solver_c.epoch == 0 and solver_c.loader.skip_next == 3
    solver_c.solve()
    assert len(losses_c) == 5  # step 3 of epoch 0 + all 4 of epoch 1

    np.testing.assert_allclose(losses_b + losses_c, losses_a, rtol=1e-6)


def test_banked_template_training_matches_plain_on_distinct_classes():
    """With all batch classes distinct and the bank rows equal to the batch
    templates, the banked-template step (encode once per class, gather) must
    produce identical losses and gradients to the plain step."""
    import jax
    import jax.numpy as jnp

    from dcl_net_tpu.config import Config as Cfg
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet, dcl_losses
    from dcl_net_tpu.train.solver import (
        build_optimizer, init_train_state, make_train_step,
    )

    grid, unit, n = (16, 16, 16), (0.024, 0.024, 0.024), 64
    ds = SyntheticPoseDataset(
        n_objects=4, n_points=n, unit_voxel_extent=unit, voxel_num_limit=grid,
        length=64, seed=0,
    )
    # one sample per class, ordered by class
    picked, seen = [], set()
    for i in range(64):
        s = ds[i]
        c = int(s["obj_idx"])
        if c not in seen:
            seen.add(c)
            picked.append(s)
        if len(seen) == 4:
            break
    picked.sort(key=lambda s: int(s["obj_idx"]))
    batch = jax.tree.map(jnp.asarray, make_batch(picked).to_dict())
    bank = {
        "feats": batch["tmp"]["feats"],        # rows already in class order
        "voxel_idx": batch["tmp"]["voxel_idx"],
    }

    model = DCLNet(unit_voxel_extent=unit, voxel_num_limit=grid, n_inp=n,
                   n_tmp=n, capacities=(256, 64, 16, 8))
    cfg = Cfg({"optimizer": {"type": "Adam", "lr": 1e-3}})
    tx, _ = build_optimizer(cfg)
    state = init_train_state(model, tx, batch)

    # compare losses and RAW gradients (post-Adam params are sign-sensitive
    # for near-zero gradients, amplifying reduction-order noise)
    def loss_of(params, use_bank):
        variables = {"params": params, "batch_stats": state.batch_stats}
        if use_bank:
            pred, mut = model.apply(
                variables, batch, jax.tree.map(jnp.asarray, bank), train=True,
                mutable=["batch_stats"],
                method=model.forward_with_template_bank,
            )
        else:
            pred, mut = model.apply(variables, batch, train=True,
                                    mutable=["batch_stats"])
        return dcl_losses(pred, batch)["loss_all"], mut["batch_stats"]

    (l1, bs1), g1 = jax.jit(jax.value_and_grad(
        lambda p: loss_of(p, False), has_aux=True))(state.params)
    (l2, bs2), g2 = jax.jit(jax.value_and_grad(
        lambda p: loss_of(p, True), has_aux=True))(state.params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)
    for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_stage2_train_step_under_bf16_main_model():
    """The stage-2 refiner train step must compose poses in f32 even when
    the frozen stage-1 model runs the bf16 production config: the scan
    carries the composed pose, and a bf16 trans_pred carried against the
    HIGHEST-precision f32 compose fails scan's type check (regression for
    the bug the synthetic-convergence run surfaced; same class as the
    refine_pose fix in models/refiner.py)."""
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet, Refiner
    from dcl_net_tpu.train.solver import init_train_state
    from dcl_net_tpu.train.stage2 import make_stage2_train_step

    kw = dict(unit_voxel_extent=(0.024,) * 3, voxel_num_limit=(16,) * 3)
    ds = SyntheticPoseDataset(n_objects=2, n_points=64, **kw, length=4)
    batch = jax.tree.map(jnp.asarray, make_batch([ds[i] for i in range(4)]).to_dict())
    model = DCLNet(n_inp=64, n_tmp=64, capacities=(256, 64, 16, 8),
                   dtype=jnp.bfloat16, **kw)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    cld = jnp.asarray(np.stack([ds.model_points(c, 32) for c in range(2)]))

    refiner = Refiner(n_inp=64)
    cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3}})
    tx, _ = build_optimizer(cfg)
    step = jax.jit(
        make_stage2_train_step(model, variables, refiner, tx, 2, cld),
        donate_argnums=(0,),
    )
    dummy = {"input_features": jnp.zeros((4, 64, 259)),
             "conf": jnp.zeros((4, 128))}
    state = init_train_state(refiner, tx, dummy)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss_all"]))
