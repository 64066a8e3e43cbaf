"""Data-parallel training over the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from dcl_net_tpu.config import Config
from dcl_net_tpu.data.schema import make_batch
from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
from dcl_net_tpu.models import DCLNet, dcl_losses
from dcl_net_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from dcl_net_tpu.train.solver import build_optimizer, init_train_state, make_train_step

GRID = (16, 16, 16)
UNIT = (0.024, 0.024, 0.024)
N = 64


def _batch(b):
    ds = SyntheticPoseDataset(
        n_objects=4, n_points=N, unit_voxel_extent=UNIT, voxel_num_limit=GRID,
    )
    return make_batch([ds[i] for i in range(b)]).to_dict()


def _setup():
    model = DCLNet(
        unit_voxel_extent=UNIT, voxel_num_limit=GRID, n_inp=N, n_tmp=N,
        capacities=(256, 64, 16, 8),
    )
    cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3, "betas": [0.5, 0.999], "eps": 1e-6}})
    tx, _ = build_optimizer(cfg)
    return model, tx


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_eight_device_train_step_matches_single_device():
    model, tx = _setup()
    batch = _batch(8)
    state = init_train_state(model, tx, batch)
    step = jax.jit(make_train_step(model, tx, dcl_losses))
    _, metrics_1dev = step(state, batch)
    loss_1 = float(metrics_1dev["loss_all"])

    mesh = make_mesh(8)
    state8 = replicate(init_train_state(model, tx, batch), mesh)
    sharded = shard_batch(batch, mesh)
    pstep = make_parallel_train_step(make_train_step(model, tx, dcl_losses), mesh)
    new_state, metrics_8dev = pstep(state8, sharded)
    loss_8 = float(metrics_8dev["loss_all"])

    # Same math, different partitioning: losses must agree closely.
    np.testing.assert_allclose(loss_8, loss_1, rtol=2e-4)
    # params actually updated
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_solver_on_mesh_matches_single_device():
    """The PRODUCT path: Solver(mesh=...) (what tools/train_stage1.py
    --n_devices engages) must train to the same losses as the single-device
    Solver on identical data."""
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

    def run(mesh):
        ds = SyntheticPoseDataset(
            n_objects=4, n_points=N, unit_voxel_extent=UNIT,
            voxel_num_limit=GRID, length=16, seed=0,
        )
        loader = BatchLoader(ds, batch_size=8, num_workers=2, seed=0)
        model, _ = _setup()
        from dcl_net_tpu.train.solver import Solver

        cfg = Config({
            "optimizer": {"type": "Adam", "lr": 1e-3, "betas": [0.5, 0.999],
                          "eps": 1e-6},
            "max_epoch": 1,
        })
        solver = Solver(model, dcl_losses, cfg, loader, mesh=mesh)
        losses = []
        for batch in loader:
            if solver.state is None:
                solver.initialize(batch, seed=0)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            solver.state, metrics = solver.train_step(solver.state, batch)
            losses.append(float(metrics["loss_all"]))
        return losses

    single = run(None)
    parallel = run(make_mesh(8))
    assert len(single) == len(parallel) == 2
    # step 1 is fresh-init (tight); step 2 runs on once-updated params, where
    # shard-reduction float ordering has been amplified through Adam once.
    np.testing.assert_allclose(parallel, single, rtol=1e-3)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, (variables, batch) = ge.entry()
    out = jax.jit(fn)(variables, batch)
    assert out["rot_pred"].shape == (2, 3, 3)
    assert bool(jax.numpy.isfinite(out["rot_pred"]).all())


@pytest.mark.slow
def test_evaluator_on_mesh_matches_single_device():
    """Mesh-sharded eval must produce the same distances as single-device."""
    from dcl_net_tpu.eval.evaluator import Evaluator

    ds = SyntheticPoseDataset(
        n_objects=2, n_points=N, unit_voxel_extent=UNIT, voxel_num_limit=GRID,
    )
    batch = _batch(8)
    model, _ = _setup()
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    model_points = np.stack([ds.model_points(c, 64) for c in range(2)])

    ev1 = Evaluator(model, variables, model_points, protocol="adds_auc")
    res1 = ev1._run(ev1.variables, batch)

    mesh = make_mesh(8)
    ev8 = Evaluator(model, variables, model_points, protocol="adds_auc",
                    mesh=mesh)
    res8 = ev8._run(ev8.variables, ev8._shard(batch))
    np.testing.assert_allclose(
        np.asarray(res8["adds"]), np.asarray(res1["adds"]), rtol=1e-4, atol=1e-6
    )


@pytest.mark.slow
def test_bench_multichip_smoke():
    """The ready-to-run multi-chip bench harness (scripts/bench_multichip.py)
    executes end-to-end on a virtual CPU mesh and emits well-formed JSON —
    so it works unmodified on the day a real multi-chip slice is attached."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the harness sets its own device count
    out = subprocess.run(
        [sys.executable, "scripts/bench_multichip.py", "--preset", "smoke",
         "--platform", "cpu", "--n_devices", "4", "--iters", "2",
         "--no_scaling_ref"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["metric"] == "multichip_eval_instances_per_sec"
    assert res["value"] > 0
    assert res["extra"]["n_devices"] == 4
    assert res["extra"]["train_samples_per_sec"] > 0
