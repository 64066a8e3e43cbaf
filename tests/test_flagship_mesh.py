"""Flagship-shape step on the 8-device CPU mesh (VERDICT r4 item 6).

dryrun_multichip validates the four product paths at 16^3/batch-16 toy
shapes; shard-boundary bugs that only appear at the production 64^3 /
production-capacity / B>=64 shapes (capacity/padding interactions per shard,
per-device occupancy extraction at the real capacities (2048,1024,512,64))
are invisible there. This runs ONE Solver train step and ONE mesh-Evaluator
batch at the flagship shape — slow tier (CPU does the full 64^3 conv pyramid
at B=64).
"""

import jax
import jax.numpy as jnp
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
from dcl_net_tpu.train.solver import (
    build_optimizer,
    init_train_state,
    make_train_step,
)

GRID = (64, 64, 64)
UNIT = (0.006, 0.006, 0.006)
N = 1024
B = 64  # 8 rows per shard on the 8-device mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_flagship_shape_mesh_train_and_eval():
    from dcl_net_tpu.eval.evaluator import Evaluator

    ds = SyntheticPoseDataset(
        n_objects=4, n_points=N, unit_voxel_extent=UNIT,
        voxel_num_limit=GRID, seed=0,
    )
    batch = make_batch([ds[i] for i in range(B)]).to_dict()
    # PRODUCTION capacities — the DCLNet defaults the real-chip configs run
    # with (models/dcl_net.py); do not shrink them here, per-shard occupancy
    # extraction at these exact budgets is the thing under test
    model = DCLNet(
        unit_voxel_extent=UNIT, voxel_num_limit=GRID, n_inp=N, n_tmp=N,
    )
    assert model.capacities == (2048, 1024, 512, 64)
    cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3,
                                "betas": [0.5, 0.999], "eps": 1e-6}})
    tx, _ = build_optimizer(cfg)
    mesh = make_mesh(8)

    # ---- one flagship train step over the mesh ----
    state = replicate(init_train_state(model, tx, batch), mesh)
    pstep = make_parallel_train_step(
        make_train_step(model, tx, dcl_losses), mesh)
    new_state, metrics = pstep(state, shard_batch(batch, mesh))
    loss = float(metrics["loss_all"])
    assert np.isfinite(loss), f"flagship mesh train step loss={loss}"
    # synthetic 1024-pt clouds occupy far fewer than 2048 voxels: any
    # overflow here means a per-shard capacity/padding misfire
    assert float(metrics["overflow_frac"]) == 0.0
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    # ---- mesh eval at flagship shape, rows checked against single-device
    # (eval mode uses stored BN stats, so per-row results are batch-shape
    # independent up to reduction-order float noise — the bs-invariance
    # guarantee the eval CLI test pins at 16^3) ----
    variables = {"params": jax.tree.map(lambda x: np.asarray(x),
                                        new_state.params),
                 "batch_stats": jax.tree.map(lambda x: np.asarray(x),
                                             new_state.batch_stats)}
    model_points = np.stack([ds.model_points(c, 256) for c in range(4)])

    ev8 = Evaluator(model, variables, model_points, protocol="adds_auc",
                    mesh=mesh)
    res8 = ev8._run(ev8.variables, ev8._shard(
        jax.tree.map(jnp.asarray, batch)))
    adds8 = np.asarray(res8["adds"])
    assert adds8.shape == (B,)
    assert np.isfinite(adds8).all()
    assert int(np.asarray(res8["overflow"]).sum()) == 0

    small = make_batch([ds[i] for i in range(8)]).to_dict()
    ev1 = Evaluator(model, variables, model_points, protocol="adds_auc")
    res1 = ev1._run(ev1.variables, jax.tree.map(jnp.asarray, small))
    np.testing.assert_allclose(
        adds8[:8], np.asarray(res1["adds"]), rtol=1e-3, atol=1e-6)
