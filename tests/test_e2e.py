"""Full-loop integration: Solver training + template-cached Evaluator.

CI-scale training (tens of steps on CPU) cannot beat the trivial
identity-pose baseline on ADD-S — that needs thousands of steps — so this
test asserts what the loop CAN show at this scale: the Solver drives the
loss down monotonically-ish across epochs, the trained state flows into the
Evaluator with the per-class template cache engaged, and the scored metric
is finite and within the geometric sanity range of the synthetic scenes.
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from dcl_net_tpu.config import Config
from dcl_net_tpu.data.loader import BatchLoader
from dcl_net_tpu.data.schema import make_batch
from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
from dcl_net_tpu.eval.evaluator import Evaluator
from dcl_net_tpu.models import DCLNet, dcl_losses
from dcl_net_tpu.train.solver import Solver

GRID = (16, 16, 16)
UNIT = (0.024, 0.024, 0.024)
N = 64
N_OBJ = 3


@pytest.mark.slow
def test_solver_to_evaluator_full_loop():
    cfg = Config({
        "optimizer": {"type": "Adam", "lr": 1e-3, "betas": [0.5, 0.999], "eps": 1e-6},
        "max_epoch": 8, "per_write": 1000, "per_save": 1000,
    })
    ds = SyntheticPoseDataset(
        n_objects=N_OBJ, n_points=N, unit_voxel_extent=UNIT,
        voxel_num_limit=GRID, length=16, seed=0, noise=0.001,
    )
    loader = BatchLoader(ds, batch_size=8, num_workers=2, seed=0)
    model = DCLNet(
        unit_voxel_extent=UNIT, voxel_num_limit=GRID, n_inp=N, n_tmp=N,
        capacities=(256, 64, 16, 8),
    )
    solver = Solver(model, dcl_losses, cfg, loader)
    solver.initialize(next(iter(loader)), seed=0)

    epoch_losses = []
    for _ in range(int(cfg.max_epoch)):
        info = solver.train_epoch()
        solver.epoch += 1
        epoch_losses.append(info["loss_all"])
    # the Solver loop must actually learn
    assert np.isfinite(epoch_losses).all()
    assert epoch_losses[-1] < 0.5 * epoch_losses[0], epoch_losses

    # trained state -> Evaluator with the per-class template cache
    bank = {"feats": [], "voxel_idx": []}
    for c in range(N_OBJ):
        s = next(ds[i] for i in range(32) if int(ds[i]["obj_idx"]) == c)
        bank["feats"].append(s["tmp_feats"])
        bank["voxel_idx"].append(s["tmp_voxel_idx"])
    bank = {k: np.stack(v) for k, v in bank.items()}
    model_points = np.stack([ds.model_points(c, 128) for c in range(N_OBJ)])
    ev = Evaluator(
        model,
        {"params": solver.state.params, "batch_stats": solver.state.batch_stats},
        model_points, protocol="adds_auc", template_bank=bank,
    )
    batch = make_batch([ds[i] for i in range(12)]).to_dict()
    res = ev._run(ev.variables, jax.tree.map(jnp.asarray, batch))
    adds = np.asarray(res["adds"])
    assert np.isfinite(adds).all()
    # scenes fit in a 0.384m volume; any sane pose lies well inside it
    assert float(adds.mean()) < 0.3
    # full aggregation path
    out = ev.evaluate(iter([jax.tree.map(jnp.asarray, batch)]))
    assert 0.0 <= out["auc_mean"] <= 100.0
