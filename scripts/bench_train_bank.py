"""Measure banked-template training: encode each CLASS's CAD branch once per
step instead of once per instance (cfg.train_template_bank, opt-in).

Usage: python scripts/bench_train_bank.py  [BANK_BATCH=128]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.models import DCLNet, dcl_losses
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.train.solver import build_optimizer, init_train_state, make_train_step

    b = int(os.environ.get("BANK_BATCH", 128))
    n_classes, n = 8, 1024
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)
    ds = SyntheticPoseDataset(n_objects=n_classes, n_points=n,
                              unit_voxel_extent=unit, voxel_num_limit=grid,
                              seed=0)
    samples = [ds[i] for i in range(b)]
    batch = jax.tree.map(jnp.asarray, make_batch(samples).to_dict())
    obj = np.asarray(batch["labels"]["obj_idx"])
    bank = {
        k: jnp.stack([batch["tmp"][k][int(np.argmax(obj == c))]
                      for c in range(n_classes)])
        for k in ("feats", "voxel_idx")
    }

    model = DCLNet(unit_voxel_extent=unit, voxel_num_limit=grid,
                   n_inp=n, n_tmp=n, interp_mode="pallas", dtype=jnp.bfloat16)
    cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3,
                                "betas": [0.5, 0.999], "eps": 1e-6}})
    tx, _ = build_optimizer(cfg)

    for label, bank_arg in [("per-instance", None), ("banked", bank)]:
        state = init_train_state(model, tx, batch)
        step = jax.jit(make_train_step(model, tx, dcl_losses,
                                       template_bank=bank_arg),
                       donate_argnums=(0,))
        state, m = step(state, batch)
        _ = float(m["loss_all"])
        iters = 6
        best = None
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, batch)
                _ = float(m["loss_all"])
            cur = (time.perf_counter() - t0) / iters
            best = cur if best is None else min(best, cur)
        print(f"{label}: B={b} step {best * 1000:.1f} ms "
              f"({b / best:.1f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
