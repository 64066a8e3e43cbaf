"""Probe the single-chip training-throughput peak beyond banked B=256.

Banked B=256 WITHOUT remat is the measured peak (397 samples/s, bench.py
train_peak); B=384/512 banked OOM at compile without remat. This script
A/Bs the remat'd banked step at B=384/512 against the B=256 no-remat
baseline in one process — if the batch amortization outruns the ~15-20%
backbone recompute cost, the peak config moves.

Usage: python scripts/bench_train_peak.py  [PEAK_BATCHES="256:0,384:1,512:1"]
(each entry is batch:remat)
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
    from dcl_net_tpu.train.solver import (
        build_optimizer, init_train_state, make_train_step)

    plan = [
        tuple(int(x) for x in item.split(":"))
        for item in os.environ.get(
            "PEAK_BATCHES", "256:0,384:1,512:1").split(",")
    ]
    max_b = max(b for b, _ in plan)
    n_classes, n = 8, 1024
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)
    ds = SyntheticPoseDataset(n_objects=n_classes, n_points=n,
                              unit_voxel_extent=unit, voxel_num_limit=grid,
                              seed=0)
    # small unique pool tiled out (bench.py pattern): static shapes make
    # repetition invisible to the timing, and full renders cost ~1s each
    pool = [ds[i] for i in range(64)]
    i = len(pool)
    while len({int(s["obj_idx"]) for s in pool}) < n_classes:
        pool.append(ds[i])
        i += 1
    samples = [pool[i % len(pool)] for i in range(max_b)]

    cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3,
                                "betas": [0.5, 0.999], "eps": 1e-6}})
    tx, _ = build_optimizer(cfg)

    for b, remat in plan:
        model = DCLNet(unit_voxel_extent=unit, voxel_num_limit=grid,
                       n_inp=n, n_tmp=n, interp_mode="pallas",
                       dtype=jnp.bfloat16, remat=bool(remat))
        batch = jax.tree.map(jnp.asarray, make_batch(samples[:b]).to_dict())
        obj = np.asarray(batch["labels"]["obj_idx"])
        # np.argmax(obj == c) silently returns 0 for an absent class — make
        # sure the truncated batch really covers every class (a PEAK_BATCHES
        # override can set b below the class-covering pool size)
        missing = [c for c in range(n_classes) if not (obj == c).any()]
        assert not missing, (
            f"batch of {b} misses classes {missing}; raise the batch size or "
            "build the bank from the class-complete pool")
        bank = {
            k: jnp.stack([batch["tmp"][k][int(np.argmax(obj == c))]
                          for c in range(n_classes)])
            for k in ("feats", "voxel_idx")
        }
        try:
            state = init_train_state(model, tx, batch)
            step = jax.jit(make_train_step(model, tx, dcl_losses,
                                           template_bank=bank),
                           donate_argnums=(0,))
            step_c = step.lower(state, batch).compile()
            state, m = step_c(state, batch)
            _ = float(m["loss_all"])
        except Exception as e:  # OOM at compile or first run
            print(f"B={b} remat={remat}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        iters = 5
        best = None
        for _rep in range(2):
            # 1-deep metric pipelining (the Solver's production loop)
            t0 = time.perf_counter()
            prev = None
            for _ in range(iters):
                state, m = step_c(state, batch)
                if prev is not None:
                    _ = float(prev["loss_all"])
                prev = m
            _ = float(prev["loss_all"])
            cur = (time.perf_counter() - t0) / iters
            best = cur if best is None else min(best, cur)
        print(f"B={b} remat={remat} banked: step {best * 1000:.1f} ms "
              f"({b / best:.1f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
