"""Train-row variance + regression diagnosis (VERDICT r4 item 4).

BENCH_r03 -> r04 moved banked B=32 223.4 -> 240.8 ms and unbanked B=128
480.5 -> 544.7 ms while unbanked B=32 stayed bit-stable (298.0 -> 297.7) —
a ~0.5 ms/sample pattern, not run-to-run noise. This script measures, in ONE
process on the real chip:

  1. every bench.py train row with R independent repetitions of the same
     5-step pipelined loop bench.py times -> min/median/max spread (the
     measured variance band docs/PERF.md should state);
  2. an overflow-predicate A/B: the round-4 change routed the EXACT
     Pallas effective-consumption predicate into the forward
     (models/backbone.py via ops/pallas_compact.capacity_overflow);
     BENCH_OVERFLOW_AB=1 re-times each row with the model's
     overflow_flag_impl="occupancy" (the cheap r03-era plain-occupancy test)
     if that knob exists, else skips.

Usage: python scripts/bench_train_variance.py [--reps 5] [--iters 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rows", default="32,32b,128,128b")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.jax_cache")))
    import jax.numpy as jnp

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet, dcl_losses
    from dcl_net_tpu.train.solver import (
        build_optimizer, init_train_state, make_train_step)

    grid, unit, n = (64, 64, 64), (0.006, 0.006, 0.006), 1024
    n_classes = 8
    ds = SyntheticPoseDataset(n_objects=n_classes, n_points=n,
                              unit_voxel_extent=unit, voxel_num_limit=grid,
                              seed=0)
    pool = [ds[i] for i in range(64)]
    i = 64
    while len({int(s["obj_idx"]) for s in pool}) < n_classes:
        pool.append(ds[i]); i += 1
    by_class = {}
    for s in pool:
        by_class.setdefault(int(s["obj_idx"]), s)
    bank = {
        k: jnp.stack([jnp.asarray(by_class[c][f"tmp_{k}"])
                      for c in range(n_classes)])
        for k in ("feats", "voxel_idx")
    }

    model = DCLNet(unit_voxel_extent=unit, voxel_num_limit=grid,
                   n_inp=n, n_tmp=n, interp_mode="pallas",
                   voxelize_impl="matmul", dtype=jnp.bfloat16)
    cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3,
                                "betas": [0.5, 0.999], "eps": 1e-6}})
    tx, _ = build_optimizer(cfg)

    def measure(bsz, banked, reps, iters):
        tb = jax.tree.map(
            jnp.asarray,
            make_batch([pool[j % len(pool)] for j in range(bsz)]).to_dict())
        state = init_train_state(model, tx, tb)
        step = jax.jit(make_train_step(model, tx, dcl_losses,
                                       template_bank=bank if banked else None),
                       donate_argnums=(0,))
        step_c = step.lower(state, tb).compile()
        state, m = step_c(state, tb)
        _ = float(m["loss_all"])
        times = []
        for _rep in range(reps):
            t0 = time.perf_counter()
            prev = None
            for _ in range(iters):
                state, m = step_c(state, tb)
                if prev is not None:
                    _ = float(prev["loss_all"])
                prev = m
            _ = float(prev["loss_all"])
            times.append((time.perf_counter() - t0) / iters * 1000)
        return times

    out = {}
    for row in args.rows.split(","):
        banked = row.endswith("b")
        bsz = int(row.rstrip("b"))
        ts = measure(bsz, banked, args.reps, args.iters)
        out[row] = {
            "batch": bsz, "banked": banked,
            "step_ms_min": round(min(ts), 1),
            "step_ms_med": round(float(np.median(ts)), 1),
            "step_ms_max": round(max(ts), 1),
            "samples_per_sec_at_min": round(bsz / (min(ts) / 1000), 1),
            "reps_ms": [round(t, 1) for t in ts],
        }
        print(f"row {row}: {out[row]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
