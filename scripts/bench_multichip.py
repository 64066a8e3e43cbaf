"""Multi-chip throughput bench: eval + train over a real device mesh.

The single-chip bench (bench.py) answers "how fast is one chip"; this
harness is the ready-to-run answer for "how fast is a slice" on the day
more than one real chip is attached: it builds a `data` mesh over ALL
visible devices (or --n_devices), runs the SAME production-config model
through the sharded Evaluator-style forward and the Solver's
make_parallel_train_step, and reports per-chip and aggregate throughput
plus weak-scaling efficiency against a 1-device mesh at the same
per-device batch.

Usage:
  python scripts/bench_multichip.py                  # all real devices
  python scripts/bench_multichip.py --n_devices 4
  python scripts/bench_multichip.py --preset smoke --platform cpu \
      --n_devices 8                                  # virtual-CPU harness check

Prints ONE JSON line (bench.py convention). On this development box only
one real TPU is attached, so real numbers here come from the 1-device
mesh; the harness itself is exercised on the 8-virtual-CPU mesh by
tests/test_parallel.py::test_bench_multichip_smoke.

Timing methodology matches bench.py / docs/PERF.md: block_until_ready()
returns early on the axon attach path, so each timed iteration fetches a
[B]-sized output; dispatch is pipelined 1-deep (the production Evaluator/
Solver pattern); best-of-3 loops on a shared chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_devices", type=int, default=None,
                   help="mesh size (default: all visible devices)")
    p.add_argument("--platform", default=None, choices=[None, "cpu"],
                   help="'cpu' forces virtual host devices (harness checks)")
    p.add_argument("--preset", default="flagship",
                   choices=["flagship", "smoke"],
                   help="flagship: production shapes (64^3 grid, 1024 pts, "
                        "eval B=512/dev); smoke: tiny shapes for CPU runs")
    p.add_argument("--eval_batch_per_device", type=int, default=None)
    p.add_argument("--train_batch_per_device", type=int, default=None)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--no_scaling_ref", action="store_true",
                   help="skip the 1-device weak-scaling reference run")
    return p.parse_args()


def main():
    args = _parse_args()
    if args.platform == "cpu":
        n = args.n_devices or 8
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")),
    )
    import jax.numpy as jnp
    import numpy as np

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet, dcl_losses
    from dcl_net_tpu.parallel import make_mesh
    from dcl_net_tpu.parallel.mesh import (
        batch_sharding,
        make_parallel_train_step,
        replicate,
        replicated_sharding,
        shard_batch,
    )
    from dcl_net_tpu.train.solver import build_optimizer, init_train_state, make_train_step

    n_devices = args.n_devices or len(jax.devices())
    device_kind = jax.devices()[0].device_kind

    if args.preset == "flagship":
        grid, unit, n_points = (64, 64, 64), (0.006, 0.006, 0.006), 1024
        caps = None  # model defaults (production capacities)
        eval_bpd = args.eval_batch_per_device or 512
        train_bpd = args.train_batch_per_device or 32
        n_classes = 8
        model_kw = dict(interp_mode="pallas", voxelize_impl="matmul",
                        dtype=jnp.bfloat16)
        if args.platform == "cpu":  # Pallas/Mosaic is TPU-only
            model_kw = {}
    else:  # smoke: the dryrun_multichip shapes — minutes on virtual CPU
        grid, unit, n_points = (16, 16, 16), (0.024, 0.024, 0.024), 128
        caps = (256, 64, 16, 8)
        eval_bpd = args.eval_batch_per_device or 4
        train_bpd = args.train_batch_per_device or 2
        n_classes = 4
        model_kw = {}

    eval_batch = eval_bpd * n_devices
    train_batch = train_bpd * n_devices

    ds = SyntheticPoseDataset(
        n_objects=n_classes, n_points=n_points, unit_voxel_extent=unit,
        voxel_num_limit=grid, seed=0,
    )
    # small unique pool tiled to the batch (bench.py rationale: static
    # shapes + unchanged per-sample occupancy make repetition invisible)
    pool = [ds[i] for i in range(min(32, max(eval_batch, train_batch)))]
    i = len(pool)
    while len({int(s["obj_idx"]) for s in pool}) < n_classes:
        pool.append(ds[i])
        i += 1
    samples = [pool[i % len(pool)]
               for i in range(max(eval_batch, train_batch))]

    model = DCLNet(
        unit_voxel_extent=unit, voxel_num_limit=grid,
        n_inp=n_points, n_tmp=n_points,
        **({"capacities": caps} if caps else {}), **model_kw,
    )

    by_class = {}
    for s in pool:
        by_class.setdefault(int(s["obj_idx"]), s)
    tmp_bank = {"tmp": {
        k: jnp.stack([jnp.asarray(by_class[c][f"tmp_{k}"])
                      for c in range(n_classes)])
        for k in ("feats", "voxel_idx")
    }}

    def bench_mesh(nd: int):
        """Eval + train throughput over an nd-device mesh. Returns dict."""
        mesh = make_mesh(nd)
        repl = replicated_sharding(mesh)
        shard = batch_sharding(mesh)

        eb = eval_bpd * nd
        batch_h = make_batch(samples[:eb]).to_dict()
        batch = shard_batch(jax.tree.map(jnp.asarray, batch_h), mesh)

        variables = replicate(
            jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), batch_h, train=False),
            mesh,
        )
        cache = replicate(
            jax.jit(lambda v, b: model.apply(
                v, b, train=False, method=model.encode_template))(
                jax.device_get(variables), tmp_bank),
            mesh,
        )

        def fwd(v, c, b):
            obs = model.apply(v, b, train=False, method=model.encode_observed)
            tmp = jax.tree.map(lambda x: x[b["labels"]["obj_idx"]], c)
            out = model.apply(v, obs, tmp, train=False, method=model.fuse)
            return out["rot_pred"], out["trans_pred"]

        fwd_j = jax.jit(fwd, in_shardings=(repl, repl, shard),
                        out_shardings=(shard, shard))
        compiled = fwd_j.lower(variables, cache, batch).compile()
        for _ in range(2):
            _ = np.asarray(compiled(variables, cache, batch)[1])

        def eval_loop():
            t0 = time.perf_counter()
            prev = compiled(variables, cache, batch)[1]
            for _ in range(args.iters - 1):
                cur = compiled(variables, cache, batch)[1]
                _ = np.asarray(prev)
                prev = cur
            _ = np.asarray(prev)
            return (time.perf_counter() - t0) / args.iters

        edt = min(eval_loop() for _ in range(3))

        # train: the product parallel path (make_parallel_train_step)
        tb = train_bpd * nd
        tbatch_h = make_batch(samples[:tb]).to_dict()
        tbatch = shard_batch(jax.tree.map(jnp.asarray, tbatch_h), mesh)
        cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3,
                                    "betas": [0.5, 0.999], "eps": 1e-6}})
        tx, _ = build_optimizer(cfg)
        state = replicate(init_train_state(model, tx, tbatch_h), mesh)
        step = make_parallel_train_step(
            make_train_step(model, tx, dcl_losses,
                            template_bank=tmp_bank["tmp"]),
            mesh,
        )
        step_c = step.lower(state, tbatch).compile()
        state, m = step_c(state, tbatch)
        _ = float(m["loss_all"])

        t_iters = max(args.iters // 2, 3)
        best = None
        for _rep in range(2):
            t0 = time.perf_counter()
            prev = None
            for _ in range(t_iters):
                state, m = step_c(state, tbatch)
                if prev is not None:
                    _ = float(prev["loss_all"])
                prev = m
            _ = float(prev["loss_all"])
            cur = (time.perf_counter() - t0) / t_iters
            best = cur if best is None else min(best, cur)

        return {
            "n_devices": nd,
            "eval_batch_total": eb,
            "eval_instances_per_sec": round(eb / edt, 2),
            "eval_instances_per_sec_per_chip": round(eb / edt / nd, 2),
            "train_batch_total": tb,
            "train_samples_per_sec": round(tb / best, 2),
            "train_samples_per_sec_per_chip": round(tb / best / nd, 2),
            "train_step_ms": round(best * 1000, 1),
        }

    result = bench_mesh(n_devices)
    scaling = None
    if n_devices > 1 and not args.no_scaling_ref:
        ref = bench_mesh(1)
        scaling = {
            "ref_1dev": ref,
            # weak-scaling efficiency: per-chip rate at N devices vs 1
            "eval_weak_efficiency": round(
                result["eval_instances_per_sec_per_chip"]
                / ref["eval_instances_per_sec_per_chip"], 3),
            "train_weak_efficiency": round(
                result["train_samples_per_sec_per_chip"]
                / ref["train_samples_per_sec_per_chip"], 3),
        }

    print(json.dumps({
        "metric": "multichip_eval_instances_per_sec",
        "value": result["eval_instances_per_sec"],
        "unit": "instances/sec",
        "extra": {
            **result,
            "scaling": scaling,
            "preset": args.preset,
            "device_kind": device_kind,
            "platform": jax.devices()[0].platform,
            "config": ("bf16 + pallas interp + matmul voxelizer + template "
                       "cache" if args.preset == "flagship"
                       and args.platform != "cpu" else "portable (no Pallas)"),
        },
    }))


if __name__ == "__main__":
    main()
