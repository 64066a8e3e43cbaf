"""Multi-host data-parallel dryrun (CPU, virtual devices).

Validates the full multi-host path — ``jax.distributed`` handshake, global
mesh across processes, BatchLoader process striding, cross-host gradient
collectives (Gloo on CPU) — WITHOUT pod hardware: run one process per
"host", each with ``--local_devices`` virtual CPU devices. The global batch
composition is identical to a single-process run by construction
(data/loader.py process striding), so the per-step losses must match a
single-process run over the same total device count to float tolerance.

Single-process reference:
  python -m dcl_net_tpu.tools.dryrun_multihost --local_devices 8 --out ref.json
2-process x 4-device run (same 8-device mesh, two hosts):
  python -m dcl_net_tpu.tools.dryrun_multihost --coordinator localhost:9876 \
      --num_hosts 2 --host_id 0 --local_devices 4 --out h0.json &
  python -m dcl_net_tpu.tools.dryrun_multihost --coordinator localhost:9876 \
      --num_hosts 2 --host_id 1 --local_devices 4 &

tests/test_multihost.py drives exactly this and asserts loss equality.

The reference has no multi-host story at all (single-process DataParallel,
reference tools/train_YCBV_stage1.py:251-252); this is the SURVEY.md §2.3
"jax.distributed init + GSPMD mesh" plan made executable.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="multi-host CPU dryrun")
    p.add_argument("--coordinator", default=None,
                   help="host:port; omit for a single-process run")
    p.add_argument("--num_hosts", type=int, default=1)
    p.add_argument("--host_id", type=int, default=0)
    p.add_argument("--local_devices", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=16, help="GLOBAL batch size")
    p.add_argument("--out", default=None, help="write per-step losses JSON here")
    args = p.parse_args(argv)

    # virtual CPU devices must be configured before the backend initializes
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")),
    )
    if args.coordinator:
        from dcl_net_tpu.parallel.mesh import init_distributed

        init_distributed(args.coordinator, args.num_hosts, args.host_id)

    import numpy as np
    import optax

    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet
    from dcl_net_tpu.models.dcl_net import dcl_losses
    from dcl_net_tpu.parallel.mesh import (
        make_mesh, make_parallel_train_step, replicate, shard_batch,
    )
    from dcl_net_tpu.train.solver import init_train_state, make_train_step

    grid, unit, n = (16, 16, 16), (0.024, 0.024, 0.024), 64
    ds = SyntheticPoseDataset(
        n_objects=2, n_points=n, unit_voxel_extent=unit, voxel_num_limit=grid,
        seed=0, length=args.batch * args.steps,
    )
    loader = BatchLoader(
        ds, batch_size=args.batch, shuffle=True, num_workers=2, seed=0,
        to_jax=False,
        process_id=jax.process_index(), process_count=jax.process_count(),
    )
    model = DCLNet(unit_voxel_extent=unit, voxel_num_limit=grid,
                   n_inp=n, n_tmp=n, capacities=(512, 512, 64, 8))
    tx = optax.adam(1e-3)
    mesh = make_mesh()

    # Establish the cross-process Gloo clique with a TRIVIAL collective
    # before the heavy model compile: concurrent cold compiles (minutes on a
    # contended host) skew the processes' arrival at the first real
    # collective past Gloo's connect timeout; a ~1 s program gets both sides
    # to the rendezvous together and the communicator is cached for every
    # later executable. No-op cost in single-process runs.
    if jax.process_count() > 1:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec

        probe = shard_batch(
            {"x": np.ones(mesh.size // jax.process_count(), np.float32)},
            mesh)
        total = jax.jit(
            lambda t: jnp.sum(t["x"]),
            out_shardings=NamedSharding(mesh, PartitionSpec()),
        )(probe)
        assert float(total) == float(mesh.size)

    step = make_parallel_train_step(make_train_step(model, tx, dcl_losses), mesh)

    losses = []
    state = None
    for batch in loader:
        if state is None:
            state = replicate(init_train_state(model, tx, batch), mesh)
        state, metrics = step(state, shard_batch(batch, mesh))
        losses.append(float(metrics["loss_all"]))

    # ---- eval arm: Evaluator.evaluate with process-sharded batches ----
    # (VERDICT r4 item 5: the Evaluator's multi-host branch — global-batch
    # divisibility check, make_array_from_process_local_data assembly, and
    # cross-process score aggregation — had no 2-process test before this.)
    # Every process builds the SAME deterministic global eval set and feeds
    # its contiguous block; the aggregated metrics must equal the
    # single-process run bit-for-bit (same scores, same aggregation).
    import jax.numpy as jnp

    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.eval.evaluator import Evaluator

    pid, pcnt = jax.process_index(), jax.process_count()
    b_local = args.batch // pcnt
    eval_rows = [ds[i] for i in range(args.batch * 2)]
    eval_batches = []
    for k in range(2):
        rows = eval_rows[k * args.batch:(k + 1) * args.batch]
        local = rows[pid * b_local:(pid + 1) * b_local]
        eval_batches.append(make_batch(local).to_dict())
    model_points = np.stack([ds.model_points(c, 32) for c in range(2)])
    eval_vars = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), eval_batches[0], train=False)
    evaluator = Evaluator(
        model, eval_vars, model_points, protocol="adds_auc", mesh=mesh)
    eres = evaluator.evaluate(iter(eval_batches))
    eval_metrics = {
        "auc_mean": float(eres["auc_mean"]),
        "acc_mean": float(eres["acc_mean"]),
        "n_overflow": int(eres["n_overflow"]),
    }

    # ---- stage-2 arm: one refiner train step over the mesh ----
    from dcl_net_tpu.models import Refiner
    from dcl_net_tpu.train.solver import TrainState
    from dcl_net_tpu.train.stage2 import make_stage2_train_step

    refiner = Refiner(n_inp=n)
    out1 = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        eval_vars, eval_batches[0])
    rvars = refiner.init(
        jax.random.PRNGKey(1),
        {"input_features": jnp.concatenate(
            [out1["points_inp"], out1["F_Xo_p"].astype(jnp.float32)], -1),
         "conf": out1["conf"]},
    )
    s2_step = make_stage2_train_step(
        model, eval_vars, refiner, tx, 2, jnp.asarray(model_points))
    ps2 = make_parallel_train_step(s2_step, mesh)
    s2_state = replicate(TrainState(
        step=jnp.zeros((), jnp.int32), params=rvars["params"],
        batch_stats={}, opt_state=tx.init(rvars["params"]),
    ), mesh)
    s2_losses = []
    for b in eval_batches:
        s2_state, m = ps2(s2_state, shard_batch(b, mesh))
        s2_losses.append(float(m["loss_all"]))

    result = {
        "losses": losses,
        "eval": eval_metrics,
        "stage2_losses": s2_losses,
        "process_count": jax.process_count(),
        "n_devices": jax.device_count(),
        "global_batch": args.batch,
    }
    print(json.dumps(result), flush=True)
    if args.out and jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
