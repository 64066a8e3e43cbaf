"""Benchmark: DCL-Net eval throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: stage-1 eval forward throughput (instances/sec/chip) at the real
workload shape — batch of 1024-point instance pairs, 64^3 voxel grid — i.e.
the per-frame inference cost that dominates the reference's eval loop
(reference tools/test_YCBV_stage1.py:127-205).

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}). We anchor against an estimated 30
instances/sec for the reference torch+spconv eval pipeline on its
contemporaneous GPU (single-instance batches, ~33 ms/frame forward —
typical for spconv-era RGB-D pose pipelines; to be replaced by a measured
number when the reference stack can be run side-by-side).
"""

import json
import os
import time

import numpy as np

BASELINE_INSTANCES_PER_SEC = 30.0


def main():
    import jax

    from dcl_net_tpu.models import DCLNet
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

    batch_size = int(os.environ.get("BENCH_BATCH", 32))
    n_points = 1024
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)

    ds = SyntheticPoseDataset(
        n_objects=8, n_points=n_points, unit_voxel_extent=unit,
        voxel_num_limit=grid, seed=0,
    )
    batch = make_batch([ds[i] for i in range(batch_size)]).to_dict()
    batch = jax.tree.map(jax.numpy.asarray, batch)

    model = DCLNet(
        unit_voxel_extent=unit, voxel_num_limit=grid,
        n_inp=n_points, n_tmp=n_points,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )

    # The eval consumer needs only the small pose outputs; keeping the big
    # per-point tensors on device matters doubly here because host<->device
    # transfer through this TPU attach path is slow. NOTE: on this backend
    # block_until_ready() returns before execution finishes, so timing MUST
    # fetch a (small) result each iteration.
    @jax.jit
    def fwd(v, b):
        out = model.apply(v, b, train=False)
        return out["rot_pred"], out["trans_pred"], jax.numpy.isfinite(out["rot_pred"]).all()

    rot, trans, ok = fwd(variables, batch)  # compile
    assert bool(ok)
    for _ in range(2):
        _ = np.asarray(fwd(variables, batch)[1])  # warmup

    iters = int(os.environ.get("BENCH_ITERS", 10))
    t0 = time.perf_counter()
    for _ in range(iters):
        trans = np.asarray(fwd(variables, batch)[1])
    dt = (time.perf_counter() - t0) / iters

    assert np.isfinite(trans).all()
    inst_per_sec = batch_size / dt
    print(json.dumps({
        "metric": "ycbv_stage1_eval_instances_per_sec_per_chip",
        "value": round(float(inst_per_sec), 2),
        "unit": "instances/sec",
        "vs_baseline": round(float(inst_per_sec) / BASELINE_INSTANCES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
