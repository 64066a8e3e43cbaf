"""Benchmark: DCL-Net eval throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: stage-1 eval forward throughput (instances/sec/chip) at the real
workload shape — batches of 1024-point instance pairs on the 64^3 voxel
grid — i.e. the per-frame inference cost that dominates the reference's eval
loop (reference tools/test_YCBV_stage1.py:127-205). Uses the production eval
configuration: per-class template features are encoded once and cached
(dcl_net_tpu/eval/evaluator.py), exactly as the eval tools run.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}). We anchor against an estimated 30
instances/sec for the reference torch+spconv eval pipeline on its
contemporaneous GPU (single-instance batches, ~33 ms/frame forward —
typical for spconv-era RGB-D pose pipelines; to be replaced by a measured
number when the reference stack can be run side-by-side).

NOTE on methodology: on this TPU attach path block_until_ready() returns
before execution finishes and host transfers are slow, so each timed
iteration fetches a small output to force completion, and only [B]-sized
results ever leave the device.
"""

import json
import os
import time

import numpy as np

BASELINE_INSTANCES_PER_SEC = 30.0


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")),
    )
    import jax.numpy as jnp

    from dcl_net_tpu.models import DCLNet
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

    batch_size = int(os.environ.get("BENCH_BATCH", 128))
    n_points = 1024
    n_classes = 8
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)

    ds = SyntheticPoseDataset(
        n_objects=n_classes, n_points=n_points, unit_voxel_extent=unit,
        voxel_num_limit=grid, seed=0,
    )
    batch = make_batch([ds[i] for i in range(batch_size)]).to_dict()
    batch = jax.tree.map(jnp.asarray, batch)

    model = DCLNet(
        unit_voxel_extent=unit, voxel_num_limit=grid,
        n_inp=n_points, n_tmp=n_points,
        interp_mode="pallas",  # the eval tools' production configuration
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )

    # Template-feature cache: encode each class's CAD template once
    # (the production eval path; reference recomputes it per frame).
    tmp_bank = {"tmp": {
        "feats": jnp.stack(
            [batch["tmp"]["feats"][np.argmax(np.asarray(batch["labels"]["obj_idx"]) == c)]
             for c in range(n_classes)]
        ),
        "voxel_idx": jnp.stack(
            [batch["tmp"]["voxel_idx"][np.argmax(np.asarray(batch["labels"]["obj_idx"]) == c)]
             for c in range(n_classes)]
        ),
    }}
    tmp_cache = jax.jit(
        lambda v, b: model.apply(v, b, train=False, method=model.encode_template)
    )(variables, tmp_bank)

    @jax.jit
    def fwd(v, cache, b):
        obs = model.apply(v, b, train=False, method=model.encode_observed)
        tmp = jax.tree.map(lambda x: x[b["labels"]["obj_idx"]], cache)
        out = model.apply(v, obs, tmp, train=False, method=model.fuse)
        return out["rot_pred"], out["trans_pred"]

    rot, trans = fwd(variables, tmp_cache, batch)  # compile
    for _ in range(2):
        _ = np.asarray(fwd(variables, tmp_cache, batch)[1])  # warmup

    iters = int(os.environ.get("BENCH_ITERS", 10))
    t0 = time.perf_counter()
    for _ in range(iters):
        trans = np.asarray(fwd(variables, tmp_cache, batch)[1])
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
