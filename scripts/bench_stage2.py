"""Stage-2 (DCL-Net + scanned 2-iteration refiner) eval throughput.

Mirrors bench.py's production configuration (bf16, pallas interp, template
cache, 1-deep pipelining, best-of-3) with the refiner composed on top —
the reference's tools/test_YCBV_stage2.py protocol.

Usage: python scripts/bench_stage2.py  [S2_BATCH=256]
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

    from dcl_net_tpu.models import DCLNet, Refiner
    from dcl_net_tpu.models.refiner import refine_pose
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

    b = int(os.environ.get("S2_BATCH", 256))
    n_classes, n = 8, 1024
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)
    ds = SyntheticPoseDataset(n_objects=n_classes, n_points=n,
                              unit_voxel_extent=unit, voxel_num_limit=grid,
                              seed=0)
    batch = jax.tree.map(jnp.asarray, make_batch([ds[i] for i in range(b)]).to_dict())
    obj = np.asarray(batch["labels"]["obj_idx"])
    bank = {"tmp": {
        k: jnp.stack([batch["tmp"][k][int(np.argmax(obj == c))]
                      for c in range(n_classes)])
        for k in ("feats", "voxel_idx")
    }}

    model = DCLNet(unit_voxel_extent=unit, voxel_num_limit=grid,
                   n_inp=n, n_tmp=n, interp_mode="pallas", dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    refiner = Refiner()
    s1 = model.apply(variables, batch, train=False)
    rv = refiner.init(
        jax.random.PRNGKey(1),
        {"input_features": jnp.concatenate(
            [s1["points_inp"], s1["F_Xo_p"].astype(jnp.float32)], axis=-1),
         "conf": s1["conf"]},
        train=False,
    )
    cache = jax.jit(
        lambda v, bb: model.apply(v, bb, train=False, method=model.encode_template)
    )(variables, bank)

    @jax.jit
    def fwd(v, rvars, c, bb):
        obs = model.apply(v, bb, train=False, method=model.encode_observed)
        tm = jax.tree.map(lambda x: x[bb["labels"]["obj_idx"]], c)
        out = model.apply(v, obs, tm, train=False, method=model.fuse)
        rot, trans = refine_pose(
            refiner.apply, rvars,
            out["points_inp"], out["F_Xo_p"], out["conf"],
            out["rot_pred"], out["trans_pred"], 2,
        )
        return rot, trans

    _ = np.asarray(fwd(variables, rv, cache, batch)[1])
    _ = np.asarray(fwd(variables, rv, cache, batch)[1])
    iters = int(os.environ.get("S2_ITERS", 10))

    def loop():
        t0 = time.perf_counter()
        prev = fwd(variables, rv, cache, batch)[1]
        for _i in range(iters - 1):
            cur = fwd(variables, rv, cache, batch)[1]
            _ = np.asarray(prev)
            prev = cur
        _ = np.asarray(prev)
        return (time.perf_counter() - t0) / iters

    dt = min(loop() for _ in range(3))
    print(f"stage2 eval B={b}: {dt * 1000:.1f} ms/batch "
          f"({b / dt:.0f} inst/s/chip)")


if __name__ == "__main__":
    main()
