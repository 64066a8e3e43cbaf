"""Stage-level eval profiling on the real TPU chip (docs/PERF.md methodology).

Times nested prefixes of the production eval forward (bf16 + pallas interp +
template cache) at the bench shape; differences between prefixes give honest
per-stage costs despite the async attach path (each timed iteration fetches a
small output, 1-deep pipelined like bench.py).

Usage: python scripts/profile_stages.py  [PROF_BATCH=256] [PROF_ITERS=10]
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

    from dcl_net_tpu.models import DCLNet
    from dcl_net_tpu.models.backbone import MultiScalePointFeatures
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.ops.voxelize import voxelize_dense
    from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse
    from dcl_net_tpu.ops.pallas_interp import pallas_nn_interpolate
    from dcl_net_tpu.ops.sparse_conv import voxel_centers

    batch_size = int(os.environ.get("PROF_BATCH", 256))
    n_points, n_classes = 1024, 8
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)

    ds = SyntheticPoseDataset(
        n_objects=n_classes, n_points=n_points, unit_voxel_extent=unit,
        voxel_num_limit=grid, seed=0,
    )
    samples = [ds[i] for i in range(batch_size)]
    batch = jax.tree.map(jnp.asarray, make_batch(samples).to_dict())

    # PROF_VOX=scatter re-profiles the old exact-scatter path
    vox_impl = os.environ.get("PROF_VOX", "matmul")
    model = DCLNet(
        unit_voxel_extent=unit, voxel_num_limit=grid,
        n_inp=n_points, n_tmp=n_points,
        interp_mode="pallas", dtype=jnp.bfloat16, voxelize_impl=vox_impl,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )
    obj = np.asarray(batch["labels"]["obj_idx"])
    tmp_bank = {"tmp": {
        k: jnp.stack([batch["tmp"][k][int(np.argmax(obj == c))] for c in range(n_classes)])
        for k in ("feats", "voxel_idx")
    }}
    tmp_cache = jax.jit(
        lambda v, b: model.apply(v, b, train=False, method=model.encode_template)
    )(variables, tmp_bank)

    caps = tuple(model.capacities)
    scales = tuple(model.scale_list)
    unit_np = np.asarray(unit, np.float32)
    offset = -0.5 * unit_np * np.asarray(grid, np.float32)

    def _voxelize(b):
        if vox_impl == "matmul":
            from dcl_net_tpu.ops.pallas_voxelize import pallas_voxelize

            return pallas_voxelize(
                b["inp"]["feats"], b["inp"]["voxel_idx"], grid, mode=4,
                out_dtype=jnp.bfloat16)
        return voxelize_dense(
            b["inp"]["feats"], b["inp"]["voxel_idx"], grid, mode=4)

    def _vox(b):
        g, count = _voxelize(b)
        return g.astype(jnp.float32).sum(axis=(1, 2, 3, 4))  # small fetchable

    def _pyramid(v, b):
        g, count = _voxelize(b)
        mask = (count > 0).astype(g.dtype)
        bb = model.bind(v)
        return bb.backbone_inp(g, mask, False)

    def _backbone(v, b):
        pyr = _pyramid(v, b)
        return sum(f.astype(jnp.float32).sum() for f, m in pyr)[None]

    def _compact(v, b):
        pyr = _pyramid(v, b)
        acc = 0.0
        for lvl, (f, m) in enumerate(pyr):
            gn = int(np.prod(f.shape[1:4]))
            cap = min(caps[lvl], gn)
            coords, vfeats, vmask = pallas_dense_to_sparse(f, m, cap)
            acc = acc + vfeats.astype(jnp.float32).sum() + coords.sum()
        return acc[None]

    def _interp(v, b):
        pyr = _pyramid(v, b)
        pts = b["inp"]["feats"][..., 4:7]
        outs = []
        for lvl, (f, m) in enumerate(pyr):
            gn = int(np.prod(f.shape[1:4]))
            cap = min(caps[lvl], gn)
            coords, vfeats, vmask = pallas_dense_to_sparse(f, m, cap)
            centers = voxel_centers(coords, unit_np, float(scales[lvl]), offset)
            outs.append(pallas_nn_interpolate(pts, centers, vfeats, vmask))
        return sum(o.astype(jnp.float32).sum() for o in outs)[None]

    def _encode(v, b):
        obs = model.apply(v, b, train=False, method=model.encode_observed)
        return obs["p1"].astype(jnp.float32).sum()[None]

    def _full(v, cache, b):
        obs = model.apply(v, b, train=False, method=model.encode_observed)
        tmp = jax.tree.map(lambda x: x[b["labels"]["obj_idx"]], cache)
        out = model.apply(v, obs, tmp, train=False, method=model.fuse)
        return out["trans_pred"][:, 0]

    stages = [
        ("voxelize", jax.jit(_vox), (batch,)),
        ("vox+backbone", jax.jit(_backbone), (variables, batch)),
        ("vox+bb+compact", jax.jit(_compact), (variables, batch)),
        ("vox+bb+comp+interp", jax.jit(_interp), (variables, batch)),
        ("encode_observed", jax.jit(_encode), (variables, batch)),
        ("full_eval_fwd", jax.jit(_full), (variables, tmp_cache, batch)),
    ]

    iters = int(os.environ.get("PROF_ITERS", 10))
    results = {}
    for name, fn, args in stages:
        r = fn(*args)
        _ = np.asarray(r)
        _ = np.asarray(fn(*args))
        t0 = time.perf_counter()
        prev = fn(*args)
        for _i in range(iters - 1):
            cur = fn(*args)
            _ = np.asarray(prev)
            prev = cur
        _ = np.asarray(prev)
        dt = (time.perf_counter() - t0) / iters * 1000
        results[name] = dt
        print(f"{name:24s} {dt:8.1f} ms", flush=True)

    print("\n--- deltas ---")
    keys = list(results)
    for a, b in zip(keys, keys[1:]):
        print(f"{b:24s} +{results[b] - results[a]:8.1f} ms")


if __name__ == "__main__":
    main()
