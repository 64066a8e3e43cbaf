"""A/B: AOT serving artifact vs in-process jitted eval forward (real TPU).

Confirms the jax.export artifact pays no throughput penalty over the
in-process production eval path — same flagship shapes as bench.py
(B=512, 1024 pts, 64^3 grid, bf16 + Pallas interp + matmul voxelizer).

Methodology per docs/PERF.md: one process, fetch a SMALL output per timed
iteration (this attach path's block_until_ready returns early), best-of-R
repeats, both arms interleaved.
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

    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet
    from dcl_net_tpu.serving import (
        encode_template_cache,
        export_serve,
        load_serve,
        make_serve_fn,
    )

    batch_size = int(os.environ.get("BENCH_BATCH", 512))
    n_points, n_classes = 1024, 8
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)

    ds = SyntheticPoseDataset(
        n_objects=n_classes, n_points=n_points, unit_voxel_extent=unit,
        voxel_num_limit=grid, seed=0,
    )
    n_unique = min(64, batch_size)
    pool = [ds[i] for i in range(n_unique)]
    i = n_unique
    while len({int(s["obj_idx"]) for s in pool}) < n_classes:
        pool.append(ds[i])
        i += 1
    samples = [pool[i % len(pool)] for i in range(batch_size)]
    batch = jax.tree.map(jnp.asarray, make_batch(samples).to_dict())

    model = DCLNet(
        unit_voxel_extent=unit, voxel_num_limit=grid,
        n_inp=n_points, n_tmp=n_points,
        interp_mode="pallas", voxelize_impl="matmul", dtype=jnp.bfloat16,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )
    # build the bank from the POOL (guaranteed to hold every class even
    # when batch_size < n_classes drops the coverage-extension samples)
    by_class = {}
    for s in pool:
        by_class.setdefault(int(s["obj_idx"]), s)
    bank = {
        "feats": np.stack([by_class[c]["tmp_feats"]
                           for c in range(n_classes)]),
        "voxel_idx": np.stack([by_class[c]["tmp_voxel_idx"]
                               for c in range(n_classes)]),
    }

    feats = batch["inp"]["feats"]
    vi = batch["inp"]["voxel_idx"]
    obj_idx = batch["labels"]["obj_idx"]

    cache = encode_template_cache(model, variables, bank)
    inproc = jax.jit(make_serve_fn(model, variables, cache))

    t0 = time.perf_counter()
    data = export_serve(model, variables, bank, batch_size,
                        platforms=["tpu"])
    print(f"export: {len(data) / 1e6:.1f} MB in "
          f"{time.perf_counter() - t0:.1f} s")
    artifact = load_serve(data)

    def timed(fn, iters):
        # warm (compile + first dispatch)
        np.asarray(fn(feats, vi, obj_idx)["trans_pred"])[:1]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(feats, vi, obj_idx)
                np.asarray(out["trans_pred"][:1])  # small fetch forces exec
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    iters = int(os.environ.get("BENCH_ITERS", 10))
    t_art = timed(artifact, iters)
    t_inp = timed(inproc, iters)
    # second interleave to bound drift
    t_art = min(t_art, timed(artifact, iters))
    t_inp = min(t_inp, timed(inproc, iters))

    print(f"in-process jit : {t_inp * 1e3:8.1f} ms/batch  "
          f"{batch_size / t_inp:7.0f} inst/s")
    print(f"AOT artifact   : {t_art * 1e3:8.1f} ms/batch  "
          f"{batch_size / t_art:7.0f} inst/s")
    print(f"artifact/in-process: {t_art / t_inp:.3f}x")


if __name__ == "__main__":
    main()
