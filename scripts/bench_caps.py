"""A/B eval-forward capacities: (4096,1024,512,64) vs (2048,1024,512,64).

Interp + compaction cost scales with the level-0 capacity; measured pyramid
occupancy is ~700 at level 0, so 2048 still holds ~3x margin. Checks pose
outputs bit-wise between the two budgets on the bench workload.

Usage: python scripts/bench_caps.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from dcl_net_tpu.models import DCLNet
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

    b, n, n_classes = 256, 1024, 8
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)
    ds = SyntheticPoseDataset(
        n_objects=n_classes, n_points=n, unit_voxel_extent=unit,
        voxel_num_limit=grid, seed=0,
    )
    batch = jax.tree.map(jnp.asarray, make_batch([ds[i] for i in range(b)]).to_dict())

    def timeit(f, *args, iters=10):
        _ = np.asarray(f(*args)[1])
        _ = np.asarray(f(*args)[1])
        t0 = time.perf_counter()
        prev = f(*args)
        for _i in range(iters - 1):
            cur = f(*args)
            _ = np.asarray(prev[1])
            prev = cur
        _ = np.asarray(prev[1])
        return (time.perf_counter() - t0) / iters * 1000

    outs = {}
    for caps in [(4096, 1024, 512, 64), (2048, 1024, 512, 64),
                 (2048, 768, 512, 64)]:
        model = DCLNet(
            unit_voxel_extent=unit, voxel_num_limit=grid,
            n_inp=n, n_tmp=n, interp_mode="pallas", dtype=jnp.bfloat16,
            capacities=caps,
        )
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch, train=False
        )
        obj = np.asarray(batch["labels"]["obj_idx"])
        tmp_bank = {"tmp": {
            k: jnp.stack([batch["tmp"][k][int(np.argmax(obj == c))]
                          for c in range(n_classes)])
            for k in ("feats", "voxel_idx")
        }}
        cache = jax.jit(
            lambda v, bb: model.apply(v, bb, train=False, method=model.encode_template)
        )(variables, tmp_bank)

        @jax.jit
        def fwd(v, c, bb):
            obs = model.apply(v, bb, train=False, method=model.encode_observed)
            tm = jax.tree.map(lambda x: x[bb["labels"]["obj_idx"]], c)
            out = model.apply(v, obs, tm, train=False, method=model.fuse)
            return out["rot_pred"], out["trans_pred"]

        t = timeit(fwd, variables, cache, batch)
        r, tr = fwd(variables, cache, batch)
        outs[caps] = (np.asarray(r), np.asarray(tr))
        print(f"caps={caps}: {t:.1f} ms  ({b / t * 1000:.0f} inst/s)", flush=True)

    base = outs[(4096, 1024, 512, 64)]
    for caps, (r, tr) in outs.items():
        same_r = np.array_equal(r, base[0])
        same_t = np.array_equal(tr, base[1])
        dr = float(np.abs(r.astype(np.float32) - base[0].astype(np.float32)).max())
        dt = float(np.abs(tr.astype(np.float32) - base[1].astype(np.float32)).max())
        print(f"caps={caps}: rot identical={same_r} trans identical={same_t} "
              f"max|dR|={dr:.2e} max|dt|={dt:.2e}")


if __name__ == "__main__":
    main()
