"""Amplified A/B of voxelize-scatter variants and compaction chunk sizes.

Usage: DCLX_COMPACT_CHUNK=256 python scripts/bench_vox_variants.py
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

    from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse, _CHUNK

    def timeit(f, *args, iters=10):
        _ = np.asarray(f(*args))
        _ = np.asarray(f(*args))
        t0 = time.perf_counter()
        prev = f(*args)
        for _i in range(iters - 1):
            cur = f(*args)
            _ = np.asarray(prev)
            prev = cur
        _ = np.asarray(prev)
        return (time.perf_counter() - t0) / iters * 1000

    floor = timeit(jax.jit(lambda x: (x * 1.0001).sum()), jnp.ones((8, 128)))
    print(f"floor: {floor:.1f} ms")

    rng = np.random.default_rng(0)
    K = 8
    b, n, g = 256, 1024, 64 ** 3
    feats = jnp.asarray(rng.normal(size=(b, n, 8)).astype(np.float32))
    lin = jnp.asarray(rng.integers(0, g, size=(b, n)).astype(np.int32))

    # current: 2-D (batch_ids, lin) scatter
    bids = jnp.arange(b, dtype=jnp.int32)[:, None].repeat(n, axis=1)

    def scat2d(f, li):
        acc = 0.0
        for i in range(K):
            out = jnp.zeros((b, g, 8), f.dtype).at[bids, li].add(f + i * 1e-8)
            acc = acc + out.sum()
        return acc

    # 1-D flattened-index scatter into [b*g, c]
    def scat1d(f, li):
        acc = 0.0
        flat_ids = (bids * g + li).reshape(-1)
        ff = f.reshape(b * n, 8)
        for i in range(K):
            out = jnp.zeros((b * g, 8), f.dtype).at[flat_ids].add(ff + i * 1e-8)
            acc = acc + out.sum()
        return acc

    # segment_sum over flattened ids
    def seg(f, li):
        acc = 0.0
        flat_ids = (bids * g + li).reshape(-1)
        ff = f.reshape(b * n, 8)
        for i in range(K):
            out = jax.ops.segment_sum(ff + i * 1e-8, flat_ids, num_segments=b * g)
            acc = acc + out.sum()
        return acc

    for name, fn in [("scatter-2d", scat2d), ("scatter-1d", scat1d),
                     ("segment_sum", seg)]:
        t = timeit(jax.jit(fn), feats, lin, iters=5)
        print(f"{name}: {(t - floor) / K:.1f} ms/call", flush=True)

    # Pallas factorized one-hot matmul voxelizer (ops/pallas_voxelize.py)
    from dcl_net_tpu.ops.pallas_voxelize import pallas_voxelize

    d = 64
    idx3 = jnp.stack(
        [lin // (d * d), (lin // d) % d, lin % d], axis=-1
    ).astype(jnp.int32)
    feats7 = feats[..., :7]

    def pvox(out_dtype):
        def f(fe, i3):
            acc = 0.0
            for i in range(K):
                g_, c_ = pallas_voxelize(
                    fe + i * 1e-8, i3, (d, d, d), out_dtype=out_dtype)
                acc = acc + g_.astype(jnp.float32).sum() + c_.sum()
            return acc
        return f

    for name, dt in [("pallas-mm bf16", jnp.bfloat16),
                     ("pallas-mm f32", jnp.float32)]:
        t = timeit(jax.jit(pvox(dt)), feats7, idx3, iters=5)
        print(f"{name}: {(t - floor) / K:.1f} ms/call", flush=True)

    # compaction at the current chunk setting (level-0 shape)
    d, c, occ = 32, 32, 700
    cap = int(os.environ.get("DCLX_BENCH_CAP", 2048))
    mask = np.zeros((b, d, d, d), np.float32)
    for i in range(b):
        pts = rng.normal(size=(occ, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        idx = np.clip(((pts * 0.4 + 0.5) * d).astype(int), 0, d - 1)
        mask[i, idx[:, 0], idx[:, 1], idx[:, 2]] = 1.0
    fb = jnp.asarray(rng.normal(size=(b, d, d, d, c)), jnp.bfloat16)
    fm = jnp.asarray(mask)

    def comp(f, m):
        acc = 0.0
        for i in range(K):
            co, vf, vm = pallas_dense_to_sparse(f + jnp.bfloat16(i * 1e-8), m, cap)
            acc = acc + co.sum() + vf.astype(jnp.float32).sum() + vm.sum()
        return acc

    t = timeit(jax.jit(comp), fb, fm, iters=5)
    print(f"compact chunk={_CHUNK}: {(t - floor) / K:.1f} ms/call")


if __name__ == "__main__":
    main()
