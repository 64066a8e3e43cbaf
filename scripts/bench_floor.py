"""Calibrate the attach-path dispatch floor and re-measure kernels with
in-jit amplification (K calls chained inside one jit so device work dominates
the per-dispatch overhead).

Usage: python scripts/bench_floor.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse
    from dcl_net_tpu.ops.voxelize import voxelize_dense

    def timeit(f, *args, iters=20):
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

    # dispatch floor: trivial kernel
    x = jnp.ones((8, 128))
    triv = jax.jit(lambda x: (x * 1.0001).sum())
    floor = timeit(triv, x)
    print(f"dispatch floor (trivial jit): {floor:.1f} ms")

    rng = np.random.default_rng(0)
    b, d, c, cap, occ = 256, 32, 32, 4096, 700
    mask = np.zeros((b, d, d, d), np.float32)
    for i in range(b):
        pts = rng.normal(size=(occ, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        idx = np.clip(((pts * 0.4 + 0.5) * d).astype(int), 0, d - 1)
        mask[i, idx[:, 0], idx[:, 1], idx[:, 2]] = 1.0
    feats = rng.normal(size=(b, d, d, d, c)).astype(np.float32)
    fb = jnp.asarray(feats, jnp.bfloat16)
    fm = jnp.asarray(mask)

    K = 8

    def compact_k(f, m):
        acc = 0.0
        for i in range(K):
            co, vf, vm = pallas_dense_to_sparse(f + jnp.bfloat16(i * 1e-8), m, cap)
            acc = acc + co.sum() + vf.astype(jnp.float32).sum() + vm.sum()
        return acc

    t = timeit(jax.jit(compact_k), fb, fm, iters=10)
    print(f"compact bf16 B={b} amplified x{K}: {t:.1f} ms total -> "
          f"{(t - floor) / K:.1f} ms/call")

    # voxelize at the model shape (B=256, N=1024, 64^3, C=7)
    n = 1024
    pfeats = jnp.asarray(rng.normal(size=(b, n, 7)).astype(np.float32))
    vidx = jnp.asarray(rng.integers(0, 64, size=(b, n, 3)).astype(np.int32))

    def vox_k(f, vi):
        acc = 0.0
        for i in range(K):
            g, cnt = voxelize_dense(f + i * 1e-8, vi, (64, 64, 64), mode=4)
            acc = acc + g.sum() + cnt.sum()
        return acc

    t = timeit(jax.jit(vox_k), pfeats, vidx, iters=10)
    print(f"voxelize B={b} amplified x{K}: {t:.1f} ms total -> "
          f"{(t - floor) / K:.1f} ms/call")


if __name__ == "__main__":
    main()
