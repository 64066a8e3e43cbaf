"""A/B: fused compaction->interp (ops/pallas_fused.py) vs the production
two-stage composition (pallas_dense_to_sparse -> voxel_centers ->
pallas_nn_interpolate), amplified per the measurement protocol
(docs/PERF.md): K copies chained in one jit, inputs perturbed per copy,
pipelined fetch, dispatch floor subtracted. VERDICT r4 item 7.

Usage: python scripts/bench_fused_interp.py   (real chip)
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

    from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse
    from dcl_net_tpu.ops.pallas_fused import pallas_compact_interpolate
    from dcl_net_tpu.ops.pallas_interp import pallas_nn_interpolate
    from dcl_net_tpu.ops.sparse_conv import voxel_centers

    B = int(os.environ.get("PROF_BATCH", 256))
    K = int(os.environ.get("PROF_K", 8))
    rng = np.random.default_rng(0)

    def timeit(f, *args, iters=10):
        _ = np.asarray(f(*args))
        _ = np.asarray(f(*args))
        best = None
        for _rep in range(2):
            t0 = time.perf_counter()
            prev = f(*args)
            for _i in range(iters - 1):
                cur = f(*args)
                _ = np.asarray(prev)
                prev = cur
            _ = np.asarray(prev)
            cur_t = (time.perf_counter() - t0) / iters * 1000
            best = cur_t if best is None else min(best, cur_t)
        return best

    floor = timeit(jax.jit(lambda x: (x * 1.0001).sum()), jnp.ones((8, 128)))
    print(f"dispatch floor: {floor:.1f} ms (B={B}, K={K})")

    # production pyramid level shapes (docs/PERF.md): (d, c, cap, occ, scale)
    levels = [
        (32, 32, 2048, 700, 2.0),
        (16, 64, 1024, 300, 4.0),
        (8, 128, 512, 190, 6.0),
    ]
    n = 1024
    unit = (0.006, 0.006, 0.006)
    offset = tuple(-0.5 * 0.006 * 64 for _ in range(3))
    pts = jnp.asarray(rng.normal(size=(B, n, 3)) * 0.05, jnp.float32)

    for d, c, cap, occ, scale in levels:
        mask = np.zeros((B, d, d, d), np.float32)
        for i in range(B):
            p = rng.normal(size=(occ, 3))
            p /= np.linalg.norm(p, axis=1, keepdims=True)
            ii = np.clip(((p * 0.4 + 0.5) * d).astype(int), 0, d - 1)
            mask[i, ii[:, 0], ii[:, 1], ii[:, 2]] = 1.0
        feats = jnp.asarray(rng.normal(size=(B, d, d, d, c)), jnp.bfloat16)
        maskj = jnp.asarray(mask)
        us = tuple(u * scale for u in unit)

        def two_one(s, f):
            co, vf, vm = pallas_dense_to_sparse(f * s.astype(f.dtype), maskj,
                                                cap)
            ctr = voxel_centers(co, unit, scale, offset)
            out = pallas_nn_interpolate(pts, ctr, vf, vm)
            return jnp.sum(out.astype(jnp.float32) * 1e-6)

        def fused_one(s, f):
            out = pallas_compact_interpolate(
                f * s.astype(f.dtype), maskj, pts, cap, us, offset)
            return jnp.sum(out.astype(jnp.float32) * 1e-6)

        def amp(one):
            def f(feats):
                acc = jnp.float32(0.0)
                for i in range(K):
                    # 1 + i/64 is EXACT in bf16 — a 1e-6 perturbation rounds
                    # back to 1.0 there and CSE collapses the K copies
                    acc = acc + one(jnp.float32(1 + i * 0.015625), feats)
                return acc
            return jax.jit(f)

        # numerical sanity before timing
        a = float(jax.jit(lambda f: two_one(jnp.float32(1.0), f))(feats))
        bb = float(jax.jit(lambda f: fused_one(jnp.float32(1.0), f))(feats))
        assert abs(a - bb) < 1e-3 * max(abs(a), 1.0), (a, bb)

        t_two = timeit(amp(two_one), feats)
        t_fused = timeit(amp(fused_one), feats)
        per_two = (t_two - floor) / K
        per_fused = (t_fused - floor) / K
        print(f"L(d={d:2d},c={c:3d},cap={cap}): two-stage {per_two:7.2f} ms"
              f"   fused {per_fused:7.2f} ms   ({per_two / per_fused:.2f}x)")

        # backward too (training relevance)
        def with_grad(one):
            # consume the gradient in the output or XLA dead-codes the
            # entire backward (the round-3 profile_train.py lesson)
            def g(s, f):
                val, grad = jax.value_and_grad(lambda ff: one(s, ff))(f)
                return val + jnp.sum(grad.astype(jnp.float32)) * 1e-12
            return g

        t_two_g = timeit(amp(with_grad(two_one)), feats)
        t_fused_g = timeit(amp(with_grad(fused_one)), feats)
        per_two_g = (t_two_g - floor) / K
        per_fused_g = (t_fused_g - floor) / K
        print(f"  +grad: two-stage {per_two_g:7.2f} ms   fused "
              f"{per_fused_g:7.2f} ms   ({per_two_g / per_fused_g:.2f}x)")


if __name__ == "__main__":
    main()
