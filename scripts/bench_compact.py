"""Microbenchmark: pallas_dense_to_sparse at production level-0 shapes.

Level-0 pyramid (post first pool): grid 32^3, C=32, cap=4096, ~700 occupied
of 32768 (~2%). Prior serial-fori kernel measured 36 ms standalone at B=256
(docs/PERF.md). Also times the VJP at the train shape (B=32).

Usage: python scripts/bench_compact.py
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

    rng = np.random.default_rng(0)
    b, d, c, cap, occ = 256, 32, 32, 4096, 700
    # clustered occupancy: points on a sphere surface like real data
    mask = np.zeros((b, d, d, d), np.float32)
    for i in range(b):
        pts = rng.normal(size=(occ, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        idx = np.clip(((pts * 0.4 + 0.5) * d).astype(int), 0, d - 1)
        mask[i, idx[:, 0], idx[:, 1], idx[:, 2]] = 1.0
    feats = rng.normal(size=(b, d, d, d, c)).astype(np.float32)
    fb = jnp.asarray(feats, jnp.bfloat16)
    fm = jnp.asarray(mask)
    print(f"occupancy/sample ~ {mask.sum() / b:.0f}")

    def _small(f, m):
        co, vf, vm = pallas_dense_to_sparse(f, m, cap)
        return co.sum() + vf.astype(jnp.float32).sum() + vm.sum()

    fn = jax.jit(_small)

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

    print(f"fwd bf16 B={b}: {timeit(fn, fb, fm):.1f} ms")
    print(f"fwd f32  B={b}: {timeit(fn, jnp.asarray(feats), fm):.1f} ms")

    # A/B vs the previous serial-fori kernel (if extracted to /tmp)
    import importlib.util
    import os
    if os.path.exists("/tmp/pallas_compact_old.py"):
        spec = importlib.util.spec_from_file_location(
            "pallas_compact_old", "/tmp/pallas_compact_old.py")
        old = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(old)

        def _small_old(f, m):
            co, vf, vm = old.pallas_dense_to_sparse(f, m, cap)
            return co.sum() + vf.astype(jnp.float32).sum() + vm.sum()

        fo = jax.jit(_small_old)
        print(f"OLD fwd bf16 B={b}: {timeit(fo, fb, fm):.1f} ms")
        # bit-identical layouts expected
        a = jax.jit(lambda f, m: pallas_dense_to_sparse(f, m, cap))(fb, fm)
        o = jax.jit(lambda f, m: old.pallas_dense_to_sparse(f, m, cap))(fb, fm)
        for x, y, nm in zip(a, o, ("coords", "vfeats", "vmask")):
            same = bool(jnp.all(x == y))
            print(f"  {nm} identical: {same}")

    # VJP at train shape
    bt = 32
    fbt = jnp.asarray(feats[:bt], jnp.bfloat16)
    fmt = jnp.asarray(mask[:bt])

    def loss(f, m):
        _, vf, vm = pallas_dense_to_sparse(f, m, cap)
        return (vf.astype(jnp.float32) * vm[..., None]).sum()

    g = jax.jit(lambda f, m: jax.grad(loss)(f, m).astype(jnp.float32).sum())
    print(f"grad bf16 B={bt}: {timeit(g, fbt, fmt):.1f} ms")


if __name__ == "__main__":
    main()
