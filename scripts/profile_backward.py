"""Amplified per-stage BACKWARD profiling at the production train shapes
(VERDICT r4 item 2: profile the backward at B=128 the way the forward was
profiled — compaction VJP, pallas-interp VJP, matmul-voxelizer VJP, conv
grads).

Method (docs/PERF.md measurement protocol): chain K copies of each stage
inside ONE jit (inputs perturbed per copy to defeat CSE), time
pipelined-fetch, subtract the measured dispatch floor, divide by K. The
stage's backward cost = amplified value_and_grad time − amplified forward
time.

Usage: python scripts/profile_backward.py   (real chip; PROF_BATCH=128)
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

    B = int(os.environ.get("PROF_BATCH", 128))
    K = int(os.environ.get("PROF_K", 4))
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

    def _consume(val_and_grad):
        # value_and_grad whose grad output is unused gets its ENTIRE
        # backward dead-coded by XLA — fold the gradient into the scalar
        val, grad = val_and_grad
        leaves = jax.tree.leaves(grad)
        return val + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-12

    x = jnp.ones((8, 128))
    floor = timeit(jax.jit(lambda x: (x * 1.0001).sum()), x)
    print(f"dispatch floor: {floor:.1f} ms (B={B}, K={K})")

    def amp(run_one, k=None):
        """K chained copies; the scalar accumulator serializes them. The
        per-copy scale must be bf16-EXACT (1 + i/64) or the bf16 stages CSE
        back into one copy (the scale rounds to 1.0)."""
        kk = K if k is None else k
        def f(*args):
            acc = jnp.float32(0.0)
            for i in range(kk):
                acc = acc + run_one(jnp.float32(1 + i * 0.015625), *args)
            return acc
        return jax.jit(f)

    def report(name, fwd_ms, grad_ms, k=None):
        kk = K if k is None else k
        fwd = (fwd_ms - floor) / kk
        both = (grad_ms - floor) / kk
        print(f"{name:28s} fwd {fwd:7.2f} ms   fwd+bwd {both:7.2f} ms   "
              f"bwd {both - fwd:7.2f} ms  ({(both - fwd) / max(fwd, 1e-9):.2f}x fwd)")

    # ---- stage 1: matmul voxelizer VJP (pallas_voxelize custom VJP) ----
    from dcl_net_tpu.ops.pallas_voxelize import pallas_voxelize

    n, grid = 1024, (64, 64, 64)
    pts_feats = jnp.asarray(rng.normal(size=(B, n, 7)), jnp.float32)
    vidx = jnp.asarray(rng.integers(0, 64, size=(B, n, 3)), jnp.int32)

    def vox_one(s, f, vi):
        g, cnt = pallas_voxelize(f * s, vi, grid, mode=4,
                                 out_dtype=jnp.bfloat16)
        return jnp.sum(g.astype(jnp.float32) * 1e-6) + jnp.sum(cnt) * 0.0

    fwd = timeit(amp(vox_one), pts_feats, vidx)
    grad = timeit(amp(lambda s, f, vi: _consume(jax.value_and_grad(
        lambda ff: vox_one(s, ff, vi))(f))), pts_feats, vidx)
    report("voxelize(matmul) VJP", fwd, grad)

    # ---- stage 2: compaction VJP (pallas_dense_to_sparse, level-0 shape) --
    from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse

    d, c, cap, occ = 32, 32, 2048, 700
    mask = np.zeros((B, d, d, d), np.float32)
    for i in range(B):
        p = rng.normal(size=(occ, 3))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        ii = np.clip(((p * 0.4 + 0.5) * d).astype(int), 0, d - 1)
        mask[i, ii[:, 0], ii[:, 1], ii[:, 2]] = 1.0
    grid_feats = jnp.asarray(rng.normal(size=(B, d, d, d, c)), jnp.bfloat16)
    maskj = jnp.asarray(mask)

    def compact_one(s, f, m):
        co, vf, vm = pallas_dense_to_sparse(f * s.astype(f.dtype), m, cap)
        return jnp.sum(vf.astype(jnp.float32) * 1e-6)

    fwd = timeit(amp(compact_one), grid_feats, maskj)
    grad = timeit(amp(lambda s, f, m: _consume(jax.value_and_grad(
        lambda ff: compact_one(s, ff, m))(f))), grid_feats, maskj)
    report("compaction VJP (L0)", fwd, grad)

    # ---- stage 3: fused 3-NN interp VJP (level-0 shape) ----
    from dcl_net_tpu.ops.pallas_interp import pallas_nn_interpolate

    pts = jnp.asarray(rng.normal(size=(B, n, 3)) * 0.05, jnp.float32)
    centers = jnp.asarray(rng.normal(size=(B, cap, 3)) * 0.05, jnp.float32)
    vfeats = jnp.asarray(rng.normal(size=(B, cap, c)), jnp.bfloat16)
    vmask = jnp.asarray((np.arange(cap)[None] < occ).astype(np.float32)
                        * np.ones((B, 1), np.float32))

    def interp_one(s, vf):
        out = pallas_nn_interpolate(pts, centers, vf * s.astype(vf.dtype),
                                    vmask)
        return jnp.sum(out.astype(jnp.float32) * 1e-6)

    fwd = timeit(amp(interp_one), vfeats)
    grad = timeit(amp(lambda s, vf: _consume(jax.value_and_grad(
        lambda ff: interp_one(s, ff))(vf))), vfeats)
    report("pallas interp VJP (L0)", fwd, grad)

    # ---- stage 4: conv1-shaped dense conv grads (the N-limited GEMMs) ----
    inp = jnp.asarray(rng.normal(size=(B, 64, 64, 64, 16)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 32)) * 0.1, jnp.bfloat16)

    def conv_one(s, x, w):
        y = jax.lax.conv_general_dilated(
            x * s.astype(x.dtype), w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    fwd = timeit(amp(conv_one), inp, w)
    grad = timeit(amp(lambda s, x, ww: _consume(jax.value_and_grad(
        lambda p: conv_one(s, p[0], p[1]))((x, ww)))), inp, w)
    report("conv1 16->32 @64^3 grads", fwd, grad)

    # ---- stage 5: whole backbone fwd vs fwd+bwd ----
    from dcl_net_tpu.models.backbone import SparseBackbone

    bb = SparseBackbone(dtype=jnp.bfloat16)
    grid0 = jnp.asarray(rng.normal(size=(B, 64, 64, 64, 7)), jnp.bfloat16)
    m0 = jnp.asarray(
        (rng.random(size=(B, 64, 64, 64)) < 0.02).astype(np.float32))
    bvars = jax.jit(lambda g, m: bb.init(jax.random.PRNGKey(0), g, m, False)
                    )(grid0[:1], m0[:1])

    def bb_one(s, g, m, v):
        out = bb.apply(v, g * s.astype(g.dtype), m, False)
        return sum(jnp.sum(f.astype(jnp.float32) * 1e-6) for f, _ in out)

    # K chained backbone backwards hold K copies of the saved activations
    # (~GBs each at B=128/64^3): amplify less or the chip OOMs
    K_bb = int(os.environ.get("PROF_BB_K", 2))
    fwd = timeit(amp(bb_one, k=K_bb), grid0, m0, bvars)
    grad = timeit(amp(lambda s, g, m, v: _consume(jax.value_and_grad(
        lambda p: bb_one(s, g, m, p))(v)), k=K_bb), grid0, m0, bvars)
    report("backbone (params grad)", fwd, grad, k=K_bb)


if __name__ == "__main__":
    main()
