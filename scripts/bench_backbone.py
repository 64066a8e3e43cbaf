"""Per-layer backbone timing on the real TPU (finds where the 86 ms goes).

Times nested prefixes of the conv stack at the production eval shape
(B=256, 64^3 grid, bf16). Also A/B's a few XLA-level variants for the
first (small-channel) convs.

Usage: python scripts/bench_backbone.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from dcl_net_tpu.models.backbone import SparseBackbone
    from dcl_net_tpu.models.blocks import SparseConvBlock
    from dcl_net_tpu.ops.sparse_conv import sparse_avg_pool

    b, d = 256, 64
    rng = np.random.default_rng(0)
    # clustered occupancy like real data (sphere surface), ~1000 voxels
    mask = np.zeros((b, d, d, d), np.float32)
    for i in range(b):
        pts = rng.normal(size=(1000, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        idx = np.clip(((pts * 0.35 + 0.5) * d).astype(int), 0, d - 1)
        mask[i, idx[:, 0], idx[:, 1], idx[:, 2]] = 1.0
    grid = rng.normal(size=(b, d, d, d, 7)).astype(np.float32) * mask[..., None]
    grid_j = jnp.asarray(grid)
    mask_j = jnp.asarray(mask)

    bb = SparseBackbone(dtype=jnp.bfloat16)
    vs = jax.jit(
        lambda g, m: bb.init(jax.random.PRNGKey(0), g, m, False)
    )(grid_j, mask_j)

    def timeit(f, *args, iters=10):
        r = f(*args)
        _ = np.asarray(r)
        _ = np.asarray(f(*args))
        t0 = time.perf_counter()
        prev = f(*args)
        for _i in range(iters - 1):
            cur = f(*args)
            _ = np.asarray(prev)
            prev = cur
        _ = np.asarray(prev)
        return (time.perf_counter() - t0) / iters * 1000

    # prefix timings through the real module
    import flax.linen as nn

    class Prefix(SparseBackbone):
        n_layers: int = 1

        @nn.compact
        def __call__(self, g, m, train):
            module_end = set(self.stride_layers) | {len(self.dims) - 2}
            x = g
            for i in range(self.n_layers):
                subm = not ((i - 1) in self.stride_layers or i == 0)
                x, m = SparseConvBlock(
                    features=self.dims[i + 1], kernel_size=self.kernel_size,
                    subm=subm, dtype=self.dtype, name=f"conv{i}",
                )(x, m, train)
                if i in module_end:
                    x, m = sparse_avg_pool(x, m, self.kernel_size, 2)
            return x.astype(jnp.float32).sum()[None]

    prev_t = 0.0
    for n in range(1, 9):
        pf = Prefix(dtype=jnp.bfloat16, n_layers=n)
        pv = jax.jit(lambda g, m: pf.init(jax.random.PRNGKey(0), g, m, False))(grid_j, mask_j)
        fn = jax.jit(lambda v, g, m: pf.apply(v, g, m, False))
        t = timeit(fn, pv, grid_j, mask_j)
        print(f"layers<= {n}: {t:7.1f} ms  (+{t - prev_t:6.1f})", flush=True)
        prev_t = t

    # ---- raw conv variants for conv0 (7 -> 16 at 64^3) ----
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 7, 16)).astype(np.float32))
    gb = grid_j.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def conv_ndhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).sum()[None]

    print(f"conv0 bf16 NDHWC : {timeit(jax.jit(conv_ndhwc), gb, wb):7.1f} ms")
    print(f"conv0 f32  NDHWC : {timeit(jax.jit(conv_ndhwc), grid_j, w):7.1f} ms")

    # channels-first
    gc = jnp.transpose(gb, (0, 4, 1, 2, 3))
    wc = jnp.transpose(wb, (4, 3, 0, 1, 2))  # OIDHW

    def conv_ncdhw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        ).sum()[None]

    print(f"conv0 bf16 NCDHW : {timeit(jax.jit(conv_ncdhw), gc, wc):7.1f} ms")

    # both module-1 convs back to back (7->16->32), the suspected hot pair
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 32)).astype(np.float32), jnp.bfloat16)

    def convpair(x, w, w2):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = jnp.maximum(y, 0)
        z = jax.lax.conv_general_dilated(
            y, w2, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return z.sum()[None]

    print(f"conv0+1 bf16     : {timeit(jax.jit(convpair), gb, wb, w2):7.1f} ms")

    # dispatch floor + pure-matmul probes of the convs' GEMM shapes:
    # conv-as-im2col is [B*D^3, 27*Cin] @ [27*Cin, Cout]. If these matmuls hit
    # much higher MFU than the convs, XLA's conv algorithm is the problem; if
    # they match, small-Cout MXU underutilization is fundamental.
    floor = timeit(jax.jit(lambda x: (x * 1.0001).sum()[None]), jnp.ones((8, 128)))
    print(f"dispatch floor   : {floor:7.1f} ms")

    for (mm, kk, nn, label, gf) in [
        (1 << 22, 192, 16, "conv0-GEMM", 2 * (1 << 22) * 192 * 16 * 16),
        (1 << 22, 432, 32, "conv1-GEMM", 2 * (1 << 22) * 432 * 32 * 16),
        (1 << 22, 432, 128, "N=128-GEMM", 2 * (1 << 22) * 432 * 128 * 16),
    ]:
        a = jnp.asarray(rng.normal(size=(mm, kk)), jnp.bfloat16)
        ws = [jnp.asarray(rng.normal(size=(kk, nn)), jnp.bfloat16)
              for _ in range(16)]

        def mk(a, *ws):
            return sum(jnp.dot(a, w).astype(jnp.float32).sum() for w in ws)[None]

        t = timeit(jax.jit(mk), a, *ws, iters=5)
        eff = gf / ((t - floor) / 1000) / 1e12
        print(f"{label}: {t:7.1f} ms total -> {(t - floor) / 16:.2f} ms/matmul, "
              f"{eff:.0f} TF/s eff", flush=True)


if __name__ == "__main__":
    main()
