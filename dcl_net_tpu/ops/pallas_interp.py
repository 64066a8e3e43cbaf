"""Pallas TPU kernel: fused masked 3-NN inverse-distance interpolation.

Production fast path for Ops_nearest_neighbor_interpolate (reference
models/Modules.py:213-227 backed by the pointnet_sp CUDA kernels,
libs/pointnet_sp/src/interpolate_gpu.cu:9-146). Replaces the XLA composition
  dist matrix [B, N, V] in HBM -> 3x argmin passes -> row gather
with one kernel per (batch, query-tile) that keeps everything in VMEM:

  - squared distances for a query tile against all V refs,
  - masked iterated argmin for the exact top-3 (ties -> lowest index,
    matching the CUDA scan order),
  - neighbor-feature extraction as one-hot matmuls on the MXU (no gathers —
    TPU scalar gathers are slow),
  - inverse-SQUARED-distance weighting (1/(d2+1e-8), the reference quirk).

Differentiable w.r.t. ref features via custom_vjp (the backward scatter is
the transposed one-hot matmul, also Pallas). Gradients w.r.t. coordinates are
not needed by DCL-Net (interpolation coordinates are data, not activations).

Layout note: coordinates are carried as [B, 3, N] / [B, 3, V] and the saved
weights/indices as [B, 3, N] — every in-kernel array is 2-D with a wide
trailing dim. Arrays with a size-3 trailing dim ([N, 3] blocks, K=3 matmuls)
stall this backend's Mosaic compiler indefinitely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QUERY_TILE = 128
_BIG = 1e10


def _interpret() -> bool:
    # CPU (tests / debugging) runs the kernels in interpreter mode.
    return jax.default_backend() == "cpu"


def _fwd_kernel(pts_ref, ctr_ref, feats_ref, mask_ref, out_ref, w_ref, idx_ref):
    # blocks: pts [1,3,T], ctr [1,3,V], feats [1,V,C], mask [1,1,V]
    pts = pts_ref[0]                                   # [3, T]
    ctr = ctr_ref[0]                                   # [3, V]
    valid = mask_ref[0]                                # [1, V]

    t = pts.shape[1]
    v = ctr.shape[1]
    d2 = jnp.zeros((t, v), jnp.float32)
    for a in range(3):
        diff = pts[a:a + 1, :].T - ctr[a:a + 1, :]     # [T, 1] - [1, V]
        d2 = d2 + diff * diff
    d2 = jnp.where(valid > 0, d2, _BIG)                # [T, V]

    # Iterated argmin top-3; the per-k one-hot mask (col == i) is REUSED for
    # both knocking the found minimum out of `cur` and accumulating the
    # reciprocal-weighted selection matrix, so the selection needs one [T,V]
    # compare per neighbor instead of two. acc = sum_k onehot_k/(d_k+eps);
    # wmat = acc / rowsum(recip) == the sum of weighted one-hots (the three
    # indices are distinct), feeding ONE MXU dot.
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    dists, idxs = [], []
    cur = d2
    acc = jnp.zeros(d2.shape, jnp.float32)             # [T, V]
    for _ in range(3):
        i = jnp.argmin(cur, axis=1)                    # [T]
        d = jnp.min(cur, axis=1)
        dists.append(d)
        idxs.append(i)
        eq = col == i[:, None]                         # [T, V] one-hot
        acc = acc + jnp.where(eq, (1.0 / (d + 1e-8))[:, None], 0.0)
        cur = jnp.where(eq, _BIG, cur)

    d3 = jnp.stack(dists, axis=0)                      # [3, T]
    recip = 1.0 / (d3 + 1e-8)
    inv_sum = 1.0 / jnp.sum(recip, axis=0)             # [T]
    weight = recip * inv_sum[None, :]

    feats = feats_ref[0]                               # [V, C]
    wmat = acc * inv_sum[:, None]                      # [T, V]
    out_ref[0] = jnp.dot(wmat, feats, preferred_element_type=jnp.float32)
    w_ref[0] = weight                                  # [3, T]
    idx_ref[0] = jnp.stack(idxs, axis=0)               # [3, T]


def _bwd_kernel(g_ref, w_ref, idx_ref, dfeats_ref):
    # dfeats[v] = sum_t sum_k 1[idx[k,t]==v] * w[k,t] * g[t]
    # = (sum_k weighted one-hot)^T @ g — one MXU dot, like the forward
    g = g_ref[0]                                       # [T, C]
    w = w_ref[0]                                       # [3, T]
    idx = idx_ref[0]                                   # [3, T]
    v = dfeats_ref.shape[1]
    colv = jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], v), 1)
    wmat = jnp.zeros((g.shape[0], v), jnp.float32)     # [T, V]
    for k in range(3):
        wmat = wmat + jnp.where(
            colv == idx[k, :][:, None], w[k, :][:, None], 0.0
        )
    acc = jax.lax.dot_general(
        wmat, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [V, C]
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        dfeats_ref[0] = jnp.zeros(dfeats_ref.shape[1:], jnp.float32)

    dfeats_ref[0] += acc


def _run_fwd(points, centers, feats, mask):
    b, n, _ = points.shape
    v, c = feats.shape[1], feats.shape[2]
    tiles = n // _QUERY_TILE
    assert n % _QUERY_TILE == 0, f"N={n} must be a multiple of {_QUERY_TILE}"
    # the kernels are written for f32 blocks; cast at the boundary (callers
    # may run the feature path in bf16)
    points = points.astype(jnp.float32)
    centers = centers.astype(jnp.float32)
    feats = feats.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    pts_t = jnp.swapaxes(points, 1, 2)                 # [B, 3, N]
    ctr_t = jnp.swapaxes(centers, 1, 2)                # [B, 3, V]
    out, w, idx = pl.pallas_call(
        _fwd_kernel,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, 3, _QUERY_TILE), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, 3, v), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, v, c), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, 1, v), lambda bi, ti: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _QUERY_TILE, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 3, _QUERY_TILE), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, 3, _QUERY_TILE), lambda bi, ti: (bi, 0, ti)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, n), jnp.int32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pts_t, ctr_t, feats, mask[:, None, :])
    return out, w, idx


@jax.custom_vjp
def pallas_nn_interpolate(points, centers, feats, mask):
    """Fused 3-NN interpolation: [B,N,3] x ([B,V,3],[B,V,C],[B,V]) -> [B,N,C].

    Output dtype follows `feats` (the kernel computes in f32 internally)."""
    out, _, _ = _run_fwd(points, centers, feats, mask)
    return out.astype(feats.dtype)


def _vjp_fwd(points, centers, feats, mask):
    out, w, idx = _run_fwd(points, centers, feats, mask)
    return out.astype(feats.dtype), (w, idx, feats.shape)


def _vjp_bwd(res, g):
    w, idx, feats_shape = res
    b, v, c = feats_shape
    n = w.shape[2]
    tiles = n // _QUERY_TILE
    out_dtype = g.dtype  # == feats dtype (the forward casts its output)
    g = g.astype(jnp.float32)
    dfeats = pl.pallas_call(
        _bwd_kernel,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, _QUERY_TILE, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 3, _QUERY_TILE), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, 3, _QUERY_TILE), lambda bi, ti: (bi, 0, ti)),
        ],
        out_specs=pl.BlockSpec((1, v, c), lambda bi, ti: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, v, c), jnp.float32),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(g, w, idx)
    return None, None, dfeats.astype(out_dtype), None


pallas_nn_interpolate.defvjp(_vjp_fwd, _vjp_bwd)
