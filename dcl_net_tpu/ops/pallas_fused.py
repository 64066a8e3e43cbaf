"""Fused stream-compaction -> 3-NN interpolation (Pallas, A/B candidate).

The production eval path runs two Pallas stages per pyramid level
(ops/pallas_compact.py then ops/pallas_interp.py) with an XLA glue pass
between them: split the compaction's raw [B, cap+chunk, C+8] f32 buffer into
vfeats (cast to model dtype), decode the linear-index channels into coords,
build metric voxel centers, and re-feed everything to the interp kernel.
This module's interp kernel consumes the compaction RAW buffer directly:

  - voxel centers are decoded from the lin-index channels IN-KERNEL
    (hi*128+lo -> (i0,i1,i2) -> idx*unit + offset),
  - validity comes from the ones channel,
  - features are the first C columns, cast in VMEM.

That removes the glue pass and one HBM round-trip of the [B, cap, C]
features per level. VERDICT r4 item 7: A/B against the two-stage path
amplified on the real chip (scripts/bench_fused_interp.py) and adopt or
reject on arithmetic.

Differentiable w.r.t. the dense grid features via custom_vjp composing the
two existing backward kernels (interp's transposed one-hot scatter into the
compacted layout, then compaction's transposed copy back onto the grid).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcl_net_tpu.ops.pallas_compact import (
    _interpret,
    _run_bwd,
    compact_raw,
)

_QUERY_TILE = 128
_BIG = 1e10


def _make_fused_kernel(c: int, capacity: int, d12: int, d2: int,
                       unit_s: Tuple[float, float, float],
                       off_c: Tuple[float, float, float]):
    """Interp kernel over the raw compaction buffer.

    Blocks: pts [1, 3, T] f32, raw [1, cap+chunk, C+8] f32 (the WHOLE raw
    buffer — no XLA slice copy; rows >= `capacity` are the last chunk's
    zero tail / overflow spill and are masked out here, exactly matching the
    two-stage path's [:capacity] slice).
    Outputs: out [1, T, C] f32, w/idx [1, 3, T] (VJP residuals).
    unit_s = unit*scale per axis; off_c = offset + 0.5*unit_s per axis
    (ops/sparse_conv.py voxel_centers semantics, incl. the reference's
    scale_lists quirk upstream)."""

    def kernel(pts_ref, raw_ref, out_ref, w_ref, idx_ref):
        pts = pts_ref[0]                                    # [3, T]
        raw = raw_ref[0]                                    # [cap+chunk, C+8]
        row = jax.lax.broadcasted_iota(jnp.int32, (1, raw.shape[0]), 1)
        valid = jnp.where(row < capacity, raw[:, c + 2][None, :], 0.0)
        # lin-index channels -> integer voxel coords -> metric centers.
        # hi/lo are exact integers in f32; do the divmod in int32.
        lin = (raw[:, c] * 128.0 + raw[:, c + 1]).astype(jnp.int32)  # [V]
        i0 = lin // d12
        rem = lin - i0 * d12
        i1 = rem // d2
        i2 = rem - i1 * d2
        ctr = [
            i0.astype(jnp.float32) * unit_s[0] + off_c[0],
            i1.astype(jnp.float32) * unit_s[1] + off_c[1],
            i2.astype(jnp.float32) * unit_s[2] + off_c[2],
        ]                                                   # 3 x [V]

        t = pts.shape[1]
        v = raw.shape[0]
        d2s = jnp.zeros((t, v), jnp.float32)
        for a in range(3):
            diff = pts[a:a + 1, :].T - ctr[a][None, :]      # [T, V]
            d2s = d2s + diff * diff
        d2s = jnp.where(valid > 0.5, d2s, _BIG)

        col = jax.lax.broadcasted_iota(jnp.int32, d2s.shape, 1)
        dists, idxs = [], []
        cur = d2s
        acc = jnp.zeros(d2s.shape, jnp.float32)
        for _ in range(3):
            i = jnp.argmin(cur, axis=1)
            d = jnp.min(cur, axis=1)
            dists.append(d)
            idxs.append(i)
            eq = col == i[:, None]
            acc = acc + jnp.where(eq, (1.0 / (d + 1e-8))[:, None], 0.0)
            cur = jnp.where(eq, _BIG, cur)

        d3 = jnp.stack(dists, axis=0)
        recip = 1.0 / (d3 + 1e-8)
        inv_sum = 1.0 / jnp.sum(recip, axis=0)
        wmat = acc * inv_sum[:, None]                       # [T, V]
        out_ref[0] = jnp.dot(wmat, raw[:, :c],
                             preferred_element_type=jnp.float32)
        w_ref[0] = recip * inv_sum[None, :]
        idx_ref[0] = jnp.stack(idxs, axis=0)

    return kernel


def _run_fused_fwd(points, raw, capacity, c, grid_shape, unit_s, off_c):
    b, n = points.shape[0], points.shape[1]
    tiles = n // _QUERY_TILE
    assert n % _QUERY_TILE == 0, f"N={n} must be a multiple of {_QUERY_TILE}"
    d12 = int(grid_shape[1] * grid_shape[2])
    d2 = int(grid_shape[2])
    pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2)  # [B, 3, N]
    vrows = int(raw.shape[1])  # cap + chunk (whole raw buffer, no slice)
    out, w, idx = pl.pallas_call(
        _make_fused_kernel(c, capacity, d12, d2, unit_s, off_c),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, 3, _QUERY_TILE), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, vrows, c + 8), lambda bi, ti: (bi, 0, 0)),
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
    )(pts_t, raw)
    return out, w, idx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_compact_interpolate(
    feats: jnp.ndarray,      # [B, D0, D1, D2, C] dense grid
    mask: jnp.ndarray,       # [B, D0, D1, D2]
    points: jnp.ndarray,     # [B, N, 3] metric query points
    capacity: int,
    unit_scaled: Sequence[float],   # unit_voxel_extent * level scale
    offset: Sequence[float],        # metric offset of voxel (0,0,0)
) -> jnp.ndarray:
    """Fused dense_to_sparse + voxel_centers + 3-NN interp: [B, N, C].

    Semantically identical to
      coords, vfeats, vmask = pallas_dense_to_sparse(feats, mask, capacity)
      centers = voxel_centers(coords, unit, scale, offset)
      pallas_nn_interpolate(points, centers, vfeats, vmask)
    (ops/sparse_conv.py / ops/pallas_interp.py — the reference pipeline
    Ops_tensor2points + three_nn/three_interpolate, models/Modules.py:
    204-227) with the intermediate split/cast/center XLA pass and the
    [B, cap, C] HBM round-trip removed.
    """
    out, _, _ = _fused_fwd(feats, mask, points, capacity, unit_scaled, offset)
    return out.astype(feats.dtype)


def _fused_fwd(feats, mask, points, capacity, unit_scaled, offset):
    c = feats.shape[-1]
    grid_shape = feats.shape[1:4]
    raw, _cap8 = compact_raw(feats, mask, capacity)
    unit_s = tuple(float(u) for u in unit_scaled)
    off_c = tuple(float(o) + 0.5 * u for o, u in zip(offset, unit_s))
    return _run_fused_fwd(points, raw, capacity, c, grid_shape, unit_s, off_c)


def _vjp_fwd(feats, mask, points, capacity, unit_scaled, offset):
    out, w, idx = _fused_fwd(feats, mask, points, capacity, unit_scaled,
                             offset)
    return out.astype(feats.dtype), (w, idx, mask)


def _vjp_bwd(capacity, unit_scaled, offset, res, g):
    w, idx, mask = res
    feats_dtype = g.dtype  # the forward casts its output to feats.dtype
    b = g.shape[0]
    c = g.shape[-1]
    cap8 = ((capacity + 7) // 8) * 8
    # stage 1: interp backward — transposed weighted one-hot scatter of the
    # query cotangent into the compacted rows (ops/pallas_interp._bwd_kernel)
    from dcl_net_tpu.ops.pallas_interp import _bwd_kernel

    n = w.shape[2]
    tiles = n // _QUERY_TILE
    d_vfeats = pl.pallas_call(
        _bwd_kernel,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, _QUERY_TILE, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 3, _QUERY_TILE), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, 3, _QUERY_TILE), lambda bi, ti: (bi, 0, ti)),
        ],
        out_specs=pl.BlockSpec((1, cap8, c), lambda bi, ti: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, cap8, c), jnp.float32),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(g.astype(jnp.float32), w, idx)
    # stage 2: compaction backward — copy the compacted-row cotangent back
    # onto the dense grid (ops/pallas_compact._run_bwd, capacity=cap8 since
    # d_vfeats already spans the aligned rows)
    feats_shape = tuple(mask.shape) + (c,)
    dfeats = _run_bwd(d_vfeats.astype(feats_dtype), mask, feats_shape,
                      feats_dtype, cap8)
    return dfeats, jnp.zeros_like(mask), None


pallas_compact_interpolate.defvjp(_vjp_fwd, _vjp_bwd)
