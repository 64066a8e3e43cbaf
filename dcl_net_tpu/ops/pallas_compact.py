"""Pallas TPU kernel: stream compaction of occupied voxels from dense grids.

Replaces dense_to_sparse's `top_k` extraction (which full-sorts the
occupancy row, ~16 ms at 32^3/batch-32) plus its row gather (~9 ms) with an
O(G) single pass: for each mask chunk, ranks are computed with a
lower-triangular ones matmul (cumsum is not lowerable on this backend),
occupied rows are compacted through an exact one-hot matmul
(precision=HIGHEST — default MXU bf16 truncation corrupts values), and the
block is stored at a sublane-aligned running offset (unaligned dynamic row
stores miscompile). Alignment gaps hold all-zero rows which the appended
validity channel marks invalid.

Output rows appear in linear-index order (same deterministic order as the
top_k path), interleaved with <=7 zero rows per chunk boundary — consumers
must select by the validity channel, which every masked op here already does.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 512


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _make_kernel(g: int, cap: int, chunk: int):
    def kernel(mask_ref, vals_ref, out_ref):
        # blocks: mask [1, 1, G], vals [1, G, C+2], out [1, cap+chunk, C+2]
        out_ref[:] = jnp.zeros_like(out_ref)
        k = chunk
        lt = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) <=
              jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(jnp.float32)
        out_slot = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)

        def body(c, offset):
            m = mask_ref[0, 0, pl.ds(c * k, k)]
            m2 = m[None, :]
            ranks = jnp.dot(m2, lt, preferred_element_type=jnp.float32)
            ranks_i = ranks.astype(jnp.int32) - 1
            onehot = ((ranks_i == out_slot) & (m2 > 0)).astype(jnp.float32)
            vals = vals_ref[0, pl.ds(c * k, k), :]
            comp = jnp.dot(onehot, vals, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            offset = pl.multiple_of(jnp.minimum(offset, cap), 8)
            out_ref[0, pl.ds(offset, k), :] = comp
            count = jnp.sum(m).astype(jnp.int32)
            return offset + ((count + 7) // 8) * 8
        jax.lax.fori_loop(0, g // k, body, jnp.int32(0))

    return kernel


def _run_fwd(
    feats: jnp.ndarray, mask: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b = feats.shape[0]
    d0, d1, d2 = feats.shape[1:4]
    c = feats.shape[-1]
    g = d0 * d1 * d2
    chunk = min(_CHUNK, g)
    assert g % chunk == 0, f"grid size {g} must be a multiple of {chunk}"
    cap = ((capacity + 7) // 8) * 8

    flat_feats = feats.reshape(b, g, c)
    flat_mask = mask.reshape(b, g).astype(jnp.float32)
    lin = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.float32)[None, :, None], (b, g, 1)
    )
    vals = jnp.concatenate(
        [flat_feats.astype(jnp.float32), lin, jnp.ones((b, g, 1), jnp.float32)],
        axis=-1,
    )  # [B, G, C+2]

    out = pl.pallas_call(
        _make_kernel(g, cap, chunk),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, g), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, g, c + 2), lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cap + chunk, c + 2), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, cap + chunk, c + 2), jnp.float32),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(flat_mask[:, None, :], vals)

    out = out[:, :capacity]
    vfeats = out[..., :c].astype(feats.dtype)
    lin_idx = out[..., c].astype(jnp.int32)
    vmask = (out[..., c + 1] > 0.5).astype(mask.dtype)
    i0 = lin_idx // (d1 * d2)
    rem = lin_idx % (d1 * d2)
    coords = jnp.stack([i0, rem // d2, rem % d2], axis=-1).astype(jnp.int32)
    coords = coords * vmask[..., None].astype(jnp.int32)
    return coords, vfeats, vmask


def _make_bwd_kernel(g: int, cap: int, chunk: int):
    """Mirror of the forward loop: chunk c's compacted rows live at the same
    running offset, so its input-grid gradient is the TRANSPOSED one-hot
    matmul of the output-cotangent slice at that offset. Alignment-gap rows
    (zero one-hot columns) and rows beyond `capacity` (zero-padded cotangent)
    contribute nothing, exactly matching the forward's selection."""

    def kernel(mask_ref, dout_ref, dvals_ref):
        # blocks: mask [1, 1, G], dout [1, cap+chunk, C], dvals [1, G, C]
        k = chunk
        lt = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) <=
              jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(jnp.float32)
        out_slot = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)

        def body(c, offset):
            m = mask_ref[0, 0, pl.ds(c * k, k)]
            m2 = m[None, :]
            ranks = jnp.dot(m2, lt, preferred_element_type=jnp.float32)
            ranks_i = ranks.astype(jnp.int32) - 1
            onehot = ((ranks_i == out_slot) & (m2 > 0)).astype(jnp.float32)
            offset = pl.multiple_of(jnp.minimum(offset, cap), 8)
            gs = dout_ref[0, pl.ds(offset, k), :]
            # dvals[j] = sum_s onehot[s, j] * gs[s]  (contract the slot axis)
            dvals = jax.lax.dot_general(
                onehot, gs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            dvals_ref[0, pl.ds(c * k, k), :] = dvals
            count = jnp.sum(m).astype(jnp.int32)
            return offset + ((count + 7) // 8) * 8
        jax.lax.fori_loop(0, g // k, body, jnp.int32(0))

    return kernel


def _run_bwd(d_vfeats, mask, feats_shape, feats_dtype, capacity):
    b, d0, d1, d2, c = feats_shape
    g = d0 * d1 * d2
    chunk = min(_CHUNK, g)
    cap = ((capacity + 7) // 8) * 8

    flat_mask = mask.reshape(b, g).astype(jnp.float32)
    dout = jnp.zeros((b, cap + chunk, c), jnp.float32)
    dout = dout.at[:, :capacity].set(d_vfeats.astype(jnp.float32))

    dflat = pl.pallas_call(
        _make_bwd_kernel(g, cap, chunk),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, g), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, cap + chunk, c), lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g, c), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, g, c), jnp.float32),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(flat_mask[:, None, :], dout)
    return dflat.reshape(b, d0, d1, d2, c).astype(feats_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_dense_to_sparse(
    feats: jnp.ndarray, mask: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-capacity occupied-voxel extraction, drop-in for
    ops.sparse_conv.dense_to_sparse (same outputs, same deterministic
    linear-index order; padding rows may also appear BETWEEN chunk groups).

    Differentiable w.r.t. `feats` via custom_vjp (backward = the forward's
    transposed one-hot matmul, also Pallas) so the fused interp fast path is
    valid under jax.grad — capability parity with the reference's
    three_interpolate backward (libs/pointnet_sp/src/interpolate_gpu.cu:
    124-146). `mask` (occupancy) is treated as non-differentiable.

    Args:
      feats: [B, D0, D1, D2, C]; mask: [B, D0, D1, D2]; capacity: static V
        (rounded up internally to a multiple of 8).
    Returns:
      coords [B, V, 3] int32, vfeats [B, V, C], vmask [B, V].
    """
    return _run_fwd(feats, mask, capacity)


def _vjp_fwd(feats, mask, capacity):
    out = _run_fwd(feats, mask, capacity)
    return out, mask


def _vjp_bwd(capacity, mask, cots):
    _, d_vfeats, _ = cots  # coords/vmask carry no gradient
    # vfeats was cast to feats.dtype in the forward, so the cotangent carries
    # the primal dtype; the grid shape is the mask's plus the channel axis.
    feats_shape = tuple(mask.shape) + (d_vfeats.shape[-1],)
    dfeats = _run_bwd(d_vfeats, mask, feats_shape, d_vfeats.dtype, capacity)
    return dfeats, jnp.zeros_like(mask)


pallas_dense_to_sparse.defvjp(_vjp_fwd, _vjp_bwd)
