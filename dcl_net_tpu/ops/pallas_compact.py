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


def _make_kernel(g: int, cap: int, chunk: int, exact: bool):
    """exact=True runs the one-hot copy matmul at HIGHEST precision (needed
    when the value channels carry full-f32 payloads); exact=False uses the
    default MXU path (6x fewer passes) — safe when every value channel is
    bf16-representable (bf16-compute features + the split lin hi/lo index
    channels), because one-hot inputs are exact in bf16 and accumulation is
    f32 either way."""
    precision = jax.lax.Precision.HIGHEST if exact else None

    def kernel(mask_ref, feats_ref, aux_ref, out_ref, out_aux_ref):
        # blocks: mask [1, 1, G], feats [1, G, C] (original dtype),
        # aux [1, G, 8] (lin_hi, lin_lo, 1, 0...; shared across batch),
        # out [1, cap+chunk, C] f32, out_aux [1, cap+chunk, 8] f32
        out_ref[:] = jnp.zeros_like(out_ref)
        out_aux_ref[:] = jnp.zeros_like(out_aux_ref)
        k = chunk
        lt = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) <=
              jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(jnp.float32)
        out_slot = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)

        def body(c, offset):
            m = mask_ref[0, 0, pl.ds(c * k, k)]
            count = jnp.sum(m).astype(jnp.int32)
            offset = pl.multiple_of(jnp.minimum(offset, cap), 8)

            # occupancy is ~2% at production shapes, so most chunks carry no
            # voxels at all — skip their matmuls and stores entirely
            @pl.when(count > 0)
            def _():
                m2 = m[None, :]
                # rank accumulation is f32 regardless of input precision
                ranks = jnp.dot(m2, lt, preferred_element_type=jnp.float32)
                ranks_i = ranks.astype(jnp.int32) - 1
                onehot = ((ranks_i == out_slot) & (m2 > 0)).astype(jnp.float32)
                vals = feats_ref[0, pl.ds(c * k, k), :].astype(jnp.float32)
                comp = jnp.dot(onehot, vals, preferred_element_type=jnp.float32,
                               precision=precision)
                aux = aux_ref[0, pl.ds(c * k, k), :]
                comp_aux = jnp.dot(onehot, aux, preferred_element_type=jnp.float32,
                                   precision=precision)
                out_ref[0, pl.ds(offset, k), :] = comp
                out_aux_ref[0, pl.ds(offset, k), :] = comp_aux

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

    flat_feats = feats.reshape(b, g, c)  # original dtype: no f32 copy in HBM
    flat_mask = mask.reshape(b, g).astype(jnp.float32)
    # aux channels, shared across the batch via the BlockSpec index map (one
    # [1, G, 8] array instead of [B, G, k] HBM temps): the linear index is
    # split into bf16-exact halves (each <= max(G//128, 127) <= 255 for
    # G <= 32768) so the default-precision MXU copy reproduces it exactly.
    lin_i = jnp.arange(g, dtype=jnp.int32)
    aux = jnp.stack(
        [
            (lin_i // 128).astype(jnp.float32),
            (lin_i % 128).astype(jnp.float32),
            jnp.ones((g,), jnp.float32),
        ] + [jnp.zeros((g,), jnp.float32)] * 5,
        axis=-1,
    )[None]  # [1, G, 8]
    # default MXU precision truncates the copied values to bf16: exact when
    # the features themselves are bf16-representable (bf16 compute dtype),
    # otherwise run the copy at HIGHEST. lin_hi exceeds bf16's exact-integer
    # range (255) for g > 32768 — force exact there too.
    exact = (feats.dtype != jnp.bfloat16) or g > 32768

    out, out_aux = pl.pallas_call(
        _make_kernel(g, cap, chunk, exact),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, g), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, g, c), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, g, 8), lambda bi: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cap + chunk, c), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, cap + chunk, 8), lambda bi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cap + chunk, c), jnp.float32),
            jax.ShapeDtypeStruct((b, cap + chunk, 8), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(flat_mask[:, None, :], flat_feats, aux)

    vfeats = out[:, :capacity].astype(feats.dtype)
    out_aux = out_aux[:, :capacity]
    lin_idx = (out_aux[..., 0] * 128.0 + out_aux[..., 1]).astype(jnp.int32)
    vmask = (out_aux[..., 2] > 0.5).astype(mask.dtype)
    i0 = lin_idx // (d1 * d2)
    rem = lin_idx % (d1 * d2)
    coords = jnp.stack([i0, rem // d2, rem % d2], axis=-1).astype(jnp.int32)
    coords = coords * vmask[..., None].astype(jnp.int32)
    return coords, vfeats, vmask


def _make_bwd_kernel(g: int, cap: int, chunk: int, exact: bool):
    """Mirror of the forward loop: chunk c's compacted rows live at the same
    running offset, so its input-grid gradient is the TRANSPOSED one-hot
    matmul of the output-cotangent slice at that offset. Alignment-gap rows
    (zero one-hot columns) and rows beyond `capacity` (zero-padded cotangent)
    contribute nothing, exactly matching the forward's selection.

    exact: HIGHEST-precision scatter of f32 cotangents (f32 training);
    default MXU precision otherwise (bf16 training — cotangents are bf16)."""
    precision = jax.lax.Precision.HIGHEST if exact else None

    def kernel(mask_ref, dout_ref, dvals_ref):
        # blocks: mask [1, 1, G], dout [1, cap+chunk, C], dvals [1, G, C]
        dvals_ref[:] = jnp.zeros_like(dvals_ref)
        k = chunk
        lt = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) <=
              jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)).astype(jnp.float32)
        out_slot = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)

        def body(c, offset):
            m = mask_ref[0, 0, pl.ds(c * k, k)]
            count = jnp.sum(m).astype(jnp.int32)
            offset = pl.multiple_of(jnp.minimum(offset, cap), 8)

            @pl.when(count > 0)  # empty chunks keep their zero gradient
            def _():
                m2 = m[None, :]
                ranks = jnp.dot(m2, lt, preferred_element_type=jnp.float32)
                ranks_i = ranks.astype(jnp.int32) - 1
                onehot = ((ranks_i == out_slot) & (m2 > 0)).astype(jnp.float32)
                gs = dout_ref[0, pl.ds(offset, k), :]
                # dvals[j] = sum_s onehot[s, j] * gs[s] (contract the slot axis)
                dvals = jax.lax.dot_general(
                    onehot, gs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                dvals_ref[0, pl.ds(c * k, k), :] = dvals

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
        _make_bwd_kernel(g, cap, chunk, exact=d_vfeats.dtype != jnp.bfloat16),
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
