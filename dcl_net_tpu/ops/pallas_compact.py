"""Pallas TPU kernel: stream compaction of occupied voxels from dense grids.

Replaces dense_to_sparse's `top_k` extraction (which full-sorts the
occupancy row, ~16 ms at 32^3/batch-32) plus its row gather (~9 ms) with an
O(G) pass: for each mask chunk, occupied rows are compacted through an exact
one-hot matmul and the block is stored at a sublane-aligned chunk offset
(unaligned dynamic row stores miscompile). Alignment gaps hold all-zero rows
which the appended validity channel marks invalid.

Everything the kernel needs besides the copy itself is precomputed OUTSIDE
by plain XLA ([B, n_chunks]/[B, G]-sized reductions, negligible):
  - chunk offsets (exclusive prefix sum of 8-aligned per-chunk counts),
    fed through scalar prefetch, so the grid iterates chunks with no serial
    offset dependence and Mosaic pipelines the (batch, chunk) grid;
  - chunk-local exclusive ranks (a cumsum — not lowerable INSIDE the kernel
    on this backend, cheap outside), so the kernel builds its one-hot from
    one iota compare instead of a lower-triangular ones matmul whose M=1
    shape was pure MXU latency.
The value channels and the aux channels (linear index + validity) ride ONE
fused [chunk, C+8] copy matmul (in-VMEM concat): C+8 still fits the same
number of 128-lane MXU passes as C alone, so the old separate aux matmul
(a full extra pass set) is free now. Serial-fori form of this kernel
measured ~28 ms at B=256 level-0 shapes; this form ~13 ms.

Output rows appear in linear-index order (same deterministic order as the
top_k path), interleaved with <=7 zero rows per chunk boundary — consumers
must select by the validity channel, which every masked op here already does.
TPU grid steps execute in row-major order, so a later chunk's full-block
store overwrites only the zero tail of the previous chunk's store, exactly
as the serial loop did.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# chunk-size knob for perf sweeps (scripts/bench_vox_variants.py); Mosaic
# requires 128-divisible trailing block dims, and grids smaller than the
# chunk fall back to chunk=g (always a power of two here)
_CHUNK = int(os.environ.get("DCLX_COMPACT_CHUNK", 512))
if _CHUNK % 128 != 0 or _CHUNK <= 0:
    raise ValueError(
        f"DCLX_COMPACT_CHUNK={_CHUNK} must be a positive multiple of 128 "
        "(Mosaic 128-lane trailing-dim constraint)")


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _chunk_offsets(flat_mask: jnp.ndarray, chunk: int, cap: int):
    """Per-chunk occupancy counts and exclusive 8-aligned prefix offsets.

    Plain XLA reductions ([B, n_chunks]-sized, negligible next to the kernel);
    reproduces the serial loop's running-offset arithmetic exactly:
    offset_c = min(sum_{c'<c} align8(count_c'), cap), already 8-aligned
    because cap is."""
    b, g = flat_mask.shape
    n_chunks = g // chunk
    by_chunk = flat_mask.reshape(b, n_chunks, chunk)
    counts = by_chunk.sum(-1).astype(jnp.int32)
    pad8 = ((counts + 7) // 8) * 8
    offsets = jnp.minimum(jnp.cumsum(pad8, axis=1) - pad8, cap)
    # chunk-local exclusive rank of every cell (occupied cells only are
    # meaningful); f32 is exact for any chunk <= 2^24
    ranks = (jnp.cumsum(by_chunk, axis=-1) - by_chunk).reshape(b, g)
    return counts, offsets, ranks


def _make_kernel(chunk: int, exact: bool):
    """exact=True runs the one-hot copy matmul at HIGHEST precision (needed
    when the value channels carry full-f32 payloads); exact=False uses the
    default MXU path (6x fewer passes) — safe when every value channel is
    bf16-representable (bf16-compute features + the split lin hi/lo index
    channels), because one-hot inputs are exact in bf16 and accumulation is
    f32 either way."""
    precision = jax.lax.Precision.HIGHEST if exact else None

    def kernel(counts_ref, offsets_ref, mask_ref, ranks_ref, feats_ref,
               aux_ref, out_ref):
        # scalar prefetch: counts/offsets [B, n_chunks] int32 (SMEM);
        # blocks: mask/ranks [1, 1, chunk], feats [1, chunk, C] (original
        # dtype), aux [1, chunk, 8] (lin_hi, lin_lo, 1, 0...; shared across
        # batch), out [1, cap+chunk, C+8] f32 (revisited across the chunk
        # axis of the grid; zeroed on the first step).
        bi = pl.program_id(0)
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        count = counts_ref[bi, ci]
        offset = pl.multiple_of(offsets_ref[bi, ci], 8)
        k = chunk

        # occupancy is ~2% at production shapes, so most chunks carry no
        # voxels at all — skip their matmuls and stores entirely
        @pl.when(count > 0)
        def _():
            m2 = mask_ref[0, 0, :][None, :]
            r2 = ranks_ref[0, 0, :][None, :].astype(jnp.int32)
            out_slot = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            onehot = ((r2 == out_slot) & (m2 > 0)).astype(jnp.float32)
            vals = jnp.concatenate(
                [feats_ref[0].astype(jnp.float32), aux_ref[0]], axis=1)
            comp = jnp.dot(onehot, vals, preferred_element_type=jnp.float32,
                           precision=precision)
            out_ref[0, pl.ds(offset, k), :] = comp

    return kernel


def compact_raw(
    feats: jnp.ndarray, mask: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, int]:
    """The compaction kernel's raw output [B, cap+chunk, C+8] f32 (channels:
    C features, lin_hi, lin_lo, valid, 0*5) plus the 8-aligned cap. Shared by
    _run_fwd (which decodes/splits it in XLA) and the fused single-stage
    variant (ops/pallas_fused.py, which consumes it in-kernel) so the two
    paths can never diverge in compaction semantics."""
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

    counts, offsets, ranks = _chunk_offsets(flat_mask, chunk, cap)
    out = pl.pallas_call(
        _make_kernel(chunk, exact),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, g // chunk),
            in_specs=[
                pl.BlockSpec((1, 1, chunk), lambda bi, ci, *_: (bi, 0, ci)),
                pl.BlockSpec((1, 1, chunk), lambda bi, ci, *_: (bi, 0, ci)),
                pl.BlockSpec((1, chunk, c), lambda bi, ci, *_: (bi, ci, 0)),
                pl.BlockSpec((1, chunk, 8), lambda bi, ci, *_: (0, ci, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, cap + chunk, c + 8), lambda bi, ci, *_: (bi, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, cap + chunk, c + 8), jnp.float32),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(counts, offsets, flat_mask[:, None, :], ranks[:, None, :],
      flat_feats, aux)
    return out, cap


def capacity_overflow(mask: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """[B] bool: True where the ALIGNED chunk layout drops occupied voxels.

    The kernel stores each non-empty chunk at an 8-aligned running offset, so
    a sample can lose voxels even when its raw occupancy is <= capacity (up
    to 7 wasted slots per non-empty chunk). A chunk's rows are dropped iff
    its unclamped aligned prefix offset + its count exceeds `capacity` —
    exact for clamped offsets too, since a clamped chunk starts at
    cap >= capacity and always drops. This is the overflow predicate the
    model's per-sample overflow flag uses on the Pallas interp paths
    (models/backbone.py); the XLA dense_to_sparse path keeps the plain
    occupancy > capacity test."""
    b = mask.shape[0]
    flat = mask.reshape(b, -1).astype(jnp.float32)
    g = flat.shape[1]
    chunk = min(_CHUNK, g)
    n_chunks = g // chunk
    counts = flat.reshape(b, n_chunks, chunk).sum(-1).astype(jnp.int32)
    pad8 = ((counts + 7) // 8) * 8
    prefix = jnp.cumsum(pad8, axis=1) - pad8  # unclamped aligned offsets
    end = jnp.where(counts > 0, prefix + counts, 0)
    return jnp.max(end, axis=1) > capacity


def _run_fwd(
    feats: jnp.ndarray, mask: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    d0, d1, d2 = feats.shape[1:4]
    c = feats.shape[-1]
    out, _cap8 = compact_raw(feats, mask, capacity)
    vfeats = out[:, :capacity, :c].astype(feats.dtype)
    out_aux = out[:, :capacity, c:]
    lin_idx = (out_aux[..., 0] * 128.0 + out_aux[..., 1]).astype(jnp.int32)
    vmask = (out_aux[..., 2] > 0.5).astype(mask.dtype)
    i0 = lin_idx // (d1 * d2)
    rem = lin_idx % (d1 * d2)
    coords = jnp.stack([i0, rem // d2, rem % d2], axis=-1).astype(jnp.int32)
    coords = coords * vmask[..., None].astype(jnp.int32)
    return coords, vfeats, vmask


def _make_bwd_kernel(chunk: int, exact: bool):
    """Mirror of the forward: chunk c's compacted rows live at the same
    prefetched offset, so its input-grid gradient is the TRANSPOSED one-hot
    matmul of the output-cotangent slice at that offset. Alignment-gap rows
    (zero one-hot columns) and rows beyond `capacity` (zero-padded cotangent)
    contribute nothing, exactly matching the forward's selection.

    exact: HIGHEST-precision scatter of f32 cotangents (f32 training);
    default MXU precision otherwise (bf16 training — cotangents are bf16)."""
    precision = jax.lax.Precision.HIGHEST if exact else None

    def kernel(counts_ref, offsets_ref, mask_ref, ranks_ref, dout_ref,
               dvals_ref):
        # blocks: mask/ranks [1, 1, chunk], dout [1, cap+chunk, C] (whole
        # block, sliced dynamically), dvals [1, chunk, C] (one store per step)
        bi = pl.program_id(0)
        ci = pl.program_id(1)
        count = counts_ref[bi, ci]
        offset = pl.multiple_of(offsets_ref[bi, ci], 8)
        k = chunk

        @pl.when(count == 0)  # empty chunks carry zero gradient
        def _():
            dvals_ref[:] = jnp.zeros_like(dvals_ref)

        @pl.when(count > 0)
        def _():
            m2 = mask_ref[0, 0, :][None, :]
            r2 = ranks_ref[0, 0, :][None, :].astype(jnp.int32)
            out_slot = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            onehot = ((r2 == out_slot) & (m2 > 0)).astype(jnp.float32)
            gs = dout_ref[0, pl.ds(offset, k), :]
            # dvals[j] = sum_s onehot[s, j] * gs[s] (contract the slot axis);
            # rows of gs beyond this chunk's count have all-zero one-hot
            # columns, so reading into the next chunk's region is harmless
            dvals = jax.lax.dot_general(
                onehot, gs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            dvals_ref[0] = dvals

    return kernel


def _run_bwd(d_vfeats, mask, feats_shape, feats_dtype, capacity):
    b, d0, d1, d2, c = feats_shape
    g = d0 * d1 * d2
    chunk = min(_CHUNK, g)
    cap = ((capacity + 7) // 8) * 8

    flat_mask = mask.reshape(b, g).astype(jnp.float32)
    dout = jnp.zeros((b, cap + chunk, c), jnp.float32)
    dout = dout.at[:, :capacity].set(d_vfeats.astype(jnp.float32))

    counts, offsets, ranks = _chunk_offsets(flat_mask, chunk, cap)
    dflat = pl.pallas_call(
        _make_bwd_kernel(chunk, exact=d_vfeats.dtype != jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, g // chunk),
            in_specs=[
                pl.BlockSpec((1, 1, chunk), lambda bi, ci, *_: (bi, 0, ci)),
                pl.BlockSpec((1, 1, chunk), lambda bi, ci, *_: (bi, 0, ci)),
                pl.BlockSpec((1, cap + chunk, c), lambda bi, ci, *_: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, chunk, c), lambda bi, ci, *_: (bi, ci, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, c), jnp.float32),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(counts, offsets, flat_mask[:, None, :], ranks[:, None, :], dout)
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

    Capacity semantics: the 8-aligned per-chunk layout wastes up to 7 slots
    per NON-EMPTY chunk, so the worst-case effective capacity is
    `capacity - 7 * min(n_nonempty_chunks, G/chunk)` (uniformly scattered
    single-voxel chunks consume 8 slots each). Size capacity accordingly:
    at the production pyramid shapes the waste bound is <=7*G/512 (448 at
    level 0) on top of the measured occupancy, well inside the defaults
    (models/dcl_net.py capacities). :func:`capacity_overflow` is the exact
    per-sample "did this layout drop voxels" predicate — the model's
    overflow flag uses it on this path (models/backbone.py).

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
