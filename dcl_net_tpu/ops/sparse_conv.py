"""Sparse-3D-conv semantics on dense masked grids (TPU-native).

Replaces the reference's spconv engine (gather->GEMM->scatter rulebook loop,
reference libs/spconv/include/spconv/spconv_ops.h:253-349, rulebook build
:27-137) with an equivalent formulation that XLA maps straight onto the MXU.

Key observation: DCL-Net's grid is only 64^3 and shrinks 2x per stage, so the
sparse gather/GEMM/scatter machinery can be expressed EXACTLY on dense grids:

- SubMConv3d (submanifold): output active set == input active set; inactive
  inputs contribute zeros. Dense equivalent: conv over (features * mask) then
  multiply the output by the input mask.
- SparseConv3d stride 1 pad k//2: output active set = kernel-dilation of the
  input active set (reference geometry.h:23-87 output-position enumeration).
  Dense equivalent: conv over masked features; new mask = dilate(mask).
- SparseAvgPool3d(use_gs=False): per-output true average over the *occupied*
  voxels in the receptive field — reference's custom indiceSummaryRF +
  indiceAvgPool (libs/spconv/include/spconv/pool_ops.h:141-246,
  src/spconv/avgpool.cu:27-59, summaryRF.cu:26-68). Dense equivalent:
  sum-pool(features) / sum-pool(mask), output mask = sum-pool(mask) > 0.
- BatchNorm1d over the [M, C] sparse feature rows = masked batch norm whose
  statistics run over occupied voxels only (see masked_batch_norm_stats).

Everything here is functional; the parameterized layers live in
dcl_net_tpu/models/blocks.py. (A Pallas gather-GEMM sparse-conv variant was
prototyped and REJECTED on measurement — the XLA row-gather costs more than
the dense convs it would replace at this occupancy; see docs/PERF.md.)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv_window_sum(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """Window sum via three SEPARABLE strided 1-D depthwise convs.

    A k^3 box sum is a composition of three k-tap sums, one per axis, each
    with that axis's stride and zero padding — exactly equal to the single
    k^3 depthwise conv (sums of sums; zero padding per axis composes).
    Depthwise convs never touch the MXU on this backend, so tap count is the
    cost driver: 3x3 taps instead of 27, and striding each axis in its own
    pass shrinks the intermediate volume 2x per pass (the 64^3 pool measured
    ~26 ms as one 27-tap conv, ~7 ms separable at B=256). Differentiability
    is preserved (still plain convs).
    x: [B, D0, D1, D2, C].
    """
    c = x.shape[-1]
    # TPU convs truncate f32 inputs to bf16 at default precision; three
    # chained passes would compound that, so f32 callers (the exact path and
    # all mask/count sums — though 0/1 counts are bf16-exact anyway) run at
    # HIGHEST. bf16 feature compute keeps the fast default.
    precision = (jax.lax.Precision.HIGHEST
                 if x.dtype == jnp.float32 else None)
    for axis in range(3):
        kshape = [1, 1, 1]
        kshape[axis] = kernel
        strides = [1, 1, 1]
        strides[axis] = stride
        pads = [(0, 0)] * 3
        pads[axis] = (padding, padding)
        w = jnp.ones((*kshape, 1, c), x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, tuple(strides), pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
            precision=precision,
        )
    return x


def dilate_mask(mask: jnp.ndarray, kernel: int = 3, stride: int = 1, padding: int | None = None) -> jnp.ndarray:
    """Kernel-footprint dilation of an occupancy mask [B, D0, D1, D2].

    Equals the active-output-site enumeration of a regular sparse conv
    (reference geometry.h:23-87 getValidOutPos with stride 1, pad k//2).
    """
    if padding is None:
        padding = kernel // 2
    s = _conv_window_sum(mask[..., None].astype(jnp.float32), kernel, stride, padding)
    return (s[..., 0] > 0).astype(mask.dtype)


def sparse_avg_pool(
    feats: jnp.ndarray, mask: jnp.ndarray, kernel: int = 3, stride: int = 2, padding: int | None = None,
    use_gs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """True-average sparse pooling (ref pool_ops.h:173-246 indiceAvgPool).

    Args:
      feats: [B, D, D, D, C] features (zero at unoccupied voxels).
      mask: [B, D, D, D] occupancy (1.0/0.0).
      use_gs: if True divide by the full kernel volume ("global size"), else by
        the occupied count in the receptive field (DCL-Net uses False,
        reference models/Modules.py:151).

    Returns:
      pooled feats [B, D', D', D', C] and pooled mask [B, D', D', D'].
    """
    if padding is None:
        padding = kernel // 2
    m = mask.astype(feats.dtype)
    s = _conv_window_sum(feats * m[..., None], kernel, stride, padding)
    cnt = _conv_window_sum(m[..., None], kernel, stride, padding)[..., 0]
    new_mask = (cnt > 0).astype(mask.dtype)
    if use_gs:
        denom = jnp.asarray(kernel ** 3, feats.dtype)
        out = s / denom
    else:
        out = s / jnp.maximum(cnt, 1.0)[..., None]
    return out * new_mask[..., None].astype(feats.dtype), new_mask


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _ref_max_pool(feats, mask, kernel, stride, padding, zero_init):
    m = mask.astype(feats.dtype)
    # -inf (not finfo.min): XLA only recognizes the differentiable
    # select-and-scatter max-pool pattern with a -inf init
    neg = -jnp.inf
    guarded = jnp.where(m[..., None] > 0, feats, neg)
    pooled = jax.lax.reduce_window(
        guarded,
        jnp.asarray(neg, feats.dtype),
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, kernel, 1),
        window_strides=(1, stride, stride, stride, 1),
        padding=[(0, 0)] + [(padding, padding)] * 3 + [(0, 0)],
    )
    if zero_init:
        pooled = jnp.maximum(pooled, 0.0)
    cnt = _conv_window_sum(m[..., None], kernel, stride, padding)[..., 0]
    new_mask = (cnt > 0).astype(mask.dtype)
    return jnp.where(new_mask[..., None] > 0, pooled, 0.0), new_mask


def _ref_max_pool_fwd(feats, mask, kernel, stride, padding, zero_init):
    out, new_mask = _ref_max_pool(feats, mask, kernel, stride, padding,
                                  zero_init)
    return (out, new_mask), (feats, mask, out, new_mask)


def _ref_max_pool_bwd(kernel, stride, padding, zero_init, res, cts):
    """Reference-exact gradient routing (maxpool.cc:69-91
    SparseMaxPoolBackwardFunctor): dout accumulates into EVERY input with
    out == in — including multi-way ties, which XLA's select-and-scatter
    transpose (single-winner) does not reproduce — and nothing flows through
    the zeros-init clamp (no input equals the clamped 0).

    Implementation: for each kernel tap t, upsample out/dout from the pooled
    grid back to the input grid along the pair relation
    p = q*stride - padding + t (a one-hot lhs-dilated depthwise conv), then
    din[p] = sum_t dout_up_t[p] * 1[feats[p] == out_up_t[p]] on active
    inputs. Invalid positions carry dout_up == 0, so spurious equalities
    with the zero fill contribute nothing.
    """
    feats, mask, out, new_mask = res
    dout, _ = cts
    b = feats.shape[0]
    c = feats.shape[-1]
    d_prev = feats.shape[1:4]
    d_out = out.shape[1:4]
    pl = kernel - 1 - padding
    pads = []
    for ax in range(3):
        ph = d_prev[ax] + padding - 1 - (d_out[ax] - 1) * stride
        pads.append((pl, max(ph, 0)))
    m = mask.astype(feats.dtype)
    dout = dout * new_mask[..., None].astype(dout.dtype)

    def uptap(arr, a, bb, cc):
        # one-hot (flipped) depthwise kernel: out-grid -> in-grid at tap t
        w = np.zeros((kernel, kernel, kernel, 1, 1), np.float32)
        w[kernel - 1 - a, kernel - 1 - bb, kernel - 1 - cc, 0, 0] = 1.0
        w = jnp.asarray(w, arr.dtype)
        up = jax.lax.conv_general_dilated(
            arr, jnp.tile(w, (1, 1, 1, 1, c)), (1, 1, 1), pads,
            lhs_dilation=(stride, stride, stride),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )
        # clip/pad to the exact input extent (ph may overshoot by flooring)
        return up[:, : d_prev[0], : d_prev[1], : d_prev[2], :]

    din = jnp.zeros_like(feats)
    for a in range(kernel):
        for bb in range(kernel):
            for cc in range(kernel):
                out_up = uptap(out, a, bb, cc)
                dout_up = uptap(dout, a, bb, cc)
                din = din + jnp.where(feats == out_up, dout_up, 0.0)
    din = din * m[..., None]
    # non-float masks (bool/int occupancy) take a float0 cotangent per
    # custom_vjp rules (same pattern as pallas_voxelize.py's voxel_idx)
    if jnp.issubdtype(mask.dtype, jnp.inexact):
        dmask = jnp.zeros_like(mask)
    else:
        dmask = np.zeros(mask.shape, jax.dtypes.float0)
    return din, dmask


_ref_max_pool.defvjp(_ref_max_pool_fwd, _ref_max_pool_bwd)


def sparse_max_pool(
    feats: jnp.ndarray, mask: jnp.ndarray, kernel: int = 3, stride: int = 2, padding: int | None = None,
    zero_init: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse max pool over occupied voxels only (ref pool_ops.h:27-62 +
    src/spconv/maxpool.cc:20-40).

    Unoccupied voxels must not contribute: they are replaced by -inf before
    the window max, and outputs with an empty receptive field are zeroed.

    zero_init=True (default) reproduces the reference EXACTLY: indiceMaxPool
    initializes its output with torch::zeros and only overwrites when
    out < in, so all-negative receptive fields CLAMP at 0 (the commented-out
    "smallest = -1e50" at pool_ops.h:38-39 shows this is shipped behavior;
    pinned by tests/test_golden_maxpool.py against the compiled reference
    functors). zero_init=False gives the true max over occupied voxels.

    The custom VJP matches the reference backward functor exactly,
    INCLUDING ties: dout accumulates into every input equal to the output
    (maxpool.cc:87-88), where plain select-and-scatter would pick a single
    winner (pinned by the tie case in tests/test_golden_maxpool.py).
    """
    if padding is None:
        padding = kernel // 2
    return _ref_max_pool(feats, mask, kernel, stride, padding, zero_init)


def sparse_conv_transpose(
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 2,
    padding: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse transposed conv (spconv SparseConvTranspose3d) on dense masked
    grids. DCL-Net itself never uses it; shipped for engine-surface parity
    with the reference's spconv (libs/spconv/spconv/conv.py:249-272, rulebook
    geometry.h:87-143 getValidOutPosTranspose + :196-245 getIndicePairsDeConv)
    and golden-matched against that compiled code
    (tests/test_golden_rulebook.py::test_conv_transpose_matches_reference_rulebook).

    Semantics: each active input p contributes feats[p] @ weight[tap] at every
    output q = p*stride - padding + tap (per axis); the active output set is
    the union of contributing positions. Dense equivalent: an lhs-dilated
    correlation with the kernel flipped, output size (D-1)*stride
    - 2*padding + k.

    Args:
      feats: [B, D, D, D, Cin] (zero at inactive voxels); mask: [B, D, D, D].
      weight: [k, k, k, Cin, Cout] in the same tap layout as the forward
        convs (correlation order).
    Returns:
      (out [B, D', D', D', Cout], new_mask [B, D', D', D']).
    """
    k = weight.shape[0]
    pl = k - 1 - padding
    if pl < 0:
        raise NotImplementedError("padding > kernel-1 not supported")
    m = mask.astype(feats.dtype)
    x = feats * m[..., None]
    wf = weight[::-1, ::-1, ::-1]
    precision = (jax.lax.Precision.HIGHEST
                 if feats.dtype == jnp.float32 else None)

    def tconv(inp, w):
        return jax.lax.conv_general_dilated(
            inp, w, (1, 1, 1), [(pl, pl)] * 3,
            lhs_dilation=(stride, stride, stride),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=precision,
        )

    out = tconv(x, wf)
    ones = jnp.ones((k, k, k, 1, 1), feats.dtype)
    cnt = tconv(m[..., None], ones)[..., 0]
    new_mask = (cnt > 0).astype(mask.dtype)
    return out * new_mask[..., None].astype(out.dtype), new_mask


def sparse_inverse_conv(
    feats: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    prev_mask: jnp.ndarray,
    stride: int = 2,
    padding: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse inverse conv (spconv SparseInverseConv3d) on dense masked grids.

    The reference's inverse conv replays a previous regular conv's rulebook
    with the gather/scatter pair sides swapped and the per-offset weights
    unchanged (spconv_ops.h:253-349 `indiceConv` with `_inverse=1`:
    `indicePairs.subview(i, inverse)`; functional.py SparseInverseConvFunction)
    — its output lives exactly on the PRE-conv active set (pair relation
    p = q*stride - padding + tap both ways). Dense equivalent: an lhs-dilated
    correlation with the flipped kernel whose HIGH-side padding is sized to
    reach the pre-conv extent exactly — NOT a crop of sparse_conv_transpose:
    when the forward conv's size formula floored
    ((D0 + 2*padding - kernel) % stride != 0) the transpose's natural extent
    is SHORTER than D0 and real rulebook contributions land beyond it.
    Golden-matched against the reference's compiled rulebook (incl. a
    flooring case) in
    tests/test_golden_rulebook.py::test_inverse_conv_matches_reference_rulebook.

    Args:
      feats/mask: the downsampled grid (the conv's output side).
      prev_mask: [B, D0, D1, D2] the pre-conv occupancy to invert onto.
    """
    k = weight.shape[0]
    d_down = feats.shape[1:4]
    d_prev = prev_mask.shape[1:4]
    pl = k - 1 - padding
    if pl < 0:
        raise NotImplementedError("padding > kernel-1 not supported")
    pads = []
    for ax in range(3):
        # dilated input length + pl + ph - k + 1 == D_prev
        ph = d_prev[ax] + padding - 1 - (d_down[ax] - 1) * stride
        if ph < 0:
            raise ValueError(
                f"prev_mask dim {d_prev[ax]} shorter than the conv geometry "
                f"allows for input dim {d_down[ax]}")
        pads.append((pl, ph))
    m = mask.astype(feats.dtype)
    x = feats * m[..., None]
    wf = weight[::-1, ::-1, ::-1]
    precision = (jax.lax.Precision.HIGHEST
                 if feats.dtype == jnp.float32 else None)

    def tconv(inp, w):
        return jax.lax.conv_general_dilated(
            inp, w, (1, 1, 1), pads,
            lhs_dilation=(stride, stride, stride),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=precision,
        )

    out = tconv(x, wf)
    return out * prev_mask[..., None].astype(out.dtype), prev_mask


def masked_batch_norm_stats(
    feats: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/var per channel over occupied voxels only.

    Reproduces torch BatchNorm1d over the sparse [M, C] feature rows
    (reference models/Modules.py:37): statistics are computed over the M
    occupied voxels of the whole batch, not over the full dense grid.

    Args:
      feats: [B, ..., C]; mask: [B, ...] broadcastable occupancy.
    Returns:
      (mean [C], var [C]) — biased variance, as torch uses for normalization.
    """
    m = mask.astype(feats.dtype)[..., None]
    denom = jnp.maximum(jnp.sum(m), 1.0)
    axes = tuple(range(feats.ndim - 1))
    mean = jnp.sum(feats * m, axis=axes) / denom
    var = jnp.sum(m * (feats - mean) ** 2, axis=axes) / denom
    return mean, var


def dense_to_sparse(
    feats: jnp.ndarray, mask: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract a fixed-capacity padded list of occupied voxels from a grid.

    TPU-native replacement for iterating a sparse tensor's indices
    (reference models/Modules.py:204-211 Ops_tensor2points): top_k over the
    flattened occupancy picks the first `capacity` occupied cells (ties broken
    by linear index, deterministic). If more voxels are occupied than
    `capacity`, the excess is dropped — callers size capacity from the known
    worst case (see models/backbone.py).

    Args:
      feats: [B, D0, D1, D2, C]; mask: [B, D0, D1, D2]; capacity: static V.
    Returns:
      coords: [B, V, 3] int32 voxel indices (zeros where padded),
      vfeats: [B, V, C] features,
      vmask: [B, V] 1.0 where a real voxel, 0.0 padding.
    """
    b = feats.shape[0]
    d0, d1, d2 = feats.shape[1:4]
    c = feats.shape[-1]
    flat_mask = mask.reshape(b, d0 * d1 * d2)
    # top_k on the 0/1 mask: occupied first, stable by linear index.
    scores, lin_idx = jax.lax.top_k(flat_mask.astype(jnp.float32), capacity)
    vmask = (scores > 0).astype(feats.dtype)
    flat_feats = feats.reshape(b, d0 * d1 * d2, c)
    vfeats = jnp.take_along_axis(flat_feats, lin_idx[..., None], axis=1)
    vfeats = vfeats * vmask[..., None]
    i0 = lin_idx // (d1 * d2)
    rem = lin_idx % (d1 * d2)
    coords = jnp.stack([i0, rem // d2, rem % d2], axis=-1).astype(jnp.int32)
    coords = coords * vmask[..., None].astype(jnp.int32)
    return coords, vfeats, vmask


def voxel_centers(
    coords: jnp.ndarray, unit_voxel_extent, scale: float, offset
) -> jnp.ndarray:
    """Metric centers of voxels at a pyramid scale.

    Matches Ops_tensor2points (reference models/Modules.py:204-211):
    ``center = idx * (unit*scale) + offset + 0.5 * (unit*scale)``.
    NOTE the reference's scale_lists quirk: DCL-Net passes scales [2,4,6,8]
    although the pooled grids sit at strides [2,4,8,16]
    (reference models/DCL_Net.py:54) — we reproduce it for fidelity.
    """
    unit = np.asarray(unit_voxel_extent, dtype=np.float32) * float(scale)
    off = np.asarray(offset, dtype=np.float32)
    return coords.astype(jnp.float32) * unit + (off + 0.5 * unit)
