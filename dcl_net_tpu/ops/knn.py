"""Point-cloud neighborhood ops: KNN, 3-NN interpolation, FPS, ball query.

TPU-native replacement for the reference CUDA libraries
``libs/pointnet_lib`` (KNN/FPS/ball-query/grouping/interp,
reference libs/pointnet_lib/pointnet2_utils.py) and ``libs/pointnet_sp``
(batch-aware 3-NN interpolation, reference libs/pointnet_sp/src/
interpolate_gpu.cu:9-146).

Design: point sets are small and static (N = M = 1024, voxel lists <= 8192),
so brute-force masked distance matrices + iterated argmin selection are
exact, MXU-friendly (the cross term of the squared distance is a matmul),
fully batched, and differentiable by construction — no scatter/atomics
needed for the backward pass, unlike the CUDA originals. (``lax.top_k`` is
deliberately avoided: it full-sorts each row, ~30x slower here.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dcl_net_tpu.geometry.transform import pairwise_sq_dist

_BIG = 1e10


def knn(
    k: int,
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query point among ref points.

    Matches reference libs/pointnet_lib/pointnet2_utils.py:78-108 ``knn``
    (returns squared distances and indices, ascending).

    Args:
      k: static neighbor count.
      query: [B, N, 3]; ref: [B, M, 3]; ref_mask: optional [B, M] validity.
    Returns:
      dist2: [B, N, k] squared distances; idx: [B, N, k] int32.
    """
    d2 = pairwise_sq_dist(query, ref)  # [B, N, M]
    if ref_mask is not None:
        d2 = jnp.where(ref_mask[:, None, :] > 0, d2, _BIG)
    m = d2.shape[-1]
    k_eff = min(k, m)
    # lax.top_k full-sorts each row (~30x slower on this TPU backend than
    # min/argmin passes). Iterated argmin is exact and stable-ordered (ties
    # resolve to ascending index like a stable sort); small k unrolls, large
    # k (the reference supports k<=200) runs the same body as a scan.
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)

    def one_pass(cur):
        i = jnp.argmin(cur, axis=-1)
        d = jnp.min(cur, axis=-1)
        return jnp.where(col == i[..., None], _BIG, cur), (d, i)

    if k_eff <= 8:
        dists, idxs = [], []
        for _ in range(k_eff):
            d2, (d, i) = one_pass(d2)
            dists.append(d)
            idxs.append(i)
        dist2 = jnp.stack(dists, axis=-1)
        idx = jnp.stack(idxs, axis=-1)
    else:
        _, (dist2, idx) = jax.lax.scan(
            lambda cur, _: one_pass(cur), d2, None, length=k_eff
        )
        dist2 = jnp.moveaxis(dist2, 0, -1)
        idx = jnp.moveaxis(idx, 0, -1)
    if k_eff < k:
        # Fewer refs than k: repeat the nearest neighbor. Interpolation-wise
        # this matches the CUDA kernels' near-zero weights for missing slots.
        pad = k - k_eff
        dist2 = jnp.concatenate([dist2] + [dist2[..., :1]] * pad, axis=-1)
        idx = jnp.concatenate([idx] + [idx[..., :1]] * pad, axis=-1)
    return dist2, idx.astype(jnp.int32)


def three_nn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3 nearest neighbors, squared distances — matches the batch-aware CUDA
    kernel (reference libs/pointnet_sp/src/interpolate_gpu.cu:9-56, which
    returns dist2 and filters by batch id; here the batch dim is explicit)."""
    return knn(3, query, ref, ref_mask)


def three_interpolate(
    feats: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted sum of 3 neighbor features.

    Reference libs/pointnet_sp/src/interpolate_gpu.cu:80-122; the backward
    pass (atomicAdd scatter in CUDA, :124-146) comes free from JAX autodiff.

    Args:
      feats: [B, M, C]; idx: [B, N, 3]; weight: [B, N, 3].
    Returns:
      [B, N, C].
    """
    b, n, k = idx.shape
    gathered = jnp.take_along_axis(
        feats[:, None, :, :],  # [B, 1, M, C]
        idx[..., None],        # [B, N, 3, 1]
        axis=2,
    )  # [B, N, 3, C]
    return jnp.einsum("bnkc,bnk->bnc", gathered, weight)


def nearest_neighbor_interpolate(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_feats: jnp.ndarray,
    ref_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """3-NN inverse-(squared)-distance interpolation.

    Matches Ops_nearest_neighbor_interpolate (reference models/Modules.py:
    213-227): weights are 1/(dist2 + 1e-8) normalized — the reference feeds
    the SQUARED distance from three_nn into the reciprocal.
    """
    dist2, idx = three_nn(query, ref, ref_mask)
    recip = 1.0 / (dist2 + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return three_interpolate(ref_feats, idx, weight.astype(ref_feats.dtype))


def gather_operation(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features at point indices (ref pointnet2_utils.py:40-76).

    Args:
      feats: [B, N, C]; idx: [B, S].
    Returns:
      [B, S, C].
    """
    return jnp.take_along_axis(feats, idx[..., None], axis=1)


def grouping_operation(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Group features by neighborhood indices (ref pointnet2_utils.py:195-238).

    Args:
      feats: [B, N, C]; idx: [B, S, K].
    Returns:
      [B, S, K, C].
    """
    b, s, k = idx.shape
    return jnp.take_along_axis(
        feats[:, None, :, :], idx[..., None], axis=2
    )


def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Iterative farthest point sampling (ref sampling_gpu.cu:94 via
    pointnet2_utils.py:10-37), as a lax.scan over npoint steps.

    Starts from index 0 like the CUDA kernel. Masked points are never picked.

    Args:
      xyz: [B, N, 3]; npoint: static sample count.
    Returns:
      idx: [B, npoint] int32.
    """
    b, n, _ = xyz.shape
    if mask is None:
        valid = jnp.ones((b, n), dtype=xyz.dtype)
    else:
        valid = mask.astype(xyz.dtype)

    init_dist = jnp.where(valid > 0, _BIG, -_BIG)  # invalid points never max
    first = jnp.zeros((b,), dtype=jnp.int32)

    def step(carry, _):
        min_dist, last_idx = carry
        last_xyz = jnp.take_along_axis(xyz, last_idx[:, None, None], axis=1)
        d2 = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # [B, N]
        d2 = jnp.where(valid > 0, d2, -_BIG)
        min_dist = jnp.minimum(min_dist, d2)
        nxt = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)
        return (min_dist, nxt), last_idx

    (_, _), samples = jax.lax.scan(step, (init_dist, first), None, length=npoint)
    return jnp.swapaxes(samples, 0, 1)  # [B, npoint]


def ball_query(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Indices of up to nsample points within radius of each center.

    Matches reference semantics (pointnet2_utils.py:241-271 /
    ball_query_gpu.cu): the FIRST nsample in-radius points by index order;
    slots beyond the found count repeat the first found index.

    Args:
      xyz: [B, N, 3] source points; new_xyz: [B, S, 3] query centers.
    Returns:
      idx: [B, S, nsample] int32.
    """
    b, n, _ = xyz.shape
    d2 = pairwise_sq_dist(new_xyz, xyz)  # [B, S, N]
    inside = d2 < (radius * radius)
    if mask is not None:
        inside = jnp.logical_and(inside, mask[:, None, :] > 0)
    arange = jnp.arange(n, dtype=jnp.int32)
    # rank in-radius points by index; out-of-radius sorted to the back
    order_key = jnp.where(inside, arange[None, None, :], n + arange[None, None, :])
    _, idx = jax.lax.top_k(-order_key.astype(jnp.float32), nsample)
    idx = idx.astype(jnp.int32)
    found = jnp.take_along_axis(inside, idx, axis=-1)
    first = idx[..., :1]
    return jnp.where(found, idx, first)
