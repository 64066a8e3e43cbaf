"""Point-cloud voxelization as one jitted scatter (TPU-native).

Replaces the reference's two-part CUDA/C++ pipeline:
- ``pointgroup_ops.voxelization_idx`` — CPU hash-map building occupied-voxel
  coords + point<->voxel rulebooks in dataloader workers
  (reference libs/pointgroup_ops/src/voxelize/voxelize.cpp:10-152), and
- ``pointgroup_ops.voxelization`` — GPU scatter mean/sum over the rulebook
  (reference libs/pointgroup_ops/src/voxelize/voxelize.cu:9-54, python wrapper
  libs/pointgroup_ops/functions/pointgroup_ops.py:11-75).

TPU design: the grid is tiny (64^3) and per-sample point count is static
(1024), so instead of hash maps + ragged rulebooks we scatter features
directly into a dense [B, D, D, D, C] grid with ``.at[].add`` on linearized
voxel ids — one fused XLA scatter, fully differentiable, no host round trip.
Mode semantics follow voxelize.cpp:119-138 (0=unique 1=first 2=last 3=sum
4=mean; the file's :51 comment swaps 1/2 vs its own code — see
tests/test_golden_voxelize.py; DCL-Net uses mode 4).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Reference mode table. NOTE: the reference's comment (voxelize.cpp:51
# "1=last item(overwrite) 2=first item(keep)") CONTRADICTS its code — mode 1
# takes outputRows.front() (the FIRST point seen, voxelize.cpp:129) and mode
# 2 takes .back() (the LAST, :135). The compiled code is the ground truth
# (tests/test_golden_voxelize.py runs it), so: 1=first, 2=last.
MODE_UNIQUE = 0
MODE_FIRST = 1
MODE_LAST = 2
MODE_SUM = 3
MODE_MEAN = 4


def point_to_voxel_index(
    points: jnp.ndarray, unit_voxel_extent, voxel_num_limit
) -> jnp.ndarray:
    """Quantize metric points (centered at the volume center) to voxel indices.

    Matches the reference dataloader's
    ``(cloud + total_extent/2) / unit_extent`` with trunc-to-int (long cast)
    (reference YCBV/dataloader_train_YCBV.py:203,205).

    Args:
      points: [..., 3] metric coordinates.
    Returns:
      [..., 3] int32 voxel indices, clipped to [0, D-1].
    """
    unit = jnp.asarray(unit_voxel_extent, dtype=points.dtype)
    limit = jnp.asarray(voxel_num_limit, dtype=points.dtype)
    total = unit * limit
    idx = (points + 0.5 * total) / unit
    # trunc matches torch ``.long()`` on non-negative values (points are
    # pre-filtered to lie inside the volume).
    idx = jnp.floor(idx).astype(jnp.int32)
    return jnp.clip(idx, 0, jnp.asarray(voxel_num_limit, jnp.int32) - 1)


def voxelize_dense(
    feats: jnp.ndarray,
    voxel_idx: jnp.ndarray,
    grid_size: Tuple[int, int, int],
    mode: int = MODE_MEAN,
    point_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter per-point features into a dense voxel grid.

    Args:
      feats: [B, N, C] per-point features.
      voxel_idx: [B, N, 3] int voxel indices (must lie inside the grid).
      grid_size: static (Dz, Dy, Dx) == voxel_num_limit.
      mode: 0=unique, 1=first, 2=last, 3=sum, 4=mean — full parity with the
        reference's compiled behavior, voxelize.cpp:119-138 (its :51 comment
        swaps 1/2; DCL-Net uses mean, cfg.voxelization_mode=4).
      point_mask: optional [B, N] bool; False points are ignored.

    Returns:
      grid: [B, D0, D1, D2, C] voxel features (zeros where empty).
      count: [B, D0, D1, D2] number of points per voxel (occupancy = count>0).
    """
    b, n, c = feats.shape
    d0, d1, d2 = grid_size
    g = d0 * d1 * d2
    lin = (
        voxel_idx[..., 0] * (d1 * d2) + voxel_idx[..., 1] * d2 + voxel_idx[..., 2]
    )  # [B, N]
    ones = jnp.ones((b, n), dtype=feats.dtype)
    if point_mask is not None:
        m = point_mask.astype(feats.dtype)
        feats = feats * m[..., None]
        ones = ones * m
        # park masked points in voxel 0 contribution-free (already zeroed)
    batch_ids = jnp.arange(b, dtype=lin.dtype)[:, None].repeat(n, axis=1)

    if mode in (MODE_SUM, MODE_MEAN, MODE_UNIQUE):
        # mode 0 (guaranteed unique) is sum with <=1 point per voxel.
        # ONE scatter for features + count (ones rides as channel C): scatter
        # cost on this backend is per-pass, not per-channel — fusing the
        # count scatter into the feature scatter halves voxelize time.
        ext = jnp.concatenate([feats, ones[..., None]], axis=-1)  # [B,N,C+1]
        flat_ext = jnp.zeros((b, g, c + 1), dtype=feats.dtype)
        flat_ext = flat_ext.at[batch_ids, lin].add(ext)
        flat_feats, flat_count = flat_ext[..., :c], flat_ext[..., c]
        if mode == MODE_MEAN:
            flat_feats = flat_feats / jnp.maximum(flat_count, 1.0)[..., None]
    elif mode in (MODE_FIRST, MODE_LAST):
        flat_count = jnp.zeros((b, g), dtype=feats.dtype)
        flat_count = flat_count.at[batch_ids, lin].add(ones)
        # deterministic winner per voxel: the lowest (first) / highest (last)
        # point index — a scatter-min/max of indices followed by one gather,
        # matching the CPU hash-map's keep/overwrite semantics
        # (reference voxelize.cpp:127-138)
        pid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (b, n))
        if point_mask is not None:
            dead = ~point_mask.astype(bool)
            pid = jnp.where(dead, n if mode == MODE_FIRST else -1, pid)
        if mode == MODE_FIRST:
            win = jnp.full((b, g), n, jnp.int32).at[batch_ids, lin].min(pid)
            has = win < n
        else:
            win = jnp.full((b, g), -1, jnp.int32).at[batch_ids, lin].max(pid)
            has = win >= 0
        gathered = jnp.take_along_axis(
            feats, jnp.clip(win, 0, n - 1)[..., None], axis=1
        )
        flat_feats = jnp.where(has[..., None], gathered, 0.0)
    else:
        raise NotImplementedError(f"voxelization mode {mode}")
    grid = flat_feats.reshape(b, d0, d1, d2, c)
    count = flat_count.reshape(b, d0, d1, d2)
    return grid, count


# Public alias matching the reference op name (pointgroup_ops.voxelization).
voxelize = voxelize_dense


def point_recover(
    grid: jnp.ndarray, voxel_idx: jnp.ndarray
) -> jnp.ndarray:
    """Map voxel features back to points (ref pointgroup_ops.point_recover,
    libs/pointgroup_ops/functions/pointgroup_ops.py:78-112).

    Args:
      grid: [B, D0, D1, D2, C]; voxel_idx: [B, N, 3].
    Returns:
      [B, N, C] per-point features gathered from their voxel.
    """
    b, d0, d1, d2, c = grid.shape
    lin = (
        voxel_idx[..., 0] * (d1 * d2) + voxel_idx[..., 1] * d2 + voxel_idx[..., 2]
    )
    flat = grid.reshape(b, d0 * d1 * d2, c)
    return jnp.take_along_axis(flat, lin[..., None], axis=1)
