"""Auxiliary ops shipped by the reference libraries (capability parity).

These mirror components vendored in the reference but unused by the DCL-Net
pipeline itself — provided so a reference user finds the full surface:
- 3D/BEV NMS (reference libs/spconv/spconv/utils/__init__.py:21-64 +
  src/utils/nms.cu): rotated-free axis-aligned IoU NMS here.
- VoxelGenerator / points_to_voxel (reference spconv/utils/__init__.py:66-111,
  points_to_voxel_3d_np): point cloud -> fixed-capacity voxel tensors.
- SparseFieldMaxPool (reference libs/spconv/spconv/pool.py:107-195 +
  pool_ops.h:64-104): max pooling that selects per-FIELD by vector norm and
  copies the whole field of the winner (for equivariant features).
- ballquery_batch_p / sec_mean-style segment reductions
  (reference libs/pointgroup_ops/functions/pointgroup_ops.py:115-150,
  256-337).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------
def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
        pre_max_size: Optional[int] = None, post_max_size: Optional[int] = None
        ) -> np.ndarray:
    """Axis-aligned NMS over [N, 4] (x1, y1, x2, y2) boxes (host-side numpy,
    like the reference's non-rotated nms path)."""
    order = np.argsort(-scores)
    if pre_max_size is not None:
        order = order[:pre_max_size]
    boxes = boxes[order]
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in range(len(boxes)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        xx1 = np.maximum(x1[i], x1[i + 1:])
        yy1 = np.maximum(y1[i], y1[i + 1:])
        xx2 = np.minimum(x2[i], x2[i + 1:])
        yy2 = np.minimum(y2[i], y2[i + 1:])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[i + 1:] - inter, 1e-9)
        suppressed[i + 1:] |= iou > iou_threshold
    keep = np.asarray(keep, np.int64)
    if post_max_size is not None:
        keep = keep[:post_max_size]
    return keep


# ---------------------------------------------------------------------------
# VoxelGenerator
# ---------------------------------------------------------------------------
def points_to_voxel(
    points: np.ndarray,
    voxel_size,
    coors_range,
    max_points: int = 35,
    max_voxels: int = 20000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Point cloud -> padded voxel tensors (reference points_to_voxel_3d_np,
    spconv/utils/__init__.py:21-64).

    Returns (voxels [M, max_points, C], coords [M, 3] zyx, counts [M]).
    """
    voxel_size = np.asarray(voxel_size, np.float32)
    coors_range = np.asarray(coors_range, np.float32)
    grid = np.round((coors_range[3:] - coors_range[:3]) / voxel_size).astype(np.int64)
    c = points.shape[1]
    voxels = np.zeros((max_voxels, max_points, c), points.dtype)
    coords = np.zeros((max_voxels, 3), np.int64)
    counts = np.zeros(max_voxels, np.int64)
    voxel_map = {}
    for p in points:
        idx = np.floor((p[:3] - coors_range[:3]) / voxel_size).astype(np.int64)
        if (idx < 0).any() or (idx >= grid).any():
            continue
        key = tuple(idx)
        slot = voxel_map.get(key)
        if slot is None:
            if len(voxel_map) >= max_voxels:
                continue
            slot = len(voxel_map)
            voxel_map[key] = slot
            coords[slot] = idx[::-1]  # zyx like spconv
        if counts[slot] < max_points:
            voxels[slot, counts[slot]] = p
            counts[slot] += 1
    m = len(voxel_map)
    return voxels[:m], coords[:m], counts[:m]


class VoxelGenerator:
    """Stateful wrapper (reference VoxelGenerator, spconv/utils:66-111)."""

    def __init__(self, voxel_size, point_cloud_range, max_num_points,
                 max_voxels=20000):
        self.voxel_size = np.asarray(voxel_size, np.float32)
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.max_num_points = max_num_points
        self.max_voxels = max_voxels
        self.grid_size = np.round(
            (self.point_cloud_range[3:] - self.point_cloud_range[:3])
            / self.voxel_size
        ).astype(np.int64)

    def generate(self, points: np.ndarray):
        return points_to_voxel(
            points, self.voxel_size, self.point_cloud_range,
            self.max_num_points, self.max_voxels,
        )


# ---------------------------------------------------------------------------
# SparseFieldMaxPool
# ---------------------------------------------------------------------------
def sparse_field_max_pool(
    feats: jnp.ndarray,   # [B, D, D, D, F, C] fields of C-dim vectors
    mask: jnp.ndarray,    # [B, D, D, D]
    kernel: int = 3,
    stride: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Field max pool: per output voxel and field, copy the whole C-vector of
    the in-window voxel with the largest vector NORM (reference
    SparseFieldMaxPool, libs/spconv/spconv/pool.py:107-195: equivariant
    features must be selected per-field, not per-component).
    """
    b, d = feats.shape[0], feats.shape[1]
    f, c = feats.shape[4], feats.shape[5]
    pad = kernel // 2
    norms = jnp.linalg.norm(feats, axis=-1)  # [B, D, D, D, F]
    norms = jnp.where(mask[..., None] > 0, norms, -1.0)

    padded_n = jnp.pad(norms, [(0, 0)] + [(pad, pad)] * 3 + [(0, 0)],
                       constant_values=-1.0)
    padded_f = jnp.pad(feats, [(0, 0)] + [(pad, pad)] * 3 + [(0, 0), (0, 0)])
    out_d = (d + 2 * pad - kernel) // stride + 1

    best_n = None
    best_f = None
    for dz in range(kernel):
        for dy in range(kernel):
            for dx in range(kernel):
                sl_n = padded_n[:, dz : dz + d + 2 * pad - kernel + 1 : stride,
                                dy : dy + d + 2 * pad - kernel + 1 : stride,
                                dx : dx + d + 2 * pad - kernel + 1 : stride]
                sl_f = padded_f[:, dz : dz + d + 2 * pad - kernel + 1 : stride,
                                dy : dy + d + 2 * pad - kernel + 1 : stride,
                                dx : dx + d + 2 * pad - kernel + 1 : stride]
                if best_n is None:
                    best_n, best_f = sl_n, sl_f
                else:
                    take = sl_n > best_n
                    best_n = jnp.where(take, sl_n, best_n)
                    best_f = jnp.where(take[..., None], sl_f, best_f)
    new_mask = (best_n.max(axis=-1) >= 0).astype(mask.dtype)
    best_f = best_f * new_mask[..., None, None].astype(best_f.dtype)
    return best_f, new_mask


# ---------------------------------------------------------------------------
# Segment reductions (pointgroup sec_mean/min/max)
# ---------------------------------------------------------------------------
def sec_mean(feats: jnp.ndarray, offsets: jnp.ndarray, n_segments: int) -> jnp.ndarray:
    """Segment mean over offset-delimited rows (reference sec_mean,
    pointgroup_ops.py:256-280). offsets: [S+1]."""
    n = feats.shape[0]
    seg_ids = jnp.searchsorted(offsets[1:], jnp.arange(n), side="right")
    sums = jax.ops.segment_sum(feats, seg_ids, num_segments=n_segments)
    counts = jax.ops.segment_sum(jnp.ones((n,), feats.dtype), seg_ids, num_segments=n_segments)
    return sums / jnp.maximum(counts, 1.0)[:, None]


def sec_min(feats: jnp.ndarray, offsets: jnp.ndarray, n_segments: int) -> jnp.ndarray:
    n = feats.shape[0]
    seg_ids = jnp.searchsorted(offsets[1:], jnp.arange(n), side="right")
    return jax.ops.segment_min(feats, seg_ids, num_segments=n_segments)


def sec_max(feats: jnp.ndarray, offsets: jnp.ndarray, n_segments: int) -> jnp.ndarray:
    n = feats.shape[0]
    seg_ids = jnp.searchsorted(offsets[1:], jnp.arange(n), side="right")
    return jax.ops.segment_max(feats, seg_ids, num_segments=n_segments)
