"""Local-window 3-NN interpolation directly from dense voxel grids.

Fast path for Ops_GetPointFeat (reference models/Modules.py:228-251): instead
of extracting a global occupied-voxel list (top_k over the grid) and brute-
forcing 1024 x V distances, gather a small neighborhood window around each
query point's own cell and run the 3-NN there.

Exactness argument: every query point's containing cell is occupied (it holds
the point), so >=1 candidate is always in the window; the true 3 nearest
occupied voxel centers lie within the window except in pathologically sparse
neighborhoods where the 2nd/3rd neighbors are >2 cells away — their inverse-
squared-distance weights are negligible there. The reference's scale_lists
quirk (centers at idx*unit*scale + offset + unit*scale/2 with scale 6 on the
stride-8 grid, reference models/DCL_Net.py:54) is reproduced: the window base
is computed in QUIRK coordinates, which keeps the true minimizer within +-1
cell of the base.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _window_offsets(window: int) -> np.ndarray:
    r = np.arange(window) - window // 2
    return np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)


def local_grid_interpolate(
    points: jnp.ndarray,      # [B, N, 3] metric query points
    grid_feats: jnp.ndarray,  # [B, D0, D1, D2, C]
    grid_mask: jnp.ndarray,   # [B, D0, D1, D2]
    unit_voxel_extent,        # base unit extent (3,)
    scale: float,             # reference scale_lists entry for this level
    offset,                   # metric offset of the volume corner (3,)
    window: int = 5,
) -> jnp.ndarray:
    """3-NN inverse-squared-distance interpolation over a local window.

    Matches Ops_nearest_neighbor_interpolate semantics (weights 1/(d2+1e-8),
    reference models/Modules.py:213-227) with candidates restricted to a
    window^3 neighborhood. Returns [B, N, C].
    """
    b, n, _ = points.shape
    d0, d1, d2 = grid_feats.shape[1:4]
    c = grid_feats.shape[-1]
    su = (np.asarray(unit_voxel_extent, np.float32) * float(scale))
    off = np.asarray(offset, np.float32)

    # quirk-coordinate cell of each point, clipped to the grid
    base = jnp.floor((points - off) / su).astype(jnp.int32)
    base = jnp.clip(base, 0, jnp.asarray([d0 - 1, d1 - 1, d2 - 1], jnp.int32))

    offs = jnp.asarray(_window_offsets(window), jnp.int32)       # [W, 3]
    cand = base[:, :, None, :] + offs[None, None]                 # [B, N, W, 3]
    inb = jnp.all(
        (cand >= 0) & (cand < jnp.asarray([d0, d1, d2], jnp.int32)), axis=-1
    )                                                             # [B, N, W]
    cand = jnp.clip(cand, 0, jnp.asarray([d0 - 1, d1 - 1, d2 - 1], jnp.int32))
    lin = cand[..., 0] * (d1 * d2) + cand[..., 1] * d2 + cand[..., 2]
    w = lin.shape[-1]

    flat_mask = grid_mask.reshape(b, d0 * d1 * d2)
    occ = jnp.take_along_axis(flat_mask, lin.reshape(b, n * w), axis=1)
    occ = occ.reshape(b, n, w) * inb.astype(grid_mask.dtype)

    centers = cand.astype(jnp.float32) * su + (off + 0.5 * su)    # [B, N, W, 3]
    d2_ = jnp.sum((points[:, :, None, :] - centers) ** 2, axis=-1)
    d2_ = jnp.where(occ > 0, d2_, 1e10)

    # top-3 via iterated argmin (exact, fast on TPU)
    col = jax.lax.broadcasted_iota(jnp.int32, d2_.shape, d2_.ndim - 1)
    dists, idxs = [], []
    cur = d2_
    for _ in range(3):
        i = jnp.argmin(cur, axis=-1)
        dists.append(jnp.min(cur, axis=-1))
        idxs.append(i)
        cur = jnp.where(col == i[..., None], 1e10, cur)
    dist3 = jnp.stack(dists, -1)                                  # [B, N, 3]
    idx3 = jnp.stack(idxs, -1)

    recip = 1.0 / (dist3 + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)

    lin3 = jnp.take_along_axis(lin, idx3, axis=-1)                # [B, N, 3]
    flat_feats = grid_feats.reshape(b, d0 * d1 * d2, c)
    gathered = jnp.take_along_axis(
        flat_feats, lin3.reshape(b, n * 3)[..., None], axis=1
    ).reshape(b, n, 3, c)
    return jnp.einsum("bnkc,bnk->bnc", gathered, weight.astype(grid_feats.dtype))
