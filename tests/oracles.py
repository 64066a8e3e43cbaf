"""Pure-numpy oracles mirroring the reference CUDA op semantics.

Test strategy follows the upstream spconv pattern (reference
libs/spconv/spconv/test_utils.py:141-190): generate random sparse/dense twin
data and compare the TPU ops against straightforward numpy loops.
"""

from __future__ import annotations

import numpy as np


def np_voxelize_mean(feats, voxel_idx, grid, mask=None):
    """Scatter-mean oracle (mode 4, ref voxelize.cpp:140-151 + voxelize.cu)."""
    b, n, c = feats.shape
    out = np.zeros((b,) + tuple(grid) + (c,), dtype=np.float64)
    cnt = np.zeros((b,) + tuple(grid), dtype=np.float64)
    for bi in range(b):
        for ni in range(n):
            if mask is not None and not mask[bi, ni]:
                continue
            i, j, k = voxel_idx[bi, ni]
            out[bi, i, j, k] += feats[bi, ni]
            cnt[bi, i, j, k] += 1
    nz = cnt > 0
    out[nz] /= cnt[nz][..., None]
    return out.astype(np.float32), cnt.astype(np.float32)


def np_subm_conv3d(grid, mask, weight):
    """Submanifold conv oracle: output only at active sites, zero elsewhere.

    grid: [D,D,D,Cin] (zeros at inactive), mask: [D,D,D], weight: [k,k,k,Cin,Cout].
    """
    k = weight.shape[0]
    p = k // 2
    d0, d1, d2, cin = grid.shape
    cout = weight.shape[-1]
    padded = np.zeros((d0 + 2 * p, d1 + 2 * p, d2 + 2 * p, cin))
    padded[p:-p or None, p:-p or None, p:-p or None] = grid * mask[..., None]
    out = np.zeros((d0, d1, d2, cout))
    for x in range(d0):
        for y in range(d1):
            for z in range(d2):
                if not mask[x, y, z]:
                    continue
                win = padded[x : x + k, y : y + k, z : z + k]  # [k,k,k,cin]
                out[x, y, z] = np.tensordot(win, weight, axes=([0, 1, 2, 3], [0, 1, 2, 3]))
    return out, mask.copy()


def np_regular_sparse_conv3d(grid, mask, weight, stride=1):
    """Regular sparse conv oracle: output active wherever any input voxel is in
    the kernel footprint (ref geometry.h:23-87), stride 1, pad k//2."""
    k = weight.shape[0]
    p = k // 2
    d0, d1, d2, cin = grid.shape
    cout = weight.shape[-1]
    padded_f = np.zeros((d0 + 2 * p, d1 + 2 * p, d2 + 2 * p, cin))
    padded_f[p:-p or None, p:-p or None, p:-p or None] = grid * mask[..., None]
    padded_m = np.zeros((d0 + 2 * p, d1 + 2 * p, d2 + 2 * p))
    padded_m[p:-p or None, p:-p or None, p:-p or None] = mask
    out = np.zeros((d0, d1, d2, cout))
    new_mask = np.zeros((d0, d1, d2))
    for x in range(0, d0, stride):
        for y in range(0, d1, stride):
            for z in range(0, d2, stride):
                wm = padded_m[x : x + k, y : y + k, z : z + k]
                if wm.sum() == 0:
                    continue
                win = padded_f[x : x + k, y : y + k, z : z + k]
                out[x // stride, y // stride, z // stride] = np.tensordot(
                    win, weight, axes=([0, 1, 2, 3], [0, 1, 2, 3])
                )
                new_mask[x // stride, y // stride, z // stride] = 1
    if stride > 1:
        out = out[: d0 // stride, : d1 // stride, : d2 // stride]
        new_mask = new_mask[: d0 // stride, : d1 // stride, : d2 // stride]
    return out, new_mask


def np_sparse_avg_pool(grid, mask, kernel=3, stride=2):
    """True-average pool oracle (ref pool_ops.h:173-246, use_gs=False)."""
    p = kernel // 2
    d0, d1, d2, c = grid.shape
    o0, o1, o2 = (d0 + 2 * p - kernel) // stride + 1, (d1 + 2 * p - kernel) // stride + 1, (d2 + 2 * p - kernel) // stride + 1
    padded_f = np.zeros((d0 + 2 * p, d1 + 2 * p, d2 + 2 * p, c))
    padded_f[p : p + d0, p : p + d1, p : p + d2] = grid * mask[..., None]
    padded_m = np.zeros((d0 + 2 * p, d1 + 2 * p, d2 + 2 * p))
    padded_m[p : p + d0, p : p + d1, p : p + d2] = mask
    out = np.zeros((o0, o1, o2, c))
    new_mask = np.zeros((o0, o1, o2))
    for x in range(o0):
        for y in range(o1):
            for z in range(o2):
                wm = padded_m[x * stride : x * stride + kernel,
                              y * stride : y * stride + kernel,
                              z * stride : z * stride + kernel]
                cnt = wm.sum()
                if cnt == 0:
                    continue
                win = padded_f[x * stride : x * stride + kernel,
                               y * stride : y * stride + kernel,
                               z * stride : z * stride + kernel]
                out[x, y, z] = win.sum(axis=(0, 1, 2)) / cnt
                new_mask[x, y, z] = 1
    return out, new_mask


def np_three_nn(query, ref, ref_mask=None):
    """Squared-distance 3-NN oracle (ref interpolate_gpu.cu:9-56)."""
    b, n, _ = query.shape
    dist2 = np.zeros((b, n, 3))
    idx = np.zeros((b, n, 3), dtype=np.int64)
    for bi in range(b):
        valid = (
            np.ones(ref.shape[1], bool) if ref_mask is None else ref_mask[bi] > 0
        )
        d2 = ((query[bi][:, None] - ref[bi][None]) ** 2).sum(-1)
        d2[:, ~valid] = 1e10
        order = np.argsort(d2, axis=1, kind="stable")[:, :3]
        idx[bi] = order
        dist2[bi] = np.take_along_axis(d2, order, axis=1)
    return dist2, idx


def np_fps(xyz, npoint):
    """Farthest point sampling oracle starting at index 0 (ref sampling_gpu.cu)."""
    b, n, _ = xyz.shape
    idx = np.zeros((b, npoint), dtype=np.int64)
    for bi in range(b):
        dist = np.full(n, 1e10)
        last = 0
        for s in range(npoint):
            idx[bi, s] = last
            d2 = ((xyz[bi] - xyz[bi, last]) ** 2).sum(-1)
            dist = np.minimum(dist, d2)
            last = int(np.argmax(dist))
    return idx
