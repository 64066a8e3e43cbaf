"""ctypes binding for the native host-side voxelizer (csrc/voxelizer.cpp).

TPU-native equivalent of the reference's collate-time CPU voxelization
(reference libs/pointgroup_ops/functions/pointgroup_ops.py voxelization_idx
-> libs/pointgroup_ops/src/voxelize/voxelize.cpp:10-152). The shared library
is built on first use with g++ (no pybind11 dependency); a pure-numpy
fallback keeps everything working without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _csrc_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
    )


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so_path = os.path.join(_csrc_dir(), "libdclx_host.so")
    try:
        if not os.path.exists(so_path):
            subprocess.run(
                ["make", "-C", _csrc_dir()], check=True, capture_output=True
            )
        lib = ctypes.CDLL(so_path)
        lib.voxelize_idx.restype = ctypes.c_int
        lib.voxelize_idx.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.voxelize_feats.restype = None
        lib.voxelize_feats.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.point_recover.restype = None
        lib.point_recover.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _load_lib() is not None


def voxelization_idx(
    coords: np.ndarray, capacity: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unique-voxel map over [N, 4] (batch, x, y, z) int coords.

    Returns (output_coords [M,4] int64, input_map [N] int32 point->voxel,
    counts [M] int32), with voxel slots in first-seen order like the
    reference hash-map implementation.
    """
    coords = np.ascontiguousarray(coords, dtype=np.int64)
    n = coords.shape[0]
    capacity = capacity or n
    lib = _load_lib()
    if lib is not None:
        input_map = np.empty(n, np.int32)
        out_coords = np.zeros((capacity, 4), np.int64)
        counts = np.zeros(capacity, np.int32)
        m = lib.voxelize_idx(
            coords.ctypes.data, n, input_map.ctypes.data,
            out_coords.ctypes.data, counts.ctypes.data, capacity,
        )
        return out_coords[:m], input_map, counts[:m]
    # numpy fallback: stable first-seen unique
    _, first_idx, inverse = np.unique(
        coords, axis=0, return_index=True, return_inverse=True
    )
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    input_map = rank[inverse].astype(np.int32)
    m = len(order)
    out_coords = coords[np.sort(first_idx)]
    counts = np.bincount(input_map, minlength=m).astype(np.int32)
    return out_coords, input_map, counts


def voxelization(
    feats: np.ndarray, input_map: np.ndarray, counts: np.ndarray, mode: int = 4
) -> np.ndarray:
    """Scatter mean/sum of point feats into voxel slots (mode 4 = mean)."""
    feats = np.ascontiguousarray(feats, dtype=np.float32)
    n, c = feats.shape
    m = len(counts)
    lib = _load_lib()
    out = np.zeros((m, c), np.float32)
    if lib is not None:
        counts32 = np.ascontiguousarray(counts, np.int32)
        imap = np.ascontiguousarray(input_map, np.int32)
        lib.voxelize_feats(
            feats.ctypes.data, imap.ctypes.data, n, c,
            out.ctypes.data, counts32.ctypes.data, m, mode,
        )
        return out
    np.add.at(out, input_map, feats)
    if mode == 4:
        out /= np.maximum(counts[:, None], 1)
    return out


def point_recover(voxel_feats: np.ndarray, input_map: np.ndarray) -> np.ndarray:
    """Voxel feats back to points (reference point_recover)."""
    voxel_feats = np.ascontiguousarray(voxel_feats, dtype=np.float32)
    m, c = voxel_feats.shape
    n = len(input_map)
    lib = _load_lib()
    if lib is not None:
        out = np.empty((n, c), np.float32)
        imap = np.ascontiguousarray(input_map, np.int32)
        lib.point_recover(voxel_feats.ctypes.data, imap.ctypes.data, n, c, out.ctypes.data)
        return out
    return voxel_feats[np.clip(input_map, 0, m - 1)] * (input_map >= 0)[:, None]
