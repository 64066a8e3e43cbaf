"""Native PNG decode for the host data loaders (csrc/png_decoder.cpp).

The reference's loaders decode three PNGs per frame with PIL
(reference YCBV/dataloader_train_YCBV.py:105-210, LM/dataloader_*.py);
PIL's decode spends most of its time outside zlib (unfilter, mode
handling, the numpy copy — measured in docs/PERF.md). `imread` routes
through a single-inflate C++ decoder writing straight into a numpy
buffer; the ctypes call releases the GIL, so the loaders' thread pools
scale. Output matches ``np.array(PIL.Image.open(path))`` bit-for-bit for
every format these datasets contain (8/16-bit gray, RGB, RGBA,
gray+alpha, 8-bit palette -> indices); anything the native path does not
support (interlaced, sub-byte depths) silently falls back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

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
    d = _csrc_dir()
    so_path = os.path.join(d, "libdclx_host.so")
    try:
        # make is mtime-aware: a fresh .so is a ~10 ms no-op, a stale one
        # (built before png_decoder.cpp existed) is rebuilt. A rebuilt file
        # has a new inode, so CDLL below loads the NEW library even if an
        # older handle is already live in this process.
        subprocess.run(["make", "-C", d], check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.dclx_png_probe.restype = ctypes.c_int
        lib.dclx_png_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.dclx_png_decode.restype = ctypes.c_int
        lib.dclx_png_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _load_lib() is not None


def _pil_imread(data: bytes) -> np.ndarray:
    import io

    from PIL import Image

    return np.array(Image.open(io.BytesIO(data)))


def imread(path: str) -> np.ndarray:
    """Decode a PNG file to a numpy array (PIL array conventions).

    gray -> [H, W] u8/u16; palette -> [H, W] u8 indices; RGB/RGBA/LA ->
    [H, W, C]. Non-PNG files and unsupported PNG variants decode via PIL.
    """
    with open(path, "rb") as f:
        data = f.read()
    lib = _load_lib()
    if lib is None:
        return _pil_imread(data)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    bpc = ctypes.c_int()
    rc = lib.dclx_png_probe(
        data, len(data),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch), ctypes.byref(bpc),
    )
    if rc != 0:
        return _pil_imread(data)
    dtype = np.uint16 if bpc.value == 2 else np.uint8
    shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, ch.value)
    out = np.empty(shape, dtype)
    rc = lib.dclx_png_decode(data, len(data), out.ctypes.data)
    if rc != 0:
        return _pil_imread(data)
    return out
