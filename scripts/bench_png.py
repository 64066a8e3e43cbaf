"""PNG decode A/B: native decoder (csrc/png_decoder.cpp) vs PIL, on
REALISTIC (compressible) color content — VERDICT r4 item 7.

The round-4 table measured the color row on the fixture's random-noise
PNGs (incompressible — the inflate-bound worst case for a single-threaded
inflate) and ASSERTED 2-3x for real photos. Real photos don't exist in
this environment, but a smooth/structured synthetic image (gradients +
shapes + mild texture) compresses like one; this script measures the
color-row ratio on that content and records it.

Interleaved best-of-N within one process (same discipline as the loader
benches: alternate PIL/native per repetition so page-cache and CPU
frequency drift hit both sides equally).

Usage: python scripts/bench_png.py [--reps 30] [--size 640 480]
"""

import argparse
import io
import os
import sys
import tempfile
import time
import zlib

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def make_photo_like(w: int, h: int, seed: int = 0) -> np.ndarray:
    """Smooth gradients + solid shapes + mild texture: the filtered rows
    compress like a real indoor photo (a few bits/pixel), unlike the
    fixture's random noise (8 bits/pixel, incompressible)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        120 + 80 * np.sin(xx / w * 3.1) * np.cos(yy / h * 2.2),
        100 + 90 * (xx / w),
        90 + 100 * (yy / h),
    ], axis=-1)
    # a few solid "objects" (ellipses of constant-ish color)
    for _ in range(12):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        ry, rx = rng.randint(20, 90), rng.randint(20, 120)
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        img[m] = rng.randint(30, 220, 3)
    # mild sensor-like texture (sigma ~2 gray levels)
    img += rng.randn(h, w, 3) * 2.0
    return np.clip(img, 0, 255).astype(np.uint8)


def save_png(path: str, arr: np.ndarray) -> int:
    from PIL import Image

    Image.fromarray(arr).save(path)
    return os.path.getsize(path)


def timed_best(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def interleaved_best(fn_a, fn_b, reps: int):
    """Alternate A and B per repetition; return (best_a, best_b)."""
    best_a = best_b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn_a()
        best_a = min(best_a, time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn_b()
        best_b = min(best_b, time.perf_counter() - t0)
    return best_a, best_b


def inflate_cost(path: str, reps: int) -> float:
    """Raw zlib inflate time of the concatenated IDAT payload — the
    irreducible part of any single-threaded PNG decode."""
    with open(path, "rb") as f:
        data = f.read()
    # walk chunks, concatenate IDAT
    idat = b""
    off = 8
    while off + 8 <= len(data):
        ln = int.from_bytes(data[off:off + 4], "big")
        typ = data[off + 4:off + 8]
        if typ == b"IDAT":
            idat += data[off + 8:off + 8 + ln]
        off += 12 + ln
    return timed_best(lambda: zlib.decompress(idat), reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--size", type=int, nargs=2, default=[640, 480])
    args = ap.parse_args()
    w, h = args.size

    from PIL import Image

    from dcl_net_tpu.data import png as npng

    assert npng.have_native(), "native decoder failed to build"

    rng = np.random.RandomState(0)
    cases = {
        "color photo-like (RGB8)": make_photo_like(w, h),
        "color random-noise (RGB8)": rng.randint(0, 255, (h, w, 3), np.uint8),
    }
    with tempfile.TemporaryDirectory() as tmp:
        print(f"{'case':34s} {'size':>8s} {'PIL ms':>8s} {'native':>8s} "
              f"{'ratio':>6s} {'inflate':>8s}")
        for name, arr in cases.items():
            path = os.path.join(tmp, "img.png")
            nbytes = save_png(path, arr)

            def pil_read(path=path):
                with open(path, "rb") as f:
                    return np.array(Image.open(io.BytesIO(f.read())))

            def native_read(path=path):
                return npng.imread(path)

            np.testing.assert_array_equal(pil_read(), native_read())
            t_pil, t_nat = interleaved_best(pil_read, native_read, args.reps)
            t_inf = inflate_cost(path, args.reps)
            print(f"{name:34s} {nbytes/1024:6.0f}KB {t_pil*1e3:8.2f} "
                  f"{t_nat*1e3:8.2f} {t_pil/t_nat:5.2f}x {t_inf*1e3:8.2f}")
            print(f"{'':34s} inflate is {t_inf/t_nat*100:.0f}% of the native "
                  f"decode ({'inflate-bound' if t_inf/t_nat > 0.7 else 'unfilter/copy-bound'})")

            # fast one-shot inflate (csrc/inflate.cpp) vs the zlib streaming
            # path, same decoder, in-process interleaved A/B via the
            # DCLX_ZLIB_INFLATE knob (read per call)
            def native_zlib(path=path):
                os.environ["DCLX_ZLIB_INFLATE"] = "1"
                try:
                    return npng.imread(path)
                finally:
                    os.environ.pop("DCLX_ZLIB_INFLATE", None)

            np.testing.assert_array_equal(native_read(), native_zlib())
            t_zl, t_fast = interleaved_best(native_zlib, native_read,
                                            args.reps)
            print(f"{'':34s} native[zlib inflate] {t_zl*1e3:.2f} ms vs "
                  f"native[fast inflate] {t_fast*1e3:.2f} ms = "
                  f"{t_zl/t_fast:.2f}x; vs PIL: {t_pil/t_fast:.2f}x")


if __name__ == "__main__":
    main()
