"""Golden NMS parity vs the reference's OWN compiled CPU non-max suppression
(libs/spconv/include/spconv/nms.h:30-76 non_max_suppression_cpu, the function
behind spconv.utils.non_max_suppression_cpu), included unmodified via
tests/golden_cpp/ref_nms.cc (py::array_t / boost stubs; the CPU function
touches neither).

Pins keep-list CONTENT AND ORDER, the >=-threshold suppression boundary
(exact-tie case included), and the eps corner the reference exposes.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np
import pytest

from dcl_net_tpu.ops.extras import nms
from tests.ref_tools import compile_reference_driver

REF_INCLUDE = Path("/root/reference/libs/spconv/include")
SRC_DIR = Path(__file__).parent / "golden_cpp"


@pytest.fixture(scope="session")
def nms_lib(tmp_path_factory):
    lib = compile_reference_driver(
        tmp_path_factory, SRC_DIR / "ref_nms.cc", [REF_INCLUDE], "ref_nms")
    lib.ref_nms_cpu.restype = ctypes.c_int
    lib.ref_nms_cpu.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_float,
        ctypes.c_float, ctypes.c_void_p,
    ]
    return lib


def ref_nms(lib, boxes, order, thresh, eps=0.0):
    boxes = np.ascontiguousarray(boxes, np.float32)
    order = np.ascontiguousarray(order, np.int32)
    n = len(boxes)
    keep = np.full(n, -1, np.int32)
    m = lib.ref_nms_cpu(boxes.ctypes.data, n, order.ctypes.data,
                        float(thresh), float(eps), keep.ctypes.data)
    return keep[:m]


def random_boxes(rng, n, span=10.0):
    xy = rng.rand(n, 2).astype(np.float32) * span
    wh = rng.rand(n, 2).astype(np.float32) * 3 + 0.1
    return np.concatenate([xy, xy + wh], 1)


def test_nms_matches_reference(nms_lib, rng):
    for trial in range(5):
        n = 60
        boxes = random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        order = np.argsort(-scores).astype(np.int32)
        for thresh in (0.1, 0.3, 0.7):
            ref = ref_nms(nms_lib, boxes, order, thresh)
            ours = nms(boxes, scores, thresh)
            np.testing.assert_array_equal(
                ours, ref, err_msg=f"trial {trial} thresh {thresh}")


def test_nms_exact_tie_suppresses_like_reference(nms_lib):
    """Identical boxes have IoU exactly 1.0: the reference suppresses at
    ovr >= thresh (nms.h:69), so thresh=1.0 must still suppress the twin."""
    boxes = np.array([[0, 0, 2, 2], [0, 0, 2, 2], [5, 5, 6, 6]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    order = np.argsort(-scores).astype(np.int32)
    ref = ref_nms(nms_lib, boxes, order, 1.0)
    ours = nms(boxes, scores, 1.0)
    np.testing.assert_array_equal(ours, ref)
    assert list(ref) == [0, 2]  # the duplicate IS suppressed at ovr==thresh


def test_nms_half_overlap_boundary(nms_lib):
    """Boxes engineered to land exactly ON the threshold."""
    # unit squares overlapping half: inter=0.5, union=1.5, iou=1/3
    boxes = np.array([[0, 0, 1, 1], [0.5, 0, 1.5, 1]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    order = np.argsort(-scores).astype(np.int32)
    thresh = np.float32(0.5 / 1.5)
    ref = ref_nms(nms_lib, boxes, order, thresh)
    ours = nms(boxes, scores, float(thresh))
    np.testing.assert_array_equal(ours, ref)
