"""Golden clustering parity vs the reference's OWN compiled CPU BFS
(libs/pointgroup_ops/src/bfs_cluster/bfs_cluster.cpp:28-86 find_cc /
get_clusters / fill_cluster_idxs_, the code behind
pointgroup_ops.bfs_cluster), included unmodified via
tests/golden_cpp/ref_bfs.cc.

Pins ROW-EXACT output: semantic-label-constrained expansion (neighbors of a
different class are never entered), FIFO discovery order within a cluster,
seed order across clusters, threshold dropping, and the offsets layout.
The round-3 API fix this drove: our bfs_cluster previously had no
semantic_label parameter at all (label-blind components) and sorted members.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np
import pytest

from dcl_net_tpu.ops.extras import ballquery_batch_p, bfs_cluster
from tests.ref_tools import compile_reference_driver

REF_SRC = Path("/root/reference/libs/pointgroup_ops/src")
SRC_DIR = Path(__file__).parent / "golden_cpp"


@pytest.fixture(scope="session")
def bfs_lib(tmp_path_factory):
    lib = compile_reference_driver(
        tmp_path_factory, SRC_DIR / "ref_bfs.cc", [REF_SRC], "ref_bfs")
    lib.ref_bfs_cluster.restype = ctypes.c_int
    return lib


def ref_bfs(lib, semantic_label, ball_idx, start_len, threshold):
    semantic_label = np.ascontiguousarray(semantic_label, np.int32)
    ball_idx = np.ascontiguousarray(ball_idx, np.int32)
    start_len = np.ascontiguousarray(start_len, np.int32)
    n = len(semantic_label)
    cluster_idxs = np.full((n, 2), -1, np.int32)
    cluster_offsets = np.zeros(n + 1, np.int32)
    n_cluster = np.zeros(1, np.int32)

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    total = lib.ref_bfs_cluster(
        ip(semantic_label), ip(ball_idx), ip(start_len), n, threshold,
        ip(cluster_idxs), ip(cluster_offsets), ip(n_cluster))
    k = int(n_cluster[0])
    return cluster_idxs[:total], cluster_offsets[: k + 1]


def test_bfs_cluster_matches_reference(bfs_lib, rng):
    for trial in range(3):
        # clumped points with random semantic labels -> label-split clusters
        centers = rng.randn(4, 3) * 4
        xyz = np.concatenate(
            [c + rng.randn(15, 3) * 0.2 for c in centers]).astype(np.float32)
        labels = rng.randint(0, 3, len(xyz)).astype(np.int32)
        idx, start_len = ballquery_batch_p(
            xyz, np.array([0, len(xyz)]), radius=0.6, mean_active=60)
        for threshold in (1, 3, 6):
            ref_rows, ref_off = ref_bfs(bfs_lib, labels, idx, start_len,
                                        threshold)
            our_rows, our_off = bfs_cluster(labels, idx, start_len, threshold)
            np.testing.assert_array_equal(
                our_off, ref_off, err_msg=f"trial {trial} thr {threshold}")
            np.testing.assert_array_equal(our_rows, ref_rows)


def test_bfs_cluster_label_constraint(bfs_lib):
    """A chain a-b-c where b has a different class must split into singleton
    components even though the geometry connects them."""
    # 3 collinear points within radius of their neighbors
    start_len = np.array([[0, 2], [2, 3], [5, 2]], np.int32)
    ball_idx = np.array([0, 1, 0, 1, 2, 1, 2], np.int32)
    labels = np.array([7, 9, 7], np.int32)
    ref_rows, ref_off = ref_bfs(bfs_lib, labels, ball_idx, start_len, 1)
    our_rows, our_off = bfs_cluster(labels, ball_idx, start_len, 1)
    np.testing.assert_array_equal(our_rows, ref_rows)
    np.testing.assert_array_equal(our_off, ref_off)
    assert len(ref_off) - 1 == 3  # label change splits the chain
