"""Golden average-pool parity: the reference's OWN compiled GPU functors vs
sparse_avg_pool.

SparseAvgPool3d(use_gs=False) — the backbone's shared pool, run four times
per forward (reference models/Modules.py:153-158) — is CUDA-only in the
reference: summaryRF.cu counts the paired inputs per output (the
receptive-field population) and avgpool.cu divides the pair-sum by that
count. Unlike max pool there is NO CPU twin (maxpool.cc), so
test_golden_rulebook.py matched our op against a numpy re-derivation of
those counts. This module removes that transcription: both .cu files are
compiled from the reference checkout through the serial-CUDA shim
(stubs/cuda_serial.h; only the `<<<>>>` launch syntax is rewritten) and
driven per offset exactly like the reference's indiceSummaryRF /
indiceAvgPool / indiceAvgPoolBackward (pool_ops.h:141-246), over the
reference's own compiled rulebook.

Two channel widths exercise both dispatch paths of the reference functor:
c=5 falls through to the generic kernels; c=32 with >=32 pairs per offset
takes the vectorized int4 block kernel (NumTLP=32).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcl_net_tpu.ops.sparse_conv import sparse_avg_pool
from tests.ref_tools import compile_cuda_driver
from tests.test_golden_rulebook import (
    _pool_ref,
    random_sparse_grid,
)

REF_SPCONV = Path("/root/reference/libs/spconv")
SRC_DIR = Path(__file__).parent / "golden_cpp"


@pytest.fixture(scope="session")
def avgpool_lib(tmp_path_factory):
    return compile_cuda_driver(
        tmp_path_factory, SRC_DIR / "ref_avgpool.cc",
        {
            "spconv_avgpool_gpu.cu.inc":
                REF_SPCONV / "src" / "spconv" / "avgpool.cu",
            "spconv_summaryrf_gpu.cu.inc":
                REF_SPCONV / "src" / "spconv" / "summaryRF.cu",
        },
        [REF_SPCONV / "include"], "ref_avgpool")


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


@pytest.mark.parametrize("c,n_active", [(5, 60), (32, 300)])
def test_avg_pool_fwd_and_vjp_match_reference_functors(rulebook_lib,
                                                       avgpool_lib, rng, c,
                                                       n_active):
    d, batch, kernel, stride, padding = 10, 2, 3, 2, 1
    grid, mask, rows = random_sparse_grid(rng, batch, d, c, n_active)
    out_d, num_act, iout, pairs, num = _pool_ref(
        rulebook_lib, rows, d, batch, kernel, stride, padding)
    kv, _, pair_cap = pairs.shape
    if c == 32:
        # make sure the vectorized NumTLP=32 block kernel actually runs
        assert int(num.max()) >= 32

    in_feats = np.ascontiguousarray(
        grid[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]])
    n_in = len(rows)

    num_rf = np.zeros(num_act, np.int32)
    avgpool_lib.ref_summary_rf(_ip(pairs), _ip(num), kv, pair_cap, num_act,
                               _ip(num_rf))
    assert np.all(num_rf > 0)

    ref_out = np.zeros((num_act, c), np.float32)
    avgpool_lib.ref_avgpool_fwd(_fp(ref_out), _fp(in_feats), _ip(pairs),
                                _ip(num), kv, pair_cap, num_act, n_in, c,
                                _ip(num_rf))

    f = lambda g: sparse_avg_pool(g, jnp.asarray(mask), kernel, stride,
                                  padding)[0]
    ours, vjp = jax.vjp(f, jnp.asarray(grid))
    ours = np.asarray(ours)
    out_rows = iout[:num_act]
    got = ours[out_rows[:, 0], out_rows[:, 1], out_rows[:, 2], out_rows[:, 3]]
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)

    # backward through the reference's own functor vs jax.vjp
    d_out = rng.randn(num_act, c).astype(np.float32)
    ref_din = np.zeros((n_in, c), np.float32)
    avgpool_lib.ref_avgpool_bwd(_fp(ref_out), _fp(in_feats), _fp(d_out),
                                _fp(ref_din), _ip(pairs), _ip(num), kv,
                                pair_cap, num_act, n_in, c, _ip(num_rf))

    d_grid = np.zeros_like(ours)
    d_grid[out_rows[:, 0], out_rows[:, 1], out_rows[:, 2],
           out_rows[:, 3]] = d_out
    (our_dgrid,) = vjp(jnp.asarray(d_grid))
    our_din = np.asarray(our_dgrid)[rows[:, 0], rows[:, 1], rows[:, 2],
                                    rows[:, 3]]
    np.testing.assert_allclose(our_din, ref_din, rtol=1e-4, atol=1e-5)
