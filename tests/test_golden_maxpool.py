"""Golden max-pool parity vs the reference's OWN compiled CPU functors
(libs/spconv/src/spconv/maxpool.cc:20-91), driven through pool_ops.h's
per-offset loop semantics (indiceMaxPool :27-62 incl. its torch::zeros
output init, indiceMaxPoolBackward :113-139, indiceFieldMaxPool :64-111).

Pins two behaviors a transcription could easily get wrong:
- the zeros init CLAMPS all-negative receptive fields at 0 (the reference's
  shipped behavior — see the commented-out "smallest" at pool_ops.h:38-39);
  our sparse_max_pool's default zero_init=True matches, and its VJP matches
  the reference's out==in gradient routing (no gradient through the clamp);
- field max pool copies whole field vectors by NORM comparison
  (sparse_field_max_pool in ops/extras.py).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcl_net_tpu.ops.extras import sparse_field_max_pool
from dcl_net_tpu.ops.sparse_conv import sparse_max_pool
from tests.ref_tools import compile_reference_driver
from tests.test_golden_rulebook import (
    CONV,
    random_sparse_grid,
    ref_pairs,
)

REF_ROOT = Path("/root/reference/libs/spconv")
SRC_DIR = Path(__file__).parent / "golden_cpp"


@pytest.fixture(scope="session")
def maxpool_lib(tmp_path_factory):
    lib = compile_reference_driver(
        tmp_path_factory, SRC_DIR / "ref_maxpool.cc",
        [REF_ROOT / "include", REF_ROOT], "ref_maxpool")
    return lib

# rulebook_lib fixture: tests/conftest.py (shared with test_golden_rulebook)


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _pool_pairs(rulebook_lib, rows, d, batch, kernel=3, stride=2, padding=1):
    out_d = (d + 2 * padding - kernel) // stride + 1
    num_act, iout, pairs, num = ref_pairs(
        rulebook_lib, rows, [out_d] * 3, [kernel] * 3, [stride] * 3,
        [padding] * 3, [1] * 3, CONV, batch)
    return out_d, num_act, iout, pairs, num


def test_max_pool_fwd_matches_reference_functor(maxpool_lib, rulebook_lib, rng):
    d, c, batch = 10, 5, 2
    grid, mask, rows = random_sparse_grid(rng, batch, d, c, 60)
    grid -= 0.5  # plenty of negative values to exercise the zeros-init clamp
    grid *= mask[..., None]
    out_d, num_act, iout, pairs, num = _pool_pairs(rulebook_lib, rows, d, batch)

    in_feats = np.ascontiguousarray(
        grid[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]], np.float32)
    ref_out = np.zeros((num_act, c), np.float32)  # pool_ops.h:37 zeros init
    maxpool_lib.ref_maxpool_fwd(
        _fptr(ref_out), _fptr(in_feats), _iptr(pairs), _iptr(num),
        pairs.shape[0], pairs.shape[2], num_act, len(rows), c)

    ours, new_mask = sparse_max_pool(jnp.asarray(grid), jnp.asarray(mask), 3, 2, 1)
    ours = np.asarray(ours)
    out_rows = iout[:num_act]
    got = ours[out_rows[:, 0], out_rows[:, 1], out_rows[:, 2], out_rows[:, 3]]
    np.testing.assert_allclose(got, ref_out, rtol=1e-6, atol=1e-6)
    assert (ref_out.min() == 0.0) or (got.min() == ref_out.min())
    # the clamp actually fired somewhere (all-negative RFs exist)
    assert np.any((ref_out == 0.0) & (got == 0.0))


def test_max_pool_vjp_matches_reference_backward(maxpool_lib, rulebook_lib, rng):
    d, c, batch = 8, 4, 1
    grid, mask, rows = random_sparse_grid(rng, batch, d, c, 40)
    grid -= 0.5
    grid *= mask[..., None]
    out_d, num_act, iout, pairs, num = _pool_pairs(rulebook_lib, rows, d, batch)

    in_feats = np.ascontiguousarray(
        grid[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]], np.float32)
    ref_out = np.zeros((num_act, c), np.float32)
    maxpool_lib.ref_maxpool_fwd(
        _fptr(ref_out), _fptr(in_feats), _iptr(pairs), _iptr(num),
        pairs.shape[0], pairs.shape[2], num_act, len(rows), c)

    dout = rng.randn(num_act, c).astype(np.float32)
    ref_din = np.zeros_like(in_feats)
    maxpool_lib.ref_maxpool_bwd(
        _fptr(ref_out), _fptr(in_feats), _fptr(np.ascontiguousarray(dout)),
        _fptr(ref_din), _iptr(pairs), _iptr(num),
        pairs.shape[0], pairs.shape[2], num_act, len(rows), c)

    # cotangent on the dense output grid at the reference's active sites
    dout_grid = np.zeros((batch, out_d, out_d, out_d, c), np.float32)
    out_rows = iout[:num_act]
    dout_grid[out_rows[:, 0], out_rows[:, 1], out_rows[:, 2], out_rows[:, 3]] = dout

    def f(g):
        return sparse_max_pool(g, jnp.asarray(mask), 3, 2, 1)[0]

    _, vjp = jax.vjp(f, jnp.asarray(grid))
    din_grid = np.asarray(vjp(jnp.asarray(dout_grid))[0])
    got = din_grid[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]]
    np.testing.assert_allclose(got, ref_din, rtol=1e-5, atol=1e-6)


def test_max_pool_vjp_matches_reference_on_ties(maxpool_lib, rulebook_lib, rng):
    """Quantized features force exact ties inside windows: the reference
    backward adds dout to EVERY input with out == in (maxpool.cc:87-88), so
    a tied maximum receives the cotangent multiple times. Plain
    select-and-scatter picks a single winner; the custom VJP must not."""
    d, c, batch = 8, 3, 1
    grid, mask, rows = random_sparse_grid(rng, batch, d, c, 50)
    # quantize to a handful of levels -> many exact ties, incl. negatives
    grid = (np.round(grid * 1.5).astype(np.float32) / 2.0) * mask[..., None]
    out_d, num_act, iout, pairs, num = _pool_pairs(rulebook_lib, rows, d, batch)

    in_feats = np.ascontiguousarray(
        grid[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]], np.float32)
    ref_out = np.zeros((num_act, c), np.float32)
    maxpool_lib.ref_maxpool_fwd(
        _fptr(ref_out), _fptr(in_feats), _iptr(pairs), _iptr(num),
        pairs.shape[0], pairs.shape[2], num_act, len(rows), c)
    dout = rng.randn(num_act, c).astype(np.float32)
    ref_din = np.zeros_like(in_feats)
    maxpool_lib.ref_maxpool_bwd(
        _fptr(ref_out), _fptr(in_feats), _fptr(np.ascontiguousarray(dout)),
        _fptr(ref_din), _iptr(pairs), _iptr(num),
        pairs.shape[0], pairs.shape[2], num_act, len(rows), c)

    dout_grid = np.zeros((batch, out_d, out_d, out_d, c), np.float32)
    out_rows = iout[:num_act]
    dout_grid[out_rows[:, 0], out_rows[:, 1], out_rows[:, 2], out_rows[:, 3]] = dout

    def f(g):
        return sparse_max_pool(g, jnp.asarray(mask), 3, 2, 1)[0]

    _, vjp = jax.vjp(f, jnp.asarray(grid))
    din_grid = np.asarray(vjp(jnp.asarray(dout_grid))[0])
    got = din_grid[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]]
    np.testing.assert_allclose(got, ref_din, rtol=1e-5, atol=1e-6)
    # the tie path actually fired: some input receives gradient from a
    # window where it ties with another input
    assert np.any(np.abs(got) > 0)


def test_field_max_pool_matches_reference_functor(maxpool_lib, rulebook_lib, rng):
    d, batch, F, C = 8, 1, 3, 4
    _, mask, rows = random_sparse_grid(rng, batch, d, 1, 30)
    fields = rng.randn(batch, d, d, d, F, C).astype(np.float32)
    fields *= mask[..., None, None]
    out_d, num_act, iout, pairs, num = _pool_pairs(rulebook_lib, rows, d, batch)

    flat = fields.reshape(batch, d, d, d, F * C)
    in_feats = np.ascontiguousarray(
        flat[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]], np.float32)
    # per-field norms replicated over the C components (pool.py get_field_norm)
    norms = np.linalg.norm(
        fields[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]], axis=-1)
    in_norms = np.ascontiguousarray(
        np.repeat(norms, C, axis=-1), np.float32)

    ref_out = np.zeros((num_act, F * C), np.float32)
    ref_onorm = np.zeros((num_act, F * C), np.float32)
    maxpool_lib.ref_field_maxpool_fwd(
        _fptr(ref_out), _fptr(in_feats), _fptr(ref_onorm), _fptr(in_norms),
        _iptr(pairs), _iptr(num), pairs.shape[0], pairs.shape[2], num_act,
        len(rows), F * C)

    ours, _ = sparse_field_max_pool(jnp.asarray(fields), jnp.asarray(mask), 3, 2)
    ours = np.asarray(ours).reshape(batch, out_d, out_d, out_d, F * C)
    out_rows = iout[:num_act]
    got = ours[out_rows[:, 0], out_rows[:, 1], out_rows[:, 2], out_rows[:, 3]]
    np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-6)
