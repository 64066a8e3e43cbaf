"""Fused compaction->interp kernel (ops/pallas_fused.py) parity.

The fused stage must reproduce the two-stage composition
(pallas_dense_to_sparse -> voxel_centers -> pallas_nn_interpolate) exactly
— forward AND gradients — since it only removes the XLA glue between them.
Runs the kernels in interpret mode on CPU (conftest forces the platform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcl_net_tpu.ops.pallas_compact import pallas_dense_to_sparse
from dcl_net_tpu.ops.pallas_fused import pallas_compact_interpolate
from dcl_net_tpu.ops.pallas_interp import pallas_nn_interpolate
from dcl_net_tpu.ops.sparse_conv import voxel_centers


def _setup(rng, b=2, d=8, c=16, n=128, occ=40, dtype=jnp.float32):
    mask = np.zeros((b, d, d, d), np.float32)
    for i in range(b):
        idx = rng.integers(0, d, size=(occ, 3))
        mask[i, idx[:, 0], idx[:, 1], idx[:, 2]] = 1.0
    feats = jnp.asarray(rng.normal(size=(b, d, d, d, c)), dtype)
    maskj = jnp.asarray(mask)
    unit = (0.01, 0.01, 0.01)
    scale = 2.0
    offset = tuple(-0.5 * 0.01 * d * scale for _ in range(3))
    pts = jnp.asarray(rng.normal(size=(b, n, 3)) * 0.04, jnp.float32)
    return feats, maskj, pts, unit, scale, offset


def _two_stage(feats, mask, pts, cap, unit, scale, offset):
    coords, vfeats, vmask = pallas_dense_to_sparse(feats, mask, cap)
    centers = voxel_centers(coords, unit, scale, offset)
    return pallas_nn_interpolate(pts, centers, vfeats, vmask)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_two_stage_forward(dtype):
    rng = np.random.default_rng(0)
    feats, mask, pts, unit, scale, offset = _setup(rng, dtype=dtype)
    cap = 64
    us = tuple(u * scale for u in unit)

    ref = jax.jit(lambda f, m, p: _two_stage(f, m, p, cap, unit, scale,
                                             offset))(feats, mask, pts)
    got = jax.jit(lambda f, m, p: pallas_compact_interpolate(
        f, m, p, cap, us, offset))(feats, mask, pts)
    assert got.dtype == ref.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=1e-5, rtol=1e-5)


def test_fused_matches_two_stage_gradients():
    rng = np.random.default_rng(1)
    feats, mask, pts, unit, scale, offset = _setup(rng)
    cap = 64
    us = tuple(u * scale for u in unit)

    def loss_two(f):
        out = _two_stage(f, mask, pts, cap, unit, scale, offset)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_fused(f):
        out = pallas_compact_interpolate(f, mask, pts, cap, us, offset)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g_ref = jax.jit(jax.grad(loss_two))(feats)
    g_got = jax.jit(jax.grad(loss_fused))(feats)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_overcapacity_matches_two_stage():
    """When occupancy exceeds capacity both paths must drop the SAME
    highest-index voxels (the [:capacity] slice vs the in-kernel row bound)."""
    rng = np.random.default_rng(2)
    feats, mask, pts, unit, scale, offset = _setup(rng, occ=200)
    cap = 32  # far below the ~200-voxel occupancy
    us = tuple(u * scale for u in unit)
    ref = jax.jit(lambda f: _two_stage(f, mask, pts, cap, unit, scale,
                                       offset))(feats)
    got = jax.jit(lambda f: pallas_compact_interpolate(
        f, mask, pts, cap, us, offset))(feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_model_level_fused_matches_pallas():
    """DCLNet(interp_mode='pallas_fused') poses equal the two-stage pallas
    model's (same weights)."""
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.models import DCLNet

    grid, unit, n = (16, 16, 16), (0.024, 0.024, 0.024), 128
    ds = SyntheticPoseDataset(n_objects=2, n_points=n, unit_voxel_extent=unit,
                              voxel_num_limit=grid, seed=0)
    batch = jax.tree.map(jnp.asarray,
                         make_batch([ds[i] for i in range(2)]).to_dict())
    kw = dict(unit_voxel_extent=unit, voxel_num_limit=grid, n_inp=n, n_tmp=n,
              capacities=(256, 64, 16, 8))
    m_two = DCLNet(interp_mode="pallas", **kw)
    m_fused = DCLNet(interp_mode="pallas_fused", **kw)
    variables = jax.jit(m_two.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    out_two = jax.jit(lambda v, b: m_two.apply(v, b, train=False))(
        variables, batch)
    out_fused = jax.jit(lambda v, b: m_fused.apply(v, b, train=False))(
        variables, batch)
    np.testing.assert_allclose(
        np.asarray(out_fused["rot_pred"]), np.asarray(out_two["rot_pred"]),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_fused["trans_pred"]),
        np.asarray(out_two["trans_pred"]), atol=1e-5)
