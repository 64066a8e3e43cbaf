"""PointNet++-style grouping and set-abstraction modules (flax).

Capability parity with the reference's pointnet_lib wrappers
(reference libs/pointnet_lib/pointnet2_utils.py:274-383 QueryAndGroup /
GroupAll / KNNAndGroup and libs/pointnet_lib/pointnet2_modules.py:10-160
PointnetSAModule(MSG) / PointnetFPModule — shipped by the reference though
unused at DCL-Net runtime). Channel-last layout; fixed shapes; everything
jit-safe and differentiable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dcl_net_tpu.ops.knn import (
    ball_query,
    furthest_point_sample,
    gather_operation,
    grouping_operation,
    knn,
    nearest_neighbor_interpolate,
)


def query_and_group(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    feats: Optional[jnp.ndarray] = None,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """Ball-query neighborhoods, centered (ref pointnet2_utils.py:274-307).

    Returns [B, S, nsample, 3(+C)].
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
    if feats is None:
        return grouped_xyz
    grouped_feats = grouping_operation(feats, idx)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
    return grouped_feats


def knn_and_group(
    k: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    feats: Optional[jnp.ndarray] = None,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """KNN neighborhoods, centered (ref pointnet2_utils.py:335-383)."""
    _, idx = knn(k, new_xyz, xyz)
    grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
    if feats is None:
        return grouped_xyz
    grouped_feats = grouping_operation(feats, idx)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
    return grouped_feats


def group_all(xyz: jnp.ndarray, feats: Optional[jnp.ndarray], use_xyz: bool = True) -> jnp.ndarray:
    """Single global group (ref pointnet2_utils.py:310-333): [B, 1, N, 3(+C)]."""
    grouped = xyz[:, None, :, :]
    if feats is None:
        return grouped
    if use_xyz:
        return jnp.concatenate([grouped, feats[:, None, :, :]], axis=-1)
    return feats[:, None, :, :]


class _SharedMLP(nn.Module):
    dims: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for dim in self.dims:
            x = nn.Dense(dim, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
            x = nn.relu(x)
        return x


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (ref pointnet2_modules.py:10-102).

    npoint: FPS sample count (None = group all); per scale i: radii[i],
    nsamples[i], mlps[i].
    """

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, feats: Optional[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.npoint is not None:
            fps_idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_operation(xyz, fps_idx)
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            if self.npoint is not None:
                grouped = query_and_group(
                    xyz, new_xyz, radius, nsample, feats, self.use_xyz
                )  # [B, S, K, C]
            else:
                grouped = group_all(xyz, feats, self.use_xyz)
            out = _SharedMLP(tuple(mlp), name=f"mlp_{i}")(grouped, train)
            outs.append(jnp.max(out, axis=2))  # max over the neighborhood
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale SA module (ref pointnet2_modules.py:105-131)."""

    def __init__(self, mlp, npoint=None, radius=None, nsample=None,
                 use_xyz=True, **kw):
        super().__init__(
            npoint=npoint, radii=[radius], nsamples=[nsample], mlps=[mlp],
            use_xyz=use_xyz, **kw,
        )


class PointnetFPModule(nn.Module):
    """Feature propagation via 3-NN interpolation + unit MLP
    (ref pointnet2_modules.py:134-160)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        unknown: jnp.ndarray,          # [B, N, 3]
        known: Optional[jnp.ndarray],  # [B, M, 3]
        unknown_feats: Optional[jnp.ndarray],
        known_feats: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        if known is not None:
            interp = nearest_neighbor_interpolate(unknown, known, known_feats)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return _SharedMLP(tuple(self.mlp))(interp, train)
