"""Rigid transforms and point-set distances (pure jnp, jit-safe).

TPU-native equivalents of the reference's point-distance losses
(L2_Dis / CD_Dis at reference models/DCL_Net.py:304-311) and the pose
composition used by the stage-2 refiner
(reference tools/train_YCBV_stage2.py:264-269).

Convention: points are row vectors [..., N, 3]; a pose (R, t) acts as
``p_cam = p_obj @ R^T + t`` matching the reference's
``torch.bmm(points, rot.transpose(1,2)) + trans.unsqueeze(1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_points(points: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply pose: points [..., N, 3], rot [..., 3, 3], trans [..., 3]."""
    return jnp.einsum("...nj,...kj->...nk", points, rot) + trans[..., None, :]


def untransform_points(points: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Inverse pose: (points - t) @ R (ref models/DCL_Net.py:285-286)."""
    return jnp.einsum("...nj,...jk->...nk", points - trans[..., None, :], rot)


def compose_pose(rot_outer, trans_outer, rot_inner, trans_inner):
    """Compose so that apply(composed) == apply(outer) . apply(inner).

    Matches the refiner's update ``t <- R @ dt + t; R <- R @ dR``
    (reference tools/train_YCBV_stage2.py:264-269).
    """
    rot = jnp.einsum("...ij,...jk->...ik", rot_outer, rot_inner)
    trans = (
        jnp.einsum("...ij,...j->...i", rot_outer, trans_inner) + trans_outer
    )
    return rot, trans


def invert_pose(rot, trans):
    rot_inv = jnp.swapaxes(rot, -1, -2)
    trans_inv = -jnp.einsum("...ij,...j->...i", rot_inv, trans)
    return rot_inv, trans_inv


def l2_distance(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-point L2 distance [..., N] (ref models/DCL_Net.py:304-305)."""
    return jnp.linalg.norm(pred - target, axis=-1)


def pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances [..., N, M] between a [..., N, 3], b [..., M, 3].

    Uses |a|^2 - 2ab + |b|^2 so the cross term runs on the MXU. Clamped at 0
    to guard against negative round-off.
    """
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    # True f32 on the cross term: TPU matmuls default to bf16 inputs, which
    # corrupts mm-scale squared distances (observed ~2e-5 self-distance).
    ab = jnp.einsum("...nd,...md->...nm", a, b, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 - 2.0 * ab + b2, 0.0)


def chamfer_distance(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Symmetric chamfer per point, matching CD_Dis (ref models/DCL_Net.py:307-311).

    Returns 0.5 * (min_m ||p_n - t_m|| + min_n ||p_n - t_m||) with shape
    [..., N] (requires N == M, as in the reference where both are 1024).
    """
    d = jnp.sqrt(pairwise_sq_dist(pred, target) + 1e-12)
    d1 = jnp.min(d, axis=-1)  # for each pred point, nearest target
    d2 = jnp.min(d, axis=-2)  # for each target point, nearest pred
    return 0.5 * (d1 + d2)


def add_metric(pred_pts: jnp.ndarray, gt_pts: jnp.ndarray) -> jnp.ndarray:
    """ADD: mean L2 distance between identically-indexed posed model points."""
    return jnp.mean(l2_distance(pred_pts, gt_pts), axis=-1)


def adds_metric(pred_pts: jnp.ndarray, gt_pts: jnp.ndarray) -> jnp.ndarray:
    """ADD-S: mean nearest-neighbor distance (symmetric-object metric).

    Matches the reference eval's chamfer-mean scoring
    (reference tools/test_YCBV_stage1.py:186-189, tools/test_LM.py:123-124).
    """
    d = jnp.sqrt(pairwise_sq_dist(pred_pts, gt_pts) + 1e-12)
    return jnp.mean(jnp.min(d, axis=-1), axis=-1)
