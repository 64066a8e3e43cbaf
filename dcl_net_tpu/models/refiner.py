"""Stage-2 iterative pose refiner (flax).

TPU-native re-design of the reference Refiner (models/refiner.py:57-95) and
losses_refiner (:99-133), plus the iteration/composition loop that the
reference drives from the trainer (tools/train_YCBV_stage2.py:224-270):

  input  = concat([(X - t) @ R  (canonicalized observed points, 3ch),
                   F_Xo_p       (stage-1 embedded features, 256ch)])  # 259ch
  conf   = stage-1 confidence [B, N+M]; softmax then truncated to the first
           N entries (reference models/refiner.py:81)
  output = delta pose; composition t <- R @ dt + t, R <- R @ dR
           (reference tools/train_YCBV_stage2.py:264-266)

The iteration loop is expressed with lax.scan (static iteration count);
poses are stop-gradient'ed between iterations exactly as the reference
detaches them, so summing per-iteration losses gives the same total gradient
as the reference's backward-per-iteration accumulation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcl_net_tpu.geometry.rotation import ortho9d_to_matrix
from dcl_net_tpu.geometry.transform import (
    chamfer_distance,
    l2_distance,
    transform_points,
    untransform_points,
)
from dcl_net_tpu.models.blocks import PointMLP
from dcl_net_tpu.registry import MODELS


@MODELS.register("Refiner")
class Refiner(nn.Module):
    """One refinement step: per-point MLP + confidence pooling + delta pose."""

    n_inp: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs: Dict[str, Any], train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = inputs["input_features"]          # [B, N, 259]
        conf = inputs["conf"]                     # [B, N+M] (stage-1 sigmoid)
        conf_softmax = jax.nn.softmax(conf, axis=1)[:, : self.n_inp]  # ref refiner.py:81

        shared = PointMLP(
            dims=(512, 512, 1024), acts=("relu",) * 3, bns=(False,) * 3,
            use_bias=True, dtype=self.dtype, name="MLP_share",
        )(feats, train)                           # [B, N, 1024]
        pooled = jnp.sum(shared * conf_softmax[..., None], axis=1)  # [B, 1024]

        ortho9d = PointMLP(
            dims=(512, 128, 9), acts=("relu", "relu", "none"), bns=(False,) * 3,
            use_bias=True, dtype=self.dtype, name="regressor_rot2",
        )(pooled[:, None, :], train)[:, 0, :]
        delta_t = PointMLP(
            dims=(512, 128, 3), acts=("relu", "relu", "none"), bns=(False,) * 3,
            use_bias=True, dtype=self.dtype, name="regressor_trans2",
        )(pooled[:, None, :], train)[:, 0, :]
        delta_r = ortho9d_to_matrix(ortho9d[:, :3], ortho9d[:, 3:6], ortho9d[:, 6:])
        return {"rot_pred": delta_r, "trans_pred": delta_t}


def refiner_losses(
    pred_refiner: Dict[str, jnp.ndarray],
    trans_cur: jnp.ndarray,
    rot_cur: jnp.ndarray,
    points_tmp: jnp.ndarray,
    sym_flag: jnp.ndarray,
    rot_gt: jnp.ndarray,
    trans_gt: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Refiner point-matching loss (reference models/refiner.py:102-125).

    The CAD cloud is posed by the delta, then by the (detached) current pose,
    and compared against the gt-posed cloud with the sym-aware L2/chamfer mix.
    """
    sym = sym_flag[:, None]
    b = rot_cur.shape[0]
    if valid is None:
        valid = jnp.ones((b,), rot_cur.dtype)
    w = valid / jnp.maximum(jnp.sum(valid), 1.0)

    posed_delta = transform_points(
        points_tmp, pred_refiner["rot_pred"], pred_refiner["trans_pred"]
    )
    posed_gt = transform_points(points_tmp, rot_gt, trans_gt)
    posed_refined = transform_points(posed_delta, rot_cur, trans_cur)

    per_point = (1 - sym) * l2_distance(posed_refined, posed_gt) + \
        sym * chamfer_distance(posed_refined, posed_gt)
    loss_pose = jnp.sum(w * jnp.mean(per_point, axis=1))
    return {"loss_pose": loss_pose, "loss_all": loss_pose}


def refine_pose(
    refiner_apply,
    variables,
    points_inp: jnp.ndarray,     # [B, N, 3]
    f_xo_p: jnp.ndarray,         # [B, N, 256]
    conf: jnp.ndarray,           # [B, N+M]
    rot_init: jnp.ndarray,
    trans_init: jnp.ndarray,
    iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the full refinement loop (inference path) as a lax.scan.

    Matches the eval loop composition (reference tools/test_YCBV_stage2.py:
    214-225): canonicalize -> refiner -> compose -> repeat.
    """

    def step(carry, _):
        rot_cur, trans_cur = carry
        inp_cano = untransform_points(points_inp, rot_cur, trans_cur)
        feats = jnp.concatenate([inp_cano, f_xo_p], axis=-1)
        out = refiner_apply(variables, {"input_features": feats, "conf": conf})
        rot_new = jnp.einsum("bij,bjk->bik", rot_cur, out["rot_pred"],
                             precision=jax.lax.Precision.HIGHEST)
        trans_new = jnp.einsum(
            "bij,bj->bi", rot_cur, out["trans_pred"],
            precision=jax.lax.Precision.HIGHEST,
        ) + trans_cur
        return (rot_new, trans_new), None

    # pose composition is geometry: carry in f32 regardless of the model's
    # compute dtype (the bf16 production config emits bf16 trans_pred, and
    # the HIGHEST-precision compose returns f32 — a mixed-dtype carry would
    # fail scan's type check)
    (rot, trans), _ = jax.lax.scan(
        step,
        (rot_init.astype(jnp.float32), trans_init.astype(jnp.float32)),
        None, length=iterations,
    )
    return rot, trans
