"""DCL-Net: dual-branch correspondence learning network for 6D pose (flax).

TPU-native re-design of the reference Network (models/DCL_Net.py:38-259) and
its losses (:261-311). One fused jittable graph: voxelization, the two sparse
backbones, multi-scale interpolation, bidirectional feature-disengagement
attention (FDA), confidence-weighted pose regression and the SVD
orthogonalization all compile into a single XLA program.

The forward is split into three jointly-jittable stages:
  encode_observed / encode_template: voxelize -> backbone -> multi-scale
    interp -> the four disengage heads of that branch,
  fuse: bidirectional attention + confidence + pose heads.
__call__ = fuse(encode_observed(x), encode_template(y)) reproduces the
reference forward exactly. Because the template branch depends only on the
(fixed, per-class) CAD cloud, eval can run encode_template once per class and
reuse it for every frame — a ~2x inference saving unavailable to the
reference's monolithic forward (see eval/evaluator.py).

Data contract (fixed shapes, channel-last):
  batch = {
    "inp":  {"feats": [B,N,7], "voxel_idx": [B,N,3]},   # [1, rgb, xyz]
    "tmp":  {"feats": [B,M,7], "voxel_idx": [B,M,3]},
    "labels": {"rot_gt": [B,3,3], "trans_gt": [B,3], "obj_idx": [B]},
    "sym_flag": [B]  (1.0 = symmetric object),
    "valid":    [B]  (1.0 = real sample; padding rows carry 0.0),
  }
mirroring the reference collate output (YCBV/dataloader_train_YCBV.py:
241-266) with the ragged flattening replaced by a batched layout and the CPU
hash-map voxelization replaced by an in-graph scatter.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

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
from dcl_net_tpu.models.backbone import MultiScalePointFeatures, SparseBackbone
from dcl_net_tpu.models.blocks import PointMLP
from dcl_net_tpu.ops.knn import knn
from dcl_net_tpu.ops.pallas_voxelize import pallas_voxelize
from dcl_net_tpu.ops.voxelize import voxelize_dense
from dcl_net_tpu.registry import MODELS


def _disengager(name: str, out_dim: int, dtype) -> PointMLP:
    # Two 1x1 conv blocks, 480->256->out, BN before act, no bias
    # (reference models/DCL_Net.py:56-101, BasicBlock_3DCONV ordering).
    return PointMLP(
        dims=(256, out_dim), acts=("relu", "relu"), bns=(True, True),
        bn_before_act=True, use_bias=False, dtype=dtype, name=name,
    )


def _head(name: str, dims, acts, bns, dtype) -> PointMLP:
    # Head_MultiLayerPerceptron: Conv1d stacks with bias, BN after act
    # (reference models/Modules.py:173-201).
    return PointMLP(dims=dims, acts=acts, bns=bns, bn_before_act=False,
                    use_bias=True, dtype=dtype, name=name)


def aligner(ri_1: jnp.ndarray, ri_2: jnp.ndarray, re_2: jnp.ndarray):
    """Cross-attention Aligner (reference models/Modules.py:162-169).

    ri_1: [B, N1, C] matching feats of branch 1 (attention targets),
    ri_2: [B, N2, C] matching feats of branch 2,
    re_2: [B, N2, E] positional feats of branch 2.
    Returns (re_embed [B, N1, E], attention [B, N2, N1], softmax over N2).
    """
    logits = jnp.einsum("bmc,bnc->bmn", ri_2, ri_1)
    att = jax.nn.softmax(logits, axis=1)
    re_embed = jnp.einsum("bme,bmn->bne", re_2, att)
    return re_embed, att


@MODELS.register("DCL_Net")
class DCLNet(nn.Module):
    """The stage-1 DCL-Net (reference models/DCL_Net.py Network)."""

    voxelization_mode: int = 4
    unit_voxel_extent: Sequence[float] = (0.006, 0.006, 0.006)
    voxel_num_limit: Sequence[int] = (64, 64, 64)
    n_inp: int = 1024
    n_tmp: int = 1024
    kernel_size: int = 3
    # Per-level occupied-voxel budgets for the padded sparse extraction.
    # Measured worst-case occupancy at the production shapes (1024-point
    # surface clouds, 64^3 grid) is ~700/300/190/64 per level (docs/PERF.md)
    # — these defaults carry ~3x margin, pose outputs are BIT-IDENTICAL to
    # the 4096/8192 budgets on the bench workload (scripts/bench_caps.py),
    # and the level-0 compaction kernel runs ~20% faster (its VMEM out block
    # scales with the budget). Larger budgets remain configurable for
    # adversarial inputs (uniformly scattered points can dilate to 8x1024 at
    # level 0). Overflow degrades (drops highest-index voxels), never
    # crashes, and is guarded by the >=2x occupancy-margin test
    # (tests/test_model.py).
    # (levels 2/3 hold their ENTIRE 8^3/4^3 grids — no overflow possible)
    capacities: Sequence[int] = (2048, 1024, 512, 64)
    scale_list: Sequence[int] = (2, 4, 6, 8)  # reference quirk, DCL_Net.py:54
    interp_mode: str = "exact"
    # "scatter" = exact XLA scatter-add (reference semantics to f32);
    # "matmul" = Pallas factorized one-hot matmul (ops/pallas_voxelize.py) —
    # the backend's serial scatter costs ~25 ms at B=256 regardless of
    # formulation; with bf16 compute dtype the payloads ride the single-pass
    # MXU path (14.1 ms measured: sums of bf16-rounded features, exact f32
    # counts). With f32 payloads the kernel needs HIGHEST precision and is
    # SLOWER than the scatter (55 ms), so the tools default to matmul only
    # under TPU+bf16 (alongside interp_mode="pallas").
    voxelize_impl: str = "scatter"
    dtype: Optional[jnp.dtype] = None  # compute dtype for the big matmuls
    # Rematerialize the backbones in the backward pass: drops the dense-grid
    # conv activations (the dominant training-memory term — [B, 64^3, C]
    # stacks) and recomputes them when gradients need them. B=256 training
    # needs 19.2G HBM without remat (OOM on a 16G v5e chip), fits with it;
    # ~15-30% extra forward compute in exchange. Off by default (the
    # reference B=32/40 configs fit comfortably).
    remat: bool = False

    def setup(self):
        kw = dict(kernel_size=self.kernel_size, dtype=self.dtype)
        # static_argnums counts self: (grid=1, mask=2, train=3)
        bb_cls = (nn.remat(SparseBackbone, static_argnums=(3,))
                  if self.remat else SparseBackbone)
        self.backbone_inp = bb_cls(name="backbone_inp", **kw)
        self.backbone_tmp = bb_cls(name="backbone_tmp", **kw)
        pf_kw = dict(
            unit_voxel_extent=tuple(self.unit_voxel_extent),
            voxel_num_limit=tuple(int(d) for d in self.voxel_num_limit),
            scale_list=tuple(self.scale_list),
            capacities=tuple(self.capacities),
            interp_mode=self.interp_mode,
        )
        self.point_feats_inp = MultiScalePointFeatures(name="point_feats_inp", **pf_kw)
        self.point_feats_tmp = MultiScalePointFeatures(name="point_feats_tmp", **pf_kw)

        self.disengage_Xc_p1 = _disengager("disengage_Xc_p1", 256, self.dtype)
        self.disengage_Xc_m1 = _disengager("disengage_Xc_m1", 64, self.dtype)
        self.disengage_Xc_p2 = _disengager("disengage_Xc_p2", 256, self.dtype)
        self.disengage_Xc_m2 = _disengager("disengage_Xc_m2", 64, self.dtype)
        self.disengage_Yo_p1 = _disengager("disengage_Yo_p1", 256, self.dtype)
        self.disengage_Yo_m1 = _disengager("disengage_Yo_m1", 64, self.dtype)
        self.disengage_Yo_p2 = _disengager("disengage_Yo_p2", 256, self.dtype)
        self.disengage_Yo_m2 = _disengager("disengage_Yo_m2", 64, self.dtype)

        self.regressor_Xo = _head("regressor_Xo", (256, 128, 3),
                                  ("relu", "relu", "none"), (False,) * 3, self.dtype)
        self.regressor_Yc = _head("regressor_Yc", (256, 128, 3),
                                  ("relu", "relu", "none"), (False,) * 3, self.dtype)
        self.regressor_conf = _head("regressor_conf", (128, 128, 1),
                                    ("relu", "relu", "none"), (False,) * 3, self.dtype)
        self.regressor_conf_bi = _head("regressor_conf_bi", (128, 128, 1),
                                       ("relu", "relu", "none"), (False,) * 3, self.dtype)
        self.neck_fuser = _head("neck_fuser", (512, 512, 1024),
                                ("relu",) * 3, (True,) * 3, self.dtype)
        self.neck_fuser_bi = _head("neck_fuser_bi", (512, 512, 1024),
                                   ("relu",) * 3, (True,) * 3, self.dtype)
        self.regressor_rot = _head("regressor_rot", (512, 128, 9),
                                   ("relu", "relu", "none"), (False,) * 3, self.dtype)
        self.regressor_trans = _head("regressor_trans", (512, 128, 3),
                                     ("relu", "relu", "none"), (False,) * 3, self.dtype)

    # ------------------------------------------------------------------
    # Branch encoders
    # ------------------------------------------------------------------
    def _encode(self, backbone, point_feats, feats, voxel_idx, train):
        grid_shape = tuple(int(d) for d in self.voxel_num_limit)
        if self.voxelize_impl == "matmul" and self.voxelization_mode in (3, 4):
            grid, count = pallas_voxelize(
                feats, voxel_idx, grid_shape, mode=self.voxelization_mode,
                out_dtype=self.dtype or feats.dtype,
            )
        else:
            grid, count = voxelize_dense(
                feats, voxel_idx, grid_shape, mode=self.voxelization_mode
            )
        mask = (count > 0).astype(feats.dtype)
        pyramid = backbone(grid, mask, train)
        points = feats[..., 4:7]
        interp, overflow = point_feats(points, pyramid)
        return points, interp, overflow

    def encode_observed(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, jnp.ndarray]:
        """Observed branch: backbone + interp + the four Xc disengage heads."""
        points, f_xc, overflow = self._encode(
            self.backbone_inp, self.point_feats_inp,
            batch["inp"]["feats"], batch["inp"]["voxel_idx"], train,
        )
        return {
            "points": points,
            "overflow": overflow,
            "p1": self.disengage_Xc_p1(f_xc, train),
            "m1": self.disengage_Xc_m1(f_xc, train),
            "p2": self.disengage_Xc_p2(f_xc, train),
            "m2": self.disengage_Xc_m2(f_xc, train),
        }

    def encode_template(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, jnp.ndarray]:
        """Template branch: backbone + interp + the four Yo disengage heads.

        Depends only on the CAD cloud -> cacheable per class at eval."""
        points, f_yo, overflow = self._encode(
            self.backbone_tmp, self.point_feats_tmp,
            batch["tmp"]["feats"], batch["tmp"]["voxel_idx"], train,
        )
        return {
            "points": points,
            "overflow": overflow,
            "p1": self.disengage_Yo_p1(f_yo, train),
            "m1": self.disengage_Yo_m1(f_yo, train),
            "p2": self.disengage_Yo_p2(f_yo, train),
            "m2": self.disengage_Yo_m2(f_yo, train),
        }

    # ------------------------------------------------------------------
    # Fusion: FDA attention + confidence + pose heads
    # ------------------------------------------------------------------
    def fuse(self, obs: Dict[str, jnp.ndarray], tmp: Dict[str, jnp.ndarray],
             train: bool = False) -> Dict[str, jnp.ndarray]:
        # Forward direction: template -> observed (reference DCL_Net.py:206-207)
        f_xo_p, att = aligner(obs["m1"], tmp["m1"], tmp["p1"])   # [B, N, 256]
        xo_pred = self.regressor_Xo(f_xo_p, train)
        # Backward direction: observed -> template (reference DCL_Net.py:209-210)
        f_yc_p, att_bi = aligner(tmp["m2"], obs["m2"], obs["p2"])  # [B, M, 256]
        yc_pred = self.regressor_Yc(f_yc_p, train)

        # Confidence (reference DCL_Net.py:213-221)
        f_xo_m = jnp.einsum("bmc,bmn->bnc", tmp["m1"], att)       # [B, N, 64]
        f_m1 = jnp.concatenate([obs["m1"], f_xo_m], axis=-1)      # [B, N, 128]
        f_yc_m = jnp.einsum("bnc,bnm->bmc", obs["m2"], att_bi)    # [B, M, 64]
        f_m2 = jnp.concatenate([f_yc_m, tmp["m2"]], axis=-1)      # [B, M, 128]
        conf_1 = self.regressor_conf(f_m1, train)
        conf_2 = self.regressor_conf_bi(f_m2, train)
        conf = jax.nn.sigmoid(jnp.concatenate([conf_1, conf_2], axis=1))
        conf_softmax = jax.nn.softmax(conf, axis=1)

        # Fused global feature + pose heads (reference DCL_Net.py:223-235)
        f_p1 = jnp.concatenate([obs["p1"], f_xo_p], axis=-1)      # [B, N, 512]
        f_p2 = jnp.concatenate([f_yc_p, tmp["p2"]], axis=-1)      # [B, M, 512]
        f_p1 = self.neck_fuser(f_p1, train)
        f_p2 = self.neck_fuser_bi(f_p2, train)
        f_p = jnp.concatenate([f_p1, f_p2], axis=1)               # [B, N+M, 1024]
        f_p_wei = jnp.sum(f_p * conf_softmax, axis=1)             # [B, 1024]

        ortho9d = self.regressor_rot(f_p_wei[:, None, :], train)[:, 0, :]
        rot_pred = ortho9d_to_matrix(
            ortho9d[:, :3], ortho9d[:, 3:6], ortho9d[:, 6:]
        )
        trans_pred = self.regressor_trans(f_p_wei[:, None, :], train)[:, 0, :]

        # Capacity-overflow signal: True where either branch dropped occupied
        # voxels past its static extraction budget (see backbone.py). Older
        # cached encodings may lack the key; default to all-clear.
        ovf_o = obs.get("overflow")
        ovf_t = tmp.get("overflow")
        if ovf_o is None and ovf_t is None:
            overflow = jnp.zeros(rot_pred.shape[0], bool)
        elif ovf_o is None:
            overflow = ovf_t
        elif ovf_t is None:
            overflow = ovf_o
        else:
            overflow = ovf_o | ovf_t

        return {
            "trans_pred": trans_pred,            # [B, 3]
            "rot_pred": rot_pred,                # [B, 3, 3]
            "conf": conf[..., 0],                # [B, N+M]
            "overflow": overflow,                # [B] bool, capacity overflow
            "F_Xo_p": f_xo_p,                    # [B, N, 256]
            "Xo_pred": xo_pred,                  # [B, N, 3]
            "Yc_pred": yc_pred,                  # [B, M, 3]
            "points_inp": obs["points"],         # [B, N, 3]
            "points_tmp": tmp["points"],         # [B, M, 3]
        }

    def __call__(self, batch: Dict[str, Any], train: bool = False) -> Dict[str, jnp.ndarray]:
        obs = self.encode_observed(batch, train)
        tmp = self.encode_template(batch, train)
        return self.fuse(obs, tmp, train)

    def forward_with_template_bank(
        self, batch: Dict[str, Any], bank: Dict[str, jnp.ndarray],
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Forward that encodes the per-class template bank ONCE and gathers
        per instance — the training-side analogue of the evaluator's
        template-feature cache (templates are per-class constants in the
        reference training pipeline too: the CAD cloud is sampled once at
        dataset init, reference YCBV/dataloader_train_YCBV.py:59-76).

        Exact when batch classes are distinct; with duplicate classes the
        template-branch BN batch statistics weight each CLASS equally instead
        of each instance — statistically equivalent, not bit-matching, hence
        opt-in for training (cfg.train_template_bank).

        bank: {"feats": [C, M, 7], "voxel_idx": [C, M, 3]}.
        """
        obs = self.encode_observed(batch, train)
        tmp_all = self.encode_template({"tmp": bank}, train)
        cls = batch["labels"]["obj_idx"]
        tmp = jax.tree.map(lambda x: x[cls], tmp_all)
        return self.fuse(obs, tmp, train)


def dcl_losses(pred: Dict[str, jnp.ndarray], batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Stage-1 losses (reference models/DCL_Net.py:261-303).

    Valid-sample weighting replaces the reference's drop-in-collate: padded /
    invalid rows contribute zero with a matching denominator, keeping shapes
    static for XLA.
    """
    rot_pred = pred["rot_pred"]
    trans_pred = pred["trans_pred"]
    sym = batch["sym_flag"][:, None]              # [B, 1]
    valid = batch.get("valid")
    b = rot_pred.shape[0]
    if valid is None:
        valid = jnp.ones((b,), rot_pred.dtype)
    w = valid / jnp.maximum(jnp.sum(valid), 1.0)  # [B]

    rot_gt = batch["labels"]["rot_gt"]
    trans_gt = batch["labels"]["trans_gt"]
    points_tmp = pred["points_tmp"]
    points_inp = pred["points_inp"]
    conf = pred["conf"]                           # [B, N+M]

    tmp_posed_pred = transform_points(points_tmp, rot_pred, trans_pred)
    tmp_posed_gt = transform_points(points_tmp, rot_gt, trans_gt)

    pose_per_point = (1 - sym) * l2_distance(tmp_posed_pred, tmp_posed_gt) + \
        sym * chamfer_distance(tmp_posed_pred, tmp_posed_gt)      # [B, M]
    loss_pose = jnp.sum(w * jnp.mean(pose_per_point, axis=1))

    xo_pred = pred["Xo_pred"]
    yc_pred = pred["Yc_pred"]
    inp_cano_pred = jax.lax.stop_gradient(
        untransform_points(points_inp, rot_pred, trans_pred)
    )
    inp_cano_gt = jax.lax.stop_gradient(
        untransform_points(points_inp, rot_gt, trans_gt)
    )
    loss_xo_pp = (1 - sym) * l2_distance(xo_pred, inp_cano_gt) + 0.5 * sym * (
        chamfer_distance(xo_pred, points_tmp) + l2_distance(xo_pred, inp_cano_pred)
    )                                                              # [B, N]
    loss_xo = jnp.sum(w * jnp.mean(loss_xo_pp, axis=1))

    loss_yc_pp = (1 - sym) * l2_distance(yc_pred, tmp_posed_gt) + 0.5 * sym * (
        chamfer_distance(yc_pred, tmp_posed_gt)
        + l2_distance(yc_pred, jax.lax.stop_gradient(tmp_posed_pred))
    )                                                              # [B, M]
    loss_yc = jnp.sum(w * jnp.mean(loss_yc_pp, axis=1))

    # Confidence self-calibration (reference DCL_Net.py:292)
    pp = jax.lax.stop_gradient(
        jnp.concatenate([loss_xo_pp, loss_yc_pp], axis=1)
    )                                                              # [B, N+M]
    conf_term = pp * conf - 0.01 * jnp.log(jnp.maximum(conf, 1e-12))
    loss_conf = jnp.sum(w * jnp.mean(conf_term, axis=1))

    loss_all = loss_pose + 5.0 * loss_xo + 1.0 * loss_yc + 1.0 * loss_conf
    return {
        "loss_pose": loss_pose,
        "loss_Xo": loss_xo,
        "loss_Yc": loss_yc,
        "loss_conf": loss_conf,
        "loss_all": loss_all,
    }


def get_cano_label(points_tmp, points_inp, rot_pred, trans_gt):
    """Nearest-template-point canonical labels (reference DCL_Net.py:312-317)."""
    inp_cano = untransform_points(points_inp, rot_pred, trans_gt)
    _, idx = knn(1, inp_cano, points_tmp)
    return jnp.take_along_axis(points_tmp, idx[..., 0:1].repeat(3, -1).astype(jnp.int32), axis=1)
