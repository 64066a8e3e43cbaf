"""Pose-estimation evaluation metrics.

TPU-native rebuild of the reference eval protocol:
- VOCap AUC over the distance-recall curve capped at 0.1 m, x10
  (reference tools/test_YCBV_stage1.py:83-95).
- cal_auc_acc: per-class ADD-S AUC + <2cm accuracy (:97-110), per-class
  report over 21 YCB classes (:111-125); lost detections enter as inf.
- LineMOD protocol: ADD (L2, non-symmetric) / ADD-S (chamfer, symmetric),
  success when distance < 0.1 x object diameter
  (reference tools/test_LM.py:68-76,123-144); Occlusion-LineMOD counts lost
  detections in the denominator (reference tools/test_LMO.py:104-117).

Distance computation runs batched on device (see add_s_batch); the
curve/AUC aggregation is numpy on host — it is tiny and sequential.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcl_net_tpu.geometry.transform import (
    pairwise_sq_dist,
    transform_points,
)


# ---------------------------------------------------------------------------
# Device-side distance kernels
# ---------------------------------------------------------------------------
@jax.jit
def add_s_batch(model_points, rot_pred, trans_pred, rot_gt, trans_gt):
    """ADD-S: mean nearest-point distance between pred- and gt-posed CAD
    clouds (reference tools/test_YCBV_stage1.py:186-189). [B, P, 3] -> [B]."""
    pred = transform_points(model_points, rot_pred, trans_pred)
    gt = transform_points(model_points, rot_gt, trans_gt)
    d = jnp.sqrt(pairwise_sq_dist(pred, gt) + 1e-12)
    return jnp.mean(jnp.min(d, axis=-1), axis=-1)


@jax.jit
def add_batch(model_points, rot_pred, trans_pred, rot_gt, trans_gt):
    """ADD: mean same-index distance (reference tools/test_LM.py:123 l2_dis)."""
    pred = transform_points(model_points, rot_pred, trans_pred)
    gt = transform_points(model_points, rot_gt, trans_gt)
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=-1)


# ---------------------------------------------------------------------------
# Host-side curve aggregation
# ---------------------------------------------------------------------------
def voc_ap(rec: np.ndarray, prec: np.ndarray) -> float:
    """VOCap with the reference's 0.1m cap and x10 scaling
    (reference tools/test_YCBV_stage1.py:83-95)."""
    idx = np.where(rec != np.inf)
    if len(idx[0]) == 0:
        return 0.0
    rec = rec[idx]
    prec = prec[idx]
    mrec = np.array([0.0] + list(rec) + [0.1])
    mpre = np.array([0.0] + list(prec) + [prec[-1]])
    for i in range(1, mpre.shape[0]):
        mpre[i] = max(mpre[i], mpre[i - 1])
    i = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(np.sum((mrec[i] - mrec[i - 1]) * mpre[i]) * 10)


def auc_and_acc(
    distances: Sequence[float], max_dis: float = 0.1, acc_threshold: float = 0.02
) -> Tuple[float, float]:
    """Per-class AUC (x100) and <threshold accuracy (x100)
    (reference tools/test_YCBV_stage1.py:97-110). inf = lost detection."""
    d = np.asarray(list(distances), dtype=np.float64)
    if d.size == 0:
        return 0.0, 0.0
    d = d.copy()
    d[d > max_dis] = np.inf
    d = np.sort(d)
    n = d.size
    # float32 cumulative curve, matching the reference bit for bit
    # (tools/test_YCBV_stage1.py:107 builds acc with dtype=np.float32;
    # tests/test_golden_metrics.py pins the parity)
    acc = np.cumsum(np.ones(n, dtype=np.float32)) / n
    aps = voc_ap(d, acc)
    acc_t = float((d < acc_threshold).sum() / n)
    return aps * 100.0, acc_t * 100.0


def per_class_auc_acc(
    distances: Sequence[float],
    class_ids: Sequence[int],
    num_classes: int = 21,
    logger=None,
) -> Dict[str, object]:
    """Per-class report + means (reference tools/test_YCBV_stage1.py:111-125)."""
    d = np.asarray(list(distances))
    c = np.asarray(list(class_ids))
    aucs, accs = [], []
    for idx in range(num_classes):
        cls_d = d[c == idx]
        auc, acc = auc_and_acc(cls_d)
        aucs.append(auc)
        accs.append(acc)
        if logger:
            logger.warning(
                "NO.%02d | ADDS_AUC:%3.2f | ADDS<2cm:%3.2f" % (idx + 1, auc, acc)
            )
    auc_mean = round(float(np.mean(aucs)), 2)
    acc_mean = round(float(np.mean(accs)), 2)
    if logger:
        logger.warning("MEAN  | ADDS_AUC:%3.2f | ACC<2cm:%3.2f" % (auc_mean, acc_mean))
    return {
        "auc_per_class": aucs,
        "acc_per_class": accs,
        "auc_mean": auc_mean,
        "acc_mean": acc_mean,
    }


def success_at_diameter(
    distances: Sequence[float],
    class_ids: Sequence[int],
    diameters: Sequence[float],
    num_lost_per_class: Optional[Sequence[int]] = None,
    logger=None,
) -> Dict[str, object]:
    """LineMOD-style success rates: dis < 0.1*diameter per object
    (reference tools/test_LM.py:140-157). `diameters` are already scaled by
    0.1 as in the reference init (:74). If num_lost_per_class is given the
    lost detections count in the denominator (LMO protocol,
    reference tools/test_LMO.py:104-117)."""
    d = np.asarray(list(distances))
    c = np.asarray(list(class_ids))
    n_cls = len(diameters)
    success: List[float] = []
    counts: List[int] = []
    for idx in range(n_cls):
        cls_d = d[c == idx]
        n = cls_d.size
        s = int((cls_d < diameters[idx]).sum())
        if num_lost_per_class is not None:
            n += int(num_lost_per_class[idx])
        rate = float(s) / n if n else 0.0
        success.append(rate)
        counts.append(n)
        if logger:
            logger.warning("Object %d success rate: %f (%d)" % (idx, rate, n))
    total_s = sum(
        int((d[c == i] < diameters[i]).sum()) for i in range(n_cls)
    )
    total_n = sum(counts)
    overall = float(total_s) / total_n if total_n else 0.0
    if logger:
        logger.warning("ALL success rate: %f" % overall)
    return {
        "success_per_class": success,
        "count_per_class": counts,
        "success_mean": overall,
    }
