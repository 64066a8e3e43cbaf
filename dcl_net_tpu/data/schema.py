"""The batch data contract between the data pipeline and the models.

Mirrors the reference collate output (reference YCBV/dataloader_train_YCBV.py:
241-266) re-designed for XLA: fixed [B, N, ...] shapes, voxel indices
precomputed per point, validity flags instead of sample dropping, and no
hash-map rulebooks (voxelization happens in-graph).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import numpy as np


@dataclass
class PoseBatch:
    """Host-side batch. All arrays are numpy; `to_dict` feeds the model."""

    inp_feats: np.ndarray      # [B, N, 7]  (1, rgb-mean-subtracted, xyz)
    inp_voxel_idx: np.ndarray  # [B, N, 3]  int32
    tmp_feats: np.ndarray      # [B, M, 7]
    tmp_voxel_idx: np.ndarray  # [B, M, 3]  int32
    rot_gt: np.ndarray         # [B, 3, 3]
    trans_gt: np.ndarray       # [B, 3]
    obj_idx: np.ndarray        # [B] int32
    sym_flag: np.ndarray       # [B] float32 (1 = symmetric)
    valid: np.ndarray          # [B] float32 (0 = padded/invalid row)
    radius: Optional[np.ndarray] = None  # [B] object radius (YCBV aux)
    # 1.0 for SYNTHETIC fill rows added by pad_to (no corresponding sample).
    # valid=0 alone cannot distinguish "genuine lost detection carrying real
    # labels" (scored inf / counted lost by the eval protocol) from "row that
    # only exists to make the batch rectangular" (must be skipped entirely).
    pad: Optional[np.ndarray] = None  # [B] float32

    def to_dict(self) -> Dict[str, Any]:
        b = self.valid.shape[0]
        return {
            "inp": {"feats": self.inp_feats, "voxel_idx": self.inp_voxel_idx},
            "tmp": {"feats": self.tmp_feats, "voxel_idx": self.tmp_voxel_idx},
            "labels": {
                "rot_gt": self.rot_gt,
                "trans_gt": self.trans_gt,
                "obj_idx": self.obj_idx,
            },
            "sym_flag": self.sym_flag,
            "valid": self.valid,
            "pad": (self.pad if self.pad is not None
                    else np.zeros(b, np.float32)),
        }


def make_batch(samples, pad_to: Optional[int] = None) -> PoseBatch:
    """Stack per-sample dicts into a PoseBatch, padding to a fixed size.

    Invalid samples (the reference returns flag -1 and drops them in collate,
    YCBV/dataloader_train_YCBV.py:216-218) are kept with valid=0; padding rows
    REPLICATE the first valid sample so batch-norm statistics see only sane
    values, while valid=0 removes them from every loss/metric.
    """
    if not samples:
        raise ValueError("batch contains no samples")
    valid_samples = [s for s in samples if s.get("valid", 1.0) > 0]
    # All-invalid batches are legal (e.g. an eval frame where the detector
    # missed every instance, or a pathological train batch): every row keeps
    # valid=0 — losses weight to zero and eval scores them as lost — and the
    # first row's (zeroed) inputs serve as the padding template. The design
    # invariant is "invalid samples are valid=0 rows, never dropped".
    template = valid_samples[0] if valid_samples else samples[0]
    if pad_to is not None and pad_to < len(samples):
        raise ValueError(
            f"pad_to={pad_to} would silently drop "
            f"{len(samples) - pad_to} of {len(samples)} samples"
        )
    b = pad_to or len(samples)

    # For invalid/padding rows the INPUT features are replaced by a valid
    # sample's (keeps per-point batch-norm statistics sane) while the LABELS
    # are kept, so lost detections score against their true class.
    input_keys = {"inp_feats", "inp_voxel_idx", "tmp_feats", "tmp_voxel_idx"}
    rows = []
    pad_flags = []
    for i in range(b):
        if i < len(samples) and samples[i].get("valid", 1.0) > 0:
            rows.append((samples[i], 1.0))
            pad_flags.append(0.0)
        elif i < len(samples):
            merged = dict(samples[i])
            for k in input_keys:
                merged[k] = template[k]
            rows.append((merged, 0.0))
            pad_flags.append(0.0)  # genuine invalid row (lost detection)
        else:
            rows.append((template, 0.0))
            pad_flags.append(1.0)  # synthetic fill row — skipped by eval

    def stack(key, dtype=np.float32):
        return np.stack([np.asarray(s[key], dtype=dtype) for s, _ in rows])

    return PoseBatch(
        inp_feats=stack("inp_feats"),
        inp_voxel_idx=stack("inp_voxel_idx", np.int32),
        tmp_feats=stack("tmp_feats"),
        tmp_voxel_idx=stack("tmp_voxel_idx", np.int32),
        rot_gt=stack("rot_gt"),
        trans_gt=stack("trans_gt"),
        obj_idx=stack("obj_idx", np.int32).reshape(b),
        sym_flag=stack("sym_flag").reshape(b),
        valid=np.asarray([v for _, v in rows], np.float32),
        radius=stack("radius") if "radius" in template else None,
        pad=np.asarray(pad_flags, np.float32),
    )


def batch_to_jax(batch: PoseBatch) -> Dict[str, Any]:
    import jax.numpy as jnp

    d = batch.to_dict()

    def conv(x):
        return jnp.asarray(x)

    import jax

    return jax.tree.map(conv, d)
