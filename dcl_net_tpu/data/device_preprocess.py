"""Device-side (jit) input preprocessing: lift -> center -> aug -> filter ->
resample -> assemble, one XLA graph per batch.

The host numpy pipeline (data/preprocess.py, mirroring reference
YCBV/dataloader_train_YCBV.py:150-205) costs ~5 ms/sample/core on top of the
~10 ms PNG decode — at the measured 1681 inst/s device rate that host tail
alone consumes ~8 cores/chip. This module moves everything after the pixel
gather onto the device (SURVEY.md §7 step 4: "the depth-lift + mask-crop +
CAD-sample + voxel-index path fused into one jit'd preprocessing function"):

 host  : PNG/.mat decode, instance choice, bbox snap, mask -> candidate
         pixel gather (depth u16 / row-col i16 / rgb u8, padded to K)
 device: depth lift (reference :146-154), masked centroid centering
         (:157-159), SE(3) augmentation with jax PRNG (:161-177), volume
         filter + fixed-N resample (:189-199), feature + voxel-index
         assembly (:202-205) — batched over B, ~9 bytes/candidate on the
         wire instead of 40 bytes/point of processed features.

Randomness: production draws come from a jax PRNG folded with a step counter
in-graph. Resampling semantics match numpy's rng.choice exactly IN
DISTRIBUTION: uniform WITHOUT replacement (top-N of uniform keys over the
kept set) when keep_count > N, iid WITH replacement (inverse-CDF over the
keep mask) otherwise. For bit-level parity tests the core accepts explicit
draws (angles, translation jitter, candidate indices) captured from the
numpy path — tests/test_device_preprocess.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcl_net_tpu.data.preprocess import IMAGENET_MEAN

HIGHEST = jax.lax.Precision.HIGHEST


def euler_xyz_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic-xyz euler angles -> rotation matrix, batched [..., 3].

    Matches scipy's Rotation.from_euler("xyz", a) == transforms3d's
    euler2mat(a1, a2, a3) 'sxyz' (the reference aug convention,
    reference YCBV/dataloader_train_YCBV.py:161-166):
    R = Rz(a3) @ Ry(a2) @ Rx(a1).
    """
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    rows = jnp.stack([
        jnp.stack([r00, r01, r02], -1),
        jnp.stack([r10, r11, r12], -1),
        jnp.stack([r20, r21, r22], -1),
    ], -2)
    return rows


def _lift(raw: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Depth -> camera-frame cloud at the candidate pixels
    (reference YCBV/dataloader_train_YCBV.py:146-154; NOTE the reference's
    axis swap: xmap is the ROW index and pairs with cy/fy)."""
    cam = raw["cam"].astype(jnp.float32)                      # [B, 5]
    depth = raw["cand_depth"].astype(jnp.float32)             # [B, K]
    row = raw["cand_rc"][..., 0].astype(jnp.float32)
    col = raw["cand_rc"][..., 1].astype(jnp.float32)
    cx, cy, fx, fy, scale = (cam[:, i : i + 1] for i in range(5))
    pt2 = depth / scale
    pt0 = (col - cx) * pt2 / fx
    pt1 = (row - cy) * pt2 / fy
    return jnp.stack([pt0, pt1, pt2], axis=-1)                # [B, K, 3]


def _assemble(cloud, rgb, unit, total, limit):
    """[1, rgb, xyz] features + clipped int voxel indices
    (reference YCBV/dataloader_train_YCBV.py:202-205; data/preprocess.py
    assemble_features — including the int cast's truncation semantics and
    the total_extent[0]-for-all-axes quirk)."""
    ones = jnp.ones(cloud.shape[:-1] + (1,), jnp.float32)
    feats = jnp.concatenate([ones, rgb, cloud], axis=-1)
    vidx = ((cloud + total[0] * 0.5) / unit).astype(jnp.int32)
    vidx = jnp.clip(vidx, 0, jnp.asarray(limit, jnp.int32) - 1)
    return feats, vidx


def _draw_cand_idx(key, keep, n_points: int):
    """Sample n_points candidate indices from the kept set, matching
    numpy's rng.choice semantics in distribution (preprocess.py
    filter_and_resample): uniform WITHOUT replacement when keep_count >
    n_points (top-N of uniform keys over the kept set — exactly uniform),
    iid WITH replacement otherwise (inverse-CDF over the keep mask; the
    host path — and the reference, YCBV/dataloader_train_YCBV.py:196-198 —
    draws WITH replacement at keep_count == n_points too)."""
    b, k = keep.shape
    count = jnp.sum(keep, axis=1)                             # [B]
    k_keys, k_fill = jax.random.split(key)
    keys = jnp.where(keep, jax.random.uniform(k_keys, (b, k)), -1.0)
    # descending argsort: kept rows (positive keys) first, uniform order
    wo = jnp.argsort(-keys, axis=1)[:, :n_points]             # [B, N]
    cdf = jnp.cumsum(keep.astype(jnp.float32), axis=1)        # [B, K]
    u = jax.random.uniform(k_fill, (b, n_points)) * cdf[:, -1:]
    wr = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right")
    )(cdf, u).astype(jnp.int32)
    wr = jnp.minimum(wr, k - 1)
    return jnp.where((count > n_points)[:, None], wo, wr)


def preprocess_core(
    raw: Dict[str, jnp.ndarray],
    aug_angles: Optional[jnp.ndarray],
    aug_trans: Optional[jnp.ndarray],
    cand_idx: Optional[jnp.ndarray],
    key: Optional[jnp.ndarray],
    *,
    n_points: int,
    unit: Tuple[float, ...],
    total: Tuple[float, ...],
    limit: Tuple[int, ...],
    augment: bool,
    min_points: int,
    eval_keep_clamp: bool,
    keep_clamp_threshold: int = 32,
) -> Dict[str, jnp.ndarray]:
    """The deterministic-given-draws preprocessing graph.

    cand_idx=None draws the resample indices in-graph from `key`
    (production); a parity test passes the numpy path's selection instead.
    eval_keep_clamp reproduces the eval loaders' quirk: apply the volume
    filter only when > keep_clamp_threshold candidates survive it, else
    keep everything. YCBV test uses threshold 32 (reference
    YCBV/dataloader_test_YCBV.py:164-180); LM eval filters whenever ANY
    survive, i.e. threshold 0 (reference LM/dataloader_test_LM.py:195-204
    with keep_all_if_few). LMO eval instead invalidates zero-survivor rows
    (eval_keep_clamp=False, min_points=0).
    """
    unit = jnp.asarray(unit, jnp.float32)
    total_np = np.asarray(total, np.float32)
    b, k = raw["cand_depth"].shape
    n_cand = raw["n_cand"].astype(jnp.int32)
    cmask = jnp.arange(k)[None, :] < n_cand[:, None]          # [B, K]

    cloud = _lift(raw)
    denom = jnp.maximum(n_cand.astype(jnp.float32), 1.0)[:, None]
    centroid = jnp.sum(
        jnp.where(cmask[..., None], cloud, 0.0), axis=1) / denom
    cloud = cloud - centroid[:, None, :]
    trans = raw["trans_gt"].astype(jnp.float32) - centroid
    rot = raw["rot_gt"].astype(jnp.float32)

    if augment:
        # SE(3) aug (reference :161-177): canonicalize by the CURRENT pose,
        # jitter t, right-multiply R by the euler perturbation, re-pose.
        aug_r = euler_xyz_to_matrix(aug_angles.astype(jnp.float32))
        cloud_obj = jnp.einsum(
            "bki,bij->bkj", cloud - trans[:, None, :], rot, precision=HIGHEST)
        trans = trans + aug_trans.astype(jnp.float32)
        rot = jnp.einsum("bij,bjk->bik", rot, aug_r, precision=HIGHEST)
        cloud = jnp.einsum(
            "bki,bji->bkj", cloud_obj, rot, precision=HIGHEST
        ) + trans[:, None, :]

    inside = (
        (jnp.abs(cloud[..., 0]) < total_np[0] * 0.5)
        & (jnp.abs(cloud[..., 1]) < total_np[1] * 0.5)
        & (jnp.abs(cloud[..., 2]) < total_np[2] * 0.5)
    )
    keep = cmask & inside
    keep_count = jnp.sum(keep, axis=1)
    if eval_keep_clamp:
        keep = jnp.where(
            (keep_count > keep_clamp_threshold)[:, None], keep, cmask)
        dev_valid = n_cand > 0
    else:
        dev_valid = keep_count > min_points

    if cand_idx is None:
        cand_idx = _draw_cand_idx(key, keep, n_points)        # [B, N]

    sel = cand_idx[..., None]
    sel_cloud = jnp.take_along_axis(cloud, sel, axis=1)       # [B, N, 3]
    rgb = raw["cand_rgb"].astype(jnp.float32) / 255.0 - jnp.asarray(
        IMAGENET_MEAN)
    sel_rgb = jnp.take_along_axis(rgb, sel, axis=1)           # [B, N, 3]
    feats, vidx = _assemble(sel_cloud, sel_rgb, unit, total_np, limit)

    # Invalid rows carry a valid row's INPUTS (keeps batch-norm statistics
    # sane) while their labels stay their own — the in-graph twin of
    # make_batch's template replication (data/schema.py).
    host_valid = raw["valid"].astype(jnp.float32)
    valid = host_valid * dev_valid.astype(jnp.float32)
    tpl = jnp.argmax(valid)
    ok = (valid > 0)
    feats = jnp.where(ok[:, None, None], feats,
                      jnp.take(feats, tpl, axis=0)[None])
    vidx = jnp.where(ok[:, None, None], vidx,
                     jnp.take(vidx, tpl, axis=0)[None])

    return {
        "inp_feats": feats,
        "inp_voxel_idx": vidx,
        "rot_gt": rot,
        "trans_gt": trans,
        "valid": valid,
    }


class DevicePreprocessor:
    """Jitted batch preprocessor consuming raw candidate batches.

    Usage: pass ``collate=make_raw_batch`` and ``batch_transform=this`` to
    BatchLoader (wired by tools/train_stage1.py under
    cfg.hyper_dataset_train.device_preprocess). The transform runs in the
    loader's producer thread, so the device preprocessing graph overlaps
    the train step like any prefetch.
    """

    def __init__(
        self,
        n_points: int,
        unit_voxel_extent: Sequence[float],
        voxel_num_limit: Sequence[int],
        augment: bool = True,
        min_points: int = 50,
        eval_keep_clamp: bool = False,
        keep_clamp_threshold: int = 32,
        angle_range: float = float(np.pi / 36.0),
        trans_range: float = 0.03,
        seed: int = 0,
    ):
        unit = tuple(float(u) for u in unit_voxel_extent)
        limit = tuple(int(v) for v in voxel_num_limit)
        total = tuple(u * v for u, v in zip(unit, limit))
        self._base_key = jax.random.PRNGKey(seed)
        # multi-host: each process preprocesses its OWN block of the global
        # batch, so the draw streams must differ per process — otherwise
        # every host applies the identical per-row aug/resample sequence and
        # the global batch sees each draw duplicated process_count times.
        # Single-process keys are unchanged (no fold), so seeded runs stay
        # reproducible against existing records.
        if jax.process_count() > 1:
            self._base_key = jax.random.fold_in(
                self._base_key, jax.process_index())
        self._step = 0
        core = functools.partial(
            preprocess_core,
            n_points=int(n_points), unit=unit, total=total, limit=limit,
            augment=bool(augment), min_points=int(min_points),
            eval_keep_clamp=bool(eval_keep_clamp),
            keep_clamp_threshold=int(keep_clamp_threshold),
        )
        a_rng, t_rng = float(angle_range), float(trans_range)
        use_aug = bool(augment)

        def run(raw, base_key, step):
            # in-graph key derivation: no per-batch host PRNG dispatches
            key = jax.random.fold_in(base_key, step)
            k_ang, k_tr, k_sel = jax.random.split(key, 3)
            b = raw["cand_depth"].shape[0]
            if use_aug:
                angles = jax.random.uniform(
                    k_ang, (b, 3), minval=-a_rng, maxval=a_rng)
                tr = jax.random.uniform(
                    k_tr, (b, 3), minval=-t_rng, maxval=t_rng)
            else:
                angles = tr = None
            return core(raw, angles, tr, None, k_sel)

        self._run = jax.jit(run)

    def __call__(self, raw_batch: Dict[str, np.ndarray]) -> Dict[str, object]:
        dev = self._run(
            {k: raw_batch[k] for k in (
                "cand_depth", "cand_rc", "cand_rgb", "n_cand", "cam",
                "rot_gt", "trans_gt", "valid")},
            self._base_key, self._step,
        )
        self._step += 1
        b = int(dev["valid"].shape[0])
        return {
            "inp": {"feats": dev["inp_feats"],
                    "voxel_idx": dev["inp_voxel_idx"]},
            "tmp": {"feats": jnp.asarray(raw_batch["tmp_feats"]),
                    "voxel_idx": jnp.asarray(raw_batch["tmp_voxel_idx"])},
            "labels": {
                "rot_gt": dev["rot_gt"],
                "trans_gt": dev["trans_gt"],
                "obj_idx": jnp.asarray(raw_batch["obj_idx"]),
            },
            "sym_flag": jnp.asarray(raw_batch["sym_flag"]),
            "valid": dev["valid"],
            "pad": jnp.asarray(raw_batch.get(
                "pad", np.zeros(b, np.float32))),
        }


def make_raw_batch(samples, pad_to: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Stack raw candidate samples (YCBVTrainDataset raw mode) into a
    fixed-shape dict for DevicePreprocessor. Padding rows replicate the
    first valid sample's pixels with valid=0 (same convention as
    schema.make_batch); label arrays stay each row's own."""
    if not samples:
        raise ValueError("batch contains no samples")
    valid_samples = [s for s in samples if s.get("valid", 1.0) > 0]
    template = valid_samples[0] if valid_samples else samples[0]
    if pad_to is not None and pad_to < len(samples):
        raise ValueError(f"pad_to={pad_to} < {len(samples)} samples")
    b = pad_to or len(samples)
    # invalid rows replicate a valid row's INPUTS — both the raw observed-
    # branch pixels AND the template branch (an _invalid_raw sample carries
    # all-zero tmp grids, which would pollute the template encoder's train-
    # mode BN statistics for every real sample in the batch; schema.
    # make_batch replicates tmp_feats/tmp_voxel_idx for the same reason)
    input_keys = {"cand_depth", "cand_rc", "cand_rgb", "n_cand", "cam",
                  "tmp_feats", "tmp_voxel_idx"}
    rows, pad_flags = [], []
    for i in range(b):
        if i < len(samples):
            s = samples[i]
            if s.get("valid", 1.0) <= 0:
                s = dict(s)
                for kk in input_keys:
                    s[kk] = template[kk]
            rows.append(s)
            pad_flags.append(0.0)
        else:
            rows.append(template)
            pad_flags.append(1.0)

    def stack(key, dtype=None):
        return np.stack([np.asarray(s[key], dtype=dtype) for s in rows])

    out = {
        "cand_depth": stack("cand_depth", np.uint16),
        "cand_rc": stack("cand_rc", np.int16),
        "cand_rgb": stack("cand_rgb", np.uint8),
        "n_cand": stack("n_cand", np.int32).reshape(b),
        "cam": stack("cam", np.float32),
        "rot_gt": stack("rot_gt", np.float32),
        "trans_gt": stack("trans_gt", np.float32),
        "obj_idx": stack("obj_idx", np.int32).reshape(b),
        "sym_flag": stack("sym_flag", np.float32).reshape(b),
        "valid": np.asarray(
            [float(s.get("valid", 1.0)) for s in rows], np.float32),
        "tmp_feats": stack("tmp_feats", np.float32),
        "tmp_voxel_idx": stack("tmp_voxel_idx", np.int32),
        "pad": np.asarray(pad_flags, np.float32),
    }
    # pad rows are input-replicas with valid=0 (never scored)
    out["valid"] = out["valid"] * (1.0 - out["pad"])
    if "radius" in template:
        out["radius"] = stack("radius", np.float32).reshape(b)
    return out
