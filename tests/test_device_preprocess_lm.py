"""LM / LMO device-side preprocessing parity (data/device_preprocess.py).

Raw-candidate mode for the LineMOD datasets (data/linemod.py) must reproduce
the host numpy path — itself golden vs the reference's own loaders in
test_golden_data.py — bit-near when the device core replays the host path's
draws. Covers the reference's three distinct volume-filter semantics:

  LM train : filter + invalidate when <=128 survive
             (reference LM/dataloader_train_LM.py min_keep)
  LM eval  : filter whenever ANY survive (keep-clamp threshold 0,
             reference LM/dataloader_test_LM.py:195-204)
  LMO eval : filter, invalidate only zero-survivor rows (min_keep=0,
             reference LM/dataloader_test_LMO.py)

The miniature fixture's sphere (~0.05 m extent after centering) always sits
inside the +-0.16 m metric volume, so the host filter keeps every candidate
and its np.random draw sequence can be replayed exactly: occlusion-aug draws
happen inside the (shared) dataset call, then 3 aug angles (np.random) + 3
translation jitters (python random) + one resample choice.
"""

from __future__ import annotations

import os
import random

import jax.numpy as jnp
import numpy as np
import pytest

from dcl_net_tpu.config import Config
from dcl_net_tpu.data.device_preprocess import (
    make_raw_batch,
    preprocess_core,
)
from tests import fixtures

UNIT = 0.005
LIM = 64
N = 128


def _cfg(extra=None):
    base = {
        "input_size": N, "tmp_size": N,
        "unit_voxel_extent": [UNIT] * 3,
        "voxel_num_limit": [LIM] * 3,
        "voxelization_mode": 4,
    }
    base.update(extra or {})
    return Config(base)


RAW_CFG = {"device_preprocess": True, "device_cand_k": 8192}


@pytest.fixture(scope="module")
def lm_root(tmp_path_factory):
    return fixtures.make_linemod_fixture(
        str(tmp_path_factory.mktemp("lm_devpre")))


def _run_core(sample, cand_idx, *, augment, min_points, eval_keep_clamp,
              keep_clamp_threshold=32, angles=None, tjit=None):
    batch = make_raw_batch([sample])
    raw = {k: jnp.asarray(batch[k]) for k in (
        "cand_depth", "cand_rc", "cand_rgb", "n_cand", "cam",
        "rot_gt", "trans_gt", "valid")}
    return preprocess_core(
        raw,
        jnp.asarray(angles)[None] if angles is not None else None,
        jnp.asarray(tjit)[None] if tjit is not None else None,
        jnp.asarray(cand_idx)[None], None,
        n_points=N, unit=(UNIT,) * 3, total=(UNIT * LIM,) * 3,
        limit=(LIM,) * 3, augment=augment, min_points=min_points,
        eval_keep_clamp=eval_keep_clamp,
        keep_clamp_threshold=keep_clamp_threshold,
    )


def _assert_matches_host(out, s_np, tag):
    # atol 3e-5 (vs the YCBV test's 3e-6): the fixture sphere yields ~3k
    # candidates at ~0.9 m depth, so the f32 centroid accumulation order
    # (XLA tree reduce vs numpy pairwise mean) differs by up to ~2e-5 —
    # still 30x below the 1e-3 mm-scale geometry budget
    np.testing.assert_allclose(
        np.asarray(out["inp_feats"])[0], s_np["inp_feats"], atol=3e-5,
        err_msg=f"{tag}: feats")
    np.testing.assert_allclose(
        np.asarray(out["rot_gt"])[0], s_np["rot_gt"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["trans_gt"])[0], s_np["trans_gt"], atol=3e-5)
    # integer voxel truncation may flip ONLY for coordinates within float
    # eps of a voxel boundary. The fixture renders constant depth, so the
    # centered z of every point lands exactly ON the voxel-32 boundary
    # (+-2e-5) — mask those out and demand bit-equality elsewhere, with
    # boundary flips bounded to +-1
    dvidx = np.asarray(out["inp_voxel_idx"])[0]
    hvidx = s_np["inp_voxel_idx"]
    scaled = (s_np["inp_feats"][:, 4:7] + UNIT * LIM * 0.5) / UNIT
    boundary = np.abs(scaled - np.round(scaled)) < 1e-2
    np.testing.assert_array_equal(
        dvidx[~boundary], hvidx[~boundary],
        err_msg=f"{tag}: off-boundary voxel idx must match exactly")
    assert (np.abs(dvidx - hvidx) <= 1).all(), f"{tag}: boundary flip > 1"
    assert float(np.asarray(out["valid"])[0]) == 1.0


def test_lm_eval_device_path_matches_host(lm_root):
    """LM eval keep-clamp threshold 0: same-seed raw sample + injected
    resample choice reproduces the host path's output bit-near."""
    from dcl_net_tpu.data.linemod import LineMODDataset

    ds_np = LineMODDataset("eval", _cfg(), lm_root)
    ds_raw = LineMODDataset("eval", _cfg(RAW_CFG), lm_root)
    assert ds_raw.raw_mode and ds_raw.device_min_points == 128
    for i in (0, 5, 12):
        np.random.seed(70 + i)
        s_np = ds_np[i]
        assert s_np["valid"] == 1.0
        np.random.seed(70 + i)
        s_raw = ds_raw[i]
        n = int(s_raw["n_cand"])
        assert n > N, "fixture should overfill the resample"
        np.testing.assert_allclose(
            s_raw["tmp_feats"], s_np["tmp_feats"], atol=1e-7)
        # in-volume fixture: the host filter keeps all n candidates, so its
        # only np.random draw is _finalize's without-replacement choice
        np.random.seed(70 + i)
        cand_idx = np.random.choice(n, N, replace=False)
        out = _run_core(s_raw, cand_idx, augment=False, min_points=128,
                        eval_keep_clamp=True, keep_clamp_threshold=0)
        _assert_matches_host(out, s_np, f"lm eval row {i}")


def test_lm_train_device_path_matches_host(lm_root):
    """LM train (occlusion aug + SE(3) aug + min_keep=128): the raw draw
    consumes the occlusion-aug RNG exactly like the host path, so the SE(3)
    draws can be captured right after it and replayed in-graph."""
    from dcl_net_tpu.data.linemod import LineMODDataset

    ds_np = LineMODDataset("train", _cfg(), lm_root)
    ds_raw = LineMODDataset("train", _cfg(RAW_CFG), lm_root)
    for i in (0, 7):
        seed = 90 + i
        np.random.seed(seed)
        random.seed(seed)
        s_raw = ds_raw[i]
        n = int(s_raw["n_cand"])
        assert n > N
        # np.random/random now sit exactly where the host path is just
        # before pp.se3_augment: capture the draws it will make, in order
        angles = np.asarray(
            [np.random.uniform(-np.pi / 36, np.pi / 36) for _ in range(3)],
            np.float32)
        tjit = np.asarray(
            [random.uniform(-0.03, 0.03) for _ in range(3)], np.float32)
        cand_idx = np.random.choice(n, N, replace=False)
        np.random.seed(seed)
        random.seed(seed)
        s_np = ds_np[i]
        assert s_np["valid"] == 1.0
        out = _run_core(s_raw, cand_idx, augment=True, min_points=128,
                        eval_keep_clamp=False, angles=angles, tjit=tjit)
        _assert_matches_host(out, s_np, f"lm train row {i}")


def test_lmo_device_path_matches_host(lm_root, tmp_path):
    """LMO eval (min_keep=0, no keep-clamp): raw mode reproduces the host
    path on the HybridPose-mask fixture, flipped/aligned pose included."""
    from dcl_net_tpu.data.linemod import OcclusionLineMODDataset

    lmo_root, masks = fixtures.make_lmo_fixture(str(tmp_path), lm_root)
    models = os.path.join(lm_root, "models")
    ds_np = OcclusionLineMODDataset(
        "eval", _cfg(), lmo_root, models, masks_dir=masks)
    ds_raw = OcclusionLineMODDataset(
        "eval", _cfg(RAW_CFG), lmo_root, models, masks_dir=masks)
    assert ds_raw.raw_mode and ds_raw.device_min_points == 0
    for i in (0, 4):
        np.random.seed(30 + i)
        s_np = ds_np[i]
        assert s_np["valid"] == 1.0
        np.random.seed(30 + i)
        s_raw = ds_raw[i]
        assert int(s_raw["obj_idx"]) == int(s_np["obj_idx"])
        assert float(s_raw["sym_flag"]) == float(s_np["sym_flag"])
        n = int(s_raw["n_cand"])
        assert n > N
        np.random.seed(30 + i)
        cand_idx = np.random.choice(n, N, replace=False)
        out = _run_core(s_raw, cand_idx, augment=False, min_points=0,
                        eval_keep_clamp=False)
        _assert_matches_host(out, s_np, f"lmo row {i}")


def test_lm_samples_per_frame_draws(lm_root):
    """samples_per_frame=k re-runs the occlusion aug per draw on one decoded
    frame; draws differ (fresh RNG consumption) but share labels."""
    from dcl_net_tpu.data.linemod import LineMODDataset

    ds = LineMODDataset(
        "train", _cfg({**RAW_CFG, "samples_per_frame": 3}), lm_root)
    np.random.seed(0)
    random.seed(0)
    item = ds[0]
    assert isinstance(item, list) and len(item) == 3
    assert all(s["cand_depth"].shape == (8192,) for s in item)
    assert len({int(s["n_cand"]) for s in item}) >= 1
    # same frame -> same gt labels across draws
    for s in item[1:]:
        np.testing.assert_array_equal(s["rot_gt"], item[0]["rot_gt"])
        np.testing.assert_array_equal(s["trans_gt"], item[0]["trans_gt"])
    # eval mode ignores samples_per_frame
    ds_ev = LineMODDataset(
        "eval", _cfg({**RAW_CFG, "samples_per_frame": 3}), lm_root)
    assert ds_ev.samples_per_frame == 1


def test_lm_device_preprocess_loader_wiring(lm_root):
    """tools/common.build_device_preprocess + BatchLoader end-to-end on the
    LM fixture: model-contract batches straight from the prefetch queue."""
    from dcl_net_tpu.data.linemod import LineMODDataset
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.tools.common import build_device_preprocess

    ds_cfg = _cfg({"device_preprocess": True, "device_cand_k": 4096})
    ds = LineMODDataset("train", ds_cfg, lm_root)
    collate, transform = build_device_preprocess(ds_cfg, ds, augment=True,
                                                 seed=0)
    assert collate is not None and transform is not None
    loader = BatchLoader(ds, batch_size=4, num_workers=2, seed=0,
                         collate=collate, batch_transform=transform)
    b = next(iter(loader))
    assert b["inp"]["feats"].shape == (4, N, 7)
    assert b["tmp"]["feats"].shape == (4, N, 7)
    assert np.asarray(b["valid"]).sum() >= 3
    xyz = np.asarray(b["inp"]["feats"])[..., 4:7]
    valid = np.asarray(b["valid"]) > 0
    assert (np.abs(xyz[valid]) < UNIT * LIM * 0.5 + 1e-6).all()

    # off by default: no device_preprocess key -> (None, None)
    ds_cfg_off = _cfg()
    ds_off = LineMODDataset("train", ds_cfg_off, lm_root)
    assert build_device_preprocess(ds_cfg_off, ds_off, augment=True) == (
        None, None)
