"""Device-side preprocessing parity (data/device_preprocess.py).

The jitted lift/center/aug/filter/resample/assembly graph must reproduce the
host numpy path (data/preprocess.py, itself golden vs the reference's own
dataloader code in test_golden_data.py) bit-near when fed the SAME draws:
the core accepts explicit aug angles / translation jitter / candidate
indices, which these tests capture from seeded numpy RNGs.
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcl_net_tpu.config import Config
from dcl_net_tpu.data import preprocess as pp
from dcl_net_tpu.data.device_preprocess import (
    DevicePreprocessor,
    euler_xyz_to_matrix,
    make_raw_batch,
    preprocess_core,
)

UNIT = np.asarray([0.006, 0.006, 0.006], np.float32)
LIMIT = np.asarray([64, 64, 64], np.float32)
TOTAL = UNIT * LIMIT
N_PTS = 256


def test_euler_xyz_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(0)
    angles = rng.uniform(-0.3, 0.3, (16, 3)).astype(np.float32)
    ours = np.asarray(euler_xyz_to_matrix(jnp.asarray(angles)))
    ref = Rotation.from_euler("xyz", angles).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _fake_raw(rng, b, k, n_real=None):
    """Synthesize raw candidate batches: a depth blob near 1 m with plausible
    intrinsics so the lifted cloud lands inside the metric volume."""
    cam = np.tile(np.asarray(
        [[320.0, 240.0, 1066.0, 1067.0, 10000.0]], np.float32), (b, 1))
    rows = rng.randint(200, 280, (b, k)).astype(np.int16)
    cols = rng.randint(280, 360, (b, k)).astype(np.int16)
    depth = rng.randint(9500, 10500, (b, k)).astype(np.uint16)
    rgb = rng.randint(0, 255, (b, k, 3)).astype(np.uint8)
    n_cand = np.full(b, n_real or k, np.int32)
    for i in range(b):
        depth[i, n_cand[i]:] = 0
    rot = np.stack([np.eye(3, dtype=np.float32)] * b)
    # ground-truth translation at the blob's rough center (pre-centering)
    trans = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (b, 1))
    return {
        "cand_depth": depth, "cand_rc": np.stack([rows, cols], -1),
        "cand_rgb": rgb, "n_cand": n_cand, "cam": cam,
        "rot_gt": rot, "trans_gt": trans,
        "valid": np.ones(b, np.float32),
    }


def _numpy_reference(raw, i, rng_seed, trans_seed, augment=True):
    """Run the host numpy pipeline (preprocess.py functions — the ones
    golden-matched against the reference loader) on sample i of a raw batch,
    returning outputs AND the draws so the device core can be replayed."""
    n = int(raw["n_cand"][i])
    cam = raw["cam"][i]
    depth = raw["cand_depth"][i, :n].astype(np.float32)
    rows = raw["cand_rc"][i, :n, 0].astype(np.float32)
    cols = raw["cand_rc"][i, :n, 1].astype(np.float32)
    pt2 = depth / cam[4]
    pt0 = (cols - cam[0]) * pt2 / cam[2]
    pt1 = (rows - cam[1]) * pt2 / cam[3]
    cloud = np.stack([pt0, pt1, pt2], 1)
    rgb = pp.normalize_rgb(raw["cand_rgb"][i, :n])

    centroid = cloud.mean(axis=0)
    cloud = (cloud - centroid).astype(np.float32)
    t = raw["trans_gt"][i] - centroid.astype(np.float32)
    r = raw["rot_gt"][i]

    rng = np.random.RandomState(rng_seed)
    trans_rng = random.Random(trans_seed)
    angles = None
    tjit = None
    if augment:
        # capture the draws se3_augment will make, then replay it
        probe = np.random.RandomState(rng_seed)
        angles = np.asarray(
            [probe.uniform(-np.pi / 36, np.pi / 36) for _ in range(3)],
            np.float32)
        tprobe = random.Random(trans_seed)
        tjit = np.asarray(
            [tprobe.uniform(-0.03, 0.03) for _ in range(3)], np.float32)
        cloud, r, t = pp.se3_augment(cloud, r, t, rng, trans_rng=trans_rng)

    keep = (
        (np.abs(cloud[:, 0]) < TOTAL[0] * 0.5)
        & (np.abs(cloud[:, 1]) < TOTAL[1] * 0.5)
        & (np.abs(cloud[:, 2]) < TOTAL[2] * 0.5)
    )
    kept = np.nonzero(keep)[0]
    assert kept.size > N_PTS, "fixture should overfill the resample"
    # same choice rng state as filter_and_resample would consume
    sel = rng.choice(kept.size, N_PTS, replace=False)
    cand_idx = kept[sel]
    feats, vidx = pp.assemble_features(
        cloud[cand_idx], rgb[cand_idx], UNIT, TOTAL, LIMIT)
    return {
        "feats": feats, "vidx": vidx, "rot": r, "trans": t,
        "angles": angles, "tjit": tjit, "cand_idx": cand_idx,
    }


@pytest.mark.parametrize("augment", [False, True])
def test_core_matches_numpy_path_same_draws(augment):
    rng = np.random.RandomState(3)
    b, k = 3, 1024
    raw = _fake_raw(rng, b, k)

    refs = [
        _numpy_reference(raw, i, rng_seed=100 + i, trans_seed=200 + i,
                         augment=augment)
        for i in range(b)
    ]
    aug_angles = (jnp.asarray(np.stack([r["angles"] for r in refs]))
                  if augment else None)
    aug_trans = (jnp.asarray(np.stack([r["tjit"] for r in refs]))
                 if augment else None)
    cand_idx = jnp.asarray(np.stack([r["cand_idx"] for r in refs]))

    out = jax.jit(
        lambda rw, a, t, ci: preprocess_core(
            rw, a, t, ci, None,
            n_points=N_PTS, unit=tuple(UNIT), total=tuple(TOTAL),
            limit=tuple(int(v) for v in LIMIT), augment=augment,
            min_points=50, eval_keep_clamp=False,
        ),
        static_argnums=(),
    )({kk: jnp.asarray(v) for kk, v in raw.items()},
      aug_angles, aug_trans, cand_idx)

    feats = np.asarray(out["inp_feats"])
    vidx = np.asarray(out["inp_voxel_idx"])
    for i in range(b):
        # geometry to f32 accumulation-order tolerance (centroid sum)
        np.testing.assert_allclose(
            feats[i], refs[i]["feats"], atol=3e-6, err_msg=f"row {i} feats")
        np.testing.assert_allclose(
            np.asarray(out["rot_gt"])[i], refs[i]["rot"], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["trans_gt"])[i], refs[i]["trans"], atol=3e-6)
        # voxel indices: integer floor can flip only for points within float
        # eps of a voxel boundary
        mismatch = (vidx[i] != refs[i]["vidx"]).mean()
        assert mismatch < 5e-3, f"row {i}: voxel idx mismatch {mismatch}"
    assert np.asarray(out["valid"]).tolist() == [1.0] * b


def test_core_invalidates_underfilled_rows():
    rng = np.random.RandomState(4)
    b, k = 2, 512
    raw = _fake_raw(rng, b, k)
    # row 1: spread the depths over metres so after centroid-centering
    # (almost) every candidate falls outside the +-0.192 m metric volume
    raw["cand_depth"][1] = rng.randint(1000, 60000, k).astype(np.uint16)
    out = preprocess_core(
        {kk: jnp.asarray(v) for kk, v in raw.items()},
        None, None, None, jax.random.PRNGKey(0),
        n_points=N_PTS, unit=tuple(UNIT), total=tuple(TOTAL),
        limit=tuple(int(v) for v in LIMIT), augment=False,
        min_points=50, eval_keep_clamp=False,
    )
    valid = np.asarray(out["valid"])
    assert valid[0] == 1.0 and valid[1] == 0.0
    # the invalid row carries the valid row's inputs (BN-sane padding)
    np.testing.assert_array_equal(
        np.asarray(out["inp_feats"])[1], np.asarray(out["inp_feats"])[0])


def test_production_sampling_draws_only_kept_candidates():
    rng = np.random.RandomState(5)
    b, k = 4, 2048
    raw = _fake_raw(rng, b, k, n_real=1500)
    out = preprocess_core(
        {kk: jnp.asarray(v) for kk, v in raw.items()},
        None, None, None, jax.random.PRNGKey(7),
        n_points=N_PTS, unit=tuple(UNIT), total=tuple(TOTAL),
        limit=tuple(int(v) for v in LIMIT), augment=False,
        min_points=50, eval_keep_clamp=False,
    )
    feats = np.asarray(out["inp_feats"])
    xyz = feats[..., 4:7]
    assert np.asarray(out["valid"]).all()
    assert (np.abs(xyz) < TOTAL[0] * 0.5 + 1e-6).all(), (
        "resampled points must come from the volume-filtered set")
    # 1 + rgb channel sanity
    np.testing.assert_allclose(feats[..., 0], 1.0)
    assert (np.asarray(out["inp_voxel_idx"]) >= 0).all()
    assert (np.asarray(out["inp_voxel_idx"]) < 64).all()


def test_resample_boundary_matches_host_replacement_semantics():
    """The host path (and the reference, YCBV/dataloader_train_YCBV.py:
    196-198) draws WITH replacement when keep_count <= n_points — including
    the == boundary — and without replacement only for strictly more
    candidates. The device draw must match at the boundary."""
    from dcl_net_tpu.data.device_preprocess import _draw_cand_idx

    n, k = 64, 128
    # exactly n kept -> with replacement: near-certain duplicates (the
    # probability of an all-distinct draw is 64!/64^64 ~ 1e-28), and only
    # kept indices selected
    keep_eq = jnp.asarray(np.arange(k)[None, :] < n)
    sel = np.asarray(_draw_cand_idx(jax.random.PRNGKey(0), keep_eq, n))[0]
    assert (sel < n).all()
    assert len(np.unique(sel)) < n, (
        "keep_count == n_points must draw WITH replacement (host parity)")
    # strictly more kept -> without replacement: all distinct, all kept
    keep_gt = jnp.asarray(np.arange(k)[None, :] < n + 8)
    sel2 = np.asarray(_draw_cand_idx(jax.random.PRNGKey(0), keep_gt, n))[0]
    assert (sel2 < n + 8).all()
    assert len(np.unique(sel2)) == n


def test_make_raw_batch_replicates_template_inputs_for_invalid_rows():
    """An invalid raw sample carries all-zero template grids (_invalid_raw);
    make_raw_batch must replicate a valid row's tmp_feats/tmp_voxel_idx into
    it — same BN-statistics rationale as schema.make_batch — while labels
    stay the row's own."""
    rng = np.random.RandomState(11)

    def sample(valid):
        k, m = 32, 16
        return {
            "cand_depth": rng.randint(0, 60000, k).astype(np.uint16),
            "cand_rc": rng.randint(0, 400, (k, 2)).astype(np.int16),
            "cand_rgb": rng.randint(0, 255, (k, 3)).astype(np.uint8),
            "n_cand": np.int32(k if valid else 0),
            "cam": np.asarray([320, 240, 1066, 1067, 10000], np.float32),
            "rot_gt": np.eye(3, dtype=np.float32),
            "trans_gt": rng.rand(3).astype(np.float32),
            "obj_idx": np.int32(3 if valid else 5),
            "sym_flag": np.float32(0.0),
            "valid": float(valid),
            "tmp_feats": (rng.rand(m, 7).astype(np.float32)
                          if valid else np.zeros((m, 7), np.float32)),
            "tmp_voxel_idx": (rng.randint(0, 64, (m, 3)).astype(np.int32)
                              if valid else np.zeros((m, 3), np.int32)),
        }

    good, bad = sample(True), sample(False)
    out = make_raw_batch([good, bad])
    np.testing.assert_array_equal(out["tmp_feats"][1], good["tmp_feats"])
    np.testing.assert_array_equal(
        out["tmp_voxel_idx"][1], good["tmp_voxel_idx"])
    np.testing.assert_array_equal(out["cand_depth"][1], good["cand_depth"])
    # labels remain the invalid row's own; valid stays 0
    assert out["obj_idx"][1] == 5
    assert out["valid"][1] == 0.0


def test_device_preprocessor_end_to_end_on_fixture(tmp_path):
    """Raw-mode YCBVTrainDataset -> make_raw_batch -> DevicePreprocessor on
    the on-disk YCBV fixture: per-index (seeded) the raw sample must pick
    the same instance and identical template branch as the numpy path, and
    the device-preprocessed batch must satisfy the model contract."""
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.data.ycbv import YCBVTrainDataset
    from tests.fixtures import make_ycbv_fixture

    root, assets = make_ycbv_fixture(str(tmp_path), n_classes=3, n_frames=8,
                                     seed=0)
    base = {
        "input_size": 128, "tmp_size": 128,
        "unit_voxel_extent": [0.006, 0.006, 0.006],
        "voxel_num_limit": [64, 64, 64], "voxelization_mode": 4,
    }
    ds_np = YCBVTrainDataset(Config(dict(base)), root, assets_dir=assets)
    ds_raw = YCBVTrainDataset(
        Config({**base, "device_preprocess": True, "device_cand_k": 4096}),
        root, assets_dir=assets)
    assert ds_raw.raw_mode

    raw_samples = []
    for i in range(4):
        # instance choice draws from module np.random in BOTH modes: same
        # seed => same instance, labels, and template branch
        np.random.seed(100 + i)
        random.seed(100 + i)
        s_raw = ds_raw[i]
        np.random.seed(100 + i)
        random.seed(100 + i)
        s_np = ds_np[i]
        assert int(s_raw["obj_idx"]) == int(s_np["obj_idx"])
        np.testing.assert_allclose(
            s_raw["tmp_feats"], s_np["tmp_feats"], atol=1e-7)
        np.testing.assert_array_equal(
            s_raw["tmp_voxel_idx"], s_np["tmp_voxel_idx"])
        assert s_raw["n_cand"] > 50
        raw_samples.append(s_raw)

    pre = DevicePreprocessor(
        n_points=128, unit_voxel_extent=base["unit_voxel_extent"],
        voxel_num_limit=base["voxel_num_limit"], augment=True, seed=0)
    batch = pre(make_raw_batch(raw_samples, pad_to=6))
    assert batch["inp"]["feats"].shape == (6, 128, 7)
    assert batch["inp"]["voxel_idx"].shape == (6, 128, 3)
    assert batch["tmp"]["feats"].shape == (6, 128, 7)
    valid = np.asarray(batch["valid"])
    assert valid[:4].all() and not valid[4:].any()
    assert np.asarray(batch["pad"]).tolist() == [0, 0, 0, 0, 1, 1]
    xyz = np.asarray(batch["inp"]["feats"])[..., 4:7]
    assert (np.abs(xyz[valid > 0]) < TOTAL[0] * 0.5 + 1e-6).all()

    # loader plumbing: collate + producer-thread transform yield model-ready
    # batches straight from the prefetch queue
    loader = BatchLoader(ds_raw, batch_size=4, num_workers=2, seed=0,
                         collate=make_raw_batch, batch_transform=pre)
    b2 = next(iter(loader))
    assert b2["inp"]["feats"].shape == (4, 128, 7)
    assert np.asarray(b2["valid"]).sum() >= 3


def test_samples_per_frame_amortizes_decode(tmp_path):
    """samples_per_frame=k: one decoded frame yields k raw instance draws;
    BatchLoader(samples_per_item=k) flattens them into model batches."""
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.data.ycbv import YCBVTrainDataset
    from tests.fixtures import make_ycbv_fixture

    root, assets = make_ycbv_fixture(str(tmp_path), n_classes=3, n_frames=8,
                                     seed=0)
    ds = YCBVTrainDataset(Config({
        "input_size": 128, "tmp_size": 128,
        "unit_voxel_extent": [0.006, 0.006, 0.006],
        "voxel_num_limit": [64, 64, 64], "voxelization_mode": 4,
        "device_preprocess": True, "samples_per_frame": 4,
        "device_cand_k": 4096,
    }), root, assets_dir=assets)
    item = ds[0]
    assert isinstance(item, list) and len(item) == 4
    assert all(s["cand_depth"].shape == (4096,) for s in item)

    pre = DevicePreprocessor(
        n_points=128, unit_voxel_extent=[0.006] * 3,
        voxel_num_limit=[64] * 3, augment=True, seed=0)
    loader = BatchLoader(ds, batch_size=8, num_workers=2, seed=0,
                         collate=make_raw_batch, batch_transform=pre,
                         samples_per_item=4)
    assert len(loader) == 8 // 2  # 8 frames / (8 samples / 4 per frame)
    n_batches = 0
    for batch in loader:
        n_batches += 1
        assert batch["inp"]["feats"].shape == (8, 128, 7)
        assert np.asarray(batch["valid"]).sum() >= 6
    assert n_batches == len(loader)


def test_eval_keep_clamp_semantics():
    """eval_keep_clamp: the volume filter applies only when >32 candidates
    survive it (reference YCBV/dataloader_test_YCBV.py:164-180) — a mostly
    out-of-volume cloud keeps ALL candidates and resampled points may lie
    outside the volume."""
    rng = np.random.RandomState(6)
    b, k = 2, 512
    raw = _fake_raw(rng, b, k)
    # row 1: huge depth spread -> <=32 in-volume survivors after centering
    raw["cand_depth"][1] = rng.randint(1000, 60000, k).astype(np.uint16)
    out = preprocess_core(
        {kk: jnp.asarray(v) for kk, v in raw.items()},
        None, None, None, jax.random.PRNGKey(3),
        n_points=N_PTS, unit=tuple(UNIT), total=tuple(TOTAL),
        limit=tuple(int(v) for v in LIMIT), augment=False,
        min_points=50, eval_keep_clamp=True,
    )
    assert np.asarray(out["valid"]).tolist() == [1.0, 1.0]  # clamp keeps it
    xyz = np.asarray(out["inp_feats"])[..., 4:7]
    # row 0 (tight blob): all resampled points in-volume
    assert (np.abs(xyz[0]) < TOTAL[0] * 0.5 + 1e-6).all()
    # row 1 (clamped): the spread survives into the selection
    assert (np.abs(xyz[1]) > TOTAL[0] * 0.5).any()


def test_eval_frame_loader_device_preprocess_through_evaluator(tmp_path):
    """Raw-mode YCBVTestDataset -> EvalFrameLoader(collate+transform) ->
    Evaluator: the full device-preprocessed eval path on the disk fixture,
    lost detections included."""
    from dcl_net_tpu.data.loader import EvalFrameLoader
    from dcl_net_tpu.data.ycbv import YCBVTestDataset
    from dcl_net_tpu.eval.evaluator import Evaluator
    from dcl_net_tpu.models import DCLNet
    from tests.fixtures import make_ycbv_fixture

    root, assets = make_ycbv_fixture(str(tmp_path), n_classes=3, n_frames=4,
                                     seed=0)
    cfg = Config({
        "input_size": 128, "tmp_size": 128,
        "unit_voxel_extent": [0.006, 0.006, 0.006],
        "voxel_num_limit": [64, 64, 64], "voxelization_mode": 4,
        "device_preprocess": True, "device_cand_k": 4096,
    })
    ds = YCBVTestDataset(cfg, root, assets_dir=assets)
    assert ds.raw_mode

    pre = DevicePreprocessor(
        n_points=128, unit_voxel_extent=[0.006] * 3, voxel_num_limit=[64] * 3,
        augment=False, eval_keep_clamp=True, seed=0)
    loader = EvalFrameLoader(ds, batch_size=8, num_workers=2,
                             collate=make_raw_batch, batch_transform=pre)
    model = DCLNet(unit_voxel_extent=(0.006,) * 3, voxel_num_limit=(64,) * 3,
                   n_inp=128, n_tmp=128)
    first = next(iter(loader))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), first, train=False)
    ev = Evaluator(model, variables, ds.model_points_array(),
                   protocol="adds_auc", template_bank=ds.template_bank())
    res = ev.evaluate(iter(loader))
    assert np.isfinite(res["auc_mean"]), res
    assert res["n_overflow"] == 0
