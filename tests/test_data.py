"""Data pipeline tests on disk fixtures mimicking the real dataset formats."""

import os

import numpy as np
import pytest

from dcl_net_tpu.config import Config
from dcl_net_tpu.data.loader import BatchLoader, EvalFrameLoader
from dcl_net_tpu.data.ply import read_ply, sample_points_uniformly
from dcl_net_tpu.data import preprocess as pp

from tests import fixtures

CFG = Config({
    "input_size": 256, "tmp_size": 256,
    "unit_voxel_extent": [0.006, 0.006, 0.006],
    "voxel_num_limit": [64, 64, 64],
    "voxelization_mode": 4,
})


@pytest.fixture(scope="module")
def ycbv_dirs(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ycbv"))
    return fixtures.make_ycbv_fixture(tmp)


@pytest.fixture(scope="module")
def lm_root(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("lm"))
    return fixtures.make_linemod_fixture(tmp)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.randn(50, 3).astype(np.float32)
    cols = rng.randint(0, 255, (50, 3))
    fixtures._write_ply_ascii(str(tmp_path / "t.ply"), pts, cols)
    ply = read_ply(str(tmp_path / "t.ply"))
    np.testing.assert_allclose(ply["points"], pts, atol=1e-4)
    np.testing.assert_allclose(ply["colors"], cols / 255.0, atol=1e-4)


def test_mesh_sampling(rng):
    # unit right triangle in z=0 plane: samples must stay inside
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    s, _ = sample_points_uniformly(pts, faces, 500, np.random.RandomState(0))
    assert s.shape == (500, 3)
    assert (s[:, 2] == 0).all()
    assert (s[:, 0] >= 0).all() and (s[:, 1] >= 0).all()
    assert (s[:, 0] + s[:, 1] <= 1 + 1e-6).all()


def test_get_bbox_snaps():
    m = np.zeros((480, 640), bool)
    m[100:150, 200:280] = True
    rmin, rmax, cmin, cmax = pp.get_bbox(m)
    assert (rmax - rmin) in pp.BORDER_LIST
    assert (cmax - cmin) in pp.BORDER_LIST
    assert rmin <= 100 and rmax >= 150 and cmin <= 200 and cmax >= 280


def test_ycbv_train_dataset(ycbv_dirs):
    from dcl_net_tpu.data.ycbv import YCBVTrainDataset

    root, assets = ycbv_dirs
    np.random.seed(0)
    ds = YCBVTrainDataset(CFG, root, assets_dir=assets)
    assert len(ds) == 2
    s = ds[0]
    assert s["valid"] == 1.0
    assert s["inp_feats"].shape == (256, 7)
    assert s["tmp_feats"].shape == (256, 7)
    assert s["inp_voxel_idx"].min() >= 0 and s["inp_voxel_idx"].max() < 64
    # observed cloud must be near the gt pose of the CAD cloud:
    # feats xyz are centered; check scale sanity
    assert np.abs(s["inp_feats"][:, 4:]).max() < 0.2
    # template feats: xyz are the CAD points (radius 0.04)
    r = np.linalg.norm(s["tmp_feats"][:, 4:], axis=1)
    np.testing.assert_allclose(r, 0.04, atol=1e-3)

    loader = BatchLoader(ds, batch_size=2, num_workers=2, to_jax=False)
    batches = list(iter(loader))
    assert len(batches) == 1
    assert batches[0]["inp"]["feats"].shape == (2, 256, 7)


def test_multihost_loader_requires_drop_last_on_partial_epochs():
    """With process striding, a trailing partial global batch hands a
    higher-rank process an EMPTY index block — collate would crash on one
    host while the others dispatch a collective (a desync hang, not an
    error). The loader must refuse the configuration up front; divisible
    epochs and drop_last=True stay accepted."""
    import pytest

    ds = list(range(40))  # 40 items, global batch 16 -> trailing 8
    with pytest.raises(ValueError, match="drop_last"):
        BatchLoader(ds, batch_size=16, drop_last=False,
                    process_id=1, process_count=2)
    BatchLoader(ds, batch_size=16, drop_last=True,
                process_id=1, process_count=2)
    BatchLoader(ds[:32], batch_size=16, drop_last=False,
                process_id=1, process_count=2)


def test_process_worker_loader_matches_thread(ycbv_dirs):
    """worker_type="process" (reference parity: 10 DataLoader worker
    processes) must deliver the same batch STRUCTURE as threads. Contents
    are not bit-compared: the train dataset draws from np.random per call,
    so worker scheduling legitimately changes the augmentation stream —
    what must match is the batch schema, shapes and validity protocol."""
    from dcl_net_tpu.data.ycbv import YCBVTrainDataset

    root, assets = ycbv_dirs
    ds = YCBVTrainDataset(CFG, root, assets_dir=assets)
    thread = list(iter(BatchLoader(
        ds, batch_size=2, num_workers=2, to_jax=False, worker_type="thread")))
    proc = list(iter(BatchLoader(
        ds, batch_size=2, num_workers=2, to_jax=False, worker_type="process")))
    assert len(proc) == len(thread) == 1
    for k in ("inp", "tmp"):
        assert proc[0][k]["feats"].shape == thread[0][k]["feats"].shape
        assert proc[0][k]["voxel_idx"].dtype == thread[0][k]["voxel_idx"].dtype
    assert proc[0]["valid"].shape == thread[0]["valid"].shape
    # template branch is deterministic given the class -> every row's tmp
    # feats must be bit-identical to the class's canonical template,
    # whichever worker produced it
    bank = ds.template_bank()
    for batch in (proc[0], thread[0]):
        for i in range(2):
            if batch["valid"][i] <= 0:
                continue
            c = int(batch["labels"]["obj_idx"][i])
            np.testing.assert_array_equal(
                np.asarray(batch["tmp"]["feats"][i]), bank["feats"][c])


class _FakeSeedCounter:
    """In-process stand-in for the forkserver ctx.Value worker-id counter."""

    def __init__(self, value):
        self.value = value

    def get_lock(self):
        import contextlib

        return contextlib.nullcontext()


def test_worker_seeding_is_distinct_and_deterministic():
    """loader._init_worker must give worker k a deterministic np.random /
    random stream that differs across worker ids and across base seeds
    (forkserver workers otherwise all inherit the server process's state —
    the classic numpy+fork bug torch's DataLoader seeds around)."""
    import random

    from dcl_net_tpu.data import loader

    def stream(base_seed, worker_id):
        loader._init_worker(None, _FakeSeedCounter(worker_id), base_seed)
        return (
            tuple(np.random.randint(1 << 62) for _ in range(3)),
            tuple(random.random() for _ in range(3)),
        )

    np_state, py_state = np.random.get_state(), random.getstate()
    try:
        s00, s01 = stream(0, 0), stream(0, 1)
        assert s00 != s01  # distinct streams per worker
        assert stream(0, 0) == s00  # deterministic per (base_seed, id)
        assert stream(1, 0) != s00  # base seed matters
        # SeedSequence spread: adjacent base seeds must NOT alias worker
        # streams (base 0 worker 1 != base 1 worker 0)
        assert stream(1, 0) != s01
    finally:
        np.random.set_state(np_state)
        random.setstate(py_state)


class _RngProbeDataset:
    """Each fetch returns (pid, next np.random draw); the sleep gives the
    pool time to involve more than one worker."""

    def __len__(self):
        return 8

    def __getitem__(self, i):
        import os
        import time

        time.sleep(0.15)
        # int64 straight through (a float64 cast would mangle >2**53 draws)
        return {"pid": np.int64(os.getpid()),
                "draw": np.int64(np.random.randint(1 << 62))}


def test_process_workers_have_distinct_rng_streams():
    """End-to-end pool check: draws from DIFFERENT worker processes must
    differ (unique overall). Guarded against the vacuous pass where one
    fast-spawning worker drains every chunk — then the test skips rather
    than asserting nothing."""
    import pytest as _pytest

    from dcl_net_tpu.data.loader import _ProcessPool

    pool = _ProcessPool(2, _RngProbeDataset(), base_seed=123)
    try:
        rows = pool.map(None, range(8))
    finally:
        pool.close()
    pids = {int(r["pid"]) for r in rows}
    if len(pids) < 2:
        _pytest.skip("one worker drained all chunks; cross-worker streams "
                     "not observable this run (seed logic unit-tested above)")
    draws = [int(r["draw"]) for r in rows]
    assert len(set(draws)) == len(draws), draws


def test_ycbv_test_dataset_and_lost(ycbv_dirs):
    from dcl_net_tpu.data.ycbv import YCBVTestDataset

    root, assets = ycbv_dirs
    np.random.seed(0)
    ds = YCBVTestDataset(CFG, root, assets_dir=assets)
    frame0 = ds[0]
    # fixture hides class 2 in frame 0 -> 1 lost, 2 detected
    assert len(frame0["lost"]) == 1
    assert frame0["lost"][0]["obj_idx"] == 1
    assert len(frame0["samples"]) == 2
    mp = ds.model_points_array()
    assert mp.shape == (3, 256, 3)

    loader = EvalFrameLoader(ds, batch_size=4, num_workers=2)
    batches = list(iter(loader))
    total = sum(int(np.asarray(b["valid"]).shape[0]) for b in batches)
    n_valid = sum(int(np.asarray(b["valid"]).sum()) for b in batches)
    assert n_valid == 5  # 2 + 3 detected instances
    # lost row kept its class label
    found_lost = False
    for b in batches:
        v = np.asarray(b["valid"])
        cls = np.asarray(b["labels"]["obj_idx"])
        for i in range(len(v)):
            if v[i] == 0 and cls[i] == 1:
                found_lost = True
    assert found_lost


def test_linemod_train_dataset(lm_root):
    from dcl_net_tpu.data.linemod import LineMODDataset

    np.random.seed(0)
    ds = LineMODDataset("train", CFG, lm_root)
    assert len(ds) == 13
    s = ds[0]
    assert s["valid"] == 1.0
    assert s["inp_feats"].shape == (256, 7)
    assert s["sym_flag"] in (0.0, 1.0)
    diam = ds.diameters()
    assert len(diam) == 13
    np.testing.assert_allclose(diam, 0.008, atol=1e-6)  # 80mm * 0.1 / 1000

    # occlusion augmentation must not crash and returns valid shapes
    s2 = ds[5]
    assert s2["inp_feats"].shape == (256, 7)


def test_linemod_test_mode(lm_root):
    from dcl_net_tpu.data.linemod import LineMODDataset

    np.random.seed(0)
    ds = LineMODDataset("test", CFG, lm_root)
    # fixture writes 10 identical test lines -> 1 kept per object
    assert len(ds) == 13
    s = ds[3]
    assert s["valid"] == 1.0


def test_lmo_dataset(lm_root, tmp_path):
    from dcl_net_tpu.data.linemod import OcclusionLineMODDataset

    root, masks = fixtures.make_lmo_fixture(str(tmp_path), lm_root)
    np.random.seed(0)
    ds = OcclusionLineMODDataset(
        "eval", CFG, root, os.path.join(lm_root, "models"), masks_dir=masks
    )
    assert len(ds) == 8
    s = ds[0]
    assert s["valid"] == 1.0
    assert s["inp_feats"].shape == (256, 7)
    # the pose stored by the loader must compose alignment flipping:
    # R = flip @ r_raw @ R_lo -> orthonormal
    r = s["rot_gt"]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    d = ds.diameters(os.path.join(lm_root, "models", "models_info.yml"))
    assert len(d) == 8


def test_ycbv_frames_pins_reference_batching_protocol(ycbv_dirs):
    """Protocol fixture test (reference YCBV/dataloader_test_YCBV.py:
    116-144, 259-260): one batch per image, holding exactly that image's
    ground-truth instances IN GT ORDER, lost detections present as valid=0
    rows carrying their true class and pose labels."""
    from dcl_net_tpu.data.ycbv import YCBVTestDataset

    root, assets = ycbv_dirs
    np.random.seed(0)
    ds = YCBVTestDataset(CFG, root, assets_dir=assets)

    batches = list(ds.frames())
    assert len(batches) == len(ds) == 2

    # frame 0: gt instances are classes 1,2,3 (obj_idx 0,1,2); the fixture
    # hides class 2 -> its row is the lost one, in its gt position
    b0, path0 = batches[0]
    assert path0 == ds.list[0]
    np.testing.assert_array_equal(np.asarray(b0["labels"]["obj_idx"]), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(b0["valid"]), [1.0, 0.0, 1.0])
    # the lost row keeps its true pose labels (scored as inf by the protocol)
    import scipy.io as sio
    meta = sio.loadmat(f"{root}/{ds.list[0]}-meta.mat")
    np.testing.assert_allclose(
        np.asarray(b0["labels"]["trans_gt"])[1], meta["poses"][:, 3, 1], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b0["labels"]["rot_gt"])[1], meta["poses"][:, :3, 1], atol=1e-6
    )

    # frame 1: all three detected
    b1, _ = batches[1]
    np.testing.assert_array_equal(np.asarray(b1["labels"]["obj_idx"]), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(b1["valid"]), [1.0, 1.0, 1.0])

    # the padded EvalFrameLoader stream must carry the SAME instances:
    # every (frame, class) either valid in both or lost in both
    from dcl_net_tpu.data.loader import EvalFrameLoader

    np.random.seed(0)
    loader = EvalFrameLoader(ds, batch_size=4, num_workers=2)
    stream = []
    for b in loader:
        v = np.asarray(b["valid"])
        cls = np.asarray(b["labels"]["obj_idx"])
        stream.extend((int(c), float(f)) for c, f in zip(cls, v))
    want = []
    for b, _ in batches:
        v = np.asarray(b["valid"])
        cls = np.asarray(b["labels"]["obj_idx"])
        want.extend((int(c), float(f)) for c, f in zip(cls, v))
    # loader appends lost rows after the frame's detected ones; compare as
    # per-frame multisets in frame order (3 instances per frame here)
    assert sorted(stream[:3]) == sorted(want[:3])
    assert sorted(stream[3:6]) == sorted(want[3:6])


def test_synthetic_dataset_on_real_cad_dir(ycbv_dirs):
    """cad_dir mode: synthetic poses/views on on-disk CAD clouds (the mode
    the convergence run uses with the 21 real YCB-V objects)."""
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

    root, assets = ycbv_dirs
    ds = SyntheticPoseDataset(
        n_objects=0, n_points=128,
        unit_voxel_extent=(0.006,) * 3, voxel_num_limit=(64,) * 3,
        length=8, cad_dir=os.path.join(assets, "CADs"),
    )
    assert len(ds.cad_points) >= 1
    s = ds[0]
    assert s["inp_feats"].shape == (128, 7)
    assert s["tmp_feats"].shape == (128, 7)
    assert np.isfinite(s["inp_feats"]).all()
    # observed = CAD under the gt pose (+noise): residual must be small
    obs = s["inp_feats"][:, 4:7]
    cano = (obs - s["trans_gt"]) @ s["rot_gt"]
    cad = ds.cad_points[int(s["obj_idx"])]
    d = np.sqrt(((cano[:, None] - cad[None]) ** 2).sum(-1)).min(1)
    assert float(d.mean()) < 0.01
    bank = ds.template_bank()
    assert bank["feats"].shape == (len(ds.cad_points), 128, 7)
