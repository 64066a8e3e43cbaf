"""End-to-end CLI tool tests on CPU with tiny shapes."""

import json
import os

import numpy as np
import pytest

from tests import fixtures

SMALL_OVERRIDES = [
    "model.n_inp=64", "model.n_tmp=64",
    "model.unit_voxel_extent=[0.024,0.024,0.024]",
    "model.voxel_num_limit=[16,16,16]",
    "hyper_dataset_train.input_size=64", "hyper_dataset_train.tmp_size=64",
    "hyper_dataset_train.unit_voxel_extent=[0.024,0.024,0.024]",
    "hyper_dataset_train.voxel_num_limit=[16,16,16]",
    "hyper_dataset_train.length=8",
    "hyper_dataloader_train.bs=4", "hyper_dataloader_train.num_workers=2",
    "max_epoch=1", "per_write=1",
]


def test_train_stage1_synthetic_smoke(tmp_path):
    from dcl_net_tpu.tools.train_stage1 import main

    log_root = str(tmp_path / "log")
    main([
        "--config", "configs/config_synthetic_smoke.yaml",
        "--log_root", log_root,
        "--override", *SMALL_OVERRIDES,
    ])
    exp_dir = os.path.join(log_root, "DCL_Net_config_synthetic_smoke_id0")
    assert os.path.isdir(os.path.join(exp_dir, "epoch_1"))
    scalars = open(os.path.join(exp_dir, "scalars.jsonl")).read().strip().splitlines()
    rec = json.loads(scalars[-1])
    assert np.isfinite(rec["loss_all"])
    # resume path: run again, should pick up epoch_1 and finish instantly
    main([
        "--config", "configs/config_synthetic_smoke.yaml",
        "--log_root", log_root,
        "--override", *SMALL_OVERRIDES,
    ])


def test_train_stage1_mesh_and_bank_smoke(tmp_path):
    """CLI-level data parallelism (--n_devices 2 on the virtual CPU mesh)
    combined with banked-template training — the full product path."""
    from dcl_net_tpu.tools.train_stage1 import main

    log_root = str(tmp_path / "log")
    main([
        "--config", "configs/config_synthetic_smoke.yaml",
        "--log_root", log_root, "--exp_id", "7",
        "--n_devices", "2",
        "--override", *SMALL_OVERRIDES, "train_template_bank=true",
    ])
    exp_dir = os.path.join(log_root, "DCL_Net_config_synthetic_smoke_id7")
    assert os.path.isdir(os.path.join(exp_dir, "epoch_1"))
    scalars = open(os.path.join(exp_dir, "scalars.jsonl")).read().strip().splitlines()
    assert np.isfinite(json.loads(scalars[-1])["loss_all"])


def test_train_stage1_device_preprocess_smoke(tmp_path):
    """Train CLI on the disk YCBV fixture with device-side preprocessing +
    samples_per_frame decode amortization (the round-4 input-pipeline
    production path)."""
    from dcl_net_tpu.tools import train_stage1
    from tests import fixtures

    root, assets = fixtures.make_ycbv_fixture(str(tmp_path), n_classes=3,
                                              n_frames=8, seed=0)
    datasets_dir = os.path.dirname(assets)
    log_root = str(tmp_path / "log")
    train_stage1.main([
        "--config", "configs/config_YCBV_bs32.yaml",
        "--log_root", log_root, "--path_data", datasets_dir,
        "--override",
        "model.n_inp=64", "model.n_tmp=64",
        "model.unit_voxel_extent=[0.024,0.024,0.024]",
        "model.voxel_num_limit=[16,16,16]",
        "model.capacities=[256,64,16,8]",
        "hyper_dataset_train.input_size=64",
        "hyper_dataset_train.tmp_size=64",
        "hyper_dataset_train.unit_voxel_extent=[0.024,0.024,0.024]",
        "hyper_dataset_train.voxel_num_limit=[16,16,16]",
        "hyper_dataset_train.device_preprocess=true",
        "hyper_dataset_train.device_cand_k=2048",
        "hyper_dataset_train.samples_per_frame=2",
        "hyper_dataloader_train.bs=8",
        "hyper_dataloader_train.num_workers=2",
        "max_epoch=1", "per_val=0", "per_save=1", "per_write=1",
    ])
    exp_dir = os.path.join(log_root, "DCL_Net_config_YCBV_bs32_id0")
    scalars = open(os.path.join(exp_dir, "scalars.jsonl")).read().strip().splitlines()
    rec = json.loads(scalars[-1])
    assert np.isfinite(rec["loss_all"])
    assert rec["overflow_frac"] == 0.0


def test_train_stage1_lm_device_preprocess_smoke(tmp_path):
    """Train CLI on the LineMOD fixture with device-side preprocessing +
    samples_per_frame: the fast input path extended to LM (in-graph
    occlusion-aug'd candidates, min_keep=128 validity)."""
    from dcl_net_tpu.tools import train_stage1
    from tests import fixtures

    fixtures.make_linemod_fixture(str(tmp_path))
    log_root = str(tmp_path / "log")
    train_stage1.main([
        "--config", "configs/config_LM.yaml",
        "--log_root", log_root, "--path_data", str(tmp_path),
        "--override",
        "model.n_inp=64", "model.n_tmp=64",
        "model.unit_voxel_extent=[0.012,0.012,0.012]",
        "model.voxel_num_limit=[16,16,16]",
        "model.capacities=[256,64,16,8]",
        "hyper_dataset_train.input_size=64",
        "hyper_dataset_train.tmp_size=64",
        "hyper_dataset_train.unit_voxel_extent=[0.012,0.012,0.012]",
        "hyper_dataset_train.voxel_num_limit=[16,16,16]",
        "hyper_dataset_train.device_preprocess=true",
        "hyper_dataset_train.device_cand_k=4096",
        "hyper_dataset_train.samples_per_frame=2",
        "hyper_dataloader_train.bs=8",
        "hyper_dataloader_train.num_workers=2",
        "max_epoch=1", "per_val=0", "per_save=1", "per_write=1",
    ])
    exp_dir = os.path.join(log_root, "DCL_Net_config_LM_id0")
    scalars = open(os.path.join(exp_dir, "scalars.jsonl")).read().strip().splitlines()
    rec = json.loads(scalars[-1])
    assert np.isfinite(rec["loss_all"])


@pytest.mark.slow
def test_stage2_train_synthetic_smoke(tmp_path):
    from dcl_net_tpu.tools.train_ycbv_stage2 import main as main2

    log_root = str(tmp_path / "log")
    # first produce a stage-1 checkpoint
    from dcl_net_tpu.tools.train_stage1 import main as main1

    main1([
        "--config", "configs/config_synthetic_smoke.yaml",
        "--log_root", log_root,
        "--override", *SMALL_OVERRIDES,
    ])
    stage1_ckpt = os.path.join(
        log_root, "DCL_Net_config_synthetic_smoke_id0", "epoch_1"
    )
    main2([
        "--config", "configs/config_synthetic_smoke.yaml",
        "--log_root", log_root, "--exp_id", "2",
        "--checkpoint_stage1", stage1_ckpt,
        "--iteration", "2",
        "--override", *SMALL_OVERRIDES, "per_val=1",
    ])
    exp_dir = os.path.join(log_root, "DCL_Net_config_synthetic_smoke_id2")
    assert os.path.isdir(os.path.join(exp_dir, "epoch_1"))
    # Solver parity with stage 1 (reference stage-2 Trainer inherits these,
    # tools/train_YCBV_stage2.py:89-222): ScalarWriter records + per_val hook
    records = [
        json.loads(line) for line in
        open(os.path.join(exp_dir, "scalars.jsonl")).read().strip().splitlines()
    ]
    train_recs = [r for r in records if r["mode"] == "train"]
    eval_recs = [r for r in records if r["mode"] == "eval"]
    assert train_recs and np.isfinite(train_recs[-1]["loss_all"])
    assert eval_recs and np.isfinite(eval_recs[-1]["refined_adds_mean"])
    # resume path: a second invocation picks up epoch_1 and finishes at once
    main2([
        "--config", "configs/config_synthetic_smoke.yaml",
        "--log_root", log_root, "--exp_id", "2",
        "--checkpoint_stage1", stage1_ckpt,
        "--iteration", "2",
        "--override", *SMALL_OVERRIDES, "per_val=1",
    ])


def test_eval_ycbv_cli(tmp_path):
    """test_ycbv_stage1 CLI on the YCBV disk fixture with a random-weight
    checkpoint: checks dataset loading, checkpoint IO and metric output."""
    import jax
    import jax.numpy as jnp

    from dcl_net_tpu.tools.test_ycbv_stage1 import main as eval_main
    from dcl_net_tpu.config import Config
    from dcl_net_tpu.tools.common import build_model
    from dcl_net_tpu.train.solver import TrainState
    from dcl_net_tpu.train.checkpoints import save_checkpoint
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

    root, assets = fixtures.make_ycbv_fixture(str(tmp_path))
    datasets_dir = os.path.dirname(assets)

    overrides = [
        "model.n_inp=64", "model.n_tmp=64",
        "model.unit_voxel_extent=[0.024,0.024,0.024]",
        "model.voxel_num_limit=[16,16,16]",
        "hyper_dataset_test.input_size=64", "hyper_dataset_test.tmp_size=64",
        "hyper_dataset_test.unit_voxel_extent=[0.024,0.024,0.024]",
        "hyper_dataset_test.voxel_num_limit=[16,16,16]",
        "hyper_dataloader_test.bs=4",
    ]
    cfg = Config.fromfile("configs/config_YCBV_bs32.yaml").apply_overrides(overrides)
    model = build_model(cfg)
    ds = SyntheticPoseDataset(
        n_objects=2, n_points=64, unit_voxel_extent=(0.024,) * 3,
        voxel_num_limit=(16,) * 3, length=4,
    )
    batch = make_batch([ds[i] for i in range(2)]).to_dict()
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=True
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables["batch_stats"], opt_state={},
    )
    log_root = str(tmp_path / "log")
    ckpt_dir = os.path.join(log_root, "DCL_Net_config_YCBV_bs32_id0")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(ckpt_dir, state, 1)

    result = eval_main([
        "--config", "configs/config_YCBV_bs32.yaml",
        "--log_root", log_root, "--path_data", datasets_dir,
        "--epoch", "1",
        "--override", *overrides,
    ])
    assert "auc_mean" in result
    assert 0.0 <= result["auc_mean"] <= 100.0
    # machine-readable artifact (docs/REPRODUCE.md): every eval CLI writes
    # results_<tool>.json next to its log
    res_path = os.path.join(ckpt_dir, "results_test_ycbv_stage1.json")
    saved = json.load(open(res_path))
    assert saved["auc_mean"] == result["auc_mean"]
    assert saved["n_scored"] > 0

    # padded-batch protocol is batch-size invariant: the production configs
    # run bs=512 (fixed-dispatch amortization, docs/PERF.md) where most rows
    # of the last batch are padding — metrics must match the bs=4 run exactly
    # (pad rows skipped, lost detections still scored as inf)
    result_big = eval_main([
        "--config", "configs/config_YCBV_bs32.yaml",
        "--log_root", log_root, "--path_data", datasets_dir,
        "--epoch", "1",
        "--override", *overrides[:-1], "hyper_dataloader_test.bs=128",
    ])
    # tolerance, not equality: different batch shapes compile to different
    # reduction orders (~1e-6 relative on distances), and the VOCap
    # staircase amplifies that on a 6-instance fixture; what must hold is
    # that no instance is dropped, double-counted or mis-classed
    import numpy as _np

    assert abs(result_big["auc_mean"] - result["auc_mean"]) < 0.2
    assert abs(result_big["acc_mean"] - result["acc_mean"]) < 0.2
    _np.testing.assert_allclose(
        result_big["auc_per_class"], result["auc_per_class"], atol=0.2)

    # device-preprocess eval path through the SAME CLI: lift/clamped-filter/
    # resample in-graph (hyper_dataset_test.device_preprocess) — the
    # resample draws differ (jax PRNG vs np.random), so parity here is the
    # protocol (same instances scored, finite metrics), not bit equality
    result_dev = eval_main([
        "--config", "configs/config_YCBV_bs32.yaml",
        "--log_root", log_root, "--path_data", datasets_dir,
        "--epoch", "1",
        "--override", *overrides,
        "hyper_dataset_test.device_preprocess=true",
        "hyper_dataset_test.device_cand_k=2048",
    ])
    assert 0.0 <= result_dev["auc_mean"] <= 100.0
    assert result_dev["n_overflow"] == 0


def test_eval_lm_and_lmo_cli(tmp_path):
    """test_lm / test_lmo CLIs end to end on the disk fixtures with a
    random-weight checkpoint: SegNet-mask eval mode, HybridPose masks +
    lost-detection denominator, models_info.yml diameters, metric output."""
    import jax
    import jax.numpy as jnp

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.tools.common import build_model
    from dcl_net_tpu.tools.test_lm import main as lm_main
    from dcl_net_tpu.tools.test_lmo import main as lmo_main
    from dcl_net_tpu.train.checkpoints import save_checkpoint
    from dcl_net_tpu.train.solver import TrainState

    lm_root = fixtures.make_linemod_fixture(str(tmp_path))
    fixtures.make_lmo_fixture(str(tmp_path), lm_root)
    datasets_dir = str(tmp_path)

    overrides = [
        "model.n_inp=64", "model.n_tmp=64",
        "model.unit_voxel_extent=[0.024,0.024,0.024]",
        "model.voxel_num_limit=[16,16,16]",
        "hyper_dataset_test.input_size=64", "hyper_dataset_test.tmp_size=64",
        "hyper_dataset_test.unit_voxel_extent=[0.024,0.024,0.024]",
        "hyper_dataset_test.voxel_num_limit=[16,16,16]",
        "hyper_dataloader_test.bs=4",
    ]
    cfg = Config.fromfile("configs/config_LM.yaml").apply_overrides(overrides)
    model = build_model(cfg)
    ds = SyntheticPoseDataset(
        n_objects=2, n_points=64, unit_voxel_extent=(0.024,) * 3,
        voxel_num_limit=(16,) * 3, length=4,
    )
    batch = make_batch([ds[i] for i in range(2)]).to_dict()
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=True
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables["batch_stats"], opt_state={},
    )
    log_root = str(tmp_path / "log")
    ckpt_dir = os.path.join(log_root, "DCL_Net_config_LM_id0")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(ckpt_dir, state, 1)

    common = [
        "--config", "configs/config_LM.yaml",
        "--log_root", log_root, "--path_data", datasets_dir,
        "--epoch", "1",
        "--override", *overrides,
    ]
    res_lm = lm_main(common)
    assert "success_mean" in res_lm
    assert 0.0 <= res_lm["success_mean"] <= 100.0

    res_lmo = lmo_main(common)
    assert "success_mean" in res_lmo
    assert 0.0 <= res_lmo["success_mean"] <= 100.0

    # device-side preprocessing arms: raw candidates + in-graph lift/filter/
    # resample (LM: keep-clamp threshold 0; LMO: min_keep=0)
    dev = ["hyper_dataset_test.device_preprocess=true",
           "hyper_dataset_test.device_cand_k=2048"]
    res_lm_dev = lm_main(common + dev)
    assert 0.0 <= res_lm_dev["success_mean"] <= 100.0
    res_lmo_dev = lmo_main(common + dev)
    assert 0.0 <= res_lmo_dev["success_mean"] <= 100.0


def test_all_shipped_configs_parse_and_build():
    """Every yaml in configs/ must parse, build the model, and build the
    optimizer — catches config rot (new fields, renamed keys) across the
    whole shipped set, including the bs128 throughput and bs256 peak
    training configs."""
    import glob

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.tools.common import build_model
    from dcl_net_tpu.train.solver import build_optimizer

    paths = sorted(glob.glob("configs/*.yaml"))
    assert len(paths) >= 6
    for p in paths:
        cfg = Config.fromfile(p)
        model = build_model(cfg)
        assert model.n_inp > 0 and model.n_tmp > 0
        tx, _ = build_optimizer(cfg)
        assert tx is not None
        for side in ("train", "test"):
            dl = cfg.get(f"hyper_dataloader_{side}")
            if dl:
                assert int(dl["bs"]) > 0, p
