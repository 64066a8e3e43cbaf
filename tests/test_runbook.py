"""Runbook CI (VERDICT r4 item 9): execute docs/REPRODUCE.md's command
sequence against the on-disk fixture trees, SHELLING the documented CLIs
(`python -m dcl_net_tpu.tools.*`) as real subprocesses rather than calling
their mains in-process — so the real-data runbook cannot rot while it waits
for real data.

Covers the full §3 + §4 sequence:
  §3  eval released checkpoints (.pth converted on the fly):
      test_ycbv_stage1, test_ycbv_stage2, test_lm, test_lmo
  §4  re-train from scratch: train_stage1 -> orbax checkpoint ->
      train_ycbv_stage2 --checkpoint_stage1 <epoch dir>

The "released checkpoints" are reference-layout torch state dicts (the exact
tensor names/shapes of the reference's DCL_Net.py / refiner.py modules,
tests/test_converter_full.py) saved via torch.save — conversion completeness
is what the converter tests pin; here the claim under test is the documented
COMMANDS: flags, path layout (path_data/YCB_Video_Dataset, Linemod_
preprocessed, OCCLUSION_LINEMOD), checkpoint resolution, and the metrics
JSON artifact each eval CLI writes (results_<tool>.json).

Sizes are shrunk via --override (point counts / grids / batch), which the
runbook itself documents as the tuning surface; model CHANNEL widths — what
the .pth conversion keys on — stay the reference's.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests import fixtures
from tests.test_converter_full import _fake_reference_state_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# documented tuning surface: shrink data sizes, keep architecture widths
SMALL_EVAL = [
    "model.n_inp=64", "model.n_tmp=64",
    "model.unit_voxel_extent=[0.024,0.024,0.024]",
    "model.voxel_num_limit=[16,16,16]",
    "model.interp_mode=exact",
    "hyper_dataset_test.input_size=64", "hyper_dataset_test.tmp_size=64",
    "hyper_dataset_test.unit_voxel_extent=[0.024,0.024,0.024]",
    "hyper_dataset_test.voxel_num_limit=[16,16,16]",
    "hyper_dataloader_test.bs=4", "hyper_dataloader_test.num_workers=2",
]
SMALL_TRAIN = [
    "model.n_inp=64", "model.n_tmp=64",
    "model.unit_voxel_extent=[0.024,0.024,0.024]",
    "model.voxel_num_limit=[16,16,16]",
    "model.interp_mode=exact",
    "hyper_dataset_train.input_size=64", "hyper_dataset_train.tmp_size=64",
    "hyper_dataset_train.unit_voxel_extent=[0.024,0.024,0.024]",
    "hyper_dataset_train.voxel_num_limit=[16,16,16]",
    "hyper_dataloader_train.bs=4", "hyper_dataloader_train.num_workers=2",
    "max_epoch=1", "per_val=0", "per_save=1", "per_write=1",
]


def _shell(args, cwd, timeout=420):
    """Run one documented command as a subprocess on the CPU backend."""
    env = dict(os.environ)
    # the CLIs honor DCLNET_PLATFORM (tools/common.init): this environment's
    # sitecustomize pins the TPU backend via jax.config, which outranks
    # JAX_PLATFORMS — and the real chip is reserved for bench.py
    env["DCLNET_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 CPU device; no virtual mesh needed
    # the runbook assumes an installed package; CI runs from the repo, and
    # the commands execute in the datasets workdir — emulate the install
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m"] + args,
        cwd=cwd, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert proc.returncode == 0, (
        f"command failed: {' '.join(args)}\n--- output tail ---\n"
        + proc.stdout[-4000:])
    return proc.stdout


def _save_pth(path, state_dict):
    import torch

    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save({k: torch.as_tensor(np.asarray(v))
                for k, v in state_dict.items()}, path)


def _fake_refiner_state_dict(rng):
    """Reference refiner.py tensor layout (tests/test_converter_full.py)."""
    sd = {}
    for name, dim_in, dims in [
        ("MLP_share", 259, [512, 512, 1024]),
        ("regressor_rot2", 1024, [512, 128, 9]),
        ("regressor_trans2", 1024, [512, 128, 3]),
    ]:
        seq = 0
        cin = dim_in
        for li, cout in enumerate(dims):
            sd[f"{name}.layers.{seq}.weight"] = rng.randn(
                cout, cin, 1).astype(np.float32)
            sd[f"{name}.layers.{seq}.bias"] = rng.randn(cout).astype(
                np.float32)
            seq += 2 if (name == "MLP_share" or li < len(dims) - 1) else 1
            cin = cout
    return sd


def _result_json(workdir, log_root, exp_name, tool):
    path = os.path.join(workdir, log_root, exp_name, f"results_{tool}.json")
    assert os.path.isfile(path), f"eval CLI wrote no metrics JSON at {path}"
    with open(path) as f:
        return json.load(f)


@pytest.mark.slow
def test_reproduce_runbook_command_sequence(tmp_path):
    # ---- datasets/ tree, REPRODUCE.md §2 layout ----
    datasets = tmp_path / "datasets"
    datasets.mkdir()
    fixtures.make_ycbv_fixture(str(datasets), n_classes=3, n_frames=4, seed=0)
    lm_root = fixtures.make_linemod_fixture(str(datasets))
    fixtures.make_lmo_fixture(str(datasets), lm_root)

    workdir = str(tmp_path)  # the runbook's relative ./log, ./datasets
    rng = np.random.RandomState(0)
    _save_pth(os.path.join(workdir, "log", "DCL_Net", "epoch_84.pth"),
              _fake_reference_state_dict(rng))
    _save_pth(os.path.join(workdir, "log", "LM", "epoch_350.pth"),
              _fake_reference_state_dict(rng))
    _save_pth(os.path.join(workdir, "log", "refiner", "epoch_66.pth"),
              _fake_refiner_state_dict(rng))

    def cfgpath(name):  # the runbook's configs/ live in the repo
        return os.path.join(REPO, "configs", name)

    # ---- §3: evaluate released checkpoints (.pth converted on the fly) ----
    _shell(["dcl_net_tpu.tools.test_ycbv_stage1",
            "--config", cfgpath("config_YCBV_bs32.yaml"),
            "--path_data", "./datasets",
            "--checkpoint", "log/DCL_Net/epoch_84.pth",
            "--override", *SMALL_EVAL], cwd=workdir)
    res = _result_json(workdir, "log", "DCL_Net_config_YCBV_bs32_id0",
                       "test_ycbv_stage1")
    assert 0.0 <= res["auc_mean"] <= 100.0

    _shell(["dcl_net_tpu.tools.test_ycbv_stage2",
            "--config", cfgpath("config_YCBV_bs40.yaml"),
            "--path_data", "./datasets",
            "--checkpoint_stage1", "log/DCL_Net/epoch_84.pth",
            "--checkpoint", "log/refiner/epoch_66.pth",
            "--iteration", "2",
            "--override", *SMALL_EVAL], cwd=workdir)
    res2 = _result_json(workdir, "log", "DCL_Net_config_YCBV_bs40_id0",
                        "test_ycbv_stage2")
    assert 0.0 <= res2["auc_mean"] <= 100.0

    _shell(["dcl_net_tpu.tools.test_lm",
            "--config", cfgpath("config_LM.yaml"),
            "--path_data", "./datasets",
            "--checkpoint", "log/LM/epoch_350.pth",
            "--override", *SMALL_EVAL], cwd=workdir)
    res_lm = _result_json(workdir, "log", "DCL_Net_config_LM_id0", "test_lm")
    assert 0.0 <= res_lm["success_mean"] <= 100.0

    _shell(["dcl_net_tpu.tools.test_lmo",
            "--config", cfgpath("config_LM.yaml"),
            "--path_data", "./datasets",
            "--checkpoint", "log/LM/epoch_350.pth",
            "--override", *SMALL_EVAL], cwd=workdir)
    res_lmo = _result_json(workdir, "log", "DCL_Net_config_LM_id0",
                           "test_lmo")
    assert 0.0 <= res_lmo["success_mean"] <= 100.0

    # ---- §4: re-train from scratch, then stage 2 on the produced ckpt ----
    _shell(["dcl_net_tpu.tools.train_stage1",
            "--config", cfgpath("config_YCBV_bs32.yaml"),
            "--path_data", "./datasets", "--exp_id", "1",
            "--override", *SMALL_TRAIN], cwd=workdir)
    stage1_ckpt = os.path.join(
        workdir, "log", "DCL_Net_config_YCBV_bs32_id1", "epoch_1")
    assert os.path.isdir(stage1_ckpt)
    scalars = open(os.path.join(
        workdir, "log", "DCL_Net_config_YCBV_bs32_id1",
        "scalars.jsonl")).read().strip().splitlines()
    assert np.isfinite(json.loads(scalars[-1])["loss_all"])

    _shell(["dcl_net_tpu.tools.train_ycbv_stage2",
            "--config", cfgpath("config_YCBV_bs40.yaml"),
            "--path_data", "./datasets", "--exp_id", "1",
            "--checkpoint_stage1", stage1_ckpt, "--iteration", "2",
            "--override", *SMALL_TRAIN], cwd=workdir)
    exp2 = os.path.join(workdir, "log", "DCL_Net_config_YCBV_bs40_id1")
    assert os.path.isdir(os.path.join(exp2, "epoch_1"))
