"""Shared CLI scaffolding for the train/test tools.

Mirrors the reference tools' init pattern (argparse -> Config.fromfile ->
attribute patching -> logger + source backup, reference
tools/train_YCBV_stage1.py:20-66) without the gorilla dependency.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

from dcl_net_tpu.config import Config
from dcl_net_tpu.registry import DATASETS, MODELS
from dcl_net_tpu.train.logging import backup_source, get_logger, set_random_seed


def base_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--model", default="DCL_Net", help="model registry name")
    parser.add_argument("--config", required=True, help="path to yaml config")
    parser.add_argument("--exp_id", default=0, type=int, help="experiment id")
    parser.add_argument("--path_data", default="./datasets", help="dataset root")
    parser.add_argument("--epoch", default=None, type=int, help="checkpoint epoch (eval)")
    parser.add_argument("--checkpoint", default=None, help="explicit checkpoint path")
    parser.add_argument("--log_root", default="./log", help="log directory root")
    parser.add_argument(
        "--override", nargs="*", default=[],
        help="config overrides key.subkey=value",
    )
    parser.add_argument(
        "--n_devices", default=None, type=int,
        help="data-parallel device count (like the reference's --gpus, "
        "tools/train_YCBV_stage1.py:251-252); default: cfg.parallel."
        "n_devices, else 1 (no mesh)",
    )
    parser.add_argument(
        "--coordinator", default=None,
        help="multi-host: jax.distributed coordinator address "
        "(host:port). Requires --num_hosts/--host_id on platforms without "
        "auto-detection; the mesh then spans every host's devices and each "
        "host loads its block of the global batch (parallel/mesh.py)",
    )
    parser.add_argument("--num_hosts", default=None, type=int,
                        help="multi-host: total process count")
    parser.add_argument("--host_id", default=None, type=int,
                        help="multi-host: this process's index")
    return parser


def init(args, tool_name: str) -> Tuple[object, Config]:
    # persistent compilation cache for EVERY tool (CLAUDE.md rule 3: cold
    # compiles take minutes via remote-compile) — the eval CLIs previously
    # paid that on every invocation
    import jax

    # multi-host handshake FIRST: jax.distributed must initialize before any
    # backend touch (SURVEY.md §2.3 "jax.distributed init + GSPMD mesh")
    if getattr(args, "coordinator", None):
        from dcl_net_tpu.parallel.mesh import init_distributed

        init_distributed(
            args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )

    # DCLNET_PLATFORM=cpu|tpu: explicit backend selection for every CLI.
    # Needed because some environments register a preferred backend via
    # sitecustomize with jax.config (which outranks the JAX_PLATFORMS env
    # var) — e.g. CI runs of docs/REPRODUCE.md's commands on CPU-only hosts
    # (tests/test_runbook.py).
    if os.environ.get("DCLNET_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DCLNET_PLATFORM"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")),
    )
    cfg = Config.fromfile(args.config)
    if args.override:
        cfg = cfg.apply_overrides(args.override)
    config_name = os.path.splitext(os.path.basename(args.config))[0]
    exp_name = f"{args.model}_{config_name}_id{args.exp_id}"
    log_dir = os.path.join(args.log_root, exp_name)
    os.makedirs(log_dir, exist_ok=True)
    cfg.exp_name = exp_name
    cfg.log_dir = log_dir
    cfg.model_name = args.model
    cfg.path_data = args.path_data
    if args.epoch is not None:
        cfg.test_epoch = args.epoch
    logger = get_logger(path_file=os.path.join(log_dir, f"{tool_name}_logger.log"))
    backup_source(log_dir)
    set_random_seed(int(cfg.get("rd_seed", 1)))
    return logger, cfg


def write_result_json(cfg: Config, tool_name: str, result: dict) -> str:
    """Persist an eval CLI's metric dict as `<log_dir>/results_<tool>.json`.

    The reference tools only print metrics into their logs
    (tools/test_YCBV_stage1.py:199-205); a machine-readable artifact is what
    the reproduction runbook (docs/REPRODUCE.md) and its CI test key on.
    numpy scalars/arrays are converted to plain JSON types."""
    import json

    import numpy as np

    def clean(x):
        if isinstance(x, dict):
            return {k: clean(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [clean(v) for v in x]
        if isinstance(x, np.ndarray):
            return x.tolist()
        if isinstance(x, (np.floating, np.integer, np.bool_)):
            return x.item()
        return x

    path = os.path.join(cfg.log_dir, f"results_{tool_name}.json")
    with open(path, "w") as f:
        json.dump(clean(result), f, indent=1)
    return path


def build_mesh(cfg: Config, args=None):
    """Build the 1-D data mesh requested by --n_devices / cfg.parallel.n_devices.

    Returns None when n_devices <= 1 (single-device jit, no mesh) — mirrors
    the reference engaging DataParallel only for >1 GPU
    (tools/train_YCBV_stage1.py:251-252).
    """
    n = getattr(args, "n_devices", None) if args is not None else None
    if n is None:
        n = int(cfg.get("parallel", Config()).get("n_devices", 1))
    if n <= 1:
        return None
    from dcl_net_tpu.parallel.mesh import make_mesh

    return make_mesh(n)


def build_model(cfg: Config, dtype=None, interp_mode: str = None):
    """Instantiate the registered model from cfg.model (reference resolves by
    importlib module name, tools/train_YCBV_stage1.py:249-250).

    cfg.model.compute_dtype ("bfloat16"/"float32") selects the compute dtype
    for the conv/matmul-heavy feature path (geometry stays f32 either way);
    bf16 measures ~17% faster eval on v5e.
    """
    # deferred: tools configure the jax env (cache dir, platform) in init()
    # before any jax import
    import jax
    import jax.numpy as jnp

    import dcl_net_tpu.models  # noqa: F401  (populates the registry)

    if dtype is None:
        name = cfg.model.get("compute_dtype")
        if name is None:
            # Default on TPU: bf16 feature compute (+5% eval, 1.75x train
            # step; pose drift vs f32 bounded ~20x under metric thresholds,
            # tests/test_model.py). Geometry/SVD stays f32 HIGHEST either
            # way. Opt out with model.compute_dtype: float32.
            name = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        dtype = {"bfloat16": jnp.bfloat16, "float32": None}[str(name)]
    model_cls = MODELS.get(cfg.model.get("name", cfg.get("model_name", "DCL_Net")))
    m = cfg.model
    kwargs = {}
    caps = m.get("capacities")
    if caps:
        kwargs["capacities"] = tuple(int(c) for c in caps)
    if m.get("remat"):
        # recompute backbone activations in backward: fits large-batch
        # training in HBM (model.remat: true; see models/dcl_net.py)
        kwargs["remat"] = bool(m.remat)
    mode = m.get("interp_mode", interp_mode)
    if mode is None:
        # Default: the fused Pallas interp path (custom-VJP, so valid for
        # training too: 590 vs 655 ms/step at B=32, docs/PERF.md) on TPU;
        # on CPU the kernels run in interpret mode (slow), so tests and
        # CPU smoke runs keep the exact XLA path.
        mode = "pallas" if jax.default_backend() == "tpu" else "exact"
    kwargs["interp_mode"] = str(mode)
    vox = m.get("voxelize_impl")
    if vox is None:
        # Default: the Pallas matmul voxelizer under TPU+bf16 (the backend's
        # serial scatter costs ~25 ms at B=256 regardless of formulation; the
        # bf16 MXU one-hot matmul form measures 14.1 ms and is custom-VJP'd
        # for training — ops/pallas_voxelize.py). Under f32 payloads the
        # kernel needs HIGHEST-precision matmuls (55 ms — slower than the
        # scatter), and on CPU interpret-mode kernels are slow, so both keep
        # the exact scatter.
        on_tpu = jax.default_backend() == "tpu"
        vox = "matmul" if on_tpu and dtype == jnp.bfloat16 else "scatter"
    kwargs["voxelize_impl"] = str(vox)
    return model_cls(
        voxelization_mode=int(m.voxelization_mode),
        unit_voxel_extent=tuple(m.unit_voxel_extent),
        voxel_num_limit=tuple(int(v) for v in m.voxel_num_limit),
        n_inp=int(m.n_inp),
        n_tmp=int(m.n_tmp),
        kernel_size=int(m.backbone.kernel_size),
        dtype=dtype,
        **kwargs,
    )


def build_device_preprocess(ds_cfg, dataset, *, augment: bool,
                            eval_keep_clamp: bool = False,
                            keep_clamp_threshold: int = 32,
                            seed: int = 1, logger=None):
    """(collate, batch_transform) for opt-in device-side preprocessing
    (ds_cfg.device_preprocess), or (None, None).

    The in-graph volume-filter validity threshold comes from the dataset
    (device_min_points: YCBV train 50, LM train/test 128, LMO 0 — matching
    each reference loader's min_keep); the eval keep-clamp threshold from
    the caller (YCBV test 32, LM eval 0)."""
    if not bool(ds_cfg.get("device_preprocess", False)):
        return None, None
    if not getattr(dataset, "raw_mode", False):
        raise ValueError(
            "device_preprocess requires a dataset with raw-candidate "
            f"support, got {type(dataset).__name__}")
    from dcl_net_tpu.data.device_preprocess import (
        DevicePreprocessor, make_raw_batch,
    )

    transform = DevicePreprocessor(
        n_points=int(ds_cfg.input_size),
        unit_voxel_extent=tuple(ds_cfg.unit_voxel_extent),
        voxel_num_limit=tuple(int(v) for v in ds_cfg.voxel_num_limit),
        augment=augment,
        min_points=int(getattr(dataset, "device_min_points", 50)),
        eval_keep_clamp=eval_keep_clamp,
        keep_clamp_threshold=keep_clamp_threshold,
        seed=seed,
    )
    if logger is not None:
        logger.warning(
            "device-side preprocessing: lift/center"
            + ("/aug" if augment else "")
            + f"/filter/resample in-graph (cand_k={dataset.cand_k})")
    return make_raw_batch, transform


def build_train_dataset(cfg: Config):
    name = cfg.hyper_dataset_train.name
    ds_cfg = cfg.hyper_dataset_train
    if name == "synthetic":
        from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

        return SyntheticPoseDataset(
            n_points=int(ds_cfg.input_size),
            unit_voxel_extent=tuple(ds_cfg.unit_voxel_extent),
            voxel_num_limit=tuple(int(v) for v in ds_cfg.voxel_num_limit),
            length=int(ds_cfg.get("length", 10000)),
        )
    if name == "ycbv_train":
        from dcl_net_tpu.data.ycbv import YCBVTrainDataset

        root = os.path.join(cfg.path_data, "YCB_Video_Dataset", "root")
        assets = os.path.join(cfg.path_data, "YCB_Video_Dataset")
        return YCBVTrainDataset(ds_cfg, root, assets_dir=assets)
    if name == "linemod":
        from dcl_net_tpu.data.linemod import LineMODDataset

        root = os.path.join(cfg.path_data, "Linemod_preprocessed")
        return LineMODDataset("train", ds_cfg, root)
    raise KeyError(name)
