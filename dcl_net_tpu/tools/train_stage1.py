"""Stage-1 training CLI (covers the reference tools/train_YCBV_stage1.py and
tools/train_LM.py — the dataset/schedule choice comes from the config).

Usage:
  python -m dcl_net_tpu.tools.train_stage1 --config configs/config_YCBV_bs32.yaml \
      --path_data ./datasets --exp_id 0
  python -m dcl_net_tpu.tools.train_stage1 --config configs/config_synthetic_smoke.yaml
"""

from __future__ import annotations

import os


def main(argv=None):
    from dcl_net_tpu.tools.common import (
        base_parser, build_device_preprocess, build_mesh, build_model,
        build_train_dataset, init,
    )

    args = base_parser("DCL-Net TPU stage-1 training").parse_args(argv)
    logger, cfg = init(args, "train_stage1")
    logger.warning("*" * 20 + " Start Logging " + "*" * 20)
    logger.info(str(cfg.to_dict()))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")),
    )

    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.models.dcl_net import dcl_losses
    from dcl_net_tpu.train.logging import ScalarWriter, parameter_count
    from dcl_net_tpu.train.solver import Solver
    from dcl_net_tpu.train.checkpoints import latest_checkpoint

    logger.info("=> creating model ...")
    model = build_model(cfg)
    dataset = build_train_dataset(cfg)
    # opt-in device-side preprocessing (SURVEY §7 step 4): the dataset emits
    # raw candidate pixels and the lift/center/aug/filter/resample/assembly
    # runs as one jitted graph per batch in the loader's producer thread
    # (data/device_preprocess.py); the in-graph validity threshold follows
    # the dataset (YCBV min_keep=50, LM min_keep=128)
    collate, transform = build_device_preprocess(
        cfg.hyper_dataset_train, dataset, augment=True,
        seed=int(cfg.get("rd_seed", 1)), logger=logger,
    )
    loader = BatchLoader(
        dataset,
        collate=collate,
        batch_transform=transform,
        # raw mode can amortize the frame decode over several instance
        # draws (cfg hyper_dataset_train.samples_per_frame)
        samples_per_item=getattr(dataset, "samples_per_frame", 1),
        # multi-host: each process loads its block of the global batch
        process_id=jax.process_index(),
        process_count=jax.process_count(),
        batch_size=int(cfg.hyper_dataloader_train.bs),
        shuffle=bool(cfg.hyper_dataloader_train.get("shuffle", True)),
        drop_last=bool(cfg.hyper_dataloader_train.get("drop_last", True)),
        num_workers=int(cfg.hyper_dataloader_train.get("num_workers", 8)),
        seed=int(cfg.get("rd_seed", 1)),
        # "process" matches the reference's worker processes for real
        # PNG/.mat decoding (GIL-bound preprocessing); threads are fine for
        # in-memory/synthetic datasets (scripts/bench_loader.py numbers)
        worker_type=str(cfg.hyper_dataloader_train.get("worker_type", "thread")),
    )
    writer = ScalarWriter(cfg.log_dir)
    mesh = build_mesh(cfg, args)
    if mesh is not None:
        logger.warning(
            f"data-parallel over {mesh.size} devices "
            f"(per-device batch {int(cfg.hyper_dataloader_train.bs) // mesh.size})"
        )
    # opt-in: encode the per-class template bank once per step instead of
    # per instance (exact for distinct classes; template-branch BN batch
    # stats weight classes instead of instances — see
    # DCLNet.forward_with_template_bank)
    bank = None
    if cfg.get("train_template_bank") and hasattr(dataset, "template_bank"):
        bank = dataset.template_bank()
        logger.warning(
            f"banked-template training: {bank['feats'].shape[0]} classes "
            f"encoded once per step"
        )
    solver = Solver(
        model, dcl_losses, cfg, loader, logger=logger,
        checkpoint_dir=cfg.log_dir, writer=writer, mesh=mesh,
        template_bank=bank,
    )

    first_batch = next(iter(loader))
    solver.initialize(first_batch, seed=int(cfg.get("rd_seed", 1)))
    logger.warning(f"#Total parameters : {parameter_count(solver.state.params)}")

    resume = latest_checkpoint(cfg.log_dir)
    if resume:
        logger.warning(f"resuming from {resume}")
        solver.restore(resume)  # incl. mid-epoch position

    solver.solve()
    logger.warning("training done")


if __name__ == "__main__":
    main()
