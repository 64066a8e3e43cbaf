"""Stage-2 (refiner) training CLI (reference tools/train_YCBV_stage2.py).

Usage:
  python -m dcl_net_tpu.tools.train_ycbv_stage2 --config configs/config_YCBV_bs40.yaml \
      --config_stage1 configs/config_YCBV_bs32.yaml --checkpoint_stage1 <path> \
      --iteration 2 --path_data ./datasets
"""

from __future__ import annotations

import os
import time


def main(argv=None):
    from dcl_net_tpu.tools.common import base_parser, build_model, build_train_dataset, init

    parser = base_parser("DCL-Net TPU stage-2 refiner training")
    parser.add_argument("--refiner", default="Refiner")
    parser.add_argument("--iteration", default=2, type=int)
    parser.add_argument("--config_stage1", default=None)
    parser.add_argument("--checkpoint_stage1", required=True)
    args = parser.parse_args(argv)
    logger, cfg = init(args, "train_ycbv_stage2")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.models.refiner import Refiner
    from dcl_net_tpu.train.checkpoints import (
        convert_reference_state_dict,
        load_checkpoint,
        load_torch_checkpoint,
        latest_checkpoint,
        save_checkpoint,
    )
    from dcl_net_tpu.train.solver import TrainState, build_optimizer
    from dcl_net_tpu.train.stage2 import make_stage2_train_step

    cfg_stage1 = Config.fromfile(args.config_stage1) if args.config_stage1 else cfg
    cfg_stage1.model_name = cfg.model_name
    main_model = build_model(cfg_stage1)
    if args.checkpoint_stage1.endswith((".pth", ".pt")):
        main_vars = convert_reference_state_dict(
            load_torch_checkpoint(args.checkpoint_stage1)
        )
    else:
        payload = load_checkpoint(args.checkpoint_stage1)
        main_vars = {"params": payload["params"], "batch_stats": payload["batch_stats"]}

    dataset = build_train_dataset(cfg)
    # reference divides the batch by `iteration` (tools/train_YCBV_stage2.py:346)
    bs = max(int(cfg.hyper_dataloader_train.bs) // args.iteration, 1)
    loader = BatchLoader(
        dataset, batch_size=bs,
        num_workers=int(cfg.hyper_dataloader_train.get("num_workers", 8)),
        seed=int(cfg.get("rd_seed", 1)),
    )

    n_tmp = int(cfg.model.n_tmp)
    if hasattr(dataset, "model_points_array"):
        cld = dataset.model_points_array()
    elif hasattr(dataset, "pc_cad"):
        cld = np.stack(
            [dataset.pc_cad[c] / 1000.0 for c in sorted(dataset.pc_cad)]
        ).astype(np.float32)
    else:  # synthetic
        cld = np.stack(
            [dataset.model_points(i, n_tmp) for i in range(len(dataset.cad_points))]
        ).astype(np.float32)

    refiner = Refiner(n_inp=int(cfg.model.n_inp))
    tx, schedule = build_optimizer(cfg, len(loader))

    first = next(iter(loader))
    b, n = first["inp"]["feats"].shape[:2]
    dummy = {
        "input_features": jnp.zeros((b, n, 259)),
        "conf": jnp.zeros((b, 2 * n)),
    }
    variables = refiner.init(jax.random.PRNGKey(int(cfg.get("rd_seed", 1))), dummy)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats={}, opt_state=tx.init(variables["params"]),
    )

    step_fn = jax.jit(make_stage2_train_step(
        main_model, main_vars, refiner, tx, args.iteration, jnp.asarray(cld)
    ))

    max_epoch = int(cfg.get("max_epoch", 1))
    per_write = int(cfg.get("per_write", 10))
    for epoch in range(max_epoch):
        end = time.time()
        for i, batch in enumerate(loader):
            state, metrics = step_fn(state, batch)
            loss = float(metrics["loss_all"])
            if i % per_write == 0:
                logger.info(
                    f"[{epoch}][{i}/{len(loader)}] loss_all: {loss:.5f} "
                    f"T_step: {time.time() - end:.3f}"
                )
            end = time.time()
        save_checkpoint(cfg.log_dir, state, epoch + 1)
    logger.warning("stage-2 training done")


if __name__ == "__main__":
    main()
