"""LineMOD eval CLI (reference tools/test_LM.py): ADD(S) < 0.1*diameter.

Usage:
  python -m dcl_net_tpu.tools.test_lm --config configs/config_LM.yaml \
      --path_data ./datasets --epoch 350
"""

from __future__ import annotations

import os


def main(argv=None):
    from dcl_net_tpu.tools.common import (
        base_parser, build_device_preprocess, build_mesh, build_model, init,
    )

    args = base_parser("DCL-Net TPU LineMOD eval").parse_args(argv)
    logger, cfg = init(args, "test_lm")

    import numpy as np

    from dcl_net_tpu.data.linemod import LineMODDataset, LM_SYM_IDX
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.eval.evaluator import Evaluator
    from dcl_net_tpu.train.checkpoints import (
        convert_reference_state_dict,
        load_checkpoint,
        load_torch_checkpoint,
    )

    # inference-only pallas interp path: +30% eval throughput,
    # outputs match the exact path to ~1e-5
    model = build_model(cfg, interp_mode="pallas")
    root = os.path.join(cfg.path_data, "Linemod_preprocessed")
    dataset = LineMODDataset("eval", cfg.hyper_dataset_test, root)

    ckpt_path = args.checkpoint or os.path.join(
        cfg.log_dir, f"epoch_{cfg.get('test_epoch', 0)}"
    )
    if ckpt_path.endswith((".pth", ".pt")):
        variables = convert_reference_state_dict(load_torch_checkpoint(ckpt_path))
    else:
        payload = load_checkpoint(ckpt_path)
        variables = {"params": payload["params"], "batch_stats": payload["batch_stats"]}

    model_points = np.stack(
        [dataset.pc_cad[o] / 1000.0 for o in dataset.objlist]
    ).astype(np.float32)
    mesh = build_mesh(cfg, args)
    evaluator = Evaluator(
        model, variables, model_points,
        sym_class_ids=LM_SYM_IDX, protocol="add_0.1d",
        diameters=dataset.diameters(), template_bank=dataset.template_bank(),
        logger=logger, mesh=mesh,
    )
    # device-side eval preprocessing, opt-in: LM eval applies the volume
    # filter whenever ANY candidate survives (keep-clamp threshold 0,
    # reference LM/dataloader_test_LM.py:195-204)
    collate, transform = build_device_preprocess(
        cfg.hyper_dataset_test, dataset, augment=False,
        eval_keep_clamp=True, keep_clamp_threshold=0,
        seed=int(cfg.get("rd_seed", 1)), logger=logger,
    )
    loader = BatchLoader(
        dataset, batch_size=int(cfg.hyper_dataloader_test.get("bs", 256)),
        shuffle=False, drop_last=False,
        num_workers=int(cfg.hyper_dataloader_test.get("num_workers", 8)),
        worker_type=str(cfg.hyper_dataloader_test.get("worker_type", "thread")),
        collate=collate, batch_transform=transform,
    )
    result = evaluator.evaluate(iter(loader))
    logger.warning(f"mean success rate: {result['success_mean']}")
    from dcl_net_tpu.tools.common import write_result_json

    write_result_json(cfg, "test_lm", result)
    return result


if __name__ == "__main__":
    main()
