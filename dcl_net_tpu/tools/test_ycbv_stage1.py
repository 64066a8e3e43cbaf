"""YCB-Video stage-1 eval CLI (reference tools/test_YCBV_stage1.py).

Usage:
  python -m dcl_net_tpu.tools.test_ycbv_stage1 --config configs/config_YCBV_bs32.yaml \
      --path_data ./datasets --epoch 84 --exp_id 0
"""

from __future__ import annotations

import os


def main(argv=None):
    from dcl_net_tpu.tools.common import (
        base_parser, build_device_preprocess, build_mesh, build_model, init,
    )

    args = base_parser("DCL-Net TPU YCBV stage-1 eval").parse_args(argv)
    logger, cfg = init(args, "test_ycbv_stage1")

    import jax

    from dcl_net_tpu.data.loader import EvalFrameLoader
    from dcl_net_tpu.data.ycbv import YCBVTestDataset
    from dcl_net_tpu.eval.evaluator import Evaluator
    from dcl_net_tpu.train.checkpoints import load_checkpoint, load_torch_checkpoint, convert_reference_state_dict

    # inference-only pallas interp path: +30% eval throughput,
    # outputs match the exact path to ~1e-5
    model = build_model(cfg, interp_mode="pallas")
    root = os.path.join(cfg.path_data, "YCB_Video_Dataset", "root")
    assets = os.path.join(cfg.path_data, "YCB_Video_Dataset")
    dataset = YCBVTestDataset(cfg.hyper_dataset_test, root, assets_dir=assets)

    ckpt_path = args.checkpoint or os.path.join(
        cfg.log_dir, f"epoch_{cfg.get('test_epoch', 0)}"
    )
    if ckpt_path.endswith((".pth", ".pt")):
        variables = convert_reference_state_dict(load_torch_checkpoint(ckpt_path))
    else:
        payload = load_checkpoint(ckpt_path)
        variables = {"params": payload["params"], "batch_stats": payload["batch_stats"]}

    mesh = build_mesh(cfg, args)
    evaluator = Evaluator(
        model, variables, dataset.model_points_array(),
        protocol="adds_auc", template_bank=dataset.template_bank(),
        logger=logger, mesh=mesh,
    )
    # device-side eval preprocessing, opt-in: YCBV test applies the volume
    # filter only when >32 candidates survive it (keep-clamp, reference
    # YCBV/dataloader_test_YCBV.py:164-180)
    collate, transform = build_device_preprocess(
        cfg.hyper_dataset_test, dataset, augment=False,
        eval_keep_clamp=True, keep_clamp_threshold=32,
        seed=int(cfg.get("rd_seed", 1)), logger=logger,
    )
    loader = EvalFrameLoader(
        dataset, batch_size=int(cfg.hyper_dataloader_test.get("bs", 256)),
        num_workers=int(cfg.hyper_dataloader_test.get("num_workers", 8)),
        worker_type=str(cfg.hyper_dataloader_test.get("worker_type", "thread")),
        collate=collate, batch_transform=transform,
    )
    result = evaluator.evaluate(iter(loader))
    logger.warning(f"ADD-S AUC mean: {result['auc_mean']}  <2cm: {result['acc_mean']}")
    from dcl_net_tpu.tools.common import write_result_json

    write_result_json(cfg, "test_ycbv_stage1", result)
    return result


if __name__ == "__main__":
    main()
