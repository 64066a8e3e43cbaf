"""YCB-Video stage-1 eval CLI (reference tools/test_YCBV_stage1.py).

Usage:
  python -m dcl_net_tpu.tools.test_ycbv_stage1 --config configs/config_YCBV_bs32.yaml \
      --path_data ./datasets --epoch 84 --exp_id 0
"""

from __future__ import annotations

import os


def main(argv=None):
    from dcl_net_tpu.tools.common import base_parser, build_mesh, build_model, init

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
    collate = transform = None
    if getattr(dataset, "raw_mode", False):
        # device-side preprocessing, eval flavor (opt-in via
        # hyper_dataset_test.device_preprocess): host decodes + gathers raw
        # candidate pixels; lift/center/clamped-filter/resample run in-graph
        from dcl_net_tpu.data.device_preprocess import (
            DevicePreprocessor, make_raw_batch,
        )

        collate = make_raw_batch
        transform = DevicePreprocessor(
            n_points=int(cfg.hyper_dataset_test.input_size),
            unit_voxel_extent=tuple(cfg.hyper_dataset_test.unit_voxel_extent),
            voxel_num_limit=tuple(
                int(v) for v in cfg.hyper_dataset_test.voxel_num_limit),
            augment=False, eval_keep_clamp=True,
            seed=int(cfg.get("rd_seed", 1)),
        )
        logger.warning("device-side eval preprocessing: lift/filter/"
                       f"resample in-graph (cand_k={dataset.cand_k})")
    loader = EvalFrameLoader(
        dataset, batch_size=int(cfg.hyper_dataloader_test.get("bs", 256)),
        num_workers=int(cfg.hyper_dataloader_test.get("num_workers", 8)),
        worker_type=str(cfg.hyper_dataloader_test.get("worker_type", "thread")),
        collate=collate, batch_transform=transform,
    )
    result = evaluator.evaluate(iter(loader))
    logger.warning(f"ADD-S AUC mean: {result['auc_mean']}  <2cm: {result['acc_mean']}")
    return result


if __name__ == "__main__":
    main()
