"""YCB-Video stage-2 (refined) eval CLI (reference tools/test_YCBV_stage2.py).

Usage:
  python -m dcl_net_tpu.tools.test_ycbv_stage2 --config configs/config_YCBV_bs40.yaml \
      --checkpoint_stage1 <stage1_ckpt> --checkpoint <refiner_ckpt> --iteration 2
"""

from __future__ import annotations

import os


def main(argv=None):
    from dcl_net_tpu.tools.common import base_parser, build_mesh, build_model, init

    parser = base_parser("DCL-Net TPU YCBV stage-2 eval")
    parser.add_argument("--iteration", default=2, type=int)
    parser.add_argument("--checkpoint_stage1", required=True)
    args = parser.parse_args(argv)
    logger, cfg = init(args, "test_ycbv_stage2")

    from dcl_net_tpu.data.loader import EvalFrameLoader
    from dcl_net_tpu.data.ycbv import YCBVTestDataset
    from dcl_net_tpu.eval.evaluator import Stage2Evaluator
    from dcl_net_tpu.models.refiner import Refiner
    from dcl_net_tpu.train.checkpoints import (
        convert_reference_state_dict,
        load_checkpoint,
        load_torch_checkpoint,
    )

    # inference-only pallas interp path: +30% eval throughput,
    # outputs match the exact path to ~1e-5
    model = build_model(cfg, interp_mode="pallas")

    def load_vars(path):
        if path.endswith((".pth", ".pt")):
            return convert_reference_state_dict(load_torch_checkpoint(path))
        payload = load_checkpoint(path)
        return {"params": payload["params"],
                "batch_stats": payload.get("batch_stats", {})}

    main_vars = load_vars(args.checkpoint_stage1)
    ckpt_path = args.checkpoint or os.path.join(
        cfg.log_dir, f"epoch_{cfg.get('test_epoch', 0)}"
    )
    refiner_vars = load_vars(ckpt_path)
    refiner_vars.pop("batch_stats", None)

    root = os.path.join(cfg.path_data, "YCB_Video_Dataset", "root")
    assets = os.path.join(cfg.path_data, "YCB_Video_Dataset")
    dataset = YCBVTestDataset(cfg.hyper_dataset_test, root, assets_dir=assets)

    refiner = Refiner(n_inp=int(cfg.model.n_inp))
    mesh = build_mesh(cfg, args)
    evaluator = Stage2Evaluator(
        model, main_vars, refiner, refiner_vars,
        dataset.model_points_array(), iterations=args.iteration,
        protocol="adds_auc", template_bank=dataset.template_bank(),
        logger=logger, mesh=mesh,
    )
    loader = EvalFrameLoader(
        dataset, batch_size=int(cfg.hyper_dataloader_test.get("bs", 256)),
        num_workers=int(cfg.hyper_dataloader_test.get("num_workers", 8)),
        worker_type=str(cfg.hyper_dataloader_test.get("worker_type", "thread")),
    )
    result = evaluator.evaluate(iter(loader))
    logger.warning(f"ADD-S AUC mean: {result['auc_mean']}  <2cm: {result['acc_mean']}")
    from dcl_net_tpu.tools.common import write_result_json

    write_result_json(cfg, "test_ycbv_stage2", result)
    return result


if __name__ == "__main__":
    main()
