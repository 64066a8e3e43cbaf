"""Occlusion-LineMOD eval CLI (reference tools/test_LMO.py): ADD(S) < 0.1d,
lost detections counted in the denominator.

Usage:
  python -m dcl_net_tpu.tools.test_lmo --config configs/config_LM.yaml \
      --path_data ./datasets --epoch 350
"""

from __future__ import annotations

import os


def main(argv=None):
    from dcl_net_tpu.tools.common import (
        base_parser, build_device_preprocess, build_mesh, build_model, init,
    )

    args = base_parser("DCL-Net TPU Occlusion-LineMOD eval").parse_args(argv)
    logger, cfg = init(args, "test_lmo")

    import numpy as np

    from dcl_net_tpu.data.linemod import LMO_SYM_IDX, OcclusionLineMODDataset
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
    root = os.path.join(cfg.path_data, "OCCLUSION_LINEMOD")
    lm_models = os.path.join(cfg.path_data, "Linemod_preprocessed", "models")
    dataset = OcclusionLineMODDataset(
        "eval", cfg.hyper_dataset_test, root, lm_models,
        masks_dir=os.path.join(cfg.path_data, "LMO_Masks"),
    )

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
        sym_class_ids=LMO_SYM_IDX, protocol="add_0.1d",
        diameters=dataset.diameters(
            os.path.join(lm_models, "models_info.yml")
        ),
        count_lost=True, template_bank=dataset.template_bank(),
        logger=logger, mesh=mesh,
    )
    # device-side eval preprocessing, opt-in: LMO invalidates only
    # zero-survivor rows (min_keep=0, reference LM/dataloader_test_LMO.py;
    # the dataset sets device_min_points=0, no keep-clamp)
    collate, transform = build_device_preprocess(
        cfg.hyper_dataset_test, dataset, augment=False,
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

    write_result_json(cfg, "test_lmo", result)
    return result


if __name__ == "__main__":
    main()
