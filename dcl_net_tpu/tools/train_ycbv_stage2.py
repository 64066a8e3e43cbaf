"""Stage-2 (refiner) training CLI (reference tools/train_YCBV_stage2.py).

Runs the full Solver stack — ScalarWriter logging, per-epoch + mid-epoch
checkpoints, automatic resume, per_val eval hook, optional data-parallel
mesh — exactly like stage 1 (the reference stage-2 Trainer inherits the same
services from gorilla BaseSolver, tools/train_YCBV_stage2.py:89-222).

Usage:
  python -m dcl_net_tpu.tools.train_ycbv_stage2 --config configs/config_YCBV_bs40.yaml \
      --config_stage1 configs/config_YCBV_bs32.yaml --checkpoint_stage1 <path> \
      --iteration 2 --path_data ./datasets
"""

from __future__ import annotations

import os


def main(argv=None):
    from dcl_net_tpu.tools.common import (
        base_parser, build_mesh, build_model, build_train_dataset, init,
    )

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

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")),
    )

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.eval.metrics import add_s_batch
    from dcl_net_tpu.models.refiner import Refiner, refine_pose
    from dcl_net_tpu.train.checkpoints import (
        convert_reference_state_dict,
        load_checkpoint,
        load_torch_checkpoint,
        latest_checkpoint,
    )
    from dcl_net_tpu.train.logging import ScalarWriter, parameter_count
    from dcl_net_tpu.train.solver import Solver
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
    mesh = build_mesh(cfg, args)
    if mesh is not None:
        bs = max(bs // mesh.size, 1) * mesh.size  # keep divisibility
        logger.warning(f"data-parallel over {mesh.size} devices (batch {bs})")
    loader = BatchLoader(
        dataset, batch_size=bs,
        num_workers=int(cfg.hyper_dataloader_train.get("num_workers", 8)),
        seed=int(cfg.get("rd_seed", 1)),
        worker_type=str(cfg.hyper_dataloader_train.get("worker_type", "thread")),
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
    cld = jnp.asarray(cld)

    refiner = Refiner(n_inp=int(cfg.model.n_inp))

    # per_val hook: refined-pose ADD-S on a FIXED PROBE batch built straight
    # from the dataset with its own seed (mirrors the reference
    # Trainer.evaluate cadence, tools/train_YCBV_stage2.py:205-222). The
    # probe is TRAINING data — a monitoring signal for the refinement loop,
    # not a test metric (true held-out eval is the tools/test_* CLIs on the
    # test split); it is deliberately NOT drawn through the loader, whose
    # first epoch-0 batch the trainer immediately trains on.
    import numpy as _np

    from dcl_net_tpu.data.schema import make_batch as _make_batch

    _probe_rng = _np.random.RandomState(int(cfg.get("rd_seed", 1)) + 977)
    _probe_idx = _probe_rng.choice(
        len(dataset), size=min(bs, len(dataset)), replace=False)
    eval_batch = jax.tree.map(
        jnp.asarray,
        _make_batch([dataset[int(i)] for i in _probe_idx], pad_to=bs).to_dict(),
    )

    @jax.jit
    def _eval_run(params):
        out = main_model.apply(main_vars, eval_batch, train=False)
        rot, trans = refine_pose(
            refiner.apply, {"params": params},
            out["points_inp"], out["F_Xo_p"], out["conf"],
            out["rot_pred"], out["trans_pred"], args.iteration,
        )
        pts = cld[eval_batch["labels"]["obj_idx"]]
        adds = add_s_batch(
            pts, rot, trans,
            eval_batch["labels"]["rot_gt"], eval_batch["labels"]["trans_gt"],
        )
        valid = eval_batch["valid"]
        return jnp.sum(adds * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def eval_fn(state, epoch):
        return {"refined_adds_mean": float(_eval_run(state.params))}

    writer = ScalarWriter(cfg.log_dir)
    solver = Solver(
        refiner, None, cfg, loader, logger=logger,
        checkpoint_dir=cfg.log_dir, writer=writer, eval_fn=eval_fn, mesh=mesh,
        step_builder=lambda tx: make_stage2_train_step(
            main_model, main_vars, refiner, tx, args.iteration, cld
        ),
    )

    b, n = eval_batch["inp"]["feats"].shape[:2]
    dummy = {
        "input_features": jnp.zeros((b, n, 259)),
        "conf": jnp.zeros((b, 2 * n)),
    }
    solver.initialize(dummy, seed=int(cfg.get("rd_seed", 1)))
    logger.warning(f"#Refiner parameters : {parameter_count(solver.state.params)}")

    resume = latest_checkpoint(cfg.log_dir)
    if resume:
        logger.warning(f"resuming from {resume}")
        solver.restore(resume)  # incl. mid-epoch position

    solver.solve()
    logger.warning("stage-2 training done")


if __name__ == "__main__":
    main()
