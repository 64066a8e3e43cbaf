"""Export the trained stage-1 eval forward as a serving artifact.

Usage:
  python -m dcl_net_tpu.tools.export --config configs/config_YCBV_bs32.yaml \
      --checkpoint log/.../epoch_84 --out dclnet_ycbv.stablehlo \
      --batch 512 --platforms tpu

Produces a single self-contained StableHLO file (weights + per-class
template cache baked in; see dcl_net_tpu/serving.py). The reference's only
deployment path is running its eval scripts in-place with the full
torch/CUDA stack (reference tools/test_YCBV_stage1.py).
"""

from __future__ import annotations

import os


def _bank_dataset(cfg):
    """The dataset whose CAD template bank gets baked into the artifact —
    same selection the eval CLIs make. Differs from
    tools/common.build_train_dataset on purpose: it prefers the TEST
    dataset config and sizes template clouds by tmp_size (the bank is
    [C, n_tmp, 7]), not input_size."""
    ds_cfg = cfg.get("hyper_dataset_test") or cfg.hyper_dataset_train
    name = ds_cfg.name
    if name == "synthetic":
        from dcl_net_tpu.data.synthetic import SyntheticPoseDataset

        return SyntheticPoseDataset(
            n_points=int(ds_cfg.get("tmp_size", ds_cfg.input_size)),
            unit_voxel_extent=tuple(ds_cfg.unit_voxel_extent),
            voxel_num_limit=tuple(int(v) for v in ds_cfg.voxel_num_limit),
            length=int(ds_cfg.get("length", 64)),
        )
    if name == "ycbv_test":
        from dcl_net_tpu.data.ycbv import YCBVTestDataset

        root = os.path.join(cfg.path_data, "YCB_Video_Dataset", "root")
        assets = os.path.join(cfg.path_data, "YCB_Video_Dataset")
        return YCBVTestDataset(ds_cfg, root, assets_dir=assets)
    if name == "linemod":
        from dcl_net_tpu.data.linemod import LineMODDataset

        root = os.path.join(cfg.path_data, "Linemod_preprocessed")
        return LineMODDataset("test", ds_cfg, root)
    raise KeyError(f"no template-bank source for dataset {name!r}")


def main(argv=None):
    from dcl_net_tpu.tools.common import (
        base_parser,
        build_mesh,
        build_model,
        init,
    )

    parser = base_parser("DCL-Net TPU serving export (stage 1 or refined)")
    parser.add_argument("--out", default=None, help="artifact output path")
    parser.add_argument(
        "--bundle", default=None,
        help="output DIRECTORY for an artifact bundle instead of one file: "
        "fixed-batch fast-path artifacts (--bundle_batches) + a "
        "batch-polymorphic catch-all, with a manifest; serve any request "
        "size via serving.BundleServer (stage-1 only)")
    parser.add_argument(
        "--bundle_batches", default="1,16,64,512",
        help="comma-separated fixed batch sizes for --bundle")
    parser.add_argument("--batch", default=None,
                        help="serving batch size (default: eval bs), or "
                        "'poly' for a batch-polymorphic artifact (one "
                        "artifact serves any batch size; forces the "
                        "portable XLA paths, incompatible with --n_devices)")
    parser.add_argument(
        "--checkpoint_refiner", default=None,
        help="stage-2 refiner checkpoint; exports the full refined "
        "pipeline (stage-1 + iterative refiner in one graph)")
    parser.add_argument("--stage2", action="store_true",
                        help="export the refined pipeline even without a "
                        "refiner checkpoint (smoke mode: init weights)")
    parser.add_argument("--iteration", default=2, type=int,
                        help="refine iterations baked into a stage-2 artifact")
    parser.add_argument(
        "--platforms", default=None,
        help="comma-separated lowering platforms, e.g. 'tpu' or 'cpu,tpu'; "
        "default: current backend. Multi-platform artifacts require the "
        "portable XLA paths (exact interp + scatter voxelize).")
    args = parser.parse_args(argv)
    if (args.out is None) == (args.bundle is None):
        parser.error("exactly one of --out / --bundle is required")
    logger, cfg = init(args, "export")

    import jax

    platforms = (
        [p.strip() for p in args.platforms.split(",") if p.strip()]
        if args.platforms else [jax.default_backend()]
    )
    polymorphic = args.batch == "poly"
    if args.bundle is None and (
            len(platforms) > 1 or platforms != [jax.default_backend()]
            or polymorphic):
        # Pallas fast paths only lower for TPU from a TPU backend, and
        # compute their grids from concrete shapes; force the portable XLA
        # paths for cross-platform or batch-polymorphic artifacts.
        cfg.model.interp_mode = "exact"
        cfg.model.voxelize_impl = "scatter"
    model = build_model(cfg)

    from dcl_net_tpu.serving import export_serve, export_serve_stage2
    from dcl_net_tpu.train.checkpoints import (
        convert_reference_state_dict,
        load_checkpoint,
        load_torch_checkpoint,
    )

    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pt")):
            variables = convert_reference_state_dict(
                load_torch_checkpoint(args.checkpoint))
        else:
            payload = load_checkpoint(args.checkpoint)
            variables = {"params": payload["params"],
                         "batch_stats": payload["batch_stats"]}
    else:
        # export-from-init: lets the artifact pipeline be exercised without
        # a checkpoint (smoke/testing); a real deployment passes one.
        # Shape-only zero batch: works for every dataset type (frame-based
        # test datasets don't yield flat make_batch samples).
        import jax.numpy as jnp

        n, m = int(model.n_inp), int(model.n_tmp)
        batch = {
            "inp": {"feats": jnp.zeros((2, n, 7), jnp.float32),
                    "voxel_idx": jnp.zeros((2, n, 3), jnp.int32)},
            "tmp": {"feats": jnp.zeros((2, m, 7), jnp.float32),
                    "voxel_idx": jnp.zeros((2, m, 3), jnp.int32)},
        }
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(int(cfg.get("rd_seed", 1))), batch,
            train=False)
        logger.warning("no --checkpoint: exporting freshly initialized "
                       "weights (smoke mode)")

    dataset = _bank_dataset(cfg)
    bank = dataset.template_bank()

    if args.bundle:
        if args.stage2 or args.checkpoint_refiner:
            parser.error("--bundle currently exports the stage-1 pipeline")
        from dcl_net_tpu.serving import export_bundle, save_bundle

        sizes = [int(b) for b in args.bundle_batches.split(",") if b.strip()]
        portable = (len(platforms) > 1
                    or platforms != [jax.default_backend()])
        if portable:
            # cross-platform bundles cannot carry Pallas kernels anywhere
            fast_model = model.clone(interp_mode="exact",
                                     voxelize_impl="scatter")
            poly_model = fast_model
        else:
            fast_model = model
            # the poly catch-all always needs the portable XLA paths
            poly_model = model.clone(interp_mode="exact",
                                     voxelize_impl="scatter")
        artifacts = export_bundle(
            fast_model, variables, bank, batch_sizes=sizes,
            include_poly=True, poly_model=poly_model, platforms=platforms)
        mpath = save_bundle(args.bundle, artifacts)
        total = sum(len(d) for d in artifacts.values())
        logger.warning(
            f"exported serving bundle: {args.bundle} "
            f"({len(artifacts)} artifacts incl. poly, {total / 1e6:.1f} MB, "
            f"batches={sizes}, platforms={platforms}); manifest: {mpath}")
        return args.bundle

    if polymorphic:
        bs = None
    else:
        bs = int(args.batch) if args.batch else int(
            cfg.get("hyper_dataloader_test", {}).get("bs", 512)
            if cfg.get("hyper_dataloader_test") else 512)

    # --n_devices > 1: a data-parallel artifact (batch sharded over a 1-D
    # mesh) that must be served on the same device count
    mesh = build_mesh(cfg, args)

    stage2 = args.stage2 or args.checkpoint_refiner is not None
    if stage2:
        from dcl_net_tpu.models.refiner import Refiner

        refiner = Refiner(n_inp=int(cfg.model.n_inp))
        if args.checkpoint_refiner:
            if args.checkpoint_refiner.endswith((".pth", ".pt")):
                refiner_vars = convert_reference_state_dict(
                    load_torch_checkpoint(args.checkpoint_refiner))
                refiner_vars.pop("batch_stats", None)
            else:
                payload = load_checkpoint(args.checkpoint_refiner)
                refiner_vars = {"params": payload["params"]}
        else:
            import jax.numpy as jnp

            n = int(model.n_inp)
            m = int(model.n_tmp)
            # F_Xo_p is architecture-fixed at 256ch (models/dcl_net.py:226),
            # so the refiner input is 3 + 256 = 259 for every config
            init_inp = {
                "input_features": jnp.zeros((1, n, 259), jnp.float32),
                "conf": jnp.zeros((1, n + m), jnp.float32),
            }
            refiner_vars = jax.jit(refiner.init)(
                jax.random.PRNGKey(int(cfg.get("rd_seed", 1))), init_inp)
            logger.warning("no --checkpoint_refiner: exporting freshly "
                           "initialized refiner weights (smoke mode)")
        data = export_serve_stage2(
            model, variables, refiner, refiner_vars, bank, bs,
            iterations=int(args.iteration), platforms=platforms, mesh=mesh)
        kind = f"refined (x{args.iteration})"
    else:
        data = export_serve(model, variables, bank, bs,
                            platforms=platforms, mesh=mesh)
        kind = "stage-1"
    with open(args.out, "wb") as f:
        f.write(data)
    logger.warning(
        f"exported {kind} serving artifact: {args.out} "
        f"({len(data) / 1e6:.1f} MB, "
        f"batch={'poly' if bs is None else bs}, platforms={platforms}"
        f"{', mesh=' + str(mesh.size) if mesh is not None else ''})")
    return args.out


if __name__ == "__main__":
    main()
