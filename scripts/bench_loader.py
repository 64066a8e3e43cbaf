"""Real-file input-pipeline benchmark (VERDICT r2 item: prove the loader
can keep up with the device).

Materializes a synthetic YCBV-format tree on disk (color/depth/label PNGs +
meta.mat per frame — the exact file set the reference's 10 worker processes
decode, reference YCBV/dataloader_train_YCBV.py:105-210) and measures
YCBVTrainDataset.__getitem__ throughput through BatchLoader with thread vs
process workers.

Target: >= the measured device training rate (244 samples/s/chip at B=128,
BENCH_r02). This box exposes a single core, so the numbers here are
PER-CORE rates; the process pool scales them on multi-core hosts (the
reference assumes 10 cores for its worker count).

Usage: python scripts/bench_loader.py [--frames 48] [--iters 3]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=2, help="epochs per config")
    ap.add_argument("--workers", type=int, default=max(os.cpu_count(), 1))
    args = ap.parse_args()
    # at least one timed epoch: rates divide by the best timed epoch
    args.iters = max(1, args.iters)

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.data.loader import BatchLoader
    from dcl_net_tpu.data.ycbv import YCBVTrainDataset
    from tests.fixtures import make_ycbv_fixture

    cfg = Config({
        "input_size": 1024, "tmp_size": 1024,
        "unit_voxel_extent": [0.006, 0.006, 0.006],
        "voxel_num_limit": [64, 64, 64],
        "voxelization_mode": 4,
    })

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        root, assets = make_ycbv_fixture(
            tmp, n_classes=3, n_frames=args.frames, seed=0
        )
        print(f"fixture: {args.frames} frames in {time.perf_counter()-t0:.1f}s "
              f"(color+depth+label PNG + meta.mat each)")
        ds = YCBVTrainDataset(cfg, root, assets_dir=assets)

        # raw single-threaded __getitem__ (decode + lift + aug + voxel index)
        n_raw = min(len(ds), 64)
        t0 = time.perf_counter()
        for i in range(n_raw):
            ds[i % len(ds)]
        raw_dt = (time.perf_counter() - t0) / n_raw
        print(f"raw __getitem__: {raw_dt*1e3:.1f} ms/sample "
              f"({1/raw_dt:.1f} samples/s single-core)")

        # device-preprocess raw mode: host does decode + mask/bbox + pixel
        # gather only; lift/aug/filter/resample/assembly run in-graph
        # (data/device_preprocess.py). This is the HOST cost that bounds
        # loader throughput — the device graph overlaps the train step.
        ds_dev = YCBVTrainDataset(
            Config({**cfg.to_dict(), "device_preprocess": True}),
            root, assets_dir=assets)
        for i in range(min(len(ds_dev), 8)):
            ds_dev[i]  # warm page cache for this dataset object too
        t0 = time.perf_counter()
        for i in range(n_raw):
            ds_dev[i % len(ds_dev)]
        dev_dt = (time.perf_counter() - t0) / n_raw
        print(f"raw __getitem__ [device_preprocess]: {dev_dt*1e3:.1f} "
              f"ms/sample ({1/dev_dt:.1f} samples/s single-core; "
              f"{raw_dt/dev_dt:.2f}x the numpy-path host cost)")

        # + samples_per_frame: amortize the (dominant) PNG decode over
        # several instance draws per frame
        for spf in (2, 4):
            ds_spf = YCBVTrainDataset(
                Config({**cfg.to_dict(), "device_preprocess": True,
                        "samples_per_frame": spf}),
                root, assets_dir=assets)
            t0 = time.perf_counter()
            for i in range(n_raw):
                ds_spf[i % len(ds_spf)]
            spf_dt = (time.perf_counter() - t0) / (n_raw * spf)
            print(f"raw __getitem__ [device_preprocess, samples_per_frame="
                  f"{spf}]: {spf_dt*1e3:.1f} ms/sample "
                  f"({1/spf_dt:.1f} samples/s single-core; "
                  f"{raw_dt/spf_dt:.2f}x the numpy-path host cost)")

        if len(ds) < args.batch:
            print(f"WARNING: len(dataset)={len(ds)} < batch={args.batch}; "
                  "drop_last yields zero batches — lower --batch or raise "
                  "--frames")
        for worker_type in ("thread", "process"):
            loader = BatchLoader(
                ds, batch_size=args.batch, num_workers=args.workers,
                seed=0, to_jax=False, worker_type=worker_type,
            )
            # warm epoch (page cache, pool spin-up) then timed epochs
            best = None
            for it in range(args.iters + 1):
                t0 = time.perf_counter()
                n = 0
                for batch in loader:
                    n += batch["valid"].shape[0]
                dt = time.perf_counter() - t0
                if it > 0:
                    best = dt if best is None else min(best, dt)
            rate = n / best
            print(f"BatchLoader[{worker_type} x{args.workers}]: "
                  f"{rate:.1f} samples/s ({n} samples/epoch, best {best:.2f}s)")

        # ---- eval side: YCBVTestDataset frame decode (color/depth/label
        # PNG + meta.mat + FFB6D mask .mat per frame) through the
        # prefetching EvalFrameLoader — the decode rate the bs=512 product
        # eval path (tools/test_ycbv_stage1.py) must be fed at
        from dcl_net_tpu.data.loader import EvalFrameLoader
        from dcl_net_tpu.data.ycbv import YCBVTestDataset

        eds = YCBVTestDataset(cfg, root, assets_dir=assets)
        for worker_type in ("thread", "process"):
            loader = EvalFrameLoader(
                eds, batch_size=args.batch, num_workers=args.workers,
                worker_type=worker_type,
            )
            best, n_inst, n_rows = None, 0, 0
            for it in range(args.iters + 1):
                t0 = time.perf_counter()
                n_inst = n_rows = 0
                for batch in loader:
                    n_rows += batch["valid"].shape[0]
                    n_inst += int(batch["valid"].sum())
                dt = time.perf_counter() - t0
                if it > 0:
                    best = dt if best is None else min(best, dt)
            loader.close()
            print(f"EvalFrameLoader[{worker_type} x{args.workers}]: "
                  f"{n_inst / best:.1f} decoded inst/s over {len(eds)} frames "
                  f"({n_inst} valid of {n_rows} rows, best {best:.2f}s)")

        # + device preprocessing (VERDICT r4 item 8): EvalFrameLoader in raw
        # candidate mode + the in-graph lift/clamped-filter/resample flavor —
        # the exact tools/test_ycbv_stage1 fast-path configuration
        # (keep-clamp threshold 32, reference YCBV/dataloader_test_YCBV.py:
        # 164-180). Epoch times include the per-batch jitted-preprocess
        # dispatch; on the production chip that dispatch overlaps the next
        # batch's decode, so the HOST-side decode+gather is the bound.
        import jax

        from dcl_net_tpu.data.device_preprocess import (
            DevicePreprocessor, make_raw_batch)

        eds_dev = YCBVTestDataset(
            Config({**cfg.to_dict(), "device_preprocess": True}),
            root, assets_dir=assets)
        pre_e = DevicePreprocessor(
            n_points=int(cfg.input_size),
            unit_voxel_extent=tuple(cfg.unit_voxel_extent),
            voxel_num_limit=tuple(cfg.voxel_num_limit),
            augment=False, eval_keep_clamp=True, seed=0)
        loader = EvalFrameLoader(
            eds_dev, batch_size=args.batch, num_workers=args.workers,
            worker_type="thread", collate=make_raw_batch,
            batch_transform=pre_e)
        # count on the warm epoch only: fetching valid per batch would
        # SYNCHRONIZE on each preprocess dispatch, which the production
        # Evaluator overlaps with the next batch's decode. Timed epochs
        # iterate freely and sync ONCE on the final batch.
        n_inst = n_rows = 0
        for batch in loader:
            valid = np.asarray(jax.device_get(batch["valid"]))
            n_rows += valid.shape[0]
            n_inst += int(valid.sum())
        best = None
        for it in range(args.iters):
            t0 = time.perf_counter()
            last = None
            for batch in loader:
                last = batch
            _ = np.asarray(jax.device_get(last["valid"]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        loader.close()
        print(f"EvalFrameLoader[thread x{args.workers}, device_preprocess]: "
              f"{n_inst / best:.1f} decoded inst/s over {len(eds_dev)} frames "
              f"({n_inst} valid of {n_rows} rows, best {best:.2f}s)")

    # ---- LineMOD side: the same fast-input-path A/B on the LM tree
    # (decode + occlusion aug + mask/bbox + gather host-side; lift/aug/
    # filter/resample in-graph). LM frames carry ONE instance each, so
    # samples_per_frame re-draws the occlusion aug per sample on one decode.
    from dcl_net_tpu.data.linemod import LineMODDataset
    from tests.fixtures import make_linemod_fixture

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        lm_root = make_linemod_fixture(tmp)
        print(f"\nLM fixture: 13 objects in {time.perf_counter()-t0:.1f}s")
        lm_cfg = Config({
            "input_size": 1024, "tmp_size": 1024,
            "unit_voxel_extent": [0.005, 0.005, 0.005],
            "voxel_num_limit": [64, 64, 64], "voxelization_mode": 4,
        })
        n_raw = 32
        for label, extra, spf in (
            ("numpy path", {}, 1),
            ("device_preprocess", {"device_preprocess": True}, 1),
            ("device_preprocess, samples_per_frame=4",
             {"device_preprocess": True, "samples_per_frame": 4}, 4),
        ):
            lds = LineMODDataset(
                "train", Config({**lm_cfg.to_dict(), **extra}), lm_root)
            for i in range(8):
                lds[i % len(lds)]  # warm page cache
            t0 = time.perf_counter()
            for i in range(n_raw):
                lds[i % len(lds)]
            dt = (time.perf_counter() - t0) / (n_raw * spf)
            print(f"LM train __getitem__ [{label}]: {dt*1e3:.1f} ms/sample "
                  f"({1/dt:.1f} samples/s single-core)")
        for label, extra in (
            ("numpy path", {}),
            ("device_preprocess", {"device_preprocess": True}),
        ):
            lds = LineMODDataset(
                "eval", Config({**lm_cfg.to_dict(), **extra}), lm_root)
            for i in range(len(lds)):
                lds[i]
            t0 = time.perf_counter()
            for i in range(n_raw):
                lds[i % len(lds)]
            dt = (time.perf_counter() - t0) / n_raw
            print(f"LM eval  __getitem__ [{label}]: {dt*1e3:.1f} ms/sample "
                  f"({1/dt:.1f} samples/s single-core)")

    print(f"device rates to beat: train 244 samples/s (B=128, BENCH_r02), "
          f"eval ~1500 inst/s (B=512); cores here: {os.cpu_count()}")


if __name__ == "__main__":
    main()
