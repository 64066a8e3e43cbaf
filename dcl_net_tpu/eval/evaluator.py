"""Eval loops: stage-1 and stage-2 (refined) pose evaluation.

Rebuilds the reference eval drivers (tools/test_YCBV_stage1.py:127-205,
tools/test_YCBV_stage2.py:140-260, tools/test_LM.py:84-158,
tools/test_LMO.py) on the fixed-shape batch contract:

- batches arrive padded with `valid` flags; invalid rows are either scored as
  lost detections (protocol-dependent) or skipped,
- the forward + distance computation is one jitted graph per shape; only
  [B]-sized distances come back to host,
- metric aggregation (AUC curves / success rates) happens in numpy.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dcl_net_tpu.eval.metrics import (
    add_batch,
    add_s_batch,
    per_class_auc_acc,
    success_at_diameter,
)
from dcl_net_tpu.models.refiner import refine_pose


def _jit_run(mesh, fn, n_state_args: int):
    """Jit an eval step with EXPLICIT shardings when a mesh is present.

    Mirrors make_parallel_train_step (parallel/mesh.py): the first
    `n_state_args` arguments (variable pytrees) are pinned replicated, the
    batch is pinned leading-axis-sharded over the `data` axis, and the
    per-instance outputs are pinned sharded — so a mis-placed batch or
    variable tree fails loudly at dispatch instead of silently running
    replicated via GSPMD inference."""
    if mesh is None:
        return jax.jit(fn)
    from dcl_net_tpu.parallel.mesh import batch_sharding, replicated_sharding

    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        fn,
        in_shardings=(repl,) * n_state_args + (shard,),
        out_shardings=shard,
    )


class Evaluator:
    """Stage-1 evaluator.

    Args:
      model: DCLNet module.
      variables: trained {"params", "batch_stats"}.
      model_points: [num_classes, P, 3] CAD clouds for metric computation
        (reference loads points.xyz per class, tools/test_YCBV_stage1.py:
        147-169).
      sym_class_ids: class indices scored with ADD-S even in ADD protocol
        (reference tools/test_LM.py sym handling; YCBV scores everything
        ADD-S).
      protocol: "adds_auc" (YCBV) or "add_0.1d" (LineMOD/LMO).
    """

    def __init__(
        self,
        model,
        variables,
        model_points: np.ndarray,
        sym_class_ids: Sequence[int] = (),
        protocol: str = "adds_auc",
        diameters: Optional[Sequence[float]] = None,
        count_lost: bool = False,
        template_bank: Optional[Dict[str, np.ndarray]] = None,
        mesh=None,
        logger=None,
    ):
        """template_bank: optional {"feats": [C, M, 7], "voxel_idx": [C, M, 3]}
        per-class CAD template inputs. When given, the template branch is
        encoded ONCE per class and cached — roughly halving per-frame
        inference (impossible in the reference's monolithic forward).

        mesh: optional jax.sharding.Mesh — eval batches are sharded over the
        `data` axis and parameters replicated, scaling the same evaluator
        from 1 chip to a full slice (the reference's only analogue is
        DataParallel, tools/test_YCBV_stage1.py:230-231)."""
        self.mesh = mesh
        if mesh is not None:
            from dcl_net_tpu.parallel.mesh import replicate

            variables = replicate(variables, mesh)
        self.model = model
        self.variables = variables
        self.model_points = jnp.asarray(model_points)
        self.sym_class_ids = set(int(i) for i in sym_class_ids)
        self.protocol = protocol
        self.diameters = diameters
        self.count_lost = count_lost
        self.logger = logger

        model_pts = self.model_points
        # The adds_auc protocol scores EVERY row with ADD-S (reference
        # tools/test_YCBV_stage1.py:192-199) — the plain ADD distance would
        # be computed, fetched, and then discarded by _score_batch, so it is
        # only emitted for the add_0.1d protocol where the sym rule selects
        # between the two.
        need_add = protocol != "adds_auc"

        def score(out, batch):
            cls = batch["labels"]["obj_idx"]
            pts = model_pts[cls]  # [B, P, 3]
            adds = add_s_batch(
                pts, out["rot_pred"], out["trans_pred"],
                batch["labels"]["rot_gt"], batch["labels"]["trans_gt"],
            )
            res = {
                "adds": adds,
                "rot_pred": out["rot_pred"], "trans_pred": out["trans_pred"],
                # DCLNet always emits the capacity-overflow flag; default to
                # all-clear for custom/stub models without one
                "overflow": out.get(
                    "overflow",
                    jnp.zeros(out["rot_pred"].shape[0], bool)),
            }
            if need_add:
                res["add"] = add_batch(
                    pts, out["rot_pred"], out["trans_pred"],
                    batch["labels"]["rot_gt"], batch["labels"]["trans_gt"],
                )
            return res

        self._tmp_cache = None
        self._bank_inputs = None
        if template_bank is not None:
            self._bank_inputs = {"tmp": {
                "feats": jnp.asarray(template_bank["feats"]),
                "voxel_idx": jnp.asarray(template_bank["voxel_idx"]),
            }}
            self._encode_bank = jax.jit(
                lambda v, b: self.model.apply(
                    v, b, train=False, method=self.model.encode_template
                )
            )
            self._refresh_template_cache()

            # the cache is an ARGUMENT (not a closure): update_variables can
            # re-encode it from new weights without re-tracing this graph
            def run(variables, tmp_cache, batch):
                obs = model.apply(
                    variables, batch, train=False,
                    method=model.encode_observed,
                )
                cls = batch["labels"]["obj_idx"]
                tmp = jax.tree.map(lambda x: x[cls], tmp_cache)
                out = model.apply(variables, obs, tmp, train=False,
                                  method=model.fuse)
                return score(out, batch)

            jitted = _jit_run(mesh, run, n_state_args=2)
            self._run = lambda variables, batch: jitted(
                variables, self._tmp_cache, batch
            )
        else:

            def run(variables, batch):
                out = model.apply(variables, batch, train=False)
                return score(out, batch)

            self._run = _jit_run(mesh, run, n_state_args=1)

    def _refresh_template_cache(self):
        tmp_cache = self._encode_bank(self.variables, self._bank_inputs)
        if self.mesh is not None:
            from dcl_net_tpu.parallel.mesh import replicate

            tmp_cache = replicate(tmp_cache, self.mesh)
        self._tmp_cache = tmp_cache

    def update_variables(self, variables):
        """Swap in new weights (e.g. mid-training eval) — replicates onto the
        mesh if any and RE-ENCODES the per-class template cache, which
        depends on the weights; the jitted eval graph is reused as-is."""
        if self.mesh is not None:
            from dcl_net_tpu.parallel.mesh import replicate

            variables = replicate(variables, self.mesh)
        self.variables = variables
        if self._bank_inputs is not None:
            self._refresh_template_cache()
        return self

    def _shard(self, batch):
        if self.mesh is not None:
            # per-process batch; the global batch is b * process_count
            b = int(jax.tree.leaves(batch)[0].shape[0]) * jax.process_count()
            n = self.mesh.devices.size
            if b % n:
                raise ValueError(
                    f"global eval batch size {b} is not divisible by the "
                    f"{n}-device mesh — set the eval loader's bs to a "
                    f"multiple of n_devices (same rule the Solver enforces)"
                )
        if self.mesh is None:
            return batch
        from dcl_net_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)

    def evaluate(self, loader: Iterable) -> Dict[str, object]:
        """One pass over the loader with 1-deep dispatch pipelining: the next
        batch's forward is dispatched before the previous batch's [B]-sized
        results are fetched, overlapping host work and the per-dispatch
        attach latency with device compute (+16-30% eval throughput on this
        backend, docs/PERF.md). Every result is still fetched and scored."""
        distances: List[float] = []
        class_ids: List[int] = []
        lost_per_class: Dict[int, int] = {}
        n_overflow = 0
        multiproc = self.mesh is not None and jax.process_count() > 1

        def _local_rows(x):
            # multi-host: the jitted outputs are GLOBAL batch-sharded arrays
            # (out_shardings in _jit_run); device_get would raise on their
            # non-addressable shards. Each process fetches ITS contiguous
            # block (addressable shards in global-index order) — which lines
            # up row-for-row with the process-local loader batch the
            # valid/cls/sym metadata came from.
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                shards = sorted(
                    x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
                return np.concatenate(
                    [np.asarray(s.data) for s in shards], axis=0)
            return np.asarray(x)

        def consume(res, valid, cls, sym, pad):
            nonlocal n_overflow
            # ONE bundled host transfer for the [B]-sized outputs: per-fetch
            # attach latency is ms-scale on this backend, and separate
            # np.asarray calls per output showed up as ~2% of end-to-end
            # eval at B=512 (docs/PERF.md)
            keys = {k: res[k] for k in ("adds", "add", "overflow") if k in res}
            got = (jax.tree.map(_local_rows, keys) if multiproc
                   else jax.device_get(keys))
            adds = np.asarray(got["adds"])
            # adds_auc scores every row ADD-S; "add" is only emitted (and
            # only consulted by _score_batch) under the add_0.1d sym rule
            add = np.asarray(got.get("add", adds))
            if "overflow" in got:
                # capacity-overflow signal (models/backbone.py): count real
                # scored rows whose voxel extraction dropped occupied voxels
                ovf = np.asarray(got["overflow"])
                n_overflow += int((ovf & (valid > 0) & ~(pad > 0)).sum())
            self._score_batch(
                adds, add, valid, cls, sym,
                distances, class_ids, lost_per_class, pad=pad,
            )

        pending = None
        for batch in loader:
            res = self._run(self.variables, self._shard(batch))
            # metadata rides as one bundled transfer too (free pass-through
            # when the loader yields numpy, one fetch when device-resident)
            valid_arr, cls_arr, sym_arr, pad_arr = jax.device_get((
                batch["valid"],
                batch["labels"]["obj_idx"],
                batch["sym_flag"],
                batch.get("pad"),
            ))
            meta = (
                np.asarray(valid_arr),
                np.asarray(cls_arr),
                np.asarray(sym_arr),
                np.asarray(pad_arr) if pad_arr is not None
                else np.zeros(np.shape(valid_arr), np.asarray(valid_arr).dtype),
            )
            if pending is not None:
                consume(*pending)
            pending = (res,) + meta
        if pending is not None:
            consume(*pending)
        if multiproc:
            # every process scored only its own block: allgather the ragged
            # per-process score lists (NaN/-1 padded to the max local count)
            # and the fixed-size lost/overflow counters, so each process
            # computes IDENTICAL global metrics (tools/dryrun_multihost.py
            # asserts equality with a single-process run)
            from jax.experimental import multihost_utils as mhu

            d = np.asarray(distances, np.float64)
            c = np.asarray(class_ids, np.int64)
            counts = np.asarray(mhu.process_allgather(
                np.asarray([len(d)], np.int64)))[:, 0]
            m = int(counts.max()) if counts.size else 0
            pad_d = np.full(m, np.nan)
            pad_d[:len(d)] = d
            pad_c = np.full(m, -1, np.int64)
            pad_c[:len(c)] = c
            all_d = np.asarray(mhu.process_allgather(pad_d))
            all_c = np.asarray(mhu.process_allgather(pad_c))
            distances = [float(v) for row, k in zip(all_d, counts)
                         for v in row[:k]]
            class_ids = [int(v) for row, k in zip(all_c, counts)
                         for v in row[:k]]
            n_cls = int(self.model_points.shape[0])
            lost_vec = np.zeros(n_cls, np.int64)
            for k, v in lost_per_class.items():
                lost_vec[k] = v
            all_lost = np.asarray(mhu.process_allgather(lost_vec)).sum(0)
            lost_per_class = {i: int(all_lost[i]) for i in range(n_cls)
                              if all_lost[i]}
            n_overflow = int(np.asarray(mhu.process_allgather(
                np.asarray([n_overflow], np.int64))).sum())
        result = self.summarize(distances, class_ids, lost_per_class)
        result["n_overflow"] = n_overflow
        # scored-instance count (global under multi-host): the denominator
        # behind every mean above, and the cheap cross-config parity check
        # (two input flavors of the same dataset must score the same count)
        result["n_scored"] = len(distances)
        if n_overflow and self.logger:
            self.logger.warning(
                "capacity overflow: %d scored instances exceeded a "
                "voxel-extraction budget (model.capacities) — their "
                "highest-index voxels were dropped and the reported metrics "
                "may understate the model" % n_overflow
            )
        return result

    def _score_batch(self, adds, add, valid, cls, sym,
                     distances, class_ids, lost_per_class, pad=None):
        """Vectorized batch scoring: partition rows into pad / lost / scored
        with numpy mask arithmetic (no per-row Python loop — at B=512 and
        ~1.6k inst/s the old loop cost ~3% end-to-end), then select ADD vs
        ADD-S per row by the protocol rule. Metric aggregation is
        order-insensitive (per-class grouping + sorted VOCap curve)."""
        cls = np.asarray(cls, dtype=np.int64)
        valid = np.asarray(valid)
        sym = np.asarray(sym)
        # pad rows are synthetic fill (batch rectangularization) — neither
        # real instances nor lost detections; scoring them would corrupt the
        # per-class metrics
        real = np.ones(valid.shape, bool) if pad is None else ~(np.asarray(pad) > 0)
        # Lost detection handling is protocol-specific:
        # - LMO: counted in the success-rate denominator
        #   (reference tools/test_LMO.py:104-117),
        # - YCBV: scored as inf distance
        #   (reference tools/test_YCBV_stage1.py:192-199),
        # - LM: skipped entirely (reference tools/test_LM.py:105-108).
        lost = real & (valid <= 0)
        if lost.any():
            if self.count_lost:
                for c, n in zip(*np.unique(cls[lost], return_counts=True)):
                    lost_per_class[int(c)] = lost_per_class.get(int(c), 0) + int(n)
            elif self.protocol == "adds_auc":
                distances.extend([np.inf] * int(lost.sum()))
                class_ids.extend(cls[lost].tolist())
        scored = real & (valid > 0)
        if scored.any():
            if self.protocol == "adds_auc":
                use_adds = np.ones(valid.shape, bool)
            else:
                sym_ids = np.fromiter(self.sym_class_ids, np.int64, len(self.sym_class_ids))
                use_adds = (sym > 0) | np.isin(cls, sym_ids)
            dist = np.where(use_adds, np.asarray(adds), np.asarray(add))
            distances.extend(float(x) for x in dist[scored])
            class_ids.extend(cls[scored].tolist())

    def summarize(self, distances, class_ids, lost_per_class=None):
        if self.protocol == "adds_auc":
            num_classes = int(self.model_points.shape[0])
            return per_class_auc_acc(
                distances, class_ids, num_classes=num_classes, logger=self.logger
            )
        if self.protocol == "add_0.1d":
            assert self.diameters is not None
            lost = None
            if self.count_lost:
                lost = [
                    (lost_per_class or {}).get(i, 0)
                    for i in range(len(self.diameters))
                ]
            return success_at_diameter(
                distances, class_ids, self.diameters,
                num_lost_per_class=lost, logger=self.logger,
            )
        raise ValueError(self.protocol)


class Stage2Evaluator(Evaluator):
    """Stage-1 + iterative refiner eval (reference tools/test_YCBV_stage2.py:
    140-260): run DCL-Net, then `iterations` refine/compose steps, then score
    the final pose. The whole chain is one jitted graph."""

    def __init__(self, model, variables, refiner, refiner_variables,
                 model_points: np.ndarray, iterations: int = 2, **kw):
        super().__init__(model, variables, model_points, **kw)
        self.refiner = refiner
        if self.mesh is not None:
            from dcl_net_tpu.parallel.mesh import replicate

            refiner_variables = replicate(refiner_variables, self.mesh)
        self.refiner_variables = refiner_variables
        self.iterations = iterations

        model_pts = self.model_points
        refiner_apply = refiner.apply
        has_cache = self._bank_inputs is not None

        # like the stage-1 run: the template cache rides as an ARGUMENT so
        # update_variables' re-encoded cache takes effect without re-tracing
        def run(variables, refiner_vars, tmp_cache, batch):
            if has_cache:
                obs = model.apply(variables, batch, train=False,
                                  method=model.encode_observed)
                tmp = jax.tree.map(
                    lambda x: x[batch["labels"]["obj_idx"]], tmp_cache
                )
                out = model.apply(variables, obs, tmp, train=False,
                                  method=model.fuse)
            else:
                out = model.apply(variables, batch, train=False)
            rot, trans = refine_pose(
                refiner_apply, refiner_vars,
                out["points_inp"], out["F_Xo_p"], out["conf"],
                out["rot_pred"], out["trans_pred"], iterations,
            )
            cls = batch["labels"]["obj_idx"]
            pts = model_pts[cls]
            adds = add_s_batch(
                pts, rot, trans,
                batch["labels"]["rot_gt"], batch["labels"]["trans_gt"],
            )
            res = {"adds": adds, "rot_pred": rot, "trans_pred": trans,
                   "overflow": out.get(
                       "overflow", jnp.zeros(rot.shape[0], bool))}
            if self.protocol != "adds_auc":
                res["add"] = add_batch(
                    pts, rot, trans,
                    batch["labels"]["rot_gt"], batch["labels"]["trans_gt"],
                )
            return res

        jitted = _jit_run(self.mesh, run, n_state_args=3)
        self._run = lambda variables, batch: jitted(
            variables, self.refiner_variables,
            self._tmp_cache if has_cache else {}, batch
        )
