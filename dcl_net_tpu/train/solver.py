"""Training solver: optimizer building, LR schedules, AutoClip, train step.

TPU-native replacement for the reference's gorilla.solver.BaseSolver-based
Trainer (reference tools/train_YCBV_stage1.py:68-147) and its AutoClip
percentile gradient clipper (:212-231). The optimizer is built from the same
config schema (cfg.optimizer / cfg.lr_scheduler / cfg.lr_scheduler_cyc,
reference configs/config_YCBV_bs32.yaml:2-16).

Everything device-side is one jitted step; the Solver only orchestrates
epochs, logging and checkpoints on the host.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dcl_net_tpu.config import Config


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# AutoClip
# ---------------------------------------------------------------------------
class AutoClipState(NamedTuple):
    history: jnp.ndarray  # [H] ring buffer of grad norms
    count: jnp.ndarray    # total norms seen


def autoclip(percentile: float = 50.0, history_len: int = 1024) -> optax.GradientTransformation:
    """Percentile-based adaptive gradient clipping.

    Matches the reference AutoClip (tools/train_YCBV_stage1.py:212-231): keep
    a history of global grad norms, clip the current gradient to the given
    percentile of that history (including the current norm). The reference
    keeps an unbounded list; we use a ring buffer, identical until the buffer
    wraps and statistically equivalent after.
    """

    def init_fn(params):
        del params
        return AutoClipState(
            history=jnp.zeros((history_len,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates).astype(jnp.float32)
        history = state.history.at[state.count % history_len].set(norm)
        count = state.count + 1
        n_valid = jnp.minimum(count, history_len)
        # percentile over the valid slots: sort with empty slots pushed to
        # +inf, then take the k-th smallest with linear interpolation like
        # np.percentile.
        idx = jnp.arange(history_len)
        valid_hist = jnp.sort(jnp.where(idx < n_valid, history, jnp.inf))
        q = percentile / 100.0 * (n_valid.astype(jnp.float32) - 1.0)
        lo = jnp.floor(q).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_valid - 1)
        frac = q - lo.astype(jnp.float32)
        clip_value = valid_hist[lo] * (1 - frac) + valid_hist[hi] * frac
        scale = jnp.where(norm > clip_value, clip_value / jnp.maximum(norm, 1e-12), 1.0)
        updates = jax.tree.map(lambda g: g * scale, updates)
        return updates, AutoClipState(history=history, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------
def cyclic_lr(base_lr: float, max_lr: float, step_size_up: int, step_size_down: Optional[int] = None):
    """torch.optim.lr_scheduler.CyclicLR, triangular mode (reference
    tools/train_YCBV_stage1.py:278)."""
    step_size_down = step_size_down or step_size_up
    period = step_size_up + step_size_down

    def schedule(step):
        cycle_pos = jnp.mod(step, period)
        up = cycle_pos / step_size_up
        down = 1.0 - (cycle_pos - step_size_up) / step_size_down
        frac = jnp.where(cycle_pos <= step_size_up, up, down)
        return base_lr + (max_lr - base_lr) * jnp.clip(frac, 0.0, 1.0)

    return schedule


def step_lr(base_lr: float, step_size_steps: int, gamma: float):
    """torch StepLR per-epoch decay, expressed in steps."""

    def schedule(step):
        k = jnp.floor(step / step_size_steps)
        return base_lr * jnp.power(gamma, k)

    return schedule


def build_lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable:
    """Build from the reference config schema.

    - cfg.lr_scheduler_cyc present -> CyclicLR per iteration (YCBV configs).
    - cfg.lr_scheduler.type == StepLR -> per-epoch decay (LM config).
    """
    if "lr_scheduler_cyc" in cfg:
        c = cfg.lr_scheduler_cyc
        return cyclic_lr(
            float(c.base_lr), float(c.max_lr),
            int(c.step_size_up), int(c.get("step_size_down", c.step_size_up)),
        )
    sched = cfg.get("lr_scheduler", Config())
    stype = sched.get("type", "constant")
    base_lr = float(cfg.optimizer.lr)
    if stype == "StepLR":
        return step_lr(base_lr, int(sched.step_size) * steps_per_epoch, float(sched.gamma))
    if stype in ("constant", None):
        return lambda step: base_lr
    raise NotImplementedError(f"lr_scheduler type {stype}")


def build_optimizer(cfg: Config, steps_per_epoch: int = 1) -> Tuple[optax.GradientTransformation, Callable]:
    """Adam from cfg.optimizer (reference configs: Adam lr 1e-3,
    betas [0.5, 0.999], eps 1e-6) + AutoClip + LR schedule."""
    opt_cfg = cfg.optimizer
    if opt_cfg.get("type", "Adam") != "Adam":
        raise NotImplementedError(opt_cfg.type)
    betas = opt_cfg.get("betas", [0.9, 0.999])
    schedule = build_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        autoclip(percentile=float(cfg.get("clip_percentile", 50.0))),
        optax.scale_by_adam(b1=float(betas[0]), b2=float(betas[1]),
                            eps=float(opt_cfg.get("eps", 1e-8))),
        optax.scale_by_learning_rate(schedule),
    )
    return tx, schedule


# ---------------------------------------------------------------------------
# Train step factory
# ---------------------------------------------------------------------------
def make_train_step(model, tx, loss_fn, skip_nonfinite: bool = True,
                    template_bank=None) -> Callable:
    """Build the jittable train step: forward, loss, grad, clip, update.

    loss_fn(pred, batch) -> dict with "loss_all" (reference contract,
    tools/train_YCBV_stage1.py:168-191).

    skip_nonfinite: when the loss or any gradient is NaN/Inf the whole update
    (params, opt state, batch stats) is skipped and metrics carry
    skipped_nonfinite=1 — one bad batch cannot poison a long run (a guard
    the reference lacks; a torch run dies or silently diverges instead).

    template_bank: optional {"feats": [C, M, 7], "voxel_idx": [C, M, 3]}
    per-class template inputs — the template branch is encoded once per
    class per step instead of once per instance
    (model.forward_with_template_bank).
    """
    if template_bank is not None:
        template_bank = jax.tree.map(jnp.asarray, template_bank)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if template_bank is not None:
                pred, mut = model.apply(
                    variables, batch, template_bank, train=True,
                    mutable=["batch_stats"],
                    method=model.forward_with_template_bank,
                )
            else:
                pred, mut = model.apply(
                    variables, batch, train=True, mutable=["batch_stats"],
                )
            losses = loss_fn(pred, batch)
            if "overflow" in pred:
                # fraction of samples whose occupied voxels exceeded a
                # static extraction capacity (silently degraded — see
                # models/backbone.py); surfaced per step so a mis-sized
                # capacity config is visible in the training log
                losses = dict(losses)
                losses["overflow_frac"] = jnp.mean(
                    pred["overflow"].astype(jnp.float32)
                )
            return losses["loss_all"], (losses, mut["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        if skip_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(metrics["grad_norm"])
            pick = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), new, old
            )
            new_params = pick(new_params, state.params)
            new_opt_state = pick(new_opt_state, state.opt_state)
            new_stats = pick(new_stats, state.batch_stats)
            metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def init_train_state(model, tx, example_batch, rng_key=None) -> TrainState:
    rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng_key, example_batch, train=True
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


# ---------------------------------------------------------------------------
# Host-side epoch driver
# ---------------------------------------------------------------------------
class Solver:
    """Epoch/step loop with per-step timing and periodic logging.

    Mirrors the reference Trainer.solve/train (tools/train_YCBV_stage1.py:
    89-147): per-step T_data / T_forward timing, log-buffer averaging every
    `per_write` steps, checkpoint every `per_save` epochs.
    """

    def __init__(self, model, loss_fn, cfg: Config, loader, logger=None,
                 checkpoint_dir: Optional[str] = None, writer=None,
                 eval_fn: Optional[Callable] = None, mesh=None,
                 step_builder: Optional[Callable] = None,
                 template_bank=None):
        """eval_fn(state, epoch) -> dict of scalars; called every
        cfg.per_val epochs (reference Trainer.evaluate,
        tools/train_YCBV_stage2.py:205-222).

        mesh: optional jax.sharding.Mesh — the train step runs data-parallel
        over its `data` axis: params/opt-state replicated, batches sharded on
        the leading axis, gradient psum over ICI inserted by GSPMD (the
        reference's one multi-device strategy, DataParallel at
        tools/train_YCBV_stage1.py:251-252). Per-device batch = B/n_devices.

        step_builder: optional factory tx -> unjitted train step
        (state, batch) -> (state, metrics) replacing the default stage-1
        step — used by the stage-2 refiner trainer; it receives the Solver's
        own optimizer so opt-state structure matches, and mesh/jit/donation
        handling stays here."""
        self.model = model
        self.cfg = cfg
        self.loader = loader
        self.logger = logger
        self.writer = writer
        self.checkpoint_dir = checkpoint_dir
        self.eval_fn = eval_fn
        self.mesh = mesh
        steps_per_epoch = len(loader)
        self.tx, self.schedule = build_optimizer(cfg, steps_per_epoch)
        raw_step = (step_builder(self.tx) if step_builder
                    else make_train_step(model, self.tx, loss_fn,
                                         template_bank=template_bank))
        if mesh is not None:
            from dcl_net_tpu.parallel.mesh import make_parallel_train_step

            bs = getattr(loader, "batch_size", None)
            if bs is not None and bs % mesh.size != 0:
                raise ValueError(
                    f"batch size {bs} not divisible by mesh size {mesh.size}"
                )
            self.train_step = make_parallel_train_step(raw_step, mesh)
        else:
            # donate the state: params/opt-state update in place on device
            self.train_step = jax.jit(raw_step, donate_argnums=(0,))
        self.state: Optional[TrainState] = None
        self.epoch = 0

    def initialize(self, example_batch, seed: int = 0):
        self.state = init_train_state(
            self.model, self.tx, example_batch, jax.random.PRNGKey(seed)
        )
        if self.mesh is not None:
            from dcl_net_tpu.parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)
        return self.state

    def set_state(self, state: TrainState):
        """Install a restored state, replicating it onto the mesh if any."""
        if self.mesh is not None:
            from dcl_net_tpu.parallel.mesh import replicate

            state = replicate(state, self.mesh)
        self.state = state
        return self.state

    def solve(self, max_epoch: Optional[int] = None):
        max_epoch = max_epoch or int(self.cfg.get("max_epoch", 1))
        per_save = int(self.cfg.get("per_save", 1))
        per_val = int(self.cfg.get("per_val", 1))
        while self.epoch < max_epoch:
            self.train_epoch()
            self.epoch += 1
            # per_save/per_val <= 0 disables the hook (smoke configs)
            if self.checkpoint_dir and per_save > 0 and (self.epoch % per_save == 0):
                from dcl_net_tpu.train.checkpoints import save_checkpoint

                save_checkpoint(self.checkpoint_dir, self.state, self.epoch)
            if self.eval_fn and per_val > 0 and (self.epoch % per_val == 0):
                scalars = self.eval_fn(self.state, self.epoch)
                if scalars:
                    if self.logger:
                        self.logger.info(
                            f"[{self.epoch}] Eval - " + "\t".join(
                                f"{k}: {v:.5f}" for k, v in scalars.items()
                            )
                        )
                    if self.writer:
                        self.writer.add_scalars("eval", scalars, self.epoch)

    def save_due(self, i: int) -> bool:
        """Mid-epoch checkpoint trigger — the SINGLE definition, shared by
        maybe_save_steps and the train loop's consume-before-save ordering
        (a pending pipelined metric record must flush before the checkpoint
        writes its consumed-batches meta, or an interrupted+resumed run
        drops one record vs the uninterrupted stream)."""
        per_save_steps = int(self.cfg.get("per_save_steps", 0))
        return bool(self.checkpoint_dir and per_save_steps and i
                    and i % per_save_steps == 0)

    def maybe_save_steps(self, i: int):
        """Mid-epoch checkpointing every cfg.per_save_steps steps (the
        reference only saves per epoch; long epochs lose hours on preemption).

        The meta records how many batches of the current epoch are consumed;
        restore() feeds that to the loader so a resumed run replays the exact
        remaining batches (the shuffle is seeded by seed+epoch)."""
        if self.save_due(i):
            from dcl_net_tpu.train.checkpoints import save_checkpoint

            save_checkpoint(
                self.checkpoint_dir, self.state, self.epoch,
                meta={"consumed_batches": i + 1},
            )

    def restore(self, path: str) -> None:
        """Resume from a checkpoint directory — params/opt-state/step, epoch,
        and (for mid-epoch checkpoints) the position inside the epoch. The
        live state provides the restore target so optax's NamedTuple opt
        state keeps its structure (a raw orbax restore degrades it to dicts)."""
        if self.state is None:
            raise RuntimeError("call initialize() before restore()")
        from dcl_net_tpu.train.checkpoints import load_checkpoint

        target = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0, "epoch": 0, "meta": {"consumed_batches": 0},
        }
        payload = load_checkpoint(path, target=target)
        self.set_state(self.state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"], step=payload["step"],
        ))
        self.epoch = int(payload["epoch"])
        consumed = int(payload["meta"]["consumed_batches"])
        if consumed and hasattr(self.loader, "skip_next"):
            self.loader.skip_next = consumed

    def train_epoch(self) -> Dict[str, float]:
        per_write = int(self.cfg.get("per_write", 10))
        # Profiling hook (aux-subsystem parity with the reference's manual
        # T_data/T_forward/T_backward segmentation, train_YCBV_stage1.py:
        # 114-132 — here additionally a real device trace): set
        # cfg.profile_dir (or DCLX_PROFILE_DIR) to capture steps 2-5 of the
        # first epoch with jax.profiler.
        import os as _os

        profile_dir = self.cfg.get("profile_dir") or _os.environ.get("DCLX_PROFILE_DIR")
        buffer: Dict[str, list] = {}
        # 1-deep metric pipelining (cfg.pipeline_metrics, default on): step
        # k+1 is dispatched BEFORE step k's scalar metrics are fetched, so
        # the per-dispatch attach latency (~25-30 ms on this backend,
        # docs/PERF.md) overlaps device compute instead of serializing with
        # it — the training twin of the Evaluator's dispatch pipelining.
        # Every metric is still fetched (forcing completion, so timings stay
        # honest); T_step then reports the SUSTAINED per-step wall time
        # (dispatch + previous-step fetch), which is the number that matters.
        pipeline = bool(self.cfg.get("pipeline_metrics", True))
        pending = None  # (device metrics, T_data, lr step, loader index)

        def consume(pend, t_start, t_excl=0.0):
            pmetrics, pdata, pstep, pi = pend
            info = {k: float(v) for k, v in pmetrics.items()}  # forces completion
            if info.get("overflow_frac", 0.0) > 0 and self.logger and \
                    not getattr(self, "_warned_overflow", False):
                self._warned_overflow = True
                self.logger.warning(
                    "capacity overflow: %.1f%% of this step's samples exceed "
                    "a voxel-extraction budget (model.capacities) — their "
                    "highest-index voxels were dropped; raise the capacities "
                    "or shrink the inputs (warned once; overflow_frac tracks "
                    "it per step)" % (100.0 * info["overflow_frac"])
                )
            t_step = time.time() - t_start - t_excl
            info.update({"T_data": pdata, "T_step": t_step,
                         "lr": float(self.schedule(pstep - 1))})
            for k, v in info.items():
                buffer.setdefault(k, []).append(v)
            if self.logger and pi % per_write == 0:
                avg = {k: float(np.mean(v[-per_write:])) for k, v in buffer.items()}
                msg = f"[{self.epoch}][{pi}/{len(self.loader)}] Train - " + "\t".join(
                    f"{k}: {v:.5f}" for k, v in avg.items()
                )
                self.logger.info(msg)
                if self.writer:
                    self.writer.add_scalars("train", avg, pstep)

        end = time.time()
        # keep the loader's shuffle epoch in lockstep with the solver epoch
        # (init peeks or resumes must not drift the data order)
        if hasattr(self.loader, "epoch"):
            self.loader.epoch = self.epoch
        offset = getattr(self.loader, "skip_next", 0)  # mid-epoch resume
        # host-side mirror of state.step: reading int(state.step) from the
        # just-dispatched step's output would block until that step finishes
        # on device, silently serializing the pipelined loop
        step_host = None if self.state is None else int(self.state.step)
        for i0, batch in enumerate(self.loader):
            i = i0 + offset
            if profile_dir and self.epoch == 0 and i == 2:
                try:
                    jax.profiler.start_trace(profile_dir)
                except Exception:
                    profile_dir = None  # backend without profiler support
            if profile_dir and self.epoch == 0 and i == 5:
                jax.profiler.stop_trace()
            t_data = time.time() - end
            if self.state is None:
                self.initialize(batch)
            if step_host is None:
                step_host = int(self.state.step)  # fresh-init state: cheap
            if self.mesh is not None:
                from dcl_net_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            state, metrics = self.train_step(self.state, batch)
            self.state = state
            step_host += 1
            if pipeline and not self.save_due(i):
                if pending is not None:
                    consume(pending, end, t_excl=t_data)
                pending = (metrics, t_data, step_host, i)
            else:
                # fetch THIS step's scalars now, forcing completion
                # (block_until_ready can return early on detached TPU attach
                # paths). A due mid-epoch save also takes this path: the
                # checkpoint's consumed-batches meta must not outrun the
                # written metric stream, or an interrupted+resumed run would
                # drop one record vs the uninterrupted stream.
                if pending is not None:
                    consume(pending, end, t_excl=t_data)
                    # the loader wait already elapsed before this reset, so
                    # the current step's window excludes nothing further; its
                    # real T_data still goes into the record
                    consume((metrics, t_data, step_host, i), time.time())
                    pending = None
                else:
                    consume((metrics, t_data, step_host, i), end, t_excl=t_data)
            self.maybe_save_steps(i)
            end = time.time()
        if pending is not None:
            consume(pending, end)
        return {k: float(np.mean(v)) for k, v in buffer.items()}
