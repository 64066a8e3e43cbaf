"""Stage-2 (refiner) training step.

Rebuilds the reference stage-2 trainer logic (tools/train_YCBV_stage2.py:
224-270): the frozen stage-1 model runs in eval mode, its outputs build the
refiner input (canonicalized observed points + F_Xo_p, conf), then
`iteration` refine/compose steps each contribute a point-matching loss.
Poses are stop-gradient'ed between iterations exactly like the reference's
.detach() calls, so the summed loss has the same gradient as the reference's
per-iteration backward accumulation (optimizer steps once per batch; the
reference divides the batch size by `iteration` for memory parity, :346).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dcl_net_tpu.geometry.transform import untransform_points
from dcl_net_tpu.models.refiner import refiner_losses
from dcl_net_tpu.train.solver import TrainState


def make_stage2_train_step(
    main_model,
    main_variables,
    refiner,
    tx,
    iterations: int,
    model_points: jnp.ndarray,  # [num_classes, P, 3] CAD clouds (cld in ref)
) -> Callable:
    """Build the jitted refiner train step."""

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        out_main = main_model.apply(main_variables, batch, train=False)
        # pose carries are geometry: force f32 regardless of the model's
        # compute dtype — the bf16 production config emits bf16 trans_pred
        # and the HIGHEST-precision compose returns f32, which would fail
        # scan's carry type check (same fix as refine_pose, models/refiner.py)
        rot0 = jax.lax.stop_gradient(out_main["rot_pred"]).astype(jnp.float32)
        trans0 = jax.lax.stop_gradient(out_main["trans_pred"]).astype(jnp.float32)
        conf = jax.lax.stop_gradient(out_main["conf"])
        f_xo_p = jax.lax.stop_gradient(out_main["F_Xo_p"])
        points_inp = out_main["points_inp"]
        cld = model_points[batch["labels"]["obj_idx"]]
        rot_gt = batch["labels"]["rot_gt"]
        trans_gt = batch["labels"]["trans_gt"]
        sym = batch["sym_flag"]
        valid = batch.get("valid")

        def compute_loss(params):
            def body(carry, _):
                rot_cur, trans_cur, loss_acc = carry
                inp_cano = untransform_points(points_inp, rot_cur, trans_cur)
                feats = jnp.concatenate([inp_cano, f_xo_p], axis=-1)
                pred = refiner.apply(
                    {"params": params}, {"input_features": feats, "conf": conf},
                    train=True,
                )
                losses = refiner_losses(
                    pred, trans_cur, rot_cur, cld, sym, rot_gt, trans_gt, valid
                )
                # compose and detach for the next iteration (reference :264-269)
                rot_new = jax.lax.stop_gradient(
                    jnp.einsum("bij,bjk->bik", rot_cur, pred["rot_pred"],
                               precision=jax.lax.Precision.HIGHEST)
                )
                trans_new = jax.lax.stop_gradient(
                    jnp.einsum("bij,bj->bi", rot_cur, pred["trans_pred"],
                               precision=jax.lax.Precision.HIGHEST) + trans_cur
                )
                return (rot_new, trans_new, loss_acc + losses["loss_all"]), losses["loss_all"]

            (_, _, total), per_iter = jax.lax.scan(
                body, (rot0, trans0, jnp.zeros((), jnp.float32)), None,
                length=iterations,
            )
            return total, per_iter

        (loss, per_iter), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=state.batch_stats, opt_state=new_opt_state,
        )
        metrics = {
            "loss_all": loss,
            "loss_last_iter": per_iter[-1],
            "grad_norm": optax.global_norm(grads),
            # capacity-overflow fraction from the frozen stage-1 forward
            # (see models/backbone.py / train/solver.py)
            "overflow_frac": jnp.mean(out_main["overflow"].astype(jnp.float32)),
        }
        return new_state, metrics

    return train_step
