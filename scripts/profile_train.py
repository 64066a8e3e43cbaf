"""Split the training step cost: forward loss vs full grad step (B=32/128).

Usage: python scripts/profile_train.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from dcl_net_tpu.config import Config
    from dcl_net_tpu.models import DCLNet, dcl_losses
    from dcl_net_tpu.data.schema import make_batch
    from dcl_net_tpu.data.synthetic import SyntheticPoseDataset
    from dcl_net_tpu.train.solver import build_optimizer, init_train_state, make_train_step

    n_classes, n = 8, 1024
    grid, unit = (64, 64, 64), (0.006, 0.006, 0.006)
    ds = SyntheticPoseDataset(n_objects=n_classes, n_points=n,
                              unit_voxel_extent=unit, voxel_num_limit=grid,
                              seed=0)
    samples = [ds[i] for i in range(128)]
    model = DCLNet(unit_voxel_extent=unit, voxel_num_limit=grid,
                   n_inp=n, n_tmp=n, interp_mode="pallas", dtype=jnp.bfloat16)
    cfg = Config({"optimizer": {"type": "Adam", "lr": 1e-3,
                                "betas": [0.5, 0.999], "eps": 1e-6}})
    tx, _ = build_optimizer(cfg)

    def timeit(f, *args, iters=8):
        _ = np.asarray(f(*args))
        _ = np.asarray(f(*args))
        best = None
        for _rep in range(2):
            t0 = time.perf_counter()
            prev = f(*args)
            for _i in range(iters - 1):
                cur = f(*args)
                _ = np.asarray(prev)
                prev = cur
            _ = np.asarray(prev)
            cur_t = (time.perf_counter() - t0) / iters
            best = cur_t if best is None else min(best, cur_t)
        return best * 1000

    for b in (32, 128):
        batch = jax.tree.map(jnp.asarray, make_batch(samples[:b]).to_dict())
        state = init_train_state(model, tx, batch)

        def loss_fwd(params, stats, bb):
            pred, _ = model.apply(
                {"params": params, "batch_stats": stats}, bb, train=True,
                mutable=["batch_stats"],
            )
            return dcl_losses(pred, bb)["loss_all"]

        f_fwd = jax.jit(loss_fwd)
        t_fwd = timeit(f_fwd, state.params, state.batch_stats, batch)

        def _vg(p, s, bb):
            v, g = jax.value_and_grad(loss_fwd)(p, s, bb)
            # fold a grad reduction into the fetched scalar: returning only
            # the value lets XLA dead-code-eliminate the whole backward
            # (measured: "fwd+bwd" == fwd exactly without this)
            import optax as _optax

            return v + 0.0 * _optax.global_norm(g)

        f_vg = jax.jit(_vg)
        t_vg = timeit(f_vg, state.params, state.batch_stats, batch)

        step = jax.jit(make_train_step(model, tx, dcl_losses))
        # non-donated timing (state reused) — close enough for a split
        t_step = timeit(lambda s, bb: step(s, bb)[1]["loss_all"], state, batch)

        # eval-mode forward (train=False: no BN batch stats) for contrast
        f_ev = jax.jit(lambda v, bb: dcl_losses(
            model.apply(v, bb, train=False), bb)["loss_all"])
        t_ev = timeit(f_ev, {"params": state.params,
                             "batch_stats": state.batch_stats}, batch)

        print(f"B={b}: eval-fwd {t_ev:.0f} ms | train-fwd {t_fwd:.0f} ms | "
              f"fwd+bwd {t_vg:.0f} ms | full step {t_step:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
