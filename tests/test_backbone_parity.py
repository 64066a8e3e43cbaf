"""Integrated sparse-backbone parity: flax eval path (with BN folding) vs a
reference-faithful numpy sparse pipeline built from the per-op oracles.

This is the 'sparse conv semantics parity' acceptance check from SURVEY.md §7:
regular conv dilation, submanifold gating, masked BN (eval running stats) and
true-average pooling must compose exactly like the reference rulebook engine.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dcl_net_tpu.models.backbone import SparseBackbone
from tests import oracles


def _np_eval_block(x, mask, kernel, scale, bias, mean, var, subm, eps=1e-5):
    if subm:
        out, new_mask = oracles.np_subm_conv3d(x, mask, kernel)
    else:
        out, new_mask = oracles.np_regular_sparse_conv3d(x, mask, kernel)
    s = scale / np.sqrt(var + eps)
    out = out * s + (bias - mean * s)
    out = np.maximum(out, 0.0)
    out = out * new_mask[..., None]
    return out, new_mask


def test_backbone_eval_matches_numpy_sparse_pipeline(rng):
    D = 12
    dims = (4, 8, 8, 16)          # 3 conv layers: regular, subm, regular
    stride_layers = (1,)          # module split after layer 1
    bb = SparseBackbone(dims=dims, stride_layers=stride_layers, kernel_size=3)

    mask = np.zeros((1, D, D, D), np.float32)
    x = np.zeros((1, D, D, D, dims[0]), np.float32)
    occ = rng.choice(D ** 3, 40, replace=False)
    for f in occ:
        i, j, k = np.unravel_index(f, (D, D, D))
        mask[0, i, j, k] = 1
        x[0, i, j, k] = rng.randn(dims[0])

    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask), True)
    # randomize BN stats so folding is actually exercised
    params = jax.tree.map(lambda v: v, variables["params"])
    stats = {}
    for name in variables["batch_stats"]:
        c = variables["params"][name]["scale"].shape[0]
        stats[name] = {
            "mean": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        }
        params[name] = dict(params[name])
        params[name]["scale"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.3 + 1)
        params[name]["bias"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    pyramid = bb.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(mask), False,
    )

    # numpy reference pipeline
    cur, cur_mask = x[0], mask[0]
    np_levels = []
    # layer structure for dims len 4, stride_layers (1,):
    #   conv0 regular, conv1 subm -> pool -> (level 0)
    #   conv2 regular -> pool -> (level 1)
    layer_specs = [(0, False), (1, True), ("pool", None), (2, False), ("pool", None)]
    for spec, subm in layer_specs:
        if spec == "pool":
            cur, cur_mask = oracles.np_sparse_avg_pool(cur, cur_mask, 3, 2)
            np_levels.append((cur.copy(), cur_mask.copy()))
        else:
            i = spec
            p = params[f"conv{i}"]
            s = stats[f"conv{i}"]
            cur, cur_mask = _np_eval_block(
                cur, cur_mask, np.asarray(p["kernel"]),
                np.asarray(p["scale"]), np.asarray(p["bias"]),
                np.asarray(s["mean"]), np.asarray(s["var"]), subm,
            )

    assert len(pyramid) == len(np_levels) == 2
    for (jx, jm), (nx, nm) in zip(pyramid, np_levels):
        np.testing.assert_array_equal(np.asarray(jm)[0], nm)
        np.testing.assert_allclose(np.asarray(jx)[0], nx, atol=2e-4)


def test_backbone_train_vs_eval_consistency(rng):
    """After running train mode repeatedly on ONE batch, eval-mode outputs
    (folded running stats) must converge toward train-mode outputs."""
    D = 8
    bb = SparseBackbone(dims=(4, 8), stride_layers=(0,), kernel_size=3)
    mask = (rng.rand(2, D, D, D) < 0.2).astype(np.float32)
    x = rng.randn(2, D, D, D, 4).astype(np.float32) * mask[..., None]
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask), True)
    params, stats = variables["params"], variables["batch_stats"]
    apply = jax.jit(
        lambda p, s, train: bb.apply(
            {"params": p, "batch_stats": s}, jnp.asarray(x), jnp.asarray(mask),
            train, mutable=["batch_stats"] if train else [],
        )
    )
    for _ in range(200):  # running stats -> batch stats on a fixed batch
        out, mut = bb.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), jnp.asarray(mask), True, mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
    train_out = out[0][0]
    eval_out = bb.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(mask), False,
    )[0][0]
    np.testing.assert_allclose(
        np.asarray(eval_out), np.asarray(train_out), atol=5e-3, rtol=5e-2
    )
