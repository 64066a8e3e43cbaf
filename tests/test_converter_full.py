"""Converter completeness: a synthetic reference state_dict covering EVERY
parameter of the real DCL-Net checkpoint must convert into a tree that is
structurally identical (same paths, same shapes) to our model's init tree.

This is the guarantee that a released .pth checkpoint drops into the eval
tools without key mismatches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcl_net_tpu.models import DCLNet, Refiner
from dcl_net_tpu.train.checkpoints import convert_reference_state_dict

# Reference architecture constants (models/DCL_Net.py:47-50, Modules.py:115-150)
BACKBONE_DIMS = [7, 16, 32, 32, 64, 64, 128, 128, 256]
STRIDE_LAYERS = [1, 3, 5]
HEADS = {
    # name: (dim_in, layer_dims, with_bn)
    "regressor_Xo": (256, [256, 128, 3], False),
    "regressor_Yc": (256, [256, 128, 3], False),
    "regressor_conf": (128, [128, 128, 1], False),
    "regressor_conf_bi": (128, [128, 128, 1], False),
    "neck_fuser": (512, [512, 512, 1024], True),
    "neck_fuser_bi": (512, [512, 512, 1024], True),
    "regressor_rot": (1024, [512, 128, 9], False),
    "regressor_trans": (1024, [512, 128, 3], False),
}
DISENGAGERS = [
    "disengage_Xc_p1", "disengage_Xc_m1", "disengage_Xc_p2", "disengage_Xc_m2",
    "disengage_Yo_p1", "disengage_Yo_m1", "disengage_Yo_p2", "disengage_Yo_m2",
]


def _fake_reference_state_dict(rng):
    sd = {}

    def bn1d(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.int64(100)

    # backbone: 4 modules x 2 blocks, spconv kernels [k,k,k,cin,cout]
    for branch in ("inp", "tmp"):
        for i in range(8):
            module = i // 2 + 1
            blk = i % 2
            cin, cout = BACKBONE_DIMS[i], BACKBONE_DIMS[i + 1]
            base = f"backbone_{branch}.module{module}.{blk}.layers"
            sd[f"{base}.0.weight"] = rng.randn(3, 3, 3, cin, cout).astype(np.float32)
            bn1d(f"{base}.1", cout)

    # disengagers: 2 blocks (Conv3d 1x1 no bias + BN3d)
    for name in DISENGAGERS:
        out0 = 256
        out1 = 64 if name.endswith(("m1", "m2")) else 256
        for blk, (cin, cout) in enumerate([(480, out0), (out0, out1)]):
            base = f"{name}.{blk}.layers"
            sd[f"{base}.0.weight"] = rng.randn(cout, cin, 1, 1, 1).astype(np.float32)
            bn1d(f"{base}.1", cout)

    # heads: Conv1d (with bias) interleaved with act / optional BN
    for name, (dim_in, dims, with_bn) in HEADS.items():
        seq = 0
        cin = dim_in
        for li, cout in enumerate(dims):
            sd[f"{name}.layers.{seq}.weight"] = rng.randn(cout, cin, 1).astype(np.float32)
            sd[f"{name}.layers.{seq}.bias"] = rng.randn(cout).astype(np.float32)
            seq += 1
            last = li == len(dims) - 1
            has_act = with_bn or not last  # "none" act on last layer of no-bn heads
            if has_act:
                seq += 1  # ReLU holds no params
            if with_bn:
                bn1d(f"{name}.layers.{seq}", cout)
                seq += 1
            cin = cout
    return sd


def _tree_spec(tree):
    return {
        "/".join(str(k.key) for k in path): tuple(np.shape(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_full_checkpoint_converts_to_exact_model_tree(rng):
    sd = _fake_reference_state_dict(rng)
    converted = convert_reference_state_dict(sd)

    model = DCLNet()  # full-size 64^3 / 1024-pt configuration
    batch = {
        "inp": {"feats": jnp.zeros((1, 1024, 7)),
                "voxel_idx": jnp.zeros((1, 1024, 3), jnp.int32)},
        "tmp": {"feats": jnp.zeros((1, 1024, 7)),
                "voxel_idx": jnp.zeros((1, 1024, 3), jnp.int32)},
    }
    variables = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=True), batch
    )

    expect_params = _tree_spec(variables["params"])
    got_params = _tree_spec(converted["params"])
    assert got_params == expect_params, (
        set(expect_params) ^ set(got_params),
        {k: (expect_params.get(k), got_params.get(k))
         for k in expect_params if expect_params.get(k) != got_params.get(k)},
    )

    expect_stats = _tree_spec(variables["batch_stats"])
    got_stats = _tree_spec(converted["batch_stats"])
    assert got_stats == expect_stats


def test_full_refiner_checkpoint_converts(rng):
    sd = {}
    for name, dim_in, dims in [
        ("MLP_share", 259, [512, 512, 1024]),
        ("regressor_rot2", 1024, [512, 128, 9]),
        ("regressor_trans2", 1024, [512, 128, 3]),
    ]:
        seq = 0
        cin = dim_in
        for li, cout in enumerate(dims):
            sd[f"{name}.layers.{seq}.weight"] = rng.randn(cout, cin, 1).astype(np.float32)
            sd[f"{name}.layers.{seq}.bias"] = rng.randn(cout).astype(np.float32)
            seq += 2 if (name == "MLP_share" or li < len(dims) - 1) else 1
            cin = cout
    converted = convert_reference_state_dict(sd)

    refiner = Refiner(n_inp=1024)
    variables = jax.eval_shape(
        lambda: refiner.init(
            jax.random.PRNGKey(0),
            {"input_features": jnp.zeros((1, 1024, 259)),
             "conf": jnp.zeros((1, 2048))},
        )
    )
    assert _tree_spec(converted["params"]) == _tree_spec(variables["params"])
