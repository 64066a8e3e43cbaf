"""Checkpoint-converter fidelity: our flax modules must reproduce torch
layers bit-for-bit (up to float tolerance) given converted weights.

Strategy: build torch modules with the reference's exact Sequential layout
and state_dict naming, convert with convert_reference_state_dict, run both
on the same input, compare. Covers Conv1d-1x1 heads (BN after act), Conv3d
1x1 disengagers (BN before act), and the refiner MLPs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dcl_net_tpu.models.blocks import PointMLP  # noqa: E402
from dcl_net_tpu.train.checkpoints import convert_reference_state_dict  # noqa: E402


def _torch_head(dim_in, list_dim, list_act, list_bn):
    """Reference Head_MultiLayerPerceptron layout (models/Modules.py:173-201):
    Conv1d -> act -> [BN]."""
    layers = []
    d = dim_in
    for dim, act, bn in zip(list_dim, list_act, list_bn):
        layers.append(tnn.Conv1d(d, dim, 1))
        if act == "relu":
            layers.append(tnn.ReLU())
        if bn:
            layers.append(tnn.BatchNorm1d(dim))
        d = dim
    return tnn.Sequential(*layers)


class _TorchDisengageBlock(tnn.Module):
    """Reference BasicBlock_3DCONV: Conv3d(1x1, bias=False) -> BN3d -> ReLU."""

    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.layers = tnn.Sequential(
            tnn.Conv3d(dim_in, dim_out, 1, 1, 0, bias=False),
            tnn.BatchNorm3d(dim_out),
            tnn.ReLU(),
        )

    def forward(self, x):
        return self.layers(x)


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm3d)):
            m.running_mean.copy_(torch.tensor(rng.randn(m.num_features) * 0.1))
            m.running_var.copy_(torch.tensor(rng.rand(m.num_features) + 0.5))
            m.weight.data.copy_(torch.tensor(rng.randn(m.num_features) * 0.2 + 1))
            m.bias.data.copy_(torch.tensor(rng.randn(m.num_features) * 0.1))


def test_head_mlp_with_bn_matches_torch(rng):
    """neck_fuser layout: 512->512->512->1024, relu x3, BN x3 (after act)."""
    torch.manual_seed(0)
    head = _torch_head(512, [512, 512, 1024], ["relu"] * 3, [True] * 3)
    with torch.no_grad():
        _randomize_bn(head, rng)
    head.eval()

    sd = {"neck_fuser.layers." + k: v.numpy() for k, v in head.state_dict().items()}
    converted = convert_reference_state_dict(sd)

    ours = PointMLP(dims=(512, 512, 1024), acts=("relu",) * 3, bns=(True,) * 3,
                    use_bias=True, name="neck_fuser")
    x = rng.randn(2, 100, 512).astype(np.float32)
    out = ours.apply(
        {"params": converted["params"]["neck_fuser"],
         "batch_stats": converted["batch_stats"]["neck_fuser"]},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        ref = head(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_head_mlp_no_bn_matches_torch(rng):
    """regressor_rot layout: 1024->512->128->9, relu relu none, no BN."""
    torch.manual_seed(1)
    head = _torch_head(1024, [512, 128, 9], ["relu", "relu", "none"], [False] * 3)
    head.eval()
    sd = {"regressor_rot.layers." + k: v.numpy() for k, v in head.state_dict().items()}
    converted = convert_reference_state_dict(sd)
    ours = PointMLP(dims=(512, 128, 9), acts=("relu", "relu", "none"),
                    bns=(False,) * 3, use_bias=True, name="regressor_rot")
    x = rng.randn(2, 1, 1024).astype(np.float32)
    out = ours.apply(
        {"params": converted["params"]["regressor_rot"]},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        ref = head(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_disengager_matches_torch(rng):
    """Disengage head: 2 x (Conv3d 1x1 no-bias -> BN3d -> ReLU), 480->256->64."""
    torch.manual_seed(2)
    blk = tnn.Sequential(
        _TorchDisengageBlock(480, 256), _TorchDisengageBlock(256, 64)
    )
    with torch.no_grad():
        _randomize_bn(blk, rng)
    blk.eval()
    sd = {"disengage_Xc_m1." + k: v.numpy() for k, v in blk.state_dict().items()}
    converted = convert_reference_state_dict(sd)

    ours = PointMLP(dims=(256, 64), acts=("relu", "relu"), bns=(True, True),
                    bn_before_act=True, use_bias=False, name="disengage_Xc_m1")
    x = rng.randn(2, 50, 480).astype(np.float32)
    out = ours.apply(
        {"params": converted["params"]["disengage_Xc_m1"],
         "batch_stats": converted["batch_stats"]["disengage_Xc_m1"]},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        # reference shape: [B, C, N, 1, 1]
        xt = torch.tensor(x).permute(0, 2, 1)[:, :, :, None, None]
        ref = blk(xt).squeeze(-1).squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_backbone_conv_weight_layout(rng):
    """spconv stores kernels as [kz,ky,kx,Cin,Cout] (libs/spconv/spconv/
    conv.py:98-99) — the converter must pass them through unchanged and map
    BN params to the flat SparseConvBlock names."""
    w = rng.randn(3, 3, 3, 7, 16).astype(np.float32)
    sd = {
        "backbone_inp.module1.0.layers.0.weight": w,
        "backbone_inp.module1.0.layers.1.weight": np.ones(16, np.float32),
        "backbone_inp.module1.0.layers.1.bias": np.zeros(16, np.float32),
        "backbone_inp.module1.0.layers.1.running_mean": np.zeros(16, np.float32),
        "backbone_inp.module1.0.layers.1.running_var": np.ones(16, np.float32),
        "backbone_inp.module1.0.layers.1.num_batches_tracked": np.int64(5),
        "backbone_inp.module2.1.layers.0.weight": rng.randn(3, 3, 3, 32, 64).astype(np.float32),
    }
    converted = convert_reference_state_dict(sd)
    p = converted["params"]["backbone_inp"]
    np.testing.assert_array_equal(np.asarray(p["conv0"]["kernel"]), w)
    assert "scale" in p["conv0"] and "bias" in p["conv0"]
    assert np.asarray(converted["batch_stats"]["backbone_inp"]["conv0"]["var"]).shape == (16,)
    # module2 block 1 -> conv index 3
    assert np.asarray(p["conv3"]["kernel"]).shape == (3, 3, 3, 32, 64)


def test_refiner_heads_match_torch(rng):
    torch.manual_seed(3)
    mlp = _torch_head(259, [512, 512, 1024], ["relu"] * 3, [False] * 3)
    mlp.eval()
    sd = {"MLP_share.layers." + k: v.numpy() for k, v in mlp.state_dict().items()}
    converted = convert_reference_state_dict(sd)
    ours = PointMLP(dims=(512, 512, 1024), acts=("relu",) * 3, bns=(False,) * 3,
                    use_bias=True, name="MLP_share")
    x = rng.randn(1, 64, 259).astype(np.float32)
    out = ours.apply({"params": converted["params"]["MLP_share"]}, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = mlp(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
