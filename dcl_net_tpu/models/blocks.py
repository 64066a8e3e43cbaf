"""NN building blocks: masked sparse-conv blocks and per-point MLPs (flax).

TPU-native re-design of the reference blocks:
- BasicBlock_SPCONV (reference models/Modules.py:12-57): SparseConv3d /
  SubMConv3d + BatchNorm1d + act -> here a masked dense conv (see
  dcl_net_tpu/ops/sparse_conv.py for the semantics argument) + masked BN.
- BasicBlock_3DCONV (reference models/Modules.py:58-97): 1x1 Conv3d + BN3d +
  act over per-point features -> here a Dense + BatchNorm over [B, N, C].
- Head_MultiLayerPerceptron (reference models/Modules.py:173-201): Conv1d
  stacks -> Dense stacks.

All blocks are channel-last ([B, ..., C]) which is XLA's preferred layout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcl_net_tpu.ops.sparse_conv import (
    dilate_mask,
    masked_batch_norm_stats,
)

_ACTS = {
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "tanh": nn.tanh,
    "none": lambda x: x,
}


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose statistics run over occupied voxels only.

    Reproduces torch BatchNorm1d over sparse [M, C] feature rows (reference
    models/Modules.py:37): mean/var over the occupied voxels of the whole
    batch. torch semantics preserved: biased variance for normalization,
    unbiased for the running-stat update, momentum 0.1, eps 1e-5.
    """

    momentum: float = 0.9  # running = momentum*running + (1-momentum)*batch
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if train:
            mean, var = masked_batch_norm_stats(x.astype(jnp.float32), mask)
            if not self.is_initializing():
                m_count = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 2.0)
                unbiased = var * m_count / (m_count - 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class SparseConvBlock(nn.Module):
    """Sparse conv + masked BN + activation on a dense masked grid.

    subm=True: submanifold conv (active set unchanged).
    subm=False: regular sparse conv, stride 1, pad k//2 (active set dilates).
    Matches BasicBlock_SPCONV (reference models/Modules.py:12-57) with the
    reference backbone's fixed choices: stride 1, padding k//2, bias False
    (reference models/Modules.py:132-141).

    The block owns its conv kernel and BN parameters directly so that in eval
    mode the BN running stats FOLD into the conv weights (w' = w * s,
    b' = beta - mean * s with s = scale/sqrt(var+eps)) — one conv + relu +
    mask, zero extra elementwise passes over the 64^3 grids.

    Input invariant: x is zero at inactive voxels (maintained by the
    post-activation mask multiply of the previous block / the voxelizer).
    """

    features: int
    kernel_size: int = 3
    subm: bool = True
    use_bias: bool = False
    norm: bool = True
    act: str = "relu"
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, train: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.kernel_size
        cin, cout = x.shape[-1], self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, k, cin, cout)
        )
        if self.norm:
            scale = self.param("scale", nn.initializers.ones, (cout,))
            bias = self.param("bias", nn.initializers.zeros, (cout,))
            ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((cout,)))
            ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((cout,)))

        new_mask = mask if self.subm else dilate_mask(mask, k)
        dt = self.dtype or x.dtype

        def conv(inp, w, stride=1):
            return jax.lax.conv_general_dilated(
                inp.astype(dt), w.astype(dt), (stride,) * 3,
                [(k // 2, k // 2)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        if self.norm and not train:
            # eval: fold running stats into the kernel -> single conv
            s = scale / jnp.sqrt(ra_var.value + self.epsilon)
            w_eff = kernel * s  # broadcast over last (cout) axis
            b_eff = bias - ra_mean.value * s
            x = conv(x, w_eff) + b_eff.astype(dt)
        else:
            x = conv(x, kernel)
            if self.norm:
                xf = x.astype(jnp.float32) * new_mask[..., None]
                mean, var = masked_batch_norm_stats(xf, new_mask)
                if not self.is_initializing():
                    m_count = jnp.maximum(jnp.sum(new_mask.astype(jnp.float32)), 2.0)
                    unbiased = var * m_count / (m_count - 1.0)
                    ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                    ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                x = ((x - mean) / jnp.sqrt(var + self.epsilon) * scale + bias).astype(dt)
        x = _ACTS[self.act](x)
        # BN bias/act shift padded voxels off zero; re-zero them so the next
        # conv sees true sparse semantics.
        x = x * new_mask[..., None].astype(x.dtype)
        return x, new_mask


class PointMLP(nn.Module):
    """Per-point MLP: Dense (+ optional BN over (batch, points)) + activation.

    Covers both Head_MultiLayerPerceptron (reference models/Modules.py:173-201,
    Conv1d-1x1 stacks with optional BN1d; BN AFTER activation, note the
    reference appends act then bn) and BasicBlock_3DCONV 1x1 stacks
    (reference models/Modules.py:58-97; there BN comes BEFORE activation).

    Args mirror the reference's list-based spec.
    """

    dims: Sequence[int]                 # output dims per layer
    acts: Sequence[str]                 # per layer
    bns: Sequence[bool]                 # per layer
    bn_before_act: bool = False         # True for BasicBlock_3DCONV ordering
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i, (dim, act, bn) in enumerate(zip(self.dims, self.acts, self.bns)):
            x = nn.Dense(dim, use_bias=self.use_bias, dtype=self.dtype)(x)
            if self.bn_before_act:
                if bn:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=self.dtype,
                    )(x)
                x = _ACTS[act](x)
            else:
                x = _ACTS[act](x)
                if bn:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=self.dtype,
                    )(x)
        return x
