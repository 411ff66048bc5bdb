"""CBAM pooling ("cbam").

Semantics of reference poolings/cbam.py:19-132 (CbamPooling):
  * tokens reshaped to a square (H, W, C) grid;
  * channel attention: shared 1×1-conv MLP (C → C/16 → C, no bias, ReLU)
    applied to both the spatial mean and max, sigmoid gate × features;
  * spatial attention: concat(channel-mean, channel-max) → 7×7 conv (2→1, no
    bias) + BatchNorm2d → sigmoid gate × features;
  * residual add, ReLU, global average pool → (B, C).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .batchnorm import TorchBatchNorm
from .common import tokens_to_grid


def _make_divisible(v: float, divisor: int = 1) -> int:
    return max(1, int(v + divisor / 2) // divisor * divisor)


class CbamPooling(nn.Module):
    channels: int
    rd_ratio: float = 1.0 / 16
    spatial_kernel_size: int = 7
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_attn: bool = False):
        C = self.channels
        rd = _make_divisible(C * self.rd_ratio)
        g = tokens_to_grid(x)  # (B, H, W, C)
        residual = g

        # --- channel attention (ChannelAttn, cbam.py:19-36) -----------------
        fc1 = nn.Conv(rd, (1, 1), use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")
        x_avg = fc2(nn.relu(fc1(g.mean(axis=(1, 2), keepdims=True))))
        x_max = fc2(nn.relu(fc1(g.max(axis=(1, 2), keepdims=True))))
        g = g * jax.nn.sigmoid(x_avg + x_max)

        # --- spatial attention (SpatialAttn, cbam.py:55-67) -----------------
        sp = jnp.concatenate(
            [g.mean(axis=-1, keepdims=True), g.max(axis=-1, keepdims=True)],
            axis=-1,
        )
        k = self.spatial_kernel_size
        sp = nn.Conv(1, (k, k), padding="SAME", use_bias=False,
                     dtype=self.dtype, name="spatial_conv")(sp)
        sp = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            name="spatial_bn")(sp)
        gate = jax.nn.sigmoid(sp)
        g = g * gate

        g = nn.relu(g + residual)
        pooled = g.mean(axis=(1, 2))
        if return_attn:
            return pooled, gate
        return pooled
