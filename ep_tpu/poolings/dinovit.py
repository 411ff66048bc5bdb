"""DINOv2-block pooling ("dinovit").

Semantics of reference poolings/other_pool.py:299-318 + dinov2_layers/block.py:
one full pre-norm transformer block (8 heads, qkv WITHOUT bias, proj with
bias, no LayerScale, torch-default LN eps 1e-5, GELU MLP ratio 4) applied to
the tokens, then mean-pool over tokens.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ep_tpu.ops.attention import mha
from .common import dense


class DinoViTBlockPooling(nn.Module):
    d_model: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        qkv = dense(3 * C, use_bias=False, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, H, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        y = mha(q, k, v, head_dim ** -0.5, return_probs=return_attn)
        attn = None
        if return_attn:
            y, attn = y
        y = y.transpose(0, 2, 1, 3).reshape(B, N, C)
        y = dense(C, dtype=self.dtype, fan_in=C, name="proj")(y)
        x = x + y

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        m = dense(int(C * self.mlp_ratio), dtype=self.dtype, fan_in=C,
                  name="mlp_fc1")(h)
        m = nn.gelu(m, approximate=False)
        m = dense(C, dtype=self.dtype, fan_in=int(C * self.mlp_ratio),
                  name="mlp_fc2")(m)
        x = x + m

        pooled = x.mean(axis=1)
        if return_attn:
            return pooled, attn
        return pooled
