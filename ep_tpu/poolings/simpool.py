"""SimPool / eSimPool attentive pooling.

Semantics of reference poolings/simpool.py:5-171:
  * SimPool: GAP-initialized query, LayerNorm'd keys AND values, learned
    q/k projections, 1-head cross-attention (γ-power pooling unused in the
    benchmark — gamma=None at the graft site, main_linprobe.py:429-444).
  * SimPool_nolinears ("esimpool"): no q/k projections, LayerNorm'd query and
    keys, RAW values, 12 heads.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import dense, pooled_mha


class SimPool(nn.Module):
    dim: int
    num_heads: int = 1
    qkv_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, N, d = x.shape
        H = self.num_heads
        scale = (d // H) ** -0.5

        gap = x.mean(axis=-2, keepdims=True)  # (B, 1, d)
        ln = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_patches")
        xn = ln(x)
        q = dense(d, use_bias=self.qkv_bias, dtype=self.dtype, name="wq")(gap)
        k = dense(d, use_bias=self.qkv_bias, dtype=self.dtype, name="wk")(xn)
        v = xn

        out, attn = pooled_mha(q, k, v, H, scale, scale_after=True)
        out = out[:, 0]
        if return_attn:
            return out, attn
        return out


class SimPoolNoLinears(nn.Module):
    dim: int
    num_heads: int = 12
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, N, d = x.shape
        H = self.num_heads
        scale = (d // H) ** -0.5

        gap = x.mean(axis=-2, keepdims=True)
        ln = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_patches")
        q, k, v = ln(gap), ln(x), x

        out, attn = pooled_mha(q, k, v, H, scale, scale_after=True)
        out = out[:, 0]
        if return_attn:
            return out, attn
        return out
