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
import jax
import jax.numpy as jnp

from .common import dense


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

        q = q.reshape(B, 1, H, d // H).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, d // H).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, d // H).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqc,bhkc->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkc->bhqc", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, d)[:, 0]
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

        q = q.reshape(B, 1, H, d // H).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, d // H).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, d // H).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqc,bhkc->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkc->bhqc", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, d)[:, 0]
        if return_attn:
            return out, attn
        return out
