"""I-JEPA attentive pooler ("jepa").

Semantics of reference poolings/jepa/attentive_pooler.py:21-105 +
poolings/jepa/modules.py:123-183:
  * one learned query token (trunc_normal 0.02);
  * a CrossAttentionBlock: q += xattn(q, LN₁(x)); q += MLP(LN₂(q));
    xattn has a q projection, a fused kv projection (bias=qkv_bias=True),
    multi-head (--num_heads, default 16 at the graft site), output proj;
  * depth-scaled init: xattn.proj and mlp.fc2 weights divided by √2;
    all Linears trunc_normal(0.02), zero bias; LN torch-default eps 1e-5.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import pooled_mha, trunc_normal


def _rescaled_trunc_normal(std: float, scale: float):
    base = nn.initializers.truncated_normal(stddev=std)

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) / scale

    return init


class JEPAAttentivePooler(nn.Module):
    embed_dim: int
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_queries: int = 1
    qkv_bias: bool = True
    init_std: float = 0.02
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim ** -0.5
        Qn = self.num_queries
        tn = trunc_normal(self.init_std)
        sqrt2 = 2.0 ** 0.5

        q_tokens = self.param(
            "query_tokens", tn, (1, Qn, C), jnp.float32
        ).astype(self.dtype)
        q_in = jnp.broadcast_to(q_tokens, (B, Qn, C))

        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        q = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=tn, name="xattn_q")(q_in)
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                      kernel_init=tn, name="xattn_kv")(xn)
        # fused kv (B, N, 2C) splits to k/v WITHOUT the head transpose: the
        # reshape (B,N,2,H,dh) puts the k/v split at the leading stride
        k, v = kv[:, :, :C], kv[:, :, C:]
        y, attn = pooled_mha(q, k, v, H, scale, scale_after=True)
        y = nn.Dense(C, dtype=self.dtype,
                     kernel_init=_rescaled_trunc_normal(self.init_std, sqrt2),
                     name="xattn_proj")(y)
        q_out = q_in + y

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(q_out)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     kernel_init=tn, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype,
                     kernel_init=_rescaled_trunc_normal(self.init_std, sqrt2),
                     name="mlp_fc2")(h)
        q_out = q_out + h

        pooled = q_out[:, 0] if Qn == 1 else q_out.squeeze(1)
        if return_attn:
            return pooled, attn
        return pooled
