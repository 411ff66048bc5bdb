"""CAE attentive probe ("cae").

Semantics of reference poolings/cae_att.py:19-108 (CAEAttentiveBlock):
  * one learned query token initialized to ZEROS (no trunc_normal);
  * separately-LayerNorm'd query / keys / values (torch-default eps 1e-5);
  * cross-attention with separate q/k/v linears (no bias; qkv_bias defaults
    False at the graft site, main_linprobe.py:543-549), 8 heads, output proj
    (with bias); no residual — the attention output IS the descriptor.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import dense, pooled_mha


class CAEAttentiveBlock(nn.Module):
    dim: int
    num_heads: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_kv: jnp.ndarray, return_attn: bool = False):
        B, N, C = x_kv.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim ** -0.5

        q_tok = self.param(
            "query_token", nn.initializers.zeros, (1, 1, C), jnp.float32
        ).astype(self.dtype)
        q_tok = jnp.broadcast_to(q_tok, (B, 1, C))

        xq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1_q")(q_tok)
        xk = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1_k")(x_kv)
        xv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1_v")(x_kv)

        q = dense(C, use_bias=False, dtype=self.dtype, name="q")(xq)
        k = dense(C, use_bias=False, dtype=self.dtype, name="k")(xk)
        v = dense(C, use_bias=False, dtype=self.dtype, name="v")(xv)
        out, attn = pooled_mha(q, k, v, H, scale)
        out = dense(C, dtype=self.dtype, fan_in=C, name="proj")(out)
        pooled = out[:, 0]
        if return_attn:
            return pooled, attn
        return pooled
