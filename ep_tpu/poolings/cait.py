"""CaiT class-attention pooling ("cait").

Semantics of reference poolings/other_pool.py:390-507 (CAPooling):
  * learned cls token (trunc_normal 0.02);
  * one LayerScale_Block_CA iteration: u = [cls; x],
    cls += γ₁·ClassAttention(LN₁(u)); cls += γ₂·Mlp(LN₂(cls));
    γ init 1e-5, block norms eps 1e-6, 4 heads, qkv bias;
  * final LayerNorm (torch default eps 1e-5) over [cls; x]; take token 0.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import dense, pooled_mha, trunc_normal


class _ClassAttention(nn.Module):
    dim: int
    num_heads: int = 4
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        B, T, C = u.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim ** -0.5
        q = dense(C, use_bias=self.qkv_bias, dtype=self.dtype, fan_in=C,
                  name="q")(u[:, :1])
        k = dense(C, use_bias=self.qkv_bias, dtype=self.dtype, fan_in=C,
                  name="k")(u)
        v = dense(C, use_bias=self.qkv_bias, dtype=self.dtype, fan_in=C,
                  name="v")(u)
        out, _ = pooled_mha(q, k, v, H, scale)
        return dense(C, dtype=self.dtype, fan_in=C, name="proj")(out)


class CaiTPooling(nn.Module):
    embed_dim: int
    num_heads: int = 4
    iterations: int = 1
    mlp_ratio: float = 4.0
    init_scale: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, N, D = x.shape
        cls = self.param(
            "cls_token", trunc_normal(0.02), (1, 1, D), jnp.float32
        ).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (B, 1, D))

        for i in range(self.iterations):
            blk = f"blocks_token_only_{i}"
            u = jnp.concatenate([cls, x], axis=1)
            g1 = self.param(f"{blk}_gamma_1",
                            nn.initializers.constant(self.init_scale), (D,),
                            jnp.float32)
            g2 = self.param(f"{blk}_gamma_2",
                            nn.initializers.constant(self.init_scale), (D,),
                            jnp.float32)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"{blk}_norm1")(u)
            cls = cls + g1.astype(cls.dtype) * _ClassAttention(
                D, self.num_heads, dtype=self.dtype, name=f"{blk}_attn")(h)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"{blk}_norm2")(cls)
            m = dense(int(D * self.mlp_ratio), dtype=self.dtype, fan_in=D,
                      name=f"{blk}_mlp_fc1")(h)
            m = nn.gelu(m, approximate=False)
            m = dense(D, dtype=self.dtype, fan_in=int(D * self.mlp_ratio),
                      name=f"{blk}_mlp_fc2")(m)
            cls = cls + g2.astype(cls.dtype) * m

        # reference norms [cls; x] then takes token 0 (other_pool.py:505-507);
        # LayerNorm is per-token, so norming the cls row alone is identical
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(cls)
        return out[:, 0]
