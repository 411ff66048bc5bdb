"""CLIP-style AttentionPool2d and SigLIP-style latent attention pooling.

CLIPAttentionPool2d — reference poolings/clip/attention_pool2d.py:100-169:
  * LayerNorm(eps 1e-6) on tokens, mean token prepended, learned absolute
    pos-embed (N+1, D) with trunc_normal(std D^-0.5);
  * fused QKV (bias, trunc_normal(std D^-0.5) weights, zero bias), 4 heads,
    output projection; pooled descriptor = token 0.
  * NOTE: feat_size is fixed at construction (14, or 16 for CAPI;
    main_linprobe.py:458-471), exactly like the reference.

SigLIPAttentionPool — reference poolings/clip/attention_pool.py:13-132
(AttentionPoolLatent):
  * learned latent query (1,1,D) trunc_normal(std D^-0.5), q and fused-kv
    projections (bias), 8 heads, proj, then a residual MLP (ratio 4, no
    pre-norm: the default norm_layer is None ⇒ Identity); token 0.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import dense, pooled_mha, trunc_normal


class _QKVParams(nn.Module):
    """Declare the fused qkv Dense's param tree (same names/inits) without
    running the full (B,N,3D) projection — only token 0's output row is
    ever consumed through the q path (see CLIPAttentionPool2d)."""

    dim: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        w = self.param("kernel", trunc_normal(self.dim ** -0.5),
                       (self.dim, 3 * self.dim), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (3 * self.dim,),
                       jnp.float32) if self.use_bias else None
        return w, b


class CLIPAttentionPool2d(nn.Module):
    in_features: int
    feat_size: int = 14
    num_heads: int = 4
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, N, d = x.shape
        D = self.in_features
        H = self.num_heads
        head_dim = D // H
        scale = head_dim ** -0.5
        spatial = self.feat_size * self.feat_size

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)

        pos = self.param(
            "pos_embed", trunc_normal(D ** -0.5), (spatial + 1, D), jnp.float32
        )
        x = x + pos[None].astype(x.dtype)

        # The pool is full (N+1)-token self-attention of which ONLY token
        # 0's output is consumed (reference attention_pool2d.py:161-168
        # computes all rows then takes [..., 0, :]; return_attn also reads
        # only query row 0). Token-0 attention is independent of the other
        # query rows, so: project k/v for every token but q for token 0
        # alone (column-sliced matmuls on the SAME fused qkv weight —
        # _QKVParams declares the identical "qkv" tree), then a
        # single-query pooled_mha, then the output projection on that one
        # row. Values and head-param gradients are exactly those of the
        # full computation (discarded rows carry zero cotangent).
        w, b = _QKVParams(D, self.qkv_bias, name="qkv")()
        w = w.astype(x.dtype)
        kv = x @ w[:, D:]
        q0 = x[:, :1] @ w[:, :D]
        if b is not None:
            b = b.astype(x.dtype)
            kv = kv + b[D:]
            q0 = q0 + b[:D]
        k, v = kv[:, :, :D], kv[:, :, D:]
        out, attn = pooled_mha(q0, k, v, H, scale, scale_after=True)
        out = dense(D, dtype=self.dtype, fan_in=D, name="proj")(out)
        if return_attn:
            return out[:, 0], attn[:, :, 0, 1:]
        return out[:, 0]


class SigLIPAttentionPool(nn.Module):
    in_features: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    latent_len: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim ** -0.5
        L = self.latent_len

        latent = self.param(
            "latent", trunc_normal(C ** -0.5), (1, L, C), jnp.float32
        ).astype(self.dtype)
        q = dense(C, use_bias=self.qkv_bias, dtype=self.dtype, fan_in=C,
                  name="q")(jnp.broadcast_to(latent, (B, L, C)))
        kv = dense(2 * C, use_bias=self.qkv_bias, dtype=self.dtype, fan_in=C,
                   name="kv")(x)
        # fused kv (B, N, 2C) splits to k/v WITHOUT the head transpose
        k, v = kv[:, :, :C], kv[:, :, C:]
        out, attn = pooled_mha(q, k, v, H, scale)
        out = dense(C, dtype=self.dtype, fan_in=C, name="proj")(out)

        # residual MLP without pre-norm (norm_layer default None ⇒ Identity)
        h = dense(int(C * self.mlp_ratio), dtype=self.dtype, fan_in=C,
                  name="mlp_fc1")(out)
        h = nn.gelu(h, approximate=False)
        h = dense(C, dtype=self.dtype, fan_in=int(C * self.mlp_ratio),
                  name="mlp_fc2")(h)
        out = out + h
        out = out[:, 0]
        if return_attn:
            return out, attn
        return out
