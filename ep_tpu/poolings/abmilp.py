"""ABMILP — gated attention-MIL pooling head.

Semantics of reference poolings/abmilp.py:11-75:
  * optional 1-head transformer self-attention pre-pass (the reference reuses
    its instrumented models_vit.Attention with qkv fused, no bias, + proj);
  * an MLP attention predictor (depth-1 × [Linear D→D, act] + Linear D→1),
    softmax over tokens;
  * weighted sum of either the self-attended tokens ("both") or the raw
    tokens ("none"/"map");
  * optional fixed 2-D sin-cos positional conditioning of the predictor.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ep_tpu.ops.attention import mha
from ep_tpu.utils.pos_embed import get_2d_sincos_pos_embed
from .common import dense


class _SelfAttention1Head(nn.Module):
    """models_vit.Attention with num_heads=1, qkv_bias=False."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        qkv = dense(3 * D, use_bias=False, dtype=self.dtype, name="qkv")(x)
        # single head: the q/k/v split is a channel slice and the "head"
        # axis an expand_dims — both zero-copy, where the generic
        # (B,N,3,H,Dh) reshape+transpose materializes two full-tensor
        # relayouts (the natural-layout lesson, PERFORMANCE.md)
        q = qkv[:, None, :, :D]
        k = qkv[:, None, :, D:2 * D]
        v = qkv[:, None, :, 2 * D:]
        out = mha(q, k, v, D ** -0.5)[:, 0]
        return dense(D, dtype=self.dtype, name="proj")(out)


class ABMILPHead(nn.Module):
    dim: int
    self_attention_apply_to: str = "both"  # none | map | both
    activation: str = "tanh"
    depth: int = 2
    cond: Optional[str] = None  # None | "pe"
    content: str = "all"  # all | patch
    num_patches: Optional[int] = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        if self.content == "patch":
            x = x[:, 1:]

        if self.self_attention_apply_to != "none":
            x_attn = _SelfAttention1Head(self.dim, self.dtype, name="self_attn")(x)
        else:
            x_attn = x

        pred_in = x_attn if self.self_attention_apply_to in ("map", "both") else x
        if self.cond == "pe":
            pe = get_2d_sincos_pos_embed(
                self.dim, int(self.num_patches ** 0.5),
                cls_token=(self.content != "patch"),
            )[None]
            pred_in = pred_in + jnp.asarray(pe, pred_in.dtype)

        h = pred_in
        for i in range(self.depth - 1):
            h = dense(self.dim, dtype=self.dtype, fan_in=self.dim,
                      name=f"attention_predictor_{2 * i}")(h)
            h = jnp.tanh(h) if self.activation == "tanh" else nn.relu(h)
        h = dense(1, dtype=self.dtype, fan_in=self.dim,
                  name=f"attention_predictor_{2 * (self.depth - 1)}")(h)
        attn_map = jax.nn.softmax(h.astype(jnp.float32), axis=1).astype(x.dtype)

        x_out = x_attn if self.self_attention_apply_to == "both" else x
        out = (x_out * attn_map).sum(axis=1)
        if return_attn:
            return out, attn_map
        return out
