"""AIM attentive-probe pooling.

Semantics of reference poolings/aim.py:337-395 (AttentionPoolingClassifier):
  * input BatchNorm1d(affine=False, eps 1e-6) over the channel dim of the
    token sequence (running stats in eval);
  * one learned query (randn*0.02), K and V linear projections (no bias),
    multi-head attention (--num_heads, default 16 at the graft site,
    main_linprobe.py:479-485), mean over queries.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .batchnorm import TorchBatchNorm
from .common import dense, normal, pooled_mha


class AIMAttentionPooling(nn.Module):
    dim: int
    num_heads: int = 12
    qkv_bias: bool = False
    num_queries: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_attn: bool = False):
        B, N, C = x.shape
        H = self.num_heads
        scale = (C // H) ** -0.5

        # BatchNorm over channels, stats over (batch, tokens)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-6,
            use_bias=False, use_scale=False, dtype=self.dtype, name="bn",
        )(x)

        q = self.param(
            "cls_token", normal(0.02), (1, self.num_queries, C), jnp.float32
        ).astype(self.dtype)
        q = jnp.broadcast_to(q, (B, self.num_queries, C))
        k = dense(C, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(x)
        v = dense(C, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x)

        out, attn = pooled_mha(q, k, v, H, scale)
        out = out.mean(axis=1)
        if return_attn:
            return out, attn
        return out
