"""CoCa-style multi-query cross-attention pooling.

Semantics of reference poolings/coca_pytorch.py:249-343 (CrossAttention used
as a pooling head, main_linprobe.py:504-510):
  * 196 learned image queries (plain randn, std 1), pre-LayerNorm on queries
    only (context norm is Identity);
  * q projection D→heads*64 (8 heads, head dim 64, no bias), fused kv
    projection D→2*64 — multi-query attention: a SINGLE shared k/v head;
  * softmax stabilized by subtracting the row max;
  * output projection back to D (no bias); pooled descriptor = query 0.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import dense, normal


class CoCaCrossAttnPooling(nn.Module):
    dim: int
    dim_head: int = 64
    num_img_queries: int = 196
    heads: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, context: jnp.ndarray, return_attn: bool = False):
        B, N, D = context.shape
        H, Dh = self.heads, self.dim_head
        inner = H * Dh
        scale = Dh ** -0.5

        queries = self.param(
            "img_queries", normal(1.0), (self.num_img_queries, self.dim),
            jnp.float32,
        ).astype(self.dtype)
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        to_q = dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        kv = dense(2 * Dh, use_bias=False, dtype=self.dtype, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)  # (B, N, Dh) each — single shared head

        if not return_attn:
            # only query 0 is ever consumed (reference
            # coca_pytorch.py:339-343 projects ALL 196 queries then takes
            # [:, 0]); queries don't interact (pure cross-attention), so
            # computing just query 0 is value- AND gradient-identical —
            # the other rows' outputs carry zero cotangent either way.
            # Full-path grads/params unchanged (LN/to_q see row 0 only,
            # whose contribution is the only nonzero one).
            x0 = jnp.broadcast_to(queries[None, :1], (B, 1, queries.shape[1]))
            q = to_q(norm(x0)).reshape(B, H, Dh)
            sim = jnp.einsum("bhd,bnd->bhn", q * scale, k,
                             preferred_element_type=jnp.float32)
            sim = sim - sim.max(axis=-1, keepdims=True)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhn,bnd->bhd", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32
                             ).astype(v.dtype)
            out = out.reshape(B, 1, inner)
            out = dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)
            return out[:, 0]

        x = jnp.broadcast_to(queries[None], (B,) + queries.shape)
        x = norm(x)
        q = to_q(x)
        q = q.reshape(B, self.num_img_queries, H, Dh).transpose(0, 2, 1, 3)
        sim = jnp.einsum(
            "bhid,bjd->bhij", q * scale, k, preferred_element_type=jnp.float32
        )
        sim = sim - sim.max(axis=-1, keepdims=True)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum(
            "bhij,bjd->bhid", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, self.num_img_queries, inner)
        out = dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)
        return out[:, 0], attn
