"""Shared initializers/util for the pooling zoo.

The heads are trained from scratch, so initialization distributions matter
for parity with the reference's torch defaults:
  * torch ``nn.Linear`` default: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in) for the
    weight, U(±1/√fan_in) for the bias.
  * timm ``trunc_normal_(std)``: normal truncated at ±2σ.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

# U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch Linear default weight init.
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense(features: int, use_bias: bool = True, name: str = None,
          dtype=jnp.bfloat16, fan_in: int = None,
          kernel_init=None, bias_init=None) -> nn.Dense:
    """Dense with torch-Linear default initialization."""
    return nn.Dense(
        features, use_bias=use_bias, dtype=dtype, name=name,
        kernel_init=kernel_init or torch_linear_init,
        bias_init=bias_init or (torch_bias_init(fan_in) if fan_in else nn.initializers.zeros),
    )


def trunc_normal(std: float):
    return nn.initializers.truncated_normal(stddev=std)


def normal(std: float):
    return nn.initializers.normal(stddev=std)


def pooled_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               num_heads: int, scale: float, scale_after: bool = False):
    """Multi-head cross-attention for a FEW query tokens, MXU-shaped.

    q (B, Qn, C); k, v (B, N, C) — all PRE-head-split, natural layout.
    Returns (out (B, Qn, C), attn (B, H, Qn, N)).

    The classic head-split formulation (reshape + transpose + two
    ``bhqk``-style einsums) maps b AND h onto both operands, so XLA lowers
    each (1,N)@(N,dh) to a single-ROW matvec — B*H of them at 1/128 MXU
    row utilization — and pays two full-tensor (B,N,C) transposes for k/v.
    Measured on the cached aim head step: 8.4 ms -> 6.0 ms at bs512/ViT-B
    after this rewrite (the remainder is BatchNorm passes and the two
    119 GF k/v projections; PERFORMANCE.md). Instead, express the head
    slicing
    with block-diagonal masks so everything is one batched matmul over the
    full channel dim:

      * logits[b,(i,h),n] = (q[b,i] ⊙ head_mask[h]) · k[b,n] — zero-padded
        per-head query rows; exact, since f32 accumulation of zeros adds
        nothing;
      * out[b,i,h-slice] = (attn @ v)[b,(i,h), h-slice] — one batched
        matmul + mask-reduce; every kept element equals exactly one
        element of the full product.

    ``scale_after`` multiplies the f32 logits instead of q (matches heads
    that scale after the dot — jepa, simpool)."""
    import numpy as np

    B, Qn, C = q.shape
    N = k.shape[1]
    H = num_heads
    dh = C // H
    m = np.zeros((H, C), dtype=np.float32)
    for h in range(H):
        m[h, h * dh:(h + 1) * dh] = 1.0
    mask = jnp.asarray(m, q.dtype)

    if not scale_after:
        q = q * scale
    qh = (q[:, :, None, :] * mask[None, None]).reshape(B, Qn * H, C)
    logits = jnp.einsum("brc,bnc->brn", qh, k,
                        preferred_element_type=jnp.float32)
    if scale_after:
        logits = logits * scale
    attn = jax.nn.softmax(logits, axis=-1)  # (B, Qn*H, N)
    full = jnp.einsum("brn,bnc->brc", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)  # (B, Qn*H, C)
    out = ((full.reshape(B, Qn, H, C) * mask[None, None])
           .sum(axis=2).astype(v.dtype))  # (B, Qn, C)
    attn4 = attn.reshape(B, Qn, H, N).transpose(0, 2, 1, 3)
    return out, attn4


def tokens_to_grid(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) tokens -> (B, H, W, C) square grid (NHWC)."""
    B, N, C = x.shape
    hw = int(round(N ** 0.5))
    assert hw * hw == N, f"N={N} must be a perfect square"
    return x.reshape(B, hw, hw, C)
