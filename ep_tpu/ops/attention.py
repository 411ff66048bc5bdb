"""Multi-head self-attention for the backbone, TPU-first.

Two paths:
  * fused (default): q·kᵀ → softmax → ·v expressed so XLA fuses it onto the
    MXU; attention probabilities are never materialized in HBM. This is the
    deliberate opposite of the reference, whose Block always materializes the
    full (B,H,T,T) attention map + per-block stats even in plain training
    (models_vit.py:86-96,141-158) — a large perf tax we do not replicate.
  * capture: explicitly materializes the probabilities and the 5-kind
    attention-stat stack used by the attention-stats CLI
    (models_vit.py:246-269, models_simmim.py:383-404).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    temperature: float = 1.0,
    bias: Optional[jnp.ndarray] = None,
    return_probs: bool = False,
):
    """Attention over (B, H, T, Dh) tensors. Softmax in fp32 for stability."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    logits = logits / temperature
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    if return_probs:
        return out, probs
    return out


class AttnStats(NamedTuple):
    """Per-block attention diagnostics, matching the reference's 5-kind stack
    (models_vit.py:246-264): stacked as (5, B, H, T) —
    [attn_diag, attn_diag_adj_for_cls, cls_all_attn, all_cls_attn, entropy]."""

    stats: jnp.ndarray  # (5, B, 1, H, T)
    magnitudes: jnp.ndarray  # (2, B, 1, T): input-norm, attn-branch-norm


def attn_stats_from_probs(probs: jnp.ndarray) -> jnp.ndarray:
    """Compute the 5-kind attention stat stack from (B,H,T,T) probabilities."""
    B, H, T, _ = probs.shape
    attn_diag = jnp.diagonal(probs, axis1=2, axis2=3)  # (B,H,T) self-attn
    cls_all_attn = probs[:, :, 0, :]  # cls -> all
    all_cls_attn = probs[:, :, :, 0]  # all -> cls

    attn_wo_cls = probs[:, :, :, 1:]
    denom = attn_wo_cls.sum(axis=3, keepdims=True)
    attn_wo_cls = attn_wo_cls / (denom + 1e-6)
    entropy = -(attn_wo_cls * jnp.log(attn_wo_cls + 1e-6)).sum(axis=3)

    attn_adj = probs / (denom + 1e-6)
    attn_diag_adj = jnp.diagonal(attn_adj, axis1=2, axis2=3)

    stats = jnp.stack(
        [attn_diag, attn_diag_adj, cls_all_attn, all_cls_attn, entropy]
    )  # (5, B, H, T)
    return stats[:, :, None]  # (5, B, 1, H, T) — block axis inserted
