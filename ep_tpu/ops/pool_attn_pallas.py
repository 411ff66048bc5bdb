"""Fused Pallas kernel for EP pooling (query bank × tokens → descriptor).

EP's hot path (poolings/ep.py:37-45 in the reference) is:
    logits = (q·scale) @ tokensᵀ      (Q, N)
    attn   = softmax_N(logits)
    out[q] = attn[q] @ v[:, q, :]      per-query value slice, concat → (C')

One Pallas program per image: tokens, projected values and the query bank are
staged in VMEM once, attention probabilities never touch HBM, and the
slice-contraction is computed as a single MXU matmul (Q,N)@(N,Q·cq) followed
by a block-diagonal mask-reduce — for Q≤64 the "wasted" columns are far
cheaper than a second HBM round-trip.

Falls back transparently: the wrapper pads N to the f32 tile (multiple of 8
sublanes is enough for the second-to-last dim; we pad to 128 for the lane dim
of the transposed matmul) and masks padded keys with -inf.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ep_kernel(q_ref, x_ref, v_ref, mask_ref, out_ref, *, n_real: int):
    # q: (Q, C) pre-scaled; x: (1, Np, C); v: (1, Np, QC); out: (1, QC)
    q = q_ref[:].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, Np)
    npad = x.shape[0]
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1) < n_real
    logits = jnp.where(key_ok, logits, -jnp.inf)
    logits = logits - logits.max(axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / probs.sum(axis=-1, keepdims=True)

    full = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )  # (Q, QC)
    # block-diagonal reduce: row q contributes columns [q*cq, (q+1)*cq)
    out_ref[0, :] = (full * mask_ref[:]).sum(axis=0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ep_pool_attend(
    q_scaled: jnp.ndarray,  # (Q, C), already multiplied by scale
    tokens: jnp.ndarray,  # (B, N, C)
    v: jnp.ndarray,  # (B, N, Q, cq) projected values, per-query slices
    interpret: bool = False,
) -> jnp.ndarray:  # (B, Q, cq)
    B, N, C = tokens.shape
    Q, cq = v.shape[2], v.shape[3]
    QC = Q * cq

    n_pad = max(128, ((N + 127) // 128) * 128)
    if n_pad != N:
        pad = [(0, 0), (0, n_pad - N), (0, 0)]
        tokens = jnp.pad(tokens, pad)
        v = jnp.pad(v, [(0, 0), (0, n_pad - N), (0, 0), (0, 0)])
    v = v.reshape(B, n_pad, QC)

    mask = np.zeros((Q, QC), dtype=np.float32)
    for i in range(Q):
        mask[i, i * cq:(i + 1) * cq] = 1.0
    mask = jnp.asarray(mask)

    out = pl.pallas_call(
        functools.partial(_ep_kernel, n_real=N),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((Q, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, QC), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, QC), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, QC), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, QC), tokens.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (Q * n_pad * C + Q * n_pad * QC),
            bytes_accessed=B * n_pad * (C + QC) * tokens.dtype.itemsize,
            transcendentals=B * Q * n_pad,
        ),
        interpret=interpret,
    )(q_scaled.astype(tokens.dtype), tokens, v, mask)
    return out.reshape(B, Q, cq)


def ep_pool_attend_xla(q_scaled, tokens, v):
    """Reference XLA path (same math) for testing/fallback."""
    logits = jnp.einsum("qc,bnc->bqn", q_scaled, tokens,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqn,bnqc->bqc", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
