"""Fused Pallas kernel for EP pooling (query bank × tokens → descriptor).

EP's hot path (poolings/ep.py:37-45 in the reference) is:
    logits = (q·scale) @ tokensᵀ      (Q, N)
    attn   = softmax_N(logits)
    out[q] = attn[q] @ v[:, q, :]      per-query value slice, concat → (C')

One Pallas program per BB-image batch block: tokens, projected values and the
query bank are staged in VMEM once, attention probabilities never touch HBM,
and the slice-contraction is computed as one batched MXU matmul
(BB,Q,N)@(BB,N,Q·cq) followed by a block-diagonal mask-reduce — for Q≤64 the
"wasted" columns are far cheaper than a second HBM round-trip.

The wrapper pads N up to the 128-lane tile (padded keys masked to -inf) and
the batch up to the BB block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB = 8  # images per program (f32 sublane tile)


def _ep_kernel(q_ref, x_ref, v_ref, mask_ref, out_ref, *, n_real: int):
    # q: (Q, C) pre-scaled; x: (BB, Np, C); v: (BB, Np, QC); out: (BB, QC).
    # q/x stay bf16 INTO the MXU (it accumulates f32 from bf16 operands);
    # upcasting first doubles VMEM (the block OOM'd at ViT-L) and runs the
    # matmul at the slow f32 rate.
    q = q_ref[:]
    x = x_ref[:]
    v = v_ref[:]

    # logits[b, q, n] — batched over the BB block
    logits = jax.lax.dot_general(
        x, q, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BB, Np, Q)
    npad = x.shape[1]
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (1, npad, 1), 1) < n_real
    logits = jnp.where(key_ok, logits, -jnp.inf)
    logits = logits - logits.max(axis=1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / probs.sum(axis=1, keepdims=True)  # softmax over keys (Np)

    # full[b, q, :] = probs[b, :, q]ᵀ @ v[b]  — batched (Q, Np) @ (Np, QC)
    full = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BB, Q, QC)
    # block-diagonal reduce: row q contributes columns [q*cq, (q+1)*cq)
    out_ref[:, :] = (full * mask_ref[:][None]).sum(axis=1).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ep_pool_attend(
    q_scaled: jnp.ndarray,  # (Q, C), already multiplied by scale
    tokens: jnp.ndarray,  # (B, N, C)
    v: jnp.ndarray,  # (B, N, Q, cq) projected values, per-query slices
    interpret: bool = False,
) -> jnp.ndarray:  # (B, Q, cq)
    return _ep_pool_attend_fwd_only(q_scaled, tokens, v, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ep_pool_attend_fwd_only(
    q_scaled: jnp.ndarray,
    tokens: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    B, N, C = tokens.shape
    Q, cq = v.shape[2], v.shape[3]
    QC = Q * cq

    n_pad = max(128, ((N + 127) // 128) * 128)
    # VMEM budget check: streamed input blocks are DOUBLE-buffered by
    # Mosaic (prefetch of block b+1 while computing b), so x+v count twice.
    # The batch block can't shrink below 8 (output sublane tiling), so when
    # the footprint exceeds the 16MB scoped limit (e.g. ViT-L: C=QC=1024
    # blew it by 0.6MB) fall back to the XLA composition — the EP pool is
    # a sub-millisecond op either way, the kernel only saves HBM traffic.
    bb = BB
    est = (2 * bb * n_pad * (C + QC) * 2 + bb * n_pad * Q * 4
           + bb * Q * QC * 4 + Q * (C + QC) * 2)
    if est > 12 * 1024 * 1024 and not interpret:
        return ep_pool_attend_xla(q_scaled, tokens, v)
    b_pad = ((B + bb - 1) // bb) * bb
    tokens = jnp.pad(tokens, [(0, b_pad - B), (0, n_pad - N), (0, 0)])
    v = jnp.pad(v, [(0, b_pad - B), (0, n_pad - N), (0, 0), (0, 0)])
    v = v.reshape(b_pad, n_pad, QC)

    mask = np.zeros((Q, QC), dtype=np.float32)
    for i in range(Q):
        mask[i, i * cq:(i + 1) * cq] = 1.0
    mask = jnp.asarray(mask, tokens.dtype)

    grid = (b_pad // bb,)
    out = pl.pallas_call(
        functools.partial(_ep_kernel, n_real=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n_pad, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n_pad, QC), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, QC), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, QC), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, QC), tokens.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * (Q * n_pad * C + Q * n_pad * QC),
            bytes_accessed=b_pad * n_pad * (C + QC) * tokens.dtype.itemsize,
            transcendentals=b_pad * Q * n_pad,
        ),
        interpret=interpret,
    )(q_scaled.astype(tokens.dtype), tokens, v, mask)
    return out[:B].reshape(B, Q, cq)


def _ep_fwd(q_scaled, tokens, v, interpret):
    out = _ep_pool_attend_fwd_only(q_scaled, tokens, v, interpret)
    return out, (q_scaled, tokens, v)


def _ep_bwd(interpret, res, g):
    """Flash-style backward: recompute attention in XLA (tiny vs the
    backbone), then the softmax VJP — grads for queries, tokens and values."""
    q_scaled, tokens, v = res
    logits = jnp.einsum("qc,bnc->bqn", q_scaled, tokens,
                        preferred_element_type=jnp.float32)
    a = jax.nn.softmax(logits, axis=-1)  # (B, Q, N)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bqn,bqc->bnqc", a, g32).astype(v.dtype)
    da = jnp.einsum("bqc,bnqc->bqn", g32, v32)
    dl = a * (da - (a * da).sum(axis=-1, keepdims=True))
    dq = jnp.einsum("bqn,bnc->qc", dl,
                    tokens.astype(jnp.float32)).astype(q_scaled.dtype)
    dx = jnp.einsum("bqn,qc->bnc", dl,
                    q_scaled.astype(jnp.float32)).astype(tokens.dtype)
    return dq, dx, dv


ep_pool_attend.defvjp(_ep_fwd, _ep_bwd)


def ep_pool_attend_xla(q_scaled, tokens, v):
    """Reference XLA path (same math) for testing/fallback."""
    logits = jnp.einsum("qc,bnc->bqn", q_scaled, tokens,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqn,bnqc->bqc", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
