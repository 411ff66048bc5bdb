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
    """Flash-style backward: recompute the (tiny) attention and take the
    VJP of the MXU-shaped masked-full composition — hand-written per-slice
    einsums here lowered to single-row matvecs (see ep_pool_attend_xla)."""
    q_scaled, tokens, v = res
    _, vjp = jax.vjp(ep_pool_attend_xla, q_scaled, tokens, v)
    return vjp(g.astype(jnp.result_type(v)))


ep_pool_attend.defvjp(_ep_fwd, _ep_bwd)


def block_mask(Q: int, cq: int) -> jnp.ndarray:
    """(Q, Q*cq) block-diagonal selector: row q is 1 on its cq-slice."""
    m = np.zeros((Q, Q * cq), dtype=np.float32)
    for i in range(Q):
        m[i, i * cq:(i + 1) * cq] = 1.0
    return jnp.asarray(m)


def ep_pool_attend_xla(q_scaled, tokens, v):
    """XLA path (testing/fallback/backward) — same math as the kernel.

    The per-query-slice contraction is deliberately expressed as ONE
    batched (B,Q,N)@(B,N,Q*cq) matmul + a block-diagonal mask-reduce
    (the kernel's trick, here in XLA): the direct einsum
    ``bqn,bnqc->bqc`` maps q to a batch dim on both operands, i.e.
    B*Q single-row matvecs at 1/128 MXU row utilization — measured
    2.3 ms/step of pure forward waste at bs512/ViT-B (r4,
    scripts/cached_head_profile.py). The masked form computes Q x more
    MACs (still only ~5 GF) on full tiles and wins ~2x end-to-end.
    Every output element equals exactly one element of the full
    product, so the result is numerically identical."""
    B, N, Q, cq = v.shape
    logits = jnp.einsum("qc,bnc->bqn", q_scaled, tokens,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    full = jnp.einsum("bqn,bnm->bqm", attn.astype(v.dtype),
                      v.reshape(B, N, Q * cq),
                      preferred_element_type=jnp.float32)  # (B, Q, Q*cq)
    out = (full * block_mask(Q, cq)).sum(axis=1)  # (B, Q*cq)
    return out.reshape(B, Q, cq).astype(v.dtype)


# ---------------------------------------------------------------------------
# Fused v-projection + pooling (the cached-feature hot path).
#
# The padded kernel above commits the documented anti-pattern at typical
# probe shapes: jnp.pad of tokens AND values (two full HBM tensor copies,
# ~700 MB of traffic at bs512/ViT-B) to save a 13 MB (B,Q,N) probs
# round-trip, while the value projection x@W — the head's actual FLOPs,
# reference poolings/ep.py:30 — runs as a separate HBM-materialized matmul.
# This variant consumes tokens in their NATURAL layout (Mosaic masks the
# non-divisible N itself, the attn_fused_pallas.py lesson), computes the
# projection in-kernel with W resident in VMEM, and never materializes
# either v or the probabilities. Head-only training steps on cached tokens
# are where this dominates (train/feature_cache.py).
# ---------------------------------------------------------------------------


def _ep_fused_kernel(q_ref, x_ref, w_ref, mask_ref, out_ref, *, stripes: int):
    # q: (Q, C) pre-scaled bf16; x: (BB, N, C) natural layout; w: (C, QC);
    # mask: (Q, QC) block-diagonal; out: (BB, QC).
    q = q_ref[:]
    x = x_ref[:]
    logits = jax.lax.dot_general(  # (BB, N, Q), f32 accum from bf16 operands
        x, q, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits - logits.max(axis=1, keepdims=True)
    probs = jnp.exp(logits)
    probs = (probs / probs.sum(axis=1, keepdims=True)).astype(x.dtype)
    QC = w_ref.shape[1]
    ds = QC // stripes
    for s in range(stripes):
        sl = slice(s * ds, (s + 1) * ds)
        v = jax.lax.dot_general(  # (BB, N, ds) — the value projection
            x, w_ref[:, sl], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        full = jax.lax.dot_general(  # (BB, Q, ds)
            probs, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, sl] = (full * mask_ref[:, sl][None]).sum(axis=1).astype(
            out_ref.dtype)


def proj_plan(N: int, C: int, Q: int, QC: int, itemsize: int = 2) -> int:
    """QC-column stripe count that fits scoped VMEM, or 0 = XLA fallback.

    Budget: double-buffered x blocks + resident W + the (BB,N,ds) f32 dot
    transient and its token-dtype cast + f32 logits/probs + the (BB,Q,ds)
    full matrix + double-buffered out blocks. ``itemsize`` is the token
    dtype's (bf16 in production; f32 tokens double the footprint and
    typically push ViT-B past the budget — the module casts to its compute
    dtype before calling, poolings/ep.py)."""
    for ns in (1, 2, 4, 8):
        if QC % ns or (QC // ns) % 128:
            continue
        ds = QC // ns
        est = (2 * BB * N * C * itemsize + C * QC * itemsize
               + BB * N * ds * (4 + itemsize)
               + 2 * BB * N * Q * 4 + BB * Q * ds * 4
               + 2 * BB * QC * 4 + Q * C * itemsize + Q * QC * 4)
        if est <= 12 * 1024 * 1024:
            return ns
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ep_pool_proj_attend(
    q_scaled: jnp.ndarray,  # (Q, C), already multiplied by scale
    tokens: jnp.ndarray,  # (B, N, C)
    w: jnp.ndarray,  # (C, QC) value-projection weight (EP's v has no bias)
    interpret: bool = False,
) -> jnp.ndarray:  # (B, Q, cq)
    return _ep_proj_fwd_only(q_scaled, tokens, w, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ep_proj_fwd_only(q_scaled, tokens, w, interpret=False):
    B, N, C = tokens.shape
    Q = q_scaled.shape[0]
    QC = w.shape[1]
    stripes = proj_plan(N, C, Q, QC, tokens.dtype.itemsize)
    if stripes == 0 and not interpret:
        # trace-time print: fires once per shape, not per step
        print(f"[ep_tpu] fused EP kernel VMEM plan rejects "
              f"(N={N}, C={C}, Q={Q}, QC={QC}); using the XLA composition.")
        return ep_pool_proj_attend_xla(q_scaled, tokens, w)
    stripes = stripes or 1
    bb = BB
    b_pad = ((B + bb - 1) // bb) * bb
    tokens_p = jnp.pad(tokens, [(0, b_pad - B), (0, 0), (0, 0)]) \
        if b_pad != B else tokens

    cq = QC // Q
    mask = np.zeros((Q, QC), dtype=np.float32)
    for i in range(Q):
        mask[i, i * cq:(i + 1) * cq] = 1.0
    mask = jnp.asarray(mask, jnp.float32)

    const = lambda b: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ep_fused_kernel, stripes=stripes),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((Q, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, QC), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, QC), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, QC), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, QC), tokens.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * N * (Q * C + C * QC + Q * QC),
            bytes_accessed=b_pad * (N * C + QC) * tokens.dtype.itemsize
            + C * QC * 2,
            transcendentals=b_pad * Q * N,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q_scaled.astype(tokens.dtype), tokens_p, w.astype(tokens.dtype), mask)
    return out[:B].reshape(B, Q, cq)


def ep_pool_proj_attend_xla(q_scaled, tokens, w):
    """XLA composition of the same math (fallback + backward)."""
    B, N, C = tokens.shape
    Q = q_scaled.shape[0]
    QC = w.shape[1]
    v = (tokens @ w.astype(tokens.dtype)).reshape(B, N, Q, QC // Q)
    return ep_pool_attend_xla(q_scaled, tokens, v)


def _ep_proj_fwd(q_scaled, tokens, w, interpret):
    out = _ep_proj_fwd_only(q_scaled, tokens, w, interpret)
    return out, (q_scaled, tokens, w)


def _ep_proj_bwd(interpret, res, g):
    q_scaled, tokens, w = res
    _, vjp = jax.vjp(ep_pool_proj_attend_xla, q_scaled, tokens, w)
    return vjp(g.astype(tokens.dtype))


ep_pool_proj_attend.defvjp(_ep_proj_fwd, _ep_proj_bwd)
