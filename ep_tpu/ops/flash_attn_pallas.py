"""Pallas attention on pre-split (B,H,T,Dh) tensors.

STATUS (r4): the LONG-T production path. The encoder routes through
ops/attn_fused_pallas.py (natural qkv layout — measured faster at probe
shapes because it avoids the head-split transpose this kernel's layout
forces); when a per-image qkv block overflows VMEM (448px probing →
T=1025), the dispatch head-splits and lands HERE (attn_fused_pallas::
_fwd_flash) — measured 1.52x XLA at T=1025 on the real chip
(scripts/flash_longT_bench.py: 11.90 vs 18.05 ms, rel err 2e-6). The
head-group size adapts down until the (g, Tp, Tp) f32 logits fit the
scoped VMEM limit; shapes where even one head overflows fall back to
XLA (attn_fused_pallas::_flash_fits). Parity: tests/test_ops.py +
scripts/tpu_kernel_gate.py::gate_flash_longT.

At probe sequence lengths (T = 197–257 tokens) a full flash decomposition is
unnecessary — K/V for one (batch, head-group) fit comfortably in VMEM — but
keeping softmax(QKᵀ)V inside one kernel still removes the (B, H, T, T)
probability tensor from HBM entirely (the reference materializes it on every
block of every step, models_vit.py:86-96; we only ever materialize it in the
opt-in attention-stats capture path).

Layout: tokens padded to the 128-lane tile; each program handles G=4 heads of
one image (grid over B·H/G) with fp32 logits/softmax on the VPU and both
matmuls on the MXU. Backward = XLA recompute (cheap at these shapes; in
probing mode the encoder is never differentiated anyway).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 12  # heads per program (measured fastest at ViT-B bench shapes, r2:
# 4.95/4.75/4.61 ms for G=4/8/12 vs 5.42 XLA; G=24 exceeds the 16MB VMEM
# scoped limit — logits are (G, 256, 256) f32)


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                  temperature: float, n_real: int):
    # refs: (G, Tp, Dh). Inputs stay bf16 INTO the MXU (it accumulates f32
    # natively from bf16 operands); upcasting first would run the matmul at
    # the ~8x-slower f32 MXU rate — the round-1 kernel's mistake.
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (scale / temperature)  # (G, Tp, Tp) f32
    tp = logits.shape[1]
    if n_real < tp:  # only when the caller had to pad the token dim
        key_ok = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tp), 2) < n_real
        logits = jnp.where(key_ok, logits, -1e30)
    logits = logits - logits.max(axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / probs.sum(axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale: float, temperature: float = 1.0,
                    interpret: bool = False):
    """softmax(scale·QKᵀ/temperature)·V over (B, H, T, Dh) tensors."""
    return _flash_forward(q, k, v, scale, temperature, interpret)


@functools.partial(jax.jit, static_argnames=("scale", "temperature",
                                              "interpret", "heads_per_prog"))
def _flash_forward(q, k, v, scale, temperature, interpret,
                   heads_per_prog=G):
    B, H, T, Dh = q.shape
    # Mosaic masks non-divisible block dims itself, so T needs no host-side
    # pad: jnp.pad of q/k/v at bench shapes is 3 x 150 MB of pure HBM copy
    # per block (~2 ms) and was the reason the r1 kernel lost in-model.
    t_pad, d_pad = T, Dh
    if Dh % 8 != 0:
        d_pad = ((Dh + 7) // 8) * 8

    def prep(x):
        if d_pad != Dh:
            x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, d_pad - Dh)])
        return x.reshape(B * H, T, d_pad)

    qp, kp, vp = prep(q), prep(k), prep(v)
    # adapt the head-group size to VMEM: logits are (g, Tp, Tp) f32 and
    # dominate at long T (T=1025: g=12 would stage ~57 MB of logits).
    # Largest divisor of B*H whose logits + 4 head-stripes fit the scoped
    # limit keeps MXU occupancy without overflowing.
    t_lane = ((T + 127) // 128) * 128
    gsize = heads_per_prog
    while gsize > 1 and (
            (B * H) % gsize != 0
            or gsize * T * t_lane * 4
            + 4 * gsize * T * d_pad * q.dtype.itemsize > 13 * 1024 * 1024):
        gsize -= 1
    if (gsize == 1
            and T * t_lane * 4 + 4 * T * d_pad * q.dtype.itemsize
            > 13 * 1024 * 1024):
        # even a single head's f32 logits overflow the scoped VMEM limit
        # (possible for direct callers at very long T; product dispatch is
        # already guarded by attn_fused_pallas._flash_fits) — answer in XLA
        # instead of emitting a pallas_call Mosaic will reject.
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32) * (scale / temperature)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    grid = (B * H // gsize,) if (B * H) % gsize == 0 else (B * H,)
    g = gsize if (B * H) % gsize == 0 else 1

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale,
                          temperature=temperature, n_real=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, t_pad, d_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t_pad, d_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t_pad, d_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t_pad, d_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * t_pad * t_pad * d_pad,
            bytes_accessed=4 * B * H * t_pad * d_pad * q.dtype.itemsize,
            transcendentals=B * H * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out.reshape(B, H, t_pad, d_pad)
    return out[:, :, :T, :Dh]


def _fwd(q, k, v, scale, temperature, interpret):
    return _flash_forward(q, k, v, scale, temperature, interpret), (q, k, v)


def _bwd(scale, temperature, interpret, res, g):
    """XLA recompute backward (attention is a small FLOP share at T≈200;
    probing never reaches this — the encoder sits under stop_gradient)."""
    q, k, v = res
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32)) / temperature
    a = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", a, g32).astype(v.dtype)
    da = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
    dl = a * (da - (a * da).sum(axis=-1, keepdims=True)) / temperature
    dq = (jnp.einsum("bhqk,bhkd->bhqd", dl, k.astype(jnp.float32)) *
          scale).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bhqd->bhkd", dl, q.astype(jnp.float32)) *
          scale).astype(k.dtype)
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)
