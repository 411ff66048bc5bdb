"""int8 fused MLP half: LN2 + per-token quant + int8 fc1 + tanh-GELU +
requant + int8 fc2 + residual, one Pallas program per image.

The v5e MXU runs int8 at 2x the bf16 rate. XLA-level dynamic quantization
only won ~14% (r2 measurement: the per-token amax/round/cast VPU passes
materialize through HBM and eat the MXU win); fused in-kernel, the same
scheme measures 5.17 vs 6.22 ms for the ViT-B bench MLP half (r3), ~17%.

Scheme: weights per-output-channel symmetric int8 (computed on the fly in
XLA — O(D^2) per step, noise next to the O(B*T*D^2) matmul; no state or
checkpoint plumbing), activations per-token symmetric int8 computed
in-kernel. Mean relative output error vs the bf16 path ~1.2% — larger
than bf16 ulp, so this is OPT-IN (--int8_mlp) for users whose probing
tolerance allows it; the default path stays bf16.

Counterpart in the reference: none (fp16 AMP only, main_linprobe.py:604);
this is TPU-native headroom. Probing never differentiates the encoder; a
custom VJP recomputes the bf16 MLP for the backward so finetuning stays
correct (straight-through estimator w.r.t. quantization).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray):
    """(D_in, D_out) -> int8 weights + (1, D_out) f32 per-channel scales."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0  # (1, D_out)
    s = jnp.maximum(s, 1e-8)
    wq = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return wq, s


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            g_ref, be_ref, out_ref, *, eps: float, stripes: int):
    """stripes > 1 processes the hidden dim in 128-aligned column stripes
    (weights stay fully VMEM-resident; only the (T, DH/stripes) activation
    transients shrink) — what lets ViT-L fit the scoped VMEM."""
    x = x_ref[0]  # (T, D)
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps) * g_ref[0] + be_ref[0]
    sx = jnp.maximum(jnp.abs(h).max(axis=-1, keepdims=True), 1e-8) / 127.0
    hq = jnp.round(h / sx).astype(jnp.int8)
    DH = w1_ref.shape[1]
    ds = DH // stripes
    y = None
    for s in range(stripes):
        sl = slice(s * ds, (s + 1) * ds)
        acc = jax.lax.dot_general(  # (T, ds) s32, int8 MXU
            hq, w1_ref[:, sl], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        a = acc.astype(jnp.float32) * (sx * s1_ref[0, sl]) + b1_ref[0, sl]
        a = jax.nn.gelu(a.astype(jnp.bfloat16), approximate=True).astype(
            jnp.float32)
        sa = jnp.maximum(jnp.abs(a).max(axis=-1, keepdims=True),
                         1e-8) / 127.0
        aq = jnp.round(a / sa).astype(jnp.int8)
        acc2 = jax.lax.dot_general(  # (T, D) s32
            aq, w2_ref[sl, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        part = acc2.astype(jnp.float32) * (sa * s2_ref[0])
        y = part if y is None else y + part
    y = y + b2_ref[0]
    out_ref[0] = (xf + y).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp_int8_fused(x, w1, b1, w2, b2, gamma, beta,
                   eps: float = 1e-6, interpret: bool = False,
                   force_stripes: int = 0):
    """x + fc2(gelu(fc1(LN(x)))) with int8 matmuls.

    x (B,T,D); w1 (D,4D); w2 (4D,D); full-precision weights in — the
    per-channel int8 quantization happens here (XLA, O(D^2)).
    force_stripes overrides the VMEM-driven hidden-stripe choice (tests)."""
    return _fwd_impl(x, w1, b1, w2, b2, gamma, beta, eps, interpret,
                     force_stripes)


def plan(T: int, D: int, DH: int) -> tuple:
    """VMEM-driven tier choice, pure so gates/tests can assert it.

    Returns ("resident", stripes) — both int8 weights resident, hidden dim
    optionally striped (ViT-B: 1 stripe; ViT-L: 8); ("two_kernel", ns) —
    per-half resident weights with an int8 HBM hand-off (ViT-H); or
    ("fallback",) — shapes the kernels can't take, bf16 XLA runs instead.
    """
    # resident int8 weights + double-buffered x/out blocks + s32/f32
    # (T, DH/stripes) transients + f32 accumulator. Striping the hidden
    # dim (128-aligned slices) shrinks the transients without streaming
    # weights; ViT-L fits at stripes=8. ViT-H's 13 MB of weights alone
    # overflow the scoped VMEM -> the two-kernel split.
    stripes = 1

    def est(s):
        return (2 * D * DH + 4 * T * D * 2 + (T * (DH // s) * 4 * 2)
                + T * (DH // s) + T * D * 4)

    while est(stripes) > 12 * 1024 * 1024 and stripes < 8 \
            and (DH // (2 * stripes)) % 128 == 0:
        stripes *= 2
    if est(stripes) <= 12 * 1024 * 1024:
        return ("resident", stripes)
    # BOTH weights resident don't fit. Two-kernel split: the fc1 kernel
    # and the fc2 kernel each keep their OWN ~6.5 MB weight resident,
    # handing off a per-token-per-stripe-quantized int8 intermediate
    # through HBM (int8 halves that traffic vs a bf16 hand-off). Measured
    # at ViT-H bench shapes: 7.2 vs 10.3 ms for the bf16 MLP half. (A
    # single weight-streamed reduction-grid kernel was tried first and
    # OOM'd real VMEM — its est missed the live-f32 LN/residual
    # temporaries.)
    ns = 8
    ds = DH // ns
    # per-kernel footprints; the 15 MB bound matches the measured
    # compile at ViT-H (fc1 ≈ 14.2 MB with double-buffered aq out)
    est2 = max(
        D * DH + 4 * T * D * 2 + 2 * T * DH + T * ds * 9,
        D * DH + 2 * T * DH + 4 * T * D * 2 + T * D * 8)
    if DH % ns == 0 and ds % 128 == 0 and est2 <= 15 * 1024 * 1024:
        return ("two_kernel", ns)
    return ("fallback",)


@functools.partial(jax.jit, static_argnames=("eps", "interpret",
                                             "force_stripes"))
def _fwd_impl(x, w1, b1, w2, b2, gamma, beta, eps, interpret,
              force_stripes=0):
    B, T, D = x.shape
    DH = w1.shape[1]
    tier = plan(T, D, DH)
    if force_stripes:
        tier = ("resident", force_stripes)
    if tier[0] == "two_kernel":
        return _fwd_two_kernel(x, w1, b1, w2, b2, gamma, beta, eps,
                               interpret, tier[1])
    if tier[0] == "fallback":
        if not interpret:
            return _ref_forward(x, w1, b1, w2, b2, gamma, beta, eps)
        stripes = 1
    else:
        stripes = tier[1]
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    const = lambda b: (0, 0)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, stripes=stripes),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, DH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((DH, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * D * DH,
            bytes_accessed=2 * B * T * D * x.dtype.itemsize + 2 * D * DH,
            transcendentals=B * T * DH,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, w1q, s1,
      b1.astype(jnp.float32).reshape(1, DH), w2q, s2,
      b2.astype(jnp.float32).reshape(1, D),
      gamma.astype(jnp.float32).reshape(1, D),
      beta.astype(jnp.float32).reshape(1, D))


def _kernel_fc1(x_ref, w1_ref, s1_ref, b1_ref, g_ref, be_ref,
                aq_ref, sa_ref, *, eps: float, nstripes: int):
    """Two-kernel split, first half: LN + per-token quant + int8 fc1
    (hidden-striped) + tanh-gelu + per-token-PER-STRIPE requant. Emits the
    int8 intermediate plus its (T, S) stripe scales; only w1 is resident."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps) * g_ref[0] + be_ref[0]
    sx = jnp.maximum(jnp.abs(h).max(axis=-1, keepdims=True), 1e-8) / 127.0
    hq = jnp.round(h / sx).astype(jnp.int8)
    DH = w1_ref.shape[1]
    ds = DH // nstripes
    for s in range(nstripes):
        sl = slice(s * ds, (s + 1) * ds)
        acc = jax.lax.dot_general(
            hq, w1_ref[:, sl], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        a = acc.astype(jnp.float32) * (sx * s1_ref[0, sl]) + b1_ref[0, sl]
        a = jax.nn.gelu(a.astype(jnp.bfloat16), approximate=True).astype(
            jnp.float32)
        sa = jnp.maximum(jnp.abs(a).max(axis=-1, keepdims=True),
                         1e-8) / 127.0
        aq_ref[0, :, sl] = jnp.round(a / sa).astype(jnp.int8)
        sa_ref[0, :, s:s + 1] = sa


def _kernel_fc2(aq_ref, sa_ref, x_ref, w2_ref, s2_ref, b2_ref, out_ref, *,
                nstripes: int):
    """Second half: int8 fc2 accumulated over the hidden stripes with
    per-stripe dequant, + bias + residual; only w2 is resident."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    DH = w2_ref.shape[0]
    ds = DH // nstripes
    y = None
    for s in range(nstripes):
        sl = slice(s * ds, (s + 1) * ds)
        acc = jax.lax.dot_general(
            aq_ref[0][:, sl], w2_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        part = acc.astype(jnp.float32) * (
            sa_ref[0][:, s:s + 1] * s2_ref[0])
        y = part if y is None else y + part
    out_ref[0] = (xf + y + b2_ref[0]).astype(out_ref.dtype)


def _fwd_two_kernel(x, w1, b1, w2, b2, gamma, beta, eps, interpret,
                    nstripes: int = 8):
    B, T, D = x.shape
    DH = w1.shape[1]
    S = nstripes
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    const = lambda b: (0, 0)
    aq, sa = pl.pallas_call(
        functools.partial(_kernel_fc1, eps=eps, nstripes=S),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, DH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T, DH), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, T, DH), jnp.int8),
                   jax.ShapeDtypeStruct((B, T, S), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * D * DH,
            bytes_accessed=B * T * (D * 2 + DH) + D * DH,
            transcendentals=B * T * DH,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, w1q, s1, b1.astype(jnp.float32).reshape(1, DH),
      gamma.astype(jnp.float32).reshape(1, D),
      beta.astype(jnp.float32).reshape(1, D))
    return pl.pallas_call(
        functools.partial(_kernel_fc2, nstripes=S),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, DH), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DH, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * D * DH,
            bytes_accessed=B * T * (D * 4 + DH) + D * DH,
            transcendentals=0,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(aq, sa, x, w2q, s2, b2.astype(jnp.float32).reshape(1, D))


def _ref_forward(x, w1, b1, w2, b2, gamma, beta, eps):
    """bf16 XLA composition of the same block half (fallback + backward)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    h = (h @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    h = jax.nn.gelu(h.astype(x.dtype), approximate=True)
    h = (h @ w2.astype(x.dtype)).astype(jnp.float32) + b2
    return (xf + h).astype(x.dtype)


def _fwd(x, w1, b1, w2, b2, gamma, beta, eps, interpret, force_stripes):
    out = _fwd_impl(x, w1, b1, w2, b2, gamma, beta, eps, interpret,
                    force_stripes)
    return out, (x, w1, b1, w2, b2, gamma, beta)


def _bwd(eps, interpret, force_stripes, res, g):
    x, w1, b1, w2, b2, gamma, beta = res
    _, vjp = jax.vjp(
        lambda *a: _ref_forward(*a, eps), x, w1, b1, w2, b2, gamma, beta)
    return vjp(g)


mlp_int8_fused.defvjp(_fwd, _bwd)
