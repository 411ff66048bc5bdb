"""Attention supercell: LN1 + qkv projection + attention + out-proj +
residual, fused into one Pallas kernel.

Extends ops/attn_fused_pallas.py one level up the block: the kernel takes
the residual-stream tokens x (B, T, D) plus the block's attention weights
and produces x + proj(attention(qkv(LN(x)))) — the entire attention half of
a ViT block — without materializing LN output, the qkv tensor, per-head
q/k/v, or the (B,H,T,T) probabilities in HBM. The MLP half stays in XLA
(measured at matmul peak with tanh-GELU; nothing left to win there).

Grid is over images; the weight blocks use constant index maps so Mosaic
keeps them resident in VMEM across sequential grid steps (fetched from HBM
once per call, not once per image). VMEM budget per program at ViT-B bench
shapes: w_qkv 3.5MB + w_proj 1.2MB + x 0.3MB + qkv 0.9MB + per-head logits
0.16MB (f32) + out 0.3MB ≈ 6.5MB of the 16MB scoped limit.

Probing never differentiates the encoder (stop_gradient); a custom VJP with
XLA recompute keeps finetuning correct.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, gamma_ref, beta_ref, wproj_ref,
            bproj_ref, out_ref, *, H: int, Dh: int, scale: float,
            temperature: float, eps: float):
    D = H * Dh
    x = x_ref[0]  # (T, D) bf16
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma_ref[0]
          + beta_ref[0]).astype(x.dtype)

    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0]
    qkv = qkv.astype(x.dtype)  # (T, 3D)

    q = qkv[:, :D]
    k = qkv[:, D:2 * D]
    v = qkv[:, 2 * D:]
    coef = scale / temperature
    heads = []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * coef
        logits = logits - logits.max(axis=-1, keepdims=True)
        probs = jnp.exp(logits)
        # normalize BEFORE PV: the division fuses into the exp pass, so
        # deferring it past PV only adds a pass over the PV output
        # (measured regression; see attn_fused_pallas._kernel)
        probs = probs / probs.sum(axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            probs.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        heads.append(pv.astype(x.dtype))
    attn_out = jnp.concatenate(heads, axis=-1)

    proj = jax.lax.dot_general(
        attn_out, wproj_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[0]
    out_ref[0] = (xf + proj).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def attn_supercell(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj,
                   num_heads: int, scale: float, temperature: float = 1.0,
                   eps: float = 1e-6, interpret: bool = False):
    """x + proj(attn(qkv(LN(x)))) — the attention half of a ViT block.

    x (B,T,D) bf16; w_qkv (D,3D); b_qkv (3D,); gamma/beta (D,) f32;
    w_proj (D,D); b_proj (D,). Returns (B,T,D) in x.dtype."""
    return _fwd_impl(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj,
                     num_heads, scale, temperature, eps, interpret)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "temperature", "eps",
                                             "interpret"))
def _fwd_impl(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj, num_heads,
              scale, temperature, eps, interpret):
    B, T, D = x.shape
    Dh = D // num_heads

    # VMEM budget: resident weights (4D^2 bf16) + double-buffered x/out
    # blocks + qkv + per-head f32 logits. ViT-H (D=1280) overflows the
    # 16MB scoped limit — fall back to the XLA composition there.
    est = (4 * D * D * 2 + 4 * T * D * 2 + T * 3 * D * 2
           + T * ((T + 127) // 128 * 128) * 4 + T * D * 2)
    if est > 13 * 1024 * 1024 and not interpret:
        if jax.default_backend() == "tpu":
            # hybrid: LN/qkv/proj in XLA (matmul-bound, already at peak),
            # attention core through the natural-layout kernel
            return _hybrid_forward(x, w_qkv, b_qkv, gamma, beta, w_proj,
                                   b_proj, num_heads, scale, temperature,
                                   eps)
        return _ref_forward(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj,
                            num_heads, scale, temperature, eps)
    wq = w_qkv.astype(x.dtype)
    wp = w_proj.astype(x.dtype)
    bq = b_qkv.astype(jnp.float32).reshape(1, 3 * D)
    bp = b_proj.astype(jnp.float32).reshape(1, D)
    g = gamma.astype(jnp.float32).reshape(1, D)
    bt = beta.astype(jnp.float32).reshape(1, D)

    const = lambda b: (0, 0)  # weights: same block every grid step
    out = pl.pallas_call(
        functools.partial(_kernel, H=num_heads, Dh=Dh, scale=scale,
                          temperature=temperature, eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * D * (4 * D + 2 * num_heads * (T // 1)),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * num_heads * T * T,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            # images are independent: lets Mosaic pipeline grid steps
            # (prefetch image b+1 while computing b)
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, wq, bq, g, bt, wp, bp)
    return out


def _hybrid_forward(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj,
                    num_heads, scale, temperature, eps):
    """Large-D fallback: XLA LN/qkv/proj + the fused attention kernel."""
    from ep_tpu.ops.attn_fused_pallas import attention_qkv_fused
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    qkv = ((xn @ w_qkv.astype(x.dtype)).astype(jnp.float32)
           + b_qkv).astype(x.dtype)
    o = attention_qkv_fused(qkv, num_heads, scale, temperature)
    proj = (o @ w_proj.astype(x.dtype)).astype(jnp.float32) + b_proj
    return (xf + proj).astype(x.dtype)


def _ref_forward(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj, num_heads,
                 scale, temperature, eps):
    """XLA reference of the same math (used for the recompute backward)."""
    B, T, D = x.shape
    Dh = D // num_heads
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    qkv = (xn @ w_qkv.astype(x.dtype)).astype(jnp.float32) + b_qkv
    qkv = qkv.astype(x.dtype).reshape(B, T, 3, num_heads, Dh)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (
        scale / temperature)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
    proj = (o @ w_proj.astype(x.dtype)).astype(jnp.float32) + b_proj
    return (xf + proj).astype(x.dtype)


def _fwd(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj, num_heads, scale,
         temperature, eps, interpret):
    out = _fwd_impl(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj, num_heads,
                    scale, temperature, eps, interpret)
    return out, (x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj)


def _bwd(num_heads, scale, temperature, eps, interpret, res, g_out):
    """Explicit backward that keeps every (T, T) tensor inside Pallas
    kernels. The r4 version vjp'd through _ref_forward — XLA recompute of
    the whole half-block, which stages the (B,H,T,T) softmax and its
    cotangent in HBM (~1 GB/step at ViT-B bs512) and was the finetune-MFU
    gap called out in the r4 VERDICT. Here the LN+qkv and proj matmul
    recomputes stay in XLA (MXU-bound, cheap), while the attention core
    re-runs through attention_qkv_fused's Pallas forward and its in-VMEM
    Pallas backward (attn_fused_pallas._bwd_impl) — no (T, T) HBM traffic.
    Shapes whose blocks overflow VMEM fall back inside those dispatchers."""
    from ep_tpu.ops.attn_fused_pallas import attention_qkv_fused
    x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj = res

    def front(x, gamma, beta, w_qkv, b_qkv):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma
              + beta).astype(x.dtype)
        qkv = (xn @ w_qkv.astype(x.dtype)).astype(jnp.float32) + b_qkv
        return qkv.astype(x.dtype)

    def back(x, o, w_proj, b_proj):
        proj = (o @ w_proj.astype(o.dtype)).astype(jnp.float32) + b_proj
        return (x.astype(jnp.float32) + proj).astype(x.dtype)

    qkv, front_vjp = jax.vjp(front, x, gamma, beta, w_qkv, b_qkv)
    o, attn_vjp = jax.vjp(
        lambda t: attention_qkv_fused(t, num_heads, scale, temperature,
                                      interpret), qkv)
    _, back_vjp = jax.vjp(back, x, o, w_proj, b_proj)
    dx_res, do, dwp, dbp = back_vjp(g_out)
    (dqkv,) = attn_vjp(do)
    dx_ln, dgamma, dbeta, dwq, dbq = front_vjp(dqkv)
    return (dx_res + dx_ln, dwq, dbq, dgamma, dbeta, dwp, dbp)


attn_supercell.defvjp(_fwd, _bwd)
