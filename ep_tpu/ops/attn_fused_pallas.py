"""Natural-layout fused attention: consumes the qkv Dense output directly.

``attention_qkv_fused(qkv)`` takes the (B, T, 3*H*Dh) tensor exactly as the
backbone's fused qkv projection produces it and returns the attention output
in (B, T, H*Dh) layout, ready for the output projection — no (B,H,T,Dh)
transpose, no host-side padding, no (B,H,T,T) probability tensor in HBM.

Motivation (r2 measurements at ViT-B bench shapes, bs512/T=197): XLA's attn
core costs ~5.4 ms/block; the split-tensor flash kernel gets the core to
~3.0 ms but forces q/k/v to materialize in (B*H, T, Dh) layout — the
transpose out of the qkv tensor is ~2 ms/block of pure HBM copy that XLA
would otherwise fuse. Keeping the kernel input in the qkv tensor's own
layout removes that copy: one program per image slices the 12 heads out of
VMEM (lane shifts), runs per-head QK^T -> softmax -> PV on the MXU/VPU, and
writes back in token-major layout.

The backbone uses this only on the frozen-encoder forward path (probing
never differentiates the encoder); a custom VJP with XLA recompute keeps it
safe under finetuning too.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qkv_ref, out_ref, *, H: int, Dh: int, scale: float,
            temperature: float):
    D = H * Dh
    qkv = qkv_ref[0]  # (T, 3D)
    q = qkv[:, :D]
    k = qkv[:, D:2 * D]
    v = qkv[:, 2 * D:]
    coef = scale / temperature
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * coef  # (T, T) f32
        logits = logits - logits.max(axis=-1, keepdims=True)
        probs = jnp.exp(logits)
        # normalize BEFORE PV: the division fuses into the exp's VPU pass
        # (same shape, one traversal), so moving it after PV does not save
        # the padded-probs pass — it only ADDS a pass over the PV output
        # (measured on-chip: head-group 10.5 ms prenorm vs 13.8 ms
        # norm-after at ViT-H shapes; PERFORMANCE.md r3).
        probs = probs / probs.sum(axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            probs.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, sl] = pv.astype(out_ref.dtype)


def _kernel_head_group(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                       temperature: float, norm_after: bool = False):
    """One (image, head-group) per program over qkv viewed as
    (B, T, 3H, Dh). The BlockSpec index maps slice G-head stripes at the
    DMA level — no in-kernel lane slicing at awkward Dh offsets (the
    killer at ViT-H's Dh=80) — and the per-head matmuls run batched over
    the G heads of the group.

    Measured and REJECTED at T=257 (r3): peeling key 0 off into a scalar
    correction to make the logits lane-aligned (G,T,256) — the skinny
    (G,T,Dh)x(G,Dh,1) cls matmul and the extra normalize passes cost more
    than the 257→384 lane-padding waste they remove (ViT-H bench 316→293
    img/s).
    """
    coef = scale / temperature
    # Mosaic batched matmuls need the batch dim at position 0: transpose
    # the (T, G, Dh) blocks to (G, T, Dh) in VMEM (~300KB relayouts —
    # noise vs an HBM-layout change)
    q = q_ref[0].transpose(1, 0, 2)  # (G, T, Dh)
    k = k_ref[0].transpose(1, 0, 2)
    v = v_ref[0].transpose(1, 0, 2)
    logits = jax.lax.dot_general(  # (G, T, T) f32
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * coef
    logits = logits - logits.max(axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    # normalize BEFORE PV by default (see _kernel: div fuses into the exp
    # pass; post-PV division measured 13.8 vs 10.5 ms at ViT-H shapes).
    # norm_after=True kept as the A/B knob (scripts/attn_microbench).
    denom = probs.sum(axis=-1, keepdims=True)  # (G, T, 1) f32
    if not norm_after:
        probs = probs / denom
    pv = jax.lax.dot_general(  # (G, T, Dh)
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if norm_after:
        pv = pv / denom
    out_ref[0] = pv.transpose(1, 0, 2).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def attention_qkv_fused(qkv, num_heads: int, scale: float,
                        temperature: float = 1.0, interpret: bool = False,
                        block_b: int = 1):
    """(B, T, 3*H*Dh) fused-qkv tensor -> (B, T, H*Dh) attention output."""
    return _fwd_impl(qkv, num_heads, scale, temperature, interpret, block_b)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "temperature", "interpret",
                                             "block_b"))
def _fwd_impl(qkv, num_heads, scale, temperature, interpret, block_b):
    B, T, D3 = qkv.shape
    D = D3 // 3
    Dh = D // num_heads
    # per-image VMEM estimates (per dispatch variant — the head-group
    # kernel only stages 8-head stripes, NOT full qkv rows). Long
    # sequences (448px probing -> T=1025) overflow the scoped limit ->
    # XLA attention handles any T.
    t_pad = ((T + 127) // 128) * 128
    if 128 % Dh != 0 and num_heads % 8 == 0:
        # head width doesn't divide the 128-lane tile (e.g. ViT-H Dh=80):
        # in-kernel head slicing degenerates into lane-crossing relayouts;
        # the head-group grid slices 8-head stripes at the DMA level.
        # Its VMEM: 3 q/k/v stripes + out, double-buffered, + (8,T,T) f32
        # logits — NOT full qkv rows.
        est_g = (8 * 2 * T * 8 * Dh * qkv.dtype.itemsize
                 + 8 * T * t_pad * 4)
        if est_g > 13 * 1024 * 1024 and not interpret:
            # long T: the head-split flash kernel beats XLA 1.52x at
            # T=1025 (see _fwd_flash); XLA only when even one head's
            # logits overflow VMEM
            if _flash_fits(T, Dh, qkv.dtype.itemsize):
                return _fwd_flash(qkv, num_heads, scale, temperature,
                                  interpret)
            return _fwd_xla(qkv, num_heads, scale, temperature)
        import os
        if os.environ.get("EP_TPU_ATTN_VARIANT") == "rowtile":
            # experimental A/B knob (trace-time): query-row-tiled grid
            return _fwd_head_group_rowtile(qkv, num_heads, scale,
                                           temperature, interpret)
        return _fwd_head_group(qkv, num_heads, scale, temperature,
                               interpret)
    # single-program kernel (Dh | 128): stages full qkv rows — wins at
    # probe shapes by reading qkv once instead of 3 strided passes
    est = (2 * T * D3 * qkv.dtype.itemsize + 2 * T * D * qkv.dtype.itemsize
           + T * t_pad * 4)
    if est > 13 * 1024 * 1024 and not interpret:
        # long T: the head-split flash kernel beats XLA 1.52x at T=1025
        # (see _fwd_flash); XLA only when even one head overflows VMEM
        if _flash_fits(T, Dh, qkv.dtype.itemsize):
            return _fwd_flash(qkv, num_heads, scale, temperature, interpret)
        return _fwd_xla(qkv, num_heads, scale, temperature)
    out = pl.pallas_call(
        functools.partial(_kernel, H=num_heads, Dh=Dh, scale=scale,
                          temperature=temperature),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, D3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * T * T * Dh,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 2,
            transcendentals=B * num_heads * T * T,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qkv)
    return out


def _fwd_head_group(qkv, num_heads, scale, temperature, interpret,
                    group: int = 8, norm_after: bool = False):
    B, T, D3 = qkv.shape
    D = D3 // 3
    H = num_heads
    Dh = D // H
    G = group
    ng = H // G
    # zero-copy views: (B,T,3D) -> (B,T,3H,Dh); q heads live in slots
    # [0,H), k in [H,2H), v in [2H,3H) along dim 2
    qkv4 = qkv.reshape(B, T, 3 * H, Dh)
    out = pl.pallas_call(
        functools.partial(_kernel_head_group, scale=scale,
                          temperature=temperature, norm_after=norm_after),
        grid=(B, ng),
        in_specs=[
            pl.BlockSpec((1, T, G, Dh), lambda b, g: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, G, Dh), lambda b, g: (b, 0, ng + g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, G, Dh), lambda b, g: (b, 0, 2 * ng + g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, G, Dh), lambda b, g: (b, 0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H, Dh), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * Dh,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=B * H * T * T,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qkv4, qkv4, qkv4)
    return out.reshape(B, T, D)


def _kernel_head_group_rowtile(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                               temperature: float):
    """Row-tiled head-group variant: each program handles a ROWS-query tile
    against the full key stripe (k/v blocks are constant in the tile grid
    dim, so Mosaic keeps them resident). The r2 verdict asked for this
    experiment; note the softmax REDUCE runs over the lane (key) dim, so
    query-row tiling cannot remove the 257->384 lane padding — it trades
    sublane padding (257->264 rows untiled) for tile-row padding
    (ceil(257/ROWS)*ROWS rows) plus per-tile k/v staging."""
    coef = scale / temperature
    q = q_ref[0].transpose(1, 0, 2)  # (G, rows, Dh)
    k = k_ref[0].transpose(1, 0, 2)  # (G, T, Dh)
    v = v_ref[0].transpose(1, 0, 2)
    logits = jax.lax.dot_general(  # (G, rows, T) f32
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * coef
    logits = logits - logits.max(axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / probs.sum(axis=-1, keepdims=True)
    pv = jax.lax.dot_general(  # (G, rows, Dh)
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = pv.transpose(1, 0, 2).astype(out_ref.dtype)


def _fwd_head_group_rowtile(qkv, num_heads, scale, temperature, interpret,
                            group: int = 8, rows: int = 128):
    B, T, D3 = qkv.shape
    D = D3 // 3
    H = num_heads
    Dh = D // H
    G = group
    ng = H // G
    nt = -(-T // rows)
    qkv4 = qkv.reshape(B, T, 3 * H, Dh)
    out = pl.pallas_call(
        functools.partial(_kernel_head_group_rowtile, scale=scale,
                          temperature=temperature),
        grid=(B, ng, nt),
        in_specs=[
            pl.BlockSpec((1, rows, G, Dh), lambda b, g, t: (b, t, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, G, Dh), lambda b, g, t: (b, 0, ng + g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, G, Dh), lambda b, g, t: (b, 0, 2 * ng + g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, G, Dh),
                               lambda b, g, t: (b, t, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H, Dh), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * Dh,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=B * H * T * T,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qkv4, qkv4, qkv4)
    return out.reshape(B, T, D)


def _fwd_flash(qkv, num_heads, scale, temperature, interpret):
    """Long-T route: split heads and run the head-group flash kernel
    (ops/flash_attn_pallas.py), which adapts its heads-per-program down
    until the (g, Tp, Tp) f32 logits fit VMEM. Measured on the real chip
    at the long-T product shape (448px/patch-14 probing, T=1025, ViT-B
    geometry, bs64): flash 11.90 ms vs XLA 18.05 ms per (B,T,3D)->(B,T,D)
    call, 1.52x, mean rel err 2e-6 (scripts/flash_longT_bench.py, r4)."""
    from ep_tpu.ops.flash_attn_pallas import flash_attention
    B, T, D3 = qkv.shape
    D = D3 // 3
    q, k, v = _split_heads(qkv, num_heads)
    out = flash_attention(q, k, v, scale, temperature, interpret)
    return out.transpose(0, 2, 1, 3).reshape(B, T, D)


def _flash_fits(T: int, Dh: int, itemsize: int) -> bool:
    """Can the flash kernel stage even a single head (its smallest
    program) within the scoped VMEM limit?"""
    t_lane = ((T + 127) // 128) * 128
    d_pad = ((Dh + 7) // 8) * 8
    return T * t_lane * 4 + 4 * T * d_pad * itemsize <= 13 * 1024 * 1024


def _fwd_xla(qkv, num_heads, scale, temperature):
    """XLA fallback of the same contraction (any T; used when a per-image
    kernel block would overflow VMEM)."""
    B, T, D3 = qkv.shape
    D = D3 // 3
    q, k, v = _split_heads(qkv, num_heads)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (
        scale / temperature)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    return o.transpose(0, 2, 1, 3).reshape(B, T, D)


def _split_heads(qkv, num_heads):
    B, T, D3 = qkv.shape
    D = D3 // 3
    Dh = D // num_heads
    x = qkv.reshape(B, T, 3, num_heads, Dh).transpose(2, 0, 3, 1, 4)
    return x[0], x[1], x[2]  # (B, H, T, Dh) each


def _fwd(qkv, num_heads, scale, temperature, interpret, block_b):
    return (_fwd_impl(qkv, num_heads, scale, temperature, interpret,
                      block_b), qkv)


def _bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, H: int, Dh: int, scale: float,
                temperature: float):
    """In-VMEM attention backward, one image per program: recompute the
    per-head logits/softmax in VMEM (same exact math as _kernel) and run
    the five T×T-by-T×Dh grad matmuls without ever writing a (T, T)
    tensor to HBM. The XLA recompute backward stages the softmax and its
    cotangent in HBM — ~1 GB of (B,H,T,T) traffic per step at ViT-B
    bs512 — which is what kept finetune at 36-40% MFU (r4 VERDICT #4)."""
    D = H * Dh
    qkv = qkv_ref[0]   # (T, 3D)
    g = g_ref[0]       # (T, D)
    coef = scale / temperature
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        q = qkv[:, sl]
        k = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        v = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        gh = g[:, sl]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * coef  # (T, T) f32
        logits = logits - logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits)
        a = p / p.sum(axis=-1, keepdims=True)
        ab = a.astype(v.dtype)
        dv = jax.lax.dot_general(  # aᵀ @ gh -> (T_k, Dh)
            ab, gh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(  # gh @ vᵀ -> (T_q, T_k)
            gh, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dl = (a * (da - (a * da).sum(axis=-1, keepdims=True)) * coef
              ).astype(v.dtype)
        dq = jax.lax.dot_general(  # dl @ k -> (T_q, Dh)
            dl, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(  # dlᵀ @ q -> (T_k, Dh)
            dl, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, D + h * Dh:D + (h + 1) * Dh] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * D + h * Dh:2 * D + (h + 1) * Dh] = \
            dv.astype(dqkv_ref.dtype)


def _bwd_kernel_head_group(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                           dv_ref, *, scale: float, temperature: float,
                           chunk: int):
    """Head-group backward (ViT-H Dh=80): same DMA-level head-stripe
    blocking as _kernel_head_group. The backward keeps TWO (.,T,T) f32
    tensors live (probs + da), so the full 8-head batch overflows scoped
    VMEM at T=257 (Mosaic measured 24.93 MB vs the 16 MB limit) — and
    G<8 stripes are lane-ILLEGAL (block's second-to-last dim must divide
    by 8). Fix: keep the G=8 DMA stripes but run the softmax-grad algebra
    in sequential ``chunk``-head sub-batches; buffers of finished chunks
    die and Mosaic's stack allocator reuses them."""
    coef = scale / temperature
    q = q_ref[0].transpose(1, 0, 2)   # (G, T, Dh)
    k = k_ref[0].transpose(1, 0, 2)
    v = v_ref[0].transpose(1, 0, 2)
    gh = g_ref[0].transpose(1, 0, 2)
    G = q.shape[0]
    for c0 in range(0, G, chunk):
        sl = slice(c0, c0 + chunk)
        qc, kc, vc, gc = q[sl], k[sl], v[sl], gh[sl]
        logits = jax.lax.dot_general(
            qc, kc, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * coef  # (C, T, T)
        logits = logits - logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits)
        a = p / p.sum(axis=-1, keepdims=True)
        ab = a.astype(vc.dtype)
        dv = jax.lax.dot_general(  # aᵀ @ gh per head -> (C, T_k, Dh)
            ab, gc, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(  # gh @ vᵀ -> (C, T_q, T_k)
            gc, vc, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dl = (a * (da - (a * da).sum(axis=-1, keepdims=True)) * coef
              ).astype(vc.dtype)
        dq = jax.lax.dot_general(  # dl @ k -> (C, T_q, Dh)
            dl, kc, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(  # dlᵀ @ q -> (C, T_k, Dh)
            dl, qc, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, sl] = dq.transpose(1, 0, 2).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.transpose(1, 0, 2).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.transpose(1, 0, 2).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "temperature", "interpret"))
def _bwd_impl(qkv, g, num_heads, scale, temperature, interpret):
    B, T, D3 = qkv.shape
    D = D3 // 3
    Dh = D // num_heads
    t_pad = ((T + 127) // 128) * 128
    it = qkv.dtype.itemsize
    if 128 % Dh != 0:
        # head-group route (ViT-H): G=8 DMA stripes are the ONLY lane-
        # legal blocking (Mosaic rejects blocks whose second-to-last dim
        # isn't divisible by 8), and the full 8-head backward algebra
        # overflows scoped VMEM at T=257 (Mosaic measured 24.93 MB vs
        # the 16 MB limit; the r5.0 fallback to _bwd_xla here made the
        # decomposed supercell backward recompute the attention core
        # TWICE and regressed ViT-H finetune 78.2 -> 64.0 img/s,
        # BENCH_MODELS_r05.json before this fix). The kernel therefore
        # chunks its compute — sequential 2-head sub-batches whose dead
        # buffers Mosaic's stack allocator reuses. chunk=2 is the widest
        # measured fit at ViT-H T=257 (chunk=4 still OOMs at 19.94 MB —
        # reuse across iterations is only partial), and the estimate
        # below stays calibrated-conservative for longer T.
        if num_heads % 8:
            return _bwd_xla(qkv, g, num_heads, scale, temperature)
        fixed = (7 * 2 * T * 8 * Dh * it   # 4 in + 3 out stripes, dbuf
                 + 4 * 8 * T * Dh * it)    # (G,T,Dh) transposed copies
        est_g = fixed + 2 * T * t_pad * 24
        if est_g > 13 * 1024 * 1024 and not interpret:
            return _bwd_xla(qkv, g, num_heads, scale, temperature)
        return _bwd_head_group(qkv, g, num_heads, scale, temperature,
                               interpret, chunk=2 if not interpret else 8)
    # single-program route: qkv + g + dqkv rows double-buffered + two
    # (T, T) f32 live tensors (probs + da)
    est = (2 * T * D3 * it * 2 + 2 * T * D * it + 2 * T * t_pad * 4)
    if est > 13 * 1024 * 1024 and not interpret:
        return _bwd_xla(qkv, g, num_heads, scale, temperature)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, H=num_heads, Dh=Dh, scale=scale,
                          temperature=temperature),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * T * T * Dh,
            bytes_accessed=qkv.size * it * 2 + g.size * it,
            transcendentals=B * num_heads * T * T,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qkv, g)
    return dqkv


def _bwd_head_group(qkv, g, num_heads, scale, temperature, interpret,
                    chunk: int = 8):
    B, T, D3 = qkv.shape
    D = D3 // 3
    H = num_heads
    Dh = D // H
    G = 8  # the only lane-legal stripe width (see _bwd_impl)
    ng = H // G
    qkv4 = qkv.reshape(B, T, 3 * H, Dh)
    g4 = g.reshape(B, T, H, Dh)
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, T, G, Dh), lambda b, gi, off=off: (b, 0, off * ng + gi, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, T, G, Dh), lambda b, gi: (b, 0, gi, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, T, H, Dh), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_head_group, scale=scale,
                          temperature=temperature, chunk=chunk),
        grid=(B, ng),
        in_specs=[spec(0), spec(1), spec(2),
                  pl.BlockSpec((1, T, G, Dh), lambda b, gi: (b, 0, gi, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[shp, shp, shp],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * T * T * Dh,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 7 // 3,
            transcendentals=B * H * T * T,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qkv4, qkv4, qkv4, g4)
    # (B,T,H,Dh) x3 -> (B,T,3,H,Dh) -> (B,T,3D); XLA fuses the concat into
    # the qkv-dense backward matmul that consumes dqkv
    return jnp.stack([dq, dk, dv], axis=2).reshape(B, T, D3)


def _bwd_xla(qkv, g, num_heads, scale, temperature):
    """XLA recompute backward (fallback for shapes whose per-image blocks
    overflow VMEM). All dots take the operands in their native (bf16)
    dtype and accumulate in f32 — upcasting MXU operands to f32 costs 8x
    matmul rate (PERFORMANCE.md); only the softmax/elementwise algebra
    runs in f32."""
    B, T, D3 = qkv.shape
    D = D3 // 3
    q, k, v = _split_heads(qkv, num_heads)
    gh = g.reshape(B, T, num_heads, D // num_heads).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (
        scale / temperature)
    a = jax.nn.softmax(logits, axis=-1)
    ab = a.astype(v.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", ab, gh,
                    preferred_element_type=jnp.float32)
    da = jnp.einsum("bhqd,bhkd->bhqk", gh, v,
                    preferred_element_type=jnp.float32)
    dl = (a * (da - (a * da).sum(axis=-1, keepdims=True)) / temperature
          ).astype(v.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dl, k,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dl, q,
                    preferred_element_type=jnp.float32) * scale
    dqkv = jnp.stack([dq, dk, dv])  # (3, B, H, T, Dh)
    dqkv = dqkv.transpose(1, 3, 0, 2, 4).reshape(B, T, D3)
    return dqkv.astype(qkv.dtype)


def _bwd(num_heads, scale, temperature, interpret, block_b, qkv, g):
    """Backward of the fused attention (reached in --finetuning; probing
    keeps the encoder under stop_gradient). Dispatches to the in-VMEM
    Pallas backward when the per-image blocks fit, else XLA recompute."""
    return (_bwd_impl(qkv, g, num_heads, scale, temperature, interpret),)


attention_qkv_fused.defvjp(_fwd, _bwd)
