#!/usr/bin/env python3
"""On-TPU smoke gate: every Pallas kernel variant, real Mosaic compiles.

Interpret-mode CI can't check Mosaic's actual constraints (tile layouts,
VMEM budgets, batched-dot dim ordering — see ops/attn_fused_pallas.py and
PERFORMANCE.md); this script runs EVERY kernel variant once on the real
chip at ViT-B/L/H shapes and asserts numeric agreement with the XLA
composition. Run it after touching anything under ep_tpu/ops/:

    python scripts/tpu_kernel_gate.py          # all variants (~15 min cold,
                                               #  compiles dominate)
    python scripts/tpu_kernel_gate.py --quick  # one case per kernel family

Exit code 0 = all green. Cheap by construction: batch 4, one forward per
variant (backwards are XLA compositions, covered by CPU CI).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

# (name, T, D, H) — T = tokens incl cls at 224px; ViT-H is 257 (p14)
SHAPES = {
    "vit_b": (197, 768, 12),
    "vit_l": (197, 1024, 16),
    "vit_h": (257, 1280, 16),
}
B = 4
FAILURES = []


def _check(name, ours, ref, mean_tol, max_tol):
    ours = np.asarray(jax.device_get(ours), np.float32)
    ref = np.asarray(jax.device_get(ref), np.float32)
    diff = np.abs(ours - ref)
    scale = np.abs(ref).mean() + 1e-6
    mean_rel, max_rel = diff.mean() / scale, diff.max() / scale
    ok = np.isfinite(ours).all() and mean_rel < mean_tol and max_rel < max_tol
    status = "ok " if ok else "FAIL"
    print(f"[gate] {status} {name:44s} mean_rel={mean_rel:.2e} "
          f"max_rel={max_rel:.2e}", flush=True)
    if not ok:
        FAILURES.append(name)


def _rng(*shape, dtype=jnp.bfloat16, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.normal(size=shape).astype(np.float32), dtype)


def gate_fused_attention(model):
    """attention_qkv_fused: single-program kernel (Dh|128) or the
    head-group grid (ViT-H Dh=80)."""
    from ep_tpu.ops.attn_fused_pallas import _fwd_xla, attention_qkv_fused
    T, D, H = SHAPES[model]
    variant = "head_group" if 128 % (D // H) != 0 else "single_program"
    qkv = _rng(B, T, 3 * D, seed=1)
    scale = (D // H) ** -0.5
    out = attention_qkv_fused(qkv, H, scale)
    ref = _fwd_xla(qkv, H, scale, 1.0)
    # bf16 outputs: per-element rounding is ~4e-3 relative, and the kernel
    # normalizes after PV while XLA normalizes probs first — measured
    # mean_rel ~2.2e-3 on-chip is pure rounding noise
    _check(f"attn_fused[{variant}] {model}", out, ref, 5e-3, 1e-1)


def gate_flash_longT(model="vit_b"):
    """Long-T dispatch: attention_qkv_fused at T=1025 (448px/patch-14
    probing) must route to the head-split flash kernel (r4 measurement:
    1.52x XLA; scripts/flash_longT_bench.py) and agree with XLA. The ViT-H
    case (Dh=80, non-128-divisible lane dim at long T) exercises Mosaic's
    masking rules interpret mode can't check."""
    from ep_tpu.ops.attn_fused_pallas import (_flash_fits, _fwd_xla,
                                              attention_qkv_fused)
    T = 1025
    _, D, H = SHAPES[model]
    assert _flash_fits(T, D // H, 2), "gate shape should take the flash path"
    qkv = _rng(8, T, 3 * D, seed=5)
    scale = (D // H) ** -0.5
    out = attention_qkv_fused(qkv, H, scale)
    ref = _fwd_xla(qkv, H, scale, 1.0)
    _check(f"attn_flash[long-T 1025 {model}]", out, ref, 5e-3, 1e-1)


def gate_fused_attention_bwd(model):
    """In-VMEM attention backward (finetuning path): Pallas _bwd_impl vs
    the XLA recompute backward, single-program (Dh|128) or head-group
    (ViT-H Dh=80) variant."""
    from ep_tpu.ops.attn_fused_pallas import _bwd_impl, _bwd_xla
    T, D, H = SHAPES[model]
    variant = "head_group" if 128 % (D // H) != 0 else "single_program"
    qkv = _rng(B, T, 3 * D, seed=21)
    g = _rng(B, T, D, seed=22)
    scale = (D // H) ** -0.5
    out = _bwd_impl(qkv, g, H, scale, 1.0, False)
    ref = _bwd_xla(qkv, g, H, scale, 1.0)
    _check(f"attn_fused_bwd[{variant}] {model}", out, ref, 5e-3, 2e-1)


def gate_supercell(model):
    """attn_supercell: LN1+qkv+attention+proj+residual in one kernel."""
    from ep_tpu.ops.attn_block_pallas import _ref_forward, attn_supercell
    T, D, H = SHAPES[model]
    x = _rng(B, T, D, seed=2)
    w_qkv = _rng(D, 3 * D, seed=3) * (D ** -0.5)
    b_qkv = _rng(3 * D, dtype=jnp.float32, seed=4) * 0.1
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)
    w_proj = _rng(D, D, seed=5) * (D ** -0.5)
    b_proj = _rng(D, dtype=jnp.float32, seed=6) * 0.1
    scale = (D // H) ** -0.5
    out = attn_supercell(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj,
                         H, scale)
    ref = _ref_forward(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj,
                       H, scale, 1.0, 1e-6)
    _check(f"attn_supercell {model}", out, ref, 2e-3, 1e-1)


def gate_int8_mlp(model):
    """mlp_int8_fused across its three VMEM tiers; asserts the intended
    tier is the one the shape actually selects (plan())."""
    from ep_tpu.ops.mlp_int8_pallas import _ref_forward, mlp_int8_fused, plan
    T, D, H = SHAPES[model]
    DH = 4 * D
    expected = {"vit_b": ("resident", 1), "vit_l": ("resident", 8),
                "vit_h": ("two_kernel", 8)}[model]
    got = plan(T, D, DH)
    if got != expected:
        print(f"[gate] FAIL int8 tier {model}: plan={got} expected={expected}")
        FAILURES.append(f"int8_tier {model}")
        return
    x = _rng(B, T, D, seed=7)
    w1 = _rng(D, DH, seed=8) * (D ** -0.5)
    b1 = _rng(DH, dtype=jnp.float32, seed=9) * 0.1
    w2 = _rng(DH, D, seed=10) * (DH ** -0.5)
    b2 = _rng(D, dtype=jnp.float32, seed=11) * 0.1
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)
    out = mlp_int8_fused(x, w1, b1, w2, b2, gamma, beta)
    ref = _ref_forward(x, w1, b1, w2, b2, gamma, beta, 1e-6)
    # int8 is approximate BY DESIGN (~1.2% mean feature error vs bf16,
    # ops/mlp_int8_pallas.py) — the gate bounds it, exactness lives in the
    # interpret-mode CPU tests against the emulated int8 math
    _check(f"mlp_int8[{got[0]}:{got[1]}] {model}", out, ref, 3e-2, 0.6)


def gate_ep_pool():
    """EP pooled attention, pre-projected values (fwd kernel; VJP backward
    is XLA). Shapes are d_out=2 / bf16: at d_out=1 ViT-B+ shapes this
    kernel's own VMEM plan rejects itself (padded x AND v double-buffered)
    and silently takes the XLA fallback — the d_out=1 path is served by the
    fused-projection kernel below instead."""
    from ep_tpu.ops.pool_attn_pallas import ep_pool_attend, ep_pool_attend_xla
    Q, C, d_out, N = 32, 768, 2, 196
    cq = C // (d_out * Q)
    q = _rng(Q, C, dtype=jnp.bfloat16, seed=12) * (C ** -0.5)
    x = _rng(B, N, C, dtype=jnp.bfloat16, seed=13)
    v = _rng(B, N, Q, cq, dtype=jnp.bfloat16, seed=14)
    out = ep_pool_attend(q, x, v)
    ref = ep_pool_attend_xla(q, x, v)
    _check("ep_pool_attend[d_out=2]", out, ref, 5e-3, 1e-1)


def gate_ep_pool_fused():
    """Fused v-projection + EP pooling at the real probing shape (N=197
    exercises Mosaic's non-divisible-sublane masking; bf16 like prod)."""
    from ep_tpu.ops.pool_attn_pallas import (ep_pool_proj_attend,
                                             ep_pool_proj_attend_xla,
                                             proj_plan)
    Q, C, N = 32, 768, 197
    stripes = proj_plan(N, C, Q, C)
    if stripes == 0:
        print("[gate] FAIL ep_pool_proj: plan says fallback at ViT-B shape")
        FAILURES.append("ep_pool_proj plan")
        return
    q = _rng(Q, C, dtype=jnp.bfloat16, seed=15) * (C ** -0.5)
    x = _rng(B, N, C, dtype=jnp.bfloat16, seed=16)
    w = _rng(C, C, dtype=jnp.float32, seed=17) * (C ** -0.5)
    out = ep_pool_proj_attend(q, x, w)
    ref = ep_pool_proj_attend_xla(q, x, w)
    _check(f"ep_pool_proj[stripes={stripes}]", out, ref, 2e-2, 0.2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one case per kernel family (ViT-B + ViT-H "
                         "head-group + int8 resident + EP pool)")
    args = ap.parse_args()

    backend = jax.default_backend()
    print(f"[gate] backend={backend} devices={len(jax.devices())}")
    if backend not in ("tpu", "axon"):
        print("[gate] WARNING: no TPU backend — kernels will run in "
              "interpret mode via EP_TPU_PALLAS_INTERPRET only; this does "
              "NOT exercise Mosaic. Gate is meant for the real chip.")

    t0 = time.time()
    if args.quick:
        gate_fused_attention("vit_b")
        gate_fused_attention("vit_h")
        gate_flash_longT("vit_b")
        gate_flash_longT("vit_h")
        gate_fused_attention_bwd("vit_b")
        gate_fused_attention_bwd("vit_h")
        gate_int8_mlp("vit_b")
        gate_ep_pool()
        gate_ep_pool_fused()
    else:
        for m in ("vit_b", "vit_l", "vit_h"):
            gate_fused_attention(m)
        gate_flash_longT("vit_b")
        gate_flash_longT("vit_h")
        for m in ("vit_b", "vit_l", "vit_h"):
            gate_fused_attention_bwd(m)
        for m in ("vit_b", "vit_l", "vit_h"):
            gate_supercell(m)
        for m in ("vit_b", "vit_l", "vit_h"):
            gate_int8_mlp(m)
        gate_ep_pool()
        gate_ep_pool_fused()
    print(f"[gate] done in {time.time() - t0:.0f}s; "
          f"{'ALL GREEN' if not FAILURES else 'FAILED: ' + str(FAILURES)}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
