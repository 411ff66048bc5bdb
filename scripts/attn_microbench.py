#!/usr/bin/env python3
"""Micro-bench the fused-attention variants at exact bench shapes.

Times JUST the attention contraction (qkv tensor -> output), isolating
kernel changes from the rest of the block. Used for the r3 ViT-H softmax
work (VERDICT #4): re-roll with a fresh EP_TPU_AOT_CACHE-free process
>=2x before believing ViT-H deltas (the +-8%% remote-compile lottery,
PERFORMANCE.md).

    python scripts/attn_microbench.py --model vit_h --variants \
        head_group,rowtile,xla
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SHAPES = {
    "vit_b": (197, 768, 12),
    "vit_l": (197, 1024, 16),
    "vit_h": (257, 1280, 16),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--variants", default="head_group,rowtile,xla")
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()

    from ep_tpu.ops import attn_fused_pallas as A

    T, D, H = SHAPES[args.model]
    B = args.batch
    scale = (D // H) ** -0.5
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * D)).astype(np.float32),
                      jnp.bfloat16)
    qkv = jax.device_put(qkv, jax.devices()[0])

    impls = {
        "single": lambda x: A._fwd_impl(x, H, scale, 1.0, False, 1),
        "head_group": lambda x: A._fwd_head_group(x, H, scale, 1.0, False),
        "head_group_normafter": lambda x: A._fwd_head_group(
            x, H, scale, 1.0, False, norm_after=True),
        "rowtile": lambda x: A._fwd_head_group_rowtile(x, H, scale, 1.0,
                                                       False),
        "xla": lambda x: A._fwd_xla(x, H, scale, 1.0),
    }

    ref = None
    for name in args.variants.split(","):
        fn = jax.jit(impls[name.strip()])
        t0 = time.time()
        out = fn(qkv)
        out.block_until_ready()
        float(jax.device_get(out[0, 0, 0]))
        compile_s = time.time() - t0
        # chained reps, one hard sync (relay RTT amortized away)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(qkv)
        float(jax.device_get(out.sum()))
        dt = (time.perf_counter() - t0) / args.reps
        if ref is None:
            ref = np.asarray(jax.device_get(out), np.float32)
            err = 0.0
        else:
            o = np.asarray(jax.device_get(out), np.float32)
            err = float(np.abs(o - ref).mean() / (np.abs(ref).mean() + 1e-8))
        print(f"[attn-bench] {args.model} bs{B} {name:12s} "
              f"{dt * 1e3:7.3f} ms/call  (compile {compile_s:.0f}s, "
              f"rel_err_vs_first {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
