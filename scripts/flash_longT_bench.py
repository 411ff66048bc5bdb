"""Crossover measurement: flash_attn_pallas vs XLA attention at long T.

VERDICT r3 weak #5: ops/flash_attn_pallas.py was product-unreachable —
attn_impl=pallas routes short T to the fused natural-layout kernel and
long T (where the fused kernel's per-image VMEM plan overflows) to XLA.
This measures the full (B,T,3D)->(B,T,D) path both ways at the real
long-T product shape (448 px probing with patch 14 -> T=1025) to decide
wire-or-delete with data.

Usage: python scripts/flash_longT_bench.py [--t 1025] [--b 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1025)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dh", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ep_tpu.ops.attention import mha
    from ep_tpu.ops.flash_attn_pallas import flash_attention

    B, T, H, Dh = args.b, args.t, args.heads, args.dh
    D = H * Dh
    scale = Dh ** -0.5
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * D)).astype("f") * 0.05,
                      jnp.bfloat16)

    def split(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(x):
            return x.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)

        return heads(q), heads(k), heads(v)

    @jax.jit
    def xla_path(qkv):
        q, k, v = split(qkv)
        out = mha(q, k, v, scale)
        return out.transpose(0, 2, 1, 3).reshape(B, T, D)

    @jax.jit
    def flash_path(qkv):
        q, k, v = split(qkv)
        out = flash_attention(q, k, v, scale)
        return out.transpose(0, 2, 1, 3).reshape(B, T, D)

    def bench(fn, name):
        @jax.jit
        def chain_step(o):
            # keep a data dependency so XLA can't collapse the chain
            return jnp.concatenate([fn(o), o[..., D:]], axis=-1)

        t0 = time.perf_counter()
        out = chain_step(qkv)
        out.block_until_ready()
        float(jax.device_get(out[0, 0, 0]))
        compile_s = time.perf_counter() - t0
        # pipelined chains: dispatch K, sync once (how the encoder runs)
        K = 8
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = qkv
            for _ in range(K):
                o = chain_step(o)
            float(jax.device_get(o[0, 0, 0]))
            times.append((time.perf_counter() - t0) / K)
        med = float(np.median(times)) * 1000
        print(f"[flash-bench] {name}: {med:.2f} ms/call "
              f"(B={B} T={T} H={H} Dh={Dh}; compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
        return med

    x = bench(xla_path, "xla ")
    f = bench(flash_path, "flash")
    # numerics: bf16 paths should agree to bf16 tolerance
    a = np.asarray(jax.device_get(xla_path(qkv)), np.float32)
    b = np.asarray(jax.device_get(flash_path(qkv)), np.float32)
    rel = float(np.abs(a - b).mean() / (np.abs(a).mean() + 1e-8))
    import json
    print(json.dumps({"shape": {"B": B, "T": T, "H": H, "Dh": Dh},
                      "xla_ms": round(x, 2), "flash_ms": round(f, 2),
                      "flash_speedup": round(x / f, 3),
                      "mean_rel_err": round(rel, 6)}))


if __name__ == "__main__":
    main()
