#!/usr/bin/env python3
"""Close the r4 open item: aim's cached step carries ~1.5 ms of f32
BatchNorm stats passes over (B, N, C) — measure what bf16 stats would buy
before deciding whether a knob is worth the parity break.

A/B: the production aim cached head step (TorchBatchNorm stats in f32,
torch-exact) vs a monkeypatched variant computing the batch stats and
normalization in bf16. The patch exists ONLY here — a product knob would
break the torch-exact parity contract (module parity <=1e-5 and the
stateful-BN engine parity test both pin f32-equivalent stats), so it
ships only if the measured win is large enough to justify an opt-in.

    python scripts/aim_bn_microbench.py [--batch 512]
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def patch_bf16():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from ep_tpu.poolings import batchnorm

    class BF16StatsBN(batchnorm.TorchBatchNorm):
        @nn.compact
        def __call__(self, x):
            feat_shape = (x.shape[-1],)
            reduce_axes = tuple(range(x.ndim - 1))
            n = 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda s: jnp.zeros(s, jnp.float32),
                                    feat_shape)
            ra_var = self.variable("batch_stats", "var",
                                   lambda s: jnp.ones(s, jnp.float32),
                                   feat_shape)
            if self.use_running_average:
                mean, var = ra_mean.value, ra_var.value
            else:
                xb = x.astype(jnp.bfloat16)
                mean = jnp.mean(xb, axis=reduce_axes,
                                dtype=jnp.float32)  # f32 accum, bf16 reads
                var = jnp.mean(
                    jnp.square(xb - mean.astype(jnp.bfloat16)),
                    axis=reduce_axes, dtype=jnp.float32)
                if not self.is_initializing():
                    m = self.momentum
                    bessel = n / (n - 1) if n > 1 else 1.0
                    ra_mean.value = m * ra_mean.value + (1 - m) * mean
                    ra_var.value = (m * ra_var.value
                                    + (1 - m) * (bessel * var))
            y = ((x.astype(jnp.bfloat16)
                  - mean.astype(jnp.bfloat16))
                 * jax.lax.rsqrt(var + self.epsilon
                                 ).astype(jnp.bfloat16))
            if self.use_scale:
                y = y * self.param("scale", nn.initializers.ones,
                                   feat_shape, jnp.float32).astype(y.dtype)
            if self.use_bias:
                y = y + self.param("bias", nn.initializers.zeros,
                                   feat_shape, jnp.float32).astype(y.dtype)
            return y.astype(self.dtype or x.dtype)

    # aim imports TorchBatchNorm at module import time — patch both homes
    batchnorm.TorchBatchNorm = BF16StatsBN
    from ep_tpu.poolings import aim
    aim.TorchBatchNorm = BF16StatsBN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bf16", action="store_true",
                    help="(internal) run the bf16-stats variant")
    args = ap.parse_args()

    if args.bf16:
        patch_bf16()
        from cached_head_microbench import bench_variant
        step = bench_variant("xla", args.batch, args.chain, args.reps,
                             "aim")
        print(f"AIM_BN_RESULT bf16 {step * 1000:.3f}")
        return

    # two subprocesses so each variant gets a clean jit cache/process
    import subprocess
    here = os.path.abspath(__file__)
    results = {}
    for variant, extra in (("f32", []), ("bf16", ["--bf16"])):
        if variant == "f32":
            sys.path.insert(0, os.path.dirname(here))
            from cached_head_microbench import bench_variant
            step = bench_variant("xla", args.batch, args.chain, args.reps,
                                 "aim")
            results["f32"] = step * 1000
        else:
            p = subprocess.run(
                [sys.executable, here, "--bf16", "--batch",
                 str(args.batch), "--chain", str(args.chain),
                 "--reps", str(args.reps)],
                capture_output=True, text=True, timeout=1800)
            print(p.stdout, p.stderr[-500:], sep="\n")
            for ln in p.stdout.splitlines():
                if ln.startswith("AIM_BN_RESULT bf16"):
                    results["bf16"] = float(ln.split()[-1])
    f32, bf16 = results["f32"], results.get("bf16", float("nan"))
    print(f"aim cached step: f32-stats {f32:.2f} ms, bf16-stats "
          f"{bf16:.2f} ms -> saves {f32 - bf16:.2f} ms "
          f"({100 * (f32 - bf16) / f32:.1f}%)")


if __name__ == "__main__":
    main()
