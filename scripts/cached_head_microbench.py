#!/usr/bin/env python3
"""A/B microbench for the cached-feature head train step (the hot loop of
--cache_features probing, train/feature_cache.py::make_head_steps).

Variants:
  fused  EP pool with the fused in-kernel v-projection
         (ops/pool_attn_pallas.py::ep_pool_proj_attend) — production path
  xla    pallas_pool=False: v matmul + softmax + apply as XLA einsums

    python scripts/cached_head_microbench.py [--pool fused|xla|both]
        [--batch 512] [--reps 3] [--chain 32]

Prints per-variant median pipelined step ms + img/s. Run on the real chip;
nothing else may use the TPU concurrently (CLAUDE.md relay rules).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def bench_variant(pool, batch, chain, reps, head_name="ep", tokens=0,
                  model="vit_base_patch16"):
    import contextlib

    import jax
    import jax.numpy as jnp

    from ep_tpu.configs import TrainConfig
    from ep_tpu.models.assembly import build_backbone_config
    from ep_tpu.poolings.registry import ProbeHead
    from ep_tpu.train.feature_cache import make_head_steps
    from ep_tpu.train.lars import build_optimizer
    from ep_tpu.train.schedule import make_lr_fn
    from ep_tpu.train.state import create_train_state
    from ep_tpu.parallel.mesh import make_mesh, set_current_mesh

    cfg = TrainConfig(model=model, cls_features=head_name,
                      ep_queries=32, d_out=1, num_heads=16, nb_classes=1000,
                      amp="bfloat16", batch_size=batch, eff_batch_size=batch,
                      epochs=90, warmup_epochs=10, blr=0.1,
                      pallas_pool=(pool == "fused"))
    backbone_cfg = build_backbone_config(cfg)
    mesh = make_mesh()
    set_current_mesh(mesh)
    head = ProbeHead(cfg, backbone_cfg.embed_dim, backbone_cfg.num_patches,
                     dtype=backbone_cfg.dtype)
    T = tokens or backbone_cfg.num_patches + 1
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(batch, T, backbone_cfg.embed_dim))
                        .astype(np.float32), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, cfg.nb_classes, size=(batch,)),
                         jnp.int32)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu else contextlib.nullcontext():
        variables = head.init(jax.random.key(1),
                              jnp.zeros((2, T, backbone_cfg.embed_dim)),
                              train=True)
    tx = build_optimizer("lars", 0.0)
    state = create_train_state(
        {"params": {"head": variables["params"]},
         "batch_stats": {"head": variables.get("batch_stats", {})}},
        tx, finetuning=False)
    state = jax.device_put(state, jax.devices()[0])
    train_step, _ = make_head_steps(head, mesh, tx, make_lr_fn(cfg, 1000))
    feats = jax.device_put(feats, jax.devices()[0])
    labels = jax.device_put(labels, jax.devices()[0])

    t0 = time.perf_counter()
    for _ in range(2):
        state, m = train_step(state, feats, labels)
        float(jax.device_get(m["loss"]))
    print(f"[{head_name}:{pool}] compile+warmup {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            state, m = train_step(state, feats, labels)
        float(jax.device_get(m["loss"]))
        times.append((time.perf_counter() - t0) / chain)
    step = float(np.median(times))
    print(f"[{head_name}:{pool}] median step {step * 1000:.2f} ms "
          f"({batch / step:,.0f} img/s, chains of {chain})", flush=True)
    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="both", choices=["fused", "xla", "both"])
    ap.add_argument("--head", default="ep",
                    help="any --cls_features value; non-ep heads ignore "
                         "--pool fused (it is EP-kernel-specific)")
    ap.add_argument("--model", default="vit_base_patch16")
    ap.add_argument("--tokens", type=int, default=0,
                    help="cached token count (default: num_patches+1; grid heads need 196)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    variants = ["fused", "xla"] if args.pool == "both" else [args.pool]
    if args.head != "ep":
        variants = ["xla"]
    results = {v: bench_variant(v, args.batch, args.chain, args.reps,
                                args.head, args.tokens, args.model)
               for v in variants}
    if len(results) == 2:
        f, x = results["fused"], results["xla"]
        print(f"fused/xla step ratio: {f / x:.3f} "
              f"({'fused wins' if f < x else 'xla wins'})")


if __name__ == "__main__":
    main()
