#!/usr/bin/env python3
"""Decompose the cached-feature head train step's time (real chip).

The step (train/feature_cache.py::make_head_steps) is: EP pool (v-proj +
attention) -> BN(affine=False, batch stats) -> Linear -> CE -> grads for
head params only -> LARS -> update. Matmul floor is ~1.9 ms at bs512/ViT-B
(3x the 119 GF v-projection: fwd + bwd-recompute-free dW); measured ~5.1 ms.
This harness times nested subsets so each feature's cost is a difference of
two adjacent variants:

    matmul_pair   fwd+bwd of sum(feats @ W)        -> MXU floor
    pool_fwd      EP pool forward only
    loss_fwd      full head loss forward only
    grads         value_and_grad, no optimizer
    sgd_step      grads + plain SGD update (no LARS, no BN stats plumbing)
    full_step     the production train_step (BN stats + LARS + metrics)

Usage: python scripts/cached_head_profile.py [--batch 512] [--chain 32]
"""
import argparse
import contextlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

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

    B = args.batch
    cfg = TrainConfig(model="vit_base_patch16", cls_features="ep",
                      ep_queries=32, d_out=1, nb_classes=1000,
                      amp="bfloat16", batch_size=B, eff_batch_size=B,
                      epochs=90, warmup_epochs=10, blr=0.1,
                      pallas_pool=False)
    bc = build_backbone_config(cfg)
    mesh = make_mesh()
    set_current_mesh(mesh)
    head = ProbeHead(cfg, bc.embed_dim, bc.num_patches, dtype=bc.dtype)
    T, D = bc.num_patches + 1, bc.embed_dim
    r = np.random.default_rng(1)
    feats = jnp.asarray(r.normal(size=(B, T, D)).astype(np.float32),
                        jnp.bfloat16)
    labels = jnp.asarray(r.integers(0, 1000, size=(B,)), jnp.int32)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu else contextlib.nullcontext():
        variables = head.init(jax.random.key(1), jnp.zeros((2, T, D)),
                              train=True)
    tx = build_optimizer("lars", 0.0)
    state = create_train_state(
        {"params": {"head": variables["params"]},
         "batch_stats": {"head": variables.get("batch_stats", {})}},
        tx, finetuning=False)
    state = jax.device_put(state, jax.devices()[0])
    dev = jax.devices()[0]
    feats, labels = jax.device_put(feats, dev), jax.device_put(labels, dev)

    from ep_tpu.train.steps import cross_entropy

    def loss_fn(trainable, feats, labels):
        vs = {"params": trainable["head"]}
        if state.batch_stats:
            vs["batch_stats"] = state.batch_stats.get("head", {})
        logits, _ = head.apply(vs, feats, train=True,
                               mutable=["batch_stats"])
        return cross_entropy(logits, labels).mean()

    wmat = jnp.asarray(r.normal(size=(D, D)).astype(np.float32) * 0.02,
                       jnp.bfloat16)

    def timed(name, fn, *a):
        out = None
        t0 = time.perf_counter()
        for _ in range(2):
            out = fn(*a)
            jax.tree_util.tree_map(
                lambda x: jax.device_get(x) if hasattr(x, "shape")
                and x.size == 1 else x, out)
            # hard sync on something scalar-ish
        first = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(first.sum() if first.size > 1 else first))
        print(f"[{name}] compile {time.perf_counter() - t0:.1f}s", flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.chain):
                o = fn(*a)
            first = jax.tree_util.tree_leaves(o)[0]
            float(jax.device_get(first.sum() if first.size > 1 else first))
            times.append((time.perf_counter() - t0) / args.chain)
        ms = float(np.median(times)) * 1000
        print(f"[{name}] {ms:.2f} ms", flush=True)
        return ms

    res = {}

    @jax.jit
    def matmul_pair(w, x):
        def f(w):
            return (x @ w).astype(jnp.float32).sum()
        l, g = jax.value_and_grad(f)(w)
        return l + g.astype(jnp.float32).sum()
    res["matmul_pair"] = timed("matmul_pair (fwd+dW floor)", matmul_pair,
                               wmat, feats)

    pool = head.pool if hasattr(head, "pool") else None

    @jax.jit
    def loss_fwd(trainable, f_, l_):
        return loss_fn(trainable, f_, l_)
    res["loss_fwd"] = timed("loss_fwd", loss_fwd, state.trainable, feats,
                            labels)

    @jax.jit
    def grads_only(trainable, f_, l_):
        return jax.value_and_grad(loss_fn)(trainable, f_, l_)
    res["grads"] = timed("grads (fwd+bwd)", grads_only, state.trainable,
                         feats, labels)

    @jax.jit
    def sgd_step(trainable, f_, l_):
        loss, g = jax.value_and_grad(loss_fn)(trainable, f_, l_)
        new = jax.tree_util.tree_map(lambda p, u: p - 0.01 * u, trainable, g)
        return loss, new
    res["sgd_step"] = timed("sgd_step", sgd_step, state.trainable, feats,
                            labels)

    train_step, _ = make_head_steps(head, mesh, tx, make_lr_fn(cfg, 1000))

    # non-donating wrapper so we can reuse state across chains identically
    st = state
    t0 = time.perf_counter()
    st, m = train_step(st, feats, labels)
    float(jax.device_get(m["loss"]))
    print(f"[full_step] compile {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.chain):
            st, m = train_step(st, feats, labels)
        float(jax.device_get(m["loss"]))
        times.append((time.perf_counter() - t0) / args.chain)
    res["full_step"] = float(np.median(times)) * 1000
    print(f"[full_step] {res['full_step']:.2f} ms", flush=True)

    print("\ndeltas:")
    print(f"  bwd-only (grads - loss_fwd):      "
          f"{res['grads'] - res['loss_fwd']:.2f} ms")
    print(f"  update-only (sgd - grads):        "
          f"{res['sgd_step'] - res['grads']:.2f} ms")
    print(f"  LARS+BN+metrics (full - sgd):     "
          f"{res['full_step'] - res['sgd_step']:.2f} ms")
    print(f"  loss_fwd vs matmul floor:         "
          f"{res['loss_fwd'] - res['matmul_pair'] / 3 * 1:.2f} ms "
          f"(floor pair = {res['matmul_pair']:.2f})")


if __name__ == "__main__":
    main()
