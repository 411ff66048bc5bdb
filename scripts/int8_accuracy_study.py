#!/usr/bin/env python3
"""Quantify the --int8_mlp accuracy impact (VERDICT r2: Weak #2).

Two measurements, printed as one JSON document:

A) **Per-block feature-error growth** (TPU). A scan that taps every block
   output runs the SAME weights down the bf16 supercell path and the int8
   MLP path inside one jit; reports mean relative error per depth. ViT-B
   exercises the resident tier, ViT-H the two-kernel split.

B) **Top-1 deltas on a tight-margin task.** Class prototypes with weak
   signal (alpha) + 10%% train-label noise make a task the linearly-
   separable fake dataset can't represent: the probe lands well below
   100%% (chance = 5%%), so feature perturbations can actually move
   accuracy. Final-layer features are extracted once per precision on the
   REAL TPU (the path users run); the EP head then trains on the cached
   features across >=5 seeds and we report per-seed best-val-top-1 deltas.

Two-phase design (the v1 single-process version ground to a halt at
53 GB RSS: shipping a 77 MB feature batch through the axon relay every
head-train step leaked client transfer buffers):

  --phase extract   TPU: depth study + feature extraction; features land
                    in --cache_dir as .npy, results fragments as JSON.
  --phase heads     CPU in-process (jax_platforms=cpu BEFORE backend
                    init): trains the probe heads on the cached features.
                    Zero relay traffic, f32 matmuls ("highest").
  --phase all       extract in-process, then re-exec for the heads phase.

Caveat (documented in PERFORMANCE.md): the backbone is randomly
initialized — no trained IN-1K checkpoints exist in this environment.
Random ViT features behave as a fixed random projection; quantization
error propagation through LN/residual/GELU is structural, but absolute
sensitivities on trained weights may differ.

Usage: python scripts/int8_accuracy_study.py [--models vit_b,vit_h]
       [--seeds 5] [--phase all]
"""
import argparse
import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODELS = {
    # (ViTConfig name-equivalent dims) img 224: T = N+1
    "vit_b": dict(patch=16, D=768, depth=12, heads=12),
    "vit_l": dict(patch=16, D=1024, depth=24, heads=16),
    "vit_h": dict(patch=14, D=1280, depth=32, heads=16),
}
IMG = 224
C = 20          # classes (chance = 5%)
ALPHA = 0.25    # prototype signal strength (tight margins)
NOISE_FRAC = 0.10
N_TRAIN, N_VAL, BS = 2048, 1024, 256
EPOCHS = 5


def _log(m):
    print(f"[int8-study] {m}", file=sys.stderr, flush=True)


def _cfgs(name):
    import jax.numpy as jnp
    from ep_tpu.models.vit import ViTConfig
    m = MODELS[name]
    base = ViTConfig(img_size=IMG, patch_size=m["patch"], embed_dim=m["D"],
                     depth=m["depth"], num_heads=m["heads"],
                     dtype=jnp.bfloat16, attn_impl="pallas",
                     scan_blocks=True)
    return base, base.replace(int8_mlp=True)


def _init_backbone(cfg):
    import contextlib
    import jax
    import jax.numpy as jnp
    from ep_tpu.models.vit import VisionTransformer
    model = VisionTransformer(cfg)
    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        ctx = contextlib.nullcontext()
    with ctx:
        variables = model.init(
            jax.random.key(0), jnp.zeros((2, IMG, IMG, 3), jnp.float32),
            "pos")
    return model, variables["params"]


def _make_task(seed):
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(C, IMG, IMG, 3)).astype("f")
    protos /= np.linalg.norm(protos.reshape(C, -1), axis=1).reshape(C, 1, 1, 1)
    protos *= np.sqrt(protos[0].size)  # unit-variance prototypes

    def gen(n, seed2):
        r = np.random.default_rng(seed2)
        labels = r.integers(0, C, size=(n,)).astype(np.int32)
        x = (ALPHA * protos[labels]
             + r.normal(size=(n, IMG, IMG, 3)).astype("f"))
        return x.astype("f"), labels

    xtr, ytr = gen(N_TRAIN, seed * 10 + 1)
    xva, yva = gen(N_VAL, seed * 10 + 2)
    flip = np.random.default_rng(seed * 10 + 3)
    idx = flip.choice(N_TRAIN, int(NOISE_FRAC * N_TRAIN), replace=False)
    ytr[idx] = flip.integers(0, C, size=len(idx)).astype(np.int32)
    return (xtr, ytr), (xva, yva)


def finetune_backbone(name, params, steps, cache_dir):
    """Supervised finetune on the prototype task → TRAINED weights.

    Closes the study's stated caveat (random-init backbones): no offline
    checkpoints exist, so structured weight/activation distributions —
    including the outlier channels per-channel quantization actually
    fears — are produced by training the backbone itself on the task.
    XLA attention + remat_blocks for the backward (the fused kernels are
    forward/frozen-path); extraction afterwards runs the normal pallas
    path on the trained params. Cached as msgpack in cache_dir."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization
    from ep_tpu.models.vit import VisionTransformer

    path = os.path.join(cache_dir, f"{name}_trained.msgpack")
    if os.path.exists(path):
        _log(f"{name}: trained backbone cached")
        with open(path, "rb") as f:
            return serialization.from_bytes(params, f.read())

    cfg_b, _ = _cfgs(name)
    model = VisionTransformer(cfg_b.replace(attn_impl="xla",
                                            remat_blocks=True))
    bs = {"vit_b": 256, "vit_l": 128, "vit_h": 64}[name]
    (xtr, ytr), _ = _make_task(0)
    D = cfg_b.embed_dim
    r = np.random.default_rng(1)
    head = (jnp.asarray(r.normal(0, 0.02, size=(D, C)).astype("f")),
            jnp.zeros((C,), jnp.float32))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 3e-4, max(steps // 10, 1), steps)
    # ViT-H: adamw's 2x-params f32 state (5 GB) + grads + param copies
    # blow the 16 GB HBM even with donation — adafactor's factored state
    # is ~free and converges fine for this purpose.
    opt = (optax.adamw(sched) if name == "vit_b"
           else optax.adafactor(learning_rate=sched))
    tx = optax.chain(optax.clip_by_global_norm(1.0), opt)

    def loss_fn(p, hd, x, y):
        feats, _, _ = model.apply({"params": p}, x, "pos")
        logits = feats.mean(1).astype(jnp.float32) @ hd[0] + hd[1]
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, y[:, None], 1).mean()

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(p, hd, ts, xd, yd, sel):
        x, y = jnp.take(xd, sel, axis=0), jnp.take(yd, sel, axis=0)
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, hd, x, y)
        updates, ts = tx.update(grads, ts, (p, hd))
        p, hd = optax.apply_updates((p, hd), updates)
        return p, hd, ts, loss

    # dataset device-resident once; per-step index gather happens in-jit
    # (eager gathers would pay the ~26 ms relay RTT per dispatch)
    xd = jax.device_put(jnp.asarray(xtr, jnp.bfloat16))
    yd = jax.device_put(jnp.asarray(ytr))
    p = jax.device_put(params)
    ts = tx.init((p, head))
    order = np.random.default_rng(2)
    t0 = time.time()
    for i in range(steps):
        sel = jnp.asarray(order.integers(0, N_TRAIN, size=(bs,)))
        p, head, ts, loss = step(p, head, ts, xd, yd, sel)
        if i % 50 == 0 or i == steps - 1:
            _log(f"{name} finetune step {i}/{steps}: "
                 f"loss {float(jax.device_get(loss)):.3f} "
                 f"({time.time() - t0:.0f}s)")
    p = jax.tree.map(lambda a: np.asarray(a, np.float32),
                     jax.device_get(p))
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(p))
    del xd, yd, ts
    gc.collect()
    return p


# ---------------------------------------------------------------- extract


def _build_tap_vit():
    """Lazily define TapViT (deferred flax import so --phase heads can pin
    the CPU backend before anything jax-adjacent loads). Cached in globals;
    tests/test_int8_depth_growth.py reaches it as module attr `TapViT` via
    __getattr__."""
    if "TapViT" in globals():
        return globals()["TapViT"]
    import flax.linen as nn
    import jax.numpy as jnp
    from ep_tpu.models.vit import Block

    class _BlockTap(nn.Module):
        """scan body that also COLLECTS each block's output."""

        cfg: object

        @nn.compact
        def __call__(self, x, rel_bias, temperature):
            y, _ = Block(self.cfg, name="block")(
                x, temperature=temperature, rel_bias=rel_bias, capture=False)
            return y, y

    class TapViT(nn.Module):
        """Embedding + tapped scan; param names identical to the real
        backbone (scan layout), so VisionTransformer params apply as-is."""

        cfg: object

        @nn.compact
        def __call__(self, x):
            c = self.cfg
            B = x.shape[0]
            D = c.embed_dim
            x = nn.Conv(D, (c.patch_size, c.patch_size),
                        strides=(c.patch_size, c.patch_size), padding="VALID",
                        dtype=c.dtype, name="patch_embed")(x.astype(c.dtype))
            x = x.reshape(B, -1, D)
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D),
                             jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(c.dtype), (B, 1, D)), x], axis=1)
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, 1 + c.num_patches, D), jnp.float32)
            x = x + pos.astype(c.dtype)
            Scan = nn.scan(_BlockTap, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           in_axes=(nn.broadcast, nn.broadcast),
                           length=c.depth)
            _, ys = Scan(c, name="blocks")(x, None, 1.0)
            return ys  # (depth, B, T, D)

    globals()["TapViT"] = TapViT
    return TapViT


def __getattr__(name):
    if name == "TapViT":
        return _build_tap_vit()
    raise AttributeError(name)


def depth_error_study(name, params, cfg_b, cfg_i, batch=16):
    """Mean relative per-block feature error, one jit (TPU)."""
    import jax
    import jax.numpy as jnp

    TapViT = _build_tap_vit()

    @jax.jit
    def study(p, imgs):
        ys_b = TapViT(cfg_b).apply({"params": p}, imgs).astype(jnp.float32)
        ys_i = TapViT(cfg_i).apply({"params": p}, imgs).astype(jnp.float32)
        num = jnp.abs(ys_i - ys_b).mean(axis=(1, 2, 3))
        den = jnp.abs(ys_b).mean(axis=(1, 2, 3)) + 1e-8
        return num / den

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(batch, IMG, IMG, 3)).astype("f"),
                       jnp.bfloat16)
    t0 = time.time()
    err = np.asarray(jax.device_get(study(params, imgs)))
    _log(f"{name}: depth study done in {time.time() - t0:.0f}s; "
         f"per-block rel err min={err.min():.4f} max={err.max():.4f} "
         f"final={err[-1]:.4f}")
    return [round(float(e), 5) for e in err]


def extract_features(tag, model, params, imgs, cache_dir):
    """Final-layer patch tokens ('pos'), chunked at BS, cached as .npy.

    Images ship as bf16 (identical numerics: the model's first op casts
    to bf16 anyway); features come back bf16 and are stored as f32.
    """
    import jax
    import jax.numpy as jnp
    path = os.path.join(cache_dir, f"{tag}.npy")
    if os.path.exists(path):
        _log(f"{tag}: cached")
        return
    t0 = time.time()

    @jax.jit
    def fwd(p, x):
        feats, _, _ = model.apply({"params": p}, x, "pos")
        return feats

    out = []
    nchunks = (len(imgs) + BS - 1) // BS
    for i, s in enumerate(range(0, len(imgs), BS)):
        chunk = imgs[s:s + BS]
        if len(chunk) < BS:  # pad to the compiled shape
            chunk = np.concatenate(
                [chunk, np.zeros((BS - len(chunk),) + chunk.shape[1:], "f")])
        dev = fwd(params, jnp.asarray(chunk, jnp.bfloat16))
        out.append(np.asarray(jax.device_get(dev), dtype=np.float32))
        del dev
        _log(f"{tag}: chunk {i + 1}/{nchunks} ({time.time() - t0:.0f}s)")
    feats = np.concatenate(out)[:len(imgs)]
    np.save(path, feats)
    del out, feats
    gc.collect()


def run_extract(name, cache_dir, train_steps=0):
    from ep_tpu.models.vit import VisionTransformer
    frag_path = os.path.join(cache_dir, f"{name}_depth.json")
    cfg_b, cfg_i = _cfgs(name)
    model_b, params = _init_backbone(cfg_b)
    model_i = VisionTransformer(cfg_i)
    if train_steps:
        params = finetune_backbone(name, params, train_steps, cache_dir)

    if not os.path.exists(frag_path):
        errs = depth_error_study(name, params, cfg_b, cfg_i)
        with open(frag_path, "w") as f:
            json.dump({"per_block_rel_err": errs}, f)

    (xtr, ytr), (xva, yva) = _make_task(0)
    extract_features(f"{name}_bf16_tr", model_b, params, xtr, cache_dir)
    extract_features(f"{name}_bf16_va", model_b, params, xva, cache_dir)
    extract_features(f"{name}_int8_tr", model_i, params, xtr, cache_dir)
    extract_features(f"{name}_int8_va", model_i, params, xva, cache_dir)
    np.save(os.path.join(cache_dir, f"{name}_ytr.npy"), ytr)
    np.save(os.path.join(cache_dir, f"{name}_yva.npy"), yva)
    del xtr, xva
    gc.collect()


# ------------------------------------------------------------------ heads


def head_accuracy(feats_tr, ytr, feats_va, yva, seed):
    """Train the EP head on cached features (CPU); return best val top-1."""
    import jax
    import jax.numpy as jnp
    from ep_tpu.configs import TrainConfig
    from ep_tpu.parallel.mesh import make_mesh
    from ep_tpu.poolings.registry import ProbeHead
    from ep_tpu.train.feature_cache import make_head_steps
    from ep_tpu.train.lars import build_optimizer
    from ep_tpu.train.schedule import make_lr_fn
    from ep_tpu.train.state import create_train_state

    D = feats_tr.shape[-1]
    N = feats_tr.shape[1]
    cfg = TrainConfig(cls_features="ep", ep_queries=32, d_out=1,
                      nb_classes=C, batch_size=BS, eff_batch_size=BS,
                      epochs=EPOCHS, warmup_epochs=1, blr=0.1,
                      pallas_pool=False)
    head = ProbeHead(cfg, D, N, dtype=jnp.float32)
    variables = head.init(jax.random.key(seed),
                          jnp.zeros((2, N, D), jnp.float32), train=True)
    tx = build_optimizer("lars", 0.0)
    state = create_train_state(
        {"params": {"head": variables["params"]},
         "batch_stats": {"head": variables.get("batch_stats", {})}},
        tx, finetuning=False)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    steps_per_epoch = N_TRAIN // BS
    train_step, eval_step = make_head_steps(
        head, mesh, tx, make_lr_fn(cfg, steps_per_epoch))

    order_rng = np.random.default_rng(seed)
    best = 0.0
    for epoch in range(EPOCHS):
        order = order_rng.permutation(N_TRAIN)
        for s in range(0, N_TRAIN - BS + 1, BS):
            sel = order[s:s + BS]
            state, _ = train_step(state, jnp.asarray(feats_tr[sel]),
                                  jnp.asarray(ytr[sel]))
        correct = total = 0.0
        for s in range(0, N_VAL, BS):
            sums, _ = eval_step(state, jnp.asarray(feats_va[s:s + BS]),
                                jnp.asarray(yva[s:s + BS]),
                                jnp.ones((BS,), jnp.float32))
            correct += float(sums["acc1_sum"])
            total += float(sums["count"])
        best = max(best, correct / total)
    return best


def run_heads(name, seeds, cache_dir):
    ld = lambda t: np.load(os.path.join(cache_dir, f"{t}.npy"))
    ytr, yva = ld(f"{name}_ytr"), ld(f"{name}_yva")
    ftr_b, fva_b = ld(f"{name}_bf16_tr"), ld(f"{name}_bf16_va")
    ftr_i, fva_i = ld(f"{name}_int8_tr"), ld(f"{name}_int8_va")
    feat_err = (np.abs(ftr_i - ftr_b).mean() / (np.abs(ftr_b).mean() + 1e-8))
    result = {"final_feature_rel_err": round(float(feat_err), 5)}

    accs_b, accs_i = [], []
    for seed in range(seeds):
        a_b = head_accuracy(ftr_b, ytr, fva_b, yva, seed)
        a_i = head_accuracy(ftr_i, ytr, fva_i, yva, seed)
        accs_b.append(round(a_b, 2))
        accs_i.append(round(a_i, 2))
        _log(f"{name} seed {seed}: bf16 {a_b:.2f}  int8 {a_i:.2f}  "
             f"delta {a_i - a_b:+.2f}")
    deltas = [round(i - b, 2) for b, i in zip(accs_b, accs_i)]
    result.update(
        bf16_top1=accs_b, int8_top1=accs_i, deltas=deltas,
        mean_delta=round(float(np.mean(deltas)), 3),
        worst_delta=round(float(np.min(deltas)), 2))
    with open(os.path.join(cache_dir, f"{name}_depth.json")) as f:
        result.update(json.load(f))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="vit_b,vit_h")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--phase", default="all",
                    choices=["all", "extract", "heads"])
    ap.add_argument("--cache_dir", default="/tmp/int8_study_cache")
    ap.add_argument("--train_backbone_steps", type=int, default=0,
                    help="finetune the backbone on the task first (trained-"
                         "weights variant of the study; 0 = random init)")
    args = ap.parse_args()
    os.makedirs(args.cache_dir, exist_ok=True)
    names = [n.strip() for n in args.models.split(",")]

    if args.phase == "heads":
        # CPU in-process, BEFORE any backend init (env overrides don't
        # stick under the axon sitecustomize; this does).
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
        init = (f"task-finetuned backbone ({args.train_backbone_steps} "
                f"steps)" if args.train_backbone_steps else
                "random-init backbone (no trained ckpts offline)")
        out = {"task": f"{C}-class prototypes alpha={ALPHA} + "
                       f"{int(NOISE_FRAC * 100)}% train label noise, "
                       f"{N_TRAIN}/{N_VAL} imgs, EP32 head, {EPOCHS} epochs, "
                       f"{init}"}
        for name in names:
            _log(f"=== {name} heads ===")
            out[name] = run_heads(name, args.seeds, args.cache_dir)
        print(json.dumps(out, indent=1))
        return

    if args.phase in ("all", "extract"):
        for name in names:
            _log(f"=== {name} extract ===")
            run_extract(name, args.cache_dir, args.train_backbone_steps)

    if args.phase == "all":
        # fresh process so the heads phase can pin the CPU backend
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--models", args.models, "--seeds", str(args.seeds),
             "--phase", "heads", "--cache_dir", args.cache_dir,
             "--train_backbone_steps", str(args.train_backbone_steps)],
            check=True)


if __name__ == "__main__":
    main()
