"""Quantify the cached-mode augmentation protocol gap (--cache_augs K).

The headline effective-protocol number trains on cached features; the
reference re-encodes fresh RandomResizedCrops every epoch
(/root/reference/main_linprobe.py:210-237). `--cache_augs K` caches K
epoch-seeded crop variants per image and cycles them across epochs — this
study measures WHICH K matches fresh-crop accuracy within seed noise, on
the same margin-sensitive synthetic task family as the int8 study
(scripts/int8_accuracy_study.py).

Design (everything stays on the chip — no bulk device->host pulls, which
leak relay transfer buffers; only per-epoch scalars cross the relay):
  1. u8 staged images (B, 128, 128, 3) with 20-class prototype signal and
     10% train label noise, tight margins (ALPHA tuned so top-1 is
     mid-range, where protocol differences show).
  2. Crops run through the PRODUCT device-aug path
     (data/device_aug.py::augment_train_batch — TF/BYOL sampler + bicubic
     + hflip + normalize) inside the extraction jit. Variant v uses crop
     key fold_in(base, v); fresh epoch e uses fold_in(base, 1000+e) —
     the exact mechanism --cache_augs uses (epoch-keyed crop rng).
  3. All feature sets live in ONE device-resident bf16 stack
     (S_total, N_TRAIN, N, D); EP32 head training gathers its epoch's
     variant in-jit (jnp.take), so every arm (fresh + each K) and seed
     reuses one compiled step.
  4. Arms: fresh (a new crop every epoch) vs K in {1, 2, 4, 8, 16} cached
     variants cycled e % K, EPOCHS=24, >=5 seeds, best-val top-1 per seed
     (same protocol as the int8 study's head phase).

Backbone: random-init ViT-B geometry at 112 px (N=49 patch tokens). The
crop sampler's scale/ratio distribution is resolution-invariant, so the
protocol comparison transfers; 112 px keeps the whole stack (40 sets)
at ~3 GB HBM. Output: CACHE_AUGS_STUDY.json + a table for PERFORMANCE.md.

Usage: python scripts/cache_augs_study.py [--seeds 5] [--alpha 0.3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMG, STAGE, PATCH = 112, 128, 16
C = 20
NOISE_FRAC = 0.10
N_TRAIN, N_VAL, BS = 1024, 512, 256
EPOCHS = 24
KS = [1, 2, 4, 8, 16]
N_VARIANTS = max(KS)           # cached sets: crop keys 0..15
FRESH_BASE = 1000              # fresh epoch e -> crop key 1000+e
S_TOTAL = N_VARIANTS + EPOCHS  # rows in the device feature stack


def _log(m):
    print(f"[cache-augs-study] {m}", file=sys.stderr, flush=True)


def make_task(alpha, seed=0):
    """u8 staged images with a SMOOTH (low-frequency) prototype signal plus
    i.i.d. pixel noise. Smoothness matters: white-noise prototypes are NOT
    crop-stable — a random crop bicubic-resized from a noise pattern is an
    almost uncorrelated pattern (measured: top-1 stuck ~11% across a 5x
    alpha sweep), while a low-frequency pattern keeps its class structure
    under any crop window/scale, so the probe can actually learn across
    fresh crops."""
    rng = np.random.default_rng(seed)
    coarse = rng.normal(size=(C, 6, 6, 3)).astype("f")
    # bilinear-upsample the 6x6 grid to the stage size (separable)
    up = np.zeros((C, STAGE, STAGE, 3), "f")
    xs = np.linspace(0, 5, STAGE)
    i0 = np.clip(xs.astype(int), 0, 4)
    fr = (xs - i0).astype("f")
    rows = (coarse[:, i0] * (1 - fr)[None, :, None, None]
            + coarse[:, i0 + 1] * fr[None, :, None, None])
    up = (rows[:, :, i0] * (1 - fr)[None, None, :, None]
          + rows[:, :, i0 + 1] * fr[None, None, :, None])
    protos = up
    protos /= np.linalg.norm(
        protos.reshape(C, -1), axis=1).reshape(C, 1, 1, 1)
    protos *= np.sqrt(protos[0].size)

    def gen(n, seed2):
        r = np.random.default_rng(seed2)
        labels = r.integers(0, C, size=(n,)).astype(np.int32)
        x = alpha * protos[labels] + r.normal(
            size=(n, STAGE, STAGE, 3)).astype("f")
        # map unit-variance floats into u8 with headroom (sigma ~ 36 LSB)
        u8 = np.clip(128.0 + 36.0 * x, 0, 255).astype(np.uint8)
        return u8, labels

    xtr, ytr = gen(N_TRAIN, 1)
    xva, yva = gen(N_VAL, 2)
    flip = np.random.default_rng(3)
    idx = flip.choice(N_TRAIN, int(NOISE_FRAC * N_TRAIN), replace=False)
    ytr[idx] = flip.integers(0, C, size=len(idx)).astype(np.int32)
    return (xtr, ytr), (xva, yva)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--alpha", type=float, default=0.3)
    ap.add_argument("--out", default="CACHE_AUGS_STUDY.json")
    ap.add_argument("--probe_only", action="store_true",
                    help="run one fresh-arm seed to sanity-check ALPHA")
    ap.add_argument("--probe_alphas", default="",
                    help="comma list: fresh-arm seed-0 top-1 per alpha "
                         "(one process, compiles amortized)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ep_tpu.configs import TrainConfig
    from ep_tpu.data.device_aug import (augment_train_batch,
                                        normalize_u8_batch)
    from ep_tpu.models.vit import ViTConfig, VisionTransformer
    from ep_tpu.parallel.mesh import make_mesh
    from ep_tpu.poolings.registry import ProbeHead
    from ep_tpu.train.lars import build_optimizer
    from ep_tpu.train.schedule import make_lr_fn

    from ep_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    MEAN = tuple(np.asarray(IMAGENET_MEAN).tolist())
    STD = tuple(np.asarray(IMAGENET_STD).tolist())

    # ---------------- backbone + extraction (TPU) ----------------------
    bcfg = ViTConfig(img_size=IMG, patch_size=PATCH, embed_dim=768,
                     depth=12, num_heads=12, dtype=jnp.bfloat16,
                     attn_impl="pallas", scan_blocks=True)
    model = VisionTransformer(bcfg)
    try:
        cpu = jax.devices("cpu")[0]
        ctx = jax.default_device(cpu)
    except RuntimeError:
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        variables = model.init(
            jax.random.key(0), jnp.zeros((2, IMG, IMG, 3), jnp.float32),
            "pos")
    params = jax.device_put(variables["params"])

    # Relay discipline (hard-won; two failed versions of this script):
    #   v1 pushed 160 x 12.6 MB u8 batches host->device — the relay
    #      client leaks transfer buffers per push (43 GB RSS);
    #   v2 shipped the images once but still issued 160 async extract
    #      dispatches — the client holds each in-flight request's
    #      serialized buffers too (23 GB RSS and ~1.7 s of client-side
    #      serialization per call).
    # So: ship each u8 split ONCE, and run the ENTIRE extraction as ONE
    # dispatch that lax.maps over the crop keys on device.
    @jax.jit
    def extract_all(params, u8_all, keys):
        def one(ck):
            key = jax.random.fold_in(jax.random.key(0), ck)
            x = augment_train_batch(key, u8_all, IMG, (0.08, 1.0),
                                    (3.0 / 4.0, 4.0 / 3.0), MEAN, STD,
                                    jnp.bfloat16, hflip=True)
            feats, _, _ = model.apply({"params": params}, x, "pos")
            return feats.astype(jnp.bfloat16)
        return jax.lax.map(one, keys)

    @jax.jit
    def extract_val(params, u8_all):
        x = normalize_u8_batch(u8_all, MEAN, STD, jnp.bfloat16)
        feats, _, _ = model.apply({"params": params}, x, "pos")
        return feats.astype(jnp.bfloat16)

    def extract_for(alpha):
        """Task + extraction for one alpha: (feats_stack, fva, yd, yvad).
        Same avals regardless of alpha, so the jits compile once."""
        (xtr_u8, ytr), (xva_u8, yva) = make_task(alpha)
        t0 = time.time()
        # crop-key layout: rows 0..15 = cached variants (keys 0..15),
        # rows 16.. = fresh epochs (keys 1000+e)
        crop_keys = list(range(N_VARIANTS)) + [FRESH_BASE + e
                                               for e in range(EPOCHS)]
        feats_stack = extract_all(params, jax.device_put(jnp.asarray(xtr_u8)),
                                  jnp.asarray(crop_keys, jnp.int32))
        feats_stack.block_until_ready()  # (S_TOTAL, N_TRAIN, N, D) bf16
        # val: deterministic center crop 128 -> 112 on host (u8 slice)
        off = (STAGE - IMG) // 2
        xva_c = xva_u8[:, off:off + IMG, off:off + IMG, :]
        fva = extract_val(params, jax.device_put(jnp.asarray(xva_c)))
        fva.block_until_ready()
        _log(f"alpha={alpha}: extraction done in {time.time() - t0:.0f}s; "
             f"stack {tuple(feats_stack.shape)} bf16 on device")
        return (feats_stack, fva, jax.device_put(jnp.asarray(ytr)),
                jax.device_put(jnp.asarray(yva)))

    N, D = (IMG // PATCH) ** 2, 768

    # ---------------- EP32 head training (TPU, in-jit gather) ----------
    cfg = TrainConfig(cls_features="ep", ep_queries=32, d_out=1,
                      nb_classes=C, batch_size=BS, eff_batch_size=BS,
                      epochs=EPOCHS, warmup_epochs=2, blr=0.1,
                      pallas_pool=False)
    head = ProbeHead(cfg, D, N, dtype=jnp.float32)
    tx = build_optimizer("lars", 0.0)
    lr_fn = make_lr_fn(cfg, N_TRAIN // BS)

    def init_state(seed):
        with ctx:
            v = head.init(jax.random.key(seed),
                          jnp.zeros((2, N, D), jnp.float32), train=True)
        pstate = {"params": v["params"],
                  "stats": v.get("batch_stats", {}),
                  "opt": tx.init(v["params"]),
                  "step": jnp.zeros((), jnp.int32)}
        return jax.device_put(pstate)

    def loss_fn(p, stats, fb, yb):
        out, updates = head.apply(
            {"params": p, "batch_stats": stats}, fb.astype(jnp.float32),
            train=True, mutable=["batch_stats"])
        logits = out[0] if isinstance(out, tuple) else out
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.take_along_axis(logp, yb[:, None], 1).mean()
        return loss, updates["batch_stats"]

    @jax.jit
    def train_step(st, feats_stack, yd, var, sel):
        fb = jnp.take(jnp.take(feats_stack, var, axis=0), sel, axis=0)
        yb = jnp.take(yd, sel, axis=0)
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st["params"], st["stats"], fb, yb)
        # LARS contract (train/lars.py): tx emits the RAW momentum update;
        # the step applies -lr(step) — mirrors feature_cache.make_head_steps
        raw, new_opt = tx.update(grads, st["opt"], st["params"])
        lr = lr_fn(st["step"])
        p = jax.tree.map(lambda w, u: w - lr * u, st["params"], raw)
        return {"params": p, "stats": stats, "opt": new_opt,
                "step": st["step"] + 1}, loss

    @jax.jit
    def eval_chunk(st, fb, yb):
        out = head.apply({"params": st["params"],
                          "batch_stats": st["stats"]},
                         fb.astype(jnp.float32), train=False)
        logits = out[0] if isinstance(out, tuple) else out
        return (jnp.argmax(logits, -1) == yb).sum()

    def run_arm(data, variant_for_epoch, seed):
        feats_stack, fva, yd, yvad = data
        st = init_state(seed)
        order_rng = np.random.default_rng(seed)
        best = 0.0
        for epoch in range(EPOCHS):
            var = variant_for_epoch[epoch]
            order = order_rng.permutation(N_TRAIN)
            for s in range(0, N_TRAIN - BS + 1, BS):
                st, loss = train_step(st, feats_stack, yd, jnp.int32(var),
                                      jnp.asarray(order[s:s + BS]))
            correct = sum(
                int(eval_chunk(st, fva[b:b + BS], yvad[b:b + BS]))
                for b in range(0, N_VAL, BS))
            best = max(best, 100.0 * correct / N_VAL)
        return best

    # LARS update contract: ep_tpu's LARS emits RAW momentum updates and
    # the train step applies -lr (train/lars.py; mirrored above).
    fresh_map = [N_VARIANTS + e for e in range(EPOCHS)]
    arms = {"fresh": fresh_map}
    for K in KS:
        arms[f"K={K}"] = [e % K for e in range(EPOCHS)]

    if args.probe_alphas:
        for a in (float(x) for x in args.probe_alphas.split(",")):
            data = extract_for(a)
            acc = run_arm(data, fresh_map, 0)
            _log(f"PROBE alpha={a}: fresh seed-0 top-1 = {acc:.2f}")
            del data
        return

    data = extract_for(args.alpha)
    n_seeds = 1 if args.probe_only else args.seeds
    results = {a: [] for a in arms}
    t0 = time.time()
    for seed in range(n_seeds):
        for aname, vmap in arms.items():
            acc = run_arm(data, vmap, seed)
            results[aname].append(round(acc, 2))
            _log(f"seed {seed} {aname}: {acc:.2f} "
                 f"({time.time() - t0:.0f}s)")
            if args.probe_only:
                break
        if args.probe_only:
            break

    summary = {
        "task": (f"{C}-class full-field prototypes alpha={args.alpha} in u8 "
                 f"staged {STAGE}px, {int(NOISE_FRAC*100)}% train label "
                 f"noise, {N_TRAIN}/{N_VAL} imgs, random-init ViT-B@{IMG}px, "
                 f"EP32 head, {EPOCHS} epochs, LARS blr0.1"),
        "protocol": ("fresh = new product device-aug crop every epoch "
                     "(key 1000+e); K=k = k cached epoch-keyed variants "
                     "cycled e%k — the --cache_augs mechanism"),
        "arms": {a: {"top1": v,
                     "mean": round(float(np.mean(v)), 2),
                     "std": round(float(np.std(v)), 2)}
                 for a, v in results.items() if v},
        "seeds": n_seeds,
    }
    if not args.probe_only:
        fr = np.asarray(results["fresh"])
        for K in KS:
            d = np.asarray(results[f"K={K}"]) - fr
            summary["arms"][f"K={K}"]["delta_vs_fresh"] = {
                "per_seed": [round(float(x), 2) for x in d],
                "mean": round(float(d.mean()), 2),
                "worst": round(float(d.min()), 2)}
    print(json.dumps(summary, indent=1))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    _log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
