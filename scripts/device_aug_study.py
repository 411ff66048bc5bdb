"""Measure the --device_aug square-staging protocol difference's accuracy.

data/device_aug.py documents one protocol difference vs the reference's
host pipeline (/root/reference/util/crop.py:9-35): the random crop samples
over the SQUARE staged image (stage x stage) instead of the original
rectangle, because static device shapes need a fixed staging geometry.
This study measures that geometry difference's accuracy impact on the
same margin-sensitive synthetic task family as the int8 study
(scripts/int8_accuracy_study.py) — with RECTANGULAR originals, so the
aspect distortion square staging introduces is actually exercised.

Two arms, fresh crops every epoch in both (the caching axis is
scripts/cache_augs_study.py):
  rect    reference crop GEOMETRY: TF/BYOL crop boxes sampled over the
          true (H0, W0) rectangle with the product host sampler
          (data/transforms.py::tf_random_resized_crop_params — the exact
          util/crop.py algorithm), resampled straight from the
          device-resident rectangles.
  square  the --device_aug protocol: originals staged once to a square
          (StageTrainTransform), crops sampled/applied in-jit
          (data/device_aug.py::augment_train_batch).

Both arms use the device bicubic resampler, so the comparison isolates
the crop GEOMETRY — the one documented protocol difference. The
sampler/resampler implementations themselves are parity-pinned
separately (tests/test_device_aug.py: distribution match vs the host
sampler, <=2 u8 levels vs PIL).

Relay discipline (CLAUDE.md): the relay client leaks transfer buffers
per host->device push, so each image set ships ONCE (rectangles 92 MB,
staged squares 50 MB) and every per-epoch quantity that crosses the
relay is O(batch) floats (crop boxes) — v1 of this script pushed
per-epoch u8 crops and was headed for tens of GB of leaked RSS.

Everything else mirrors the cache-augs study: 20-class full-field
prototypes at tight margin, 10% train label noise, random-init ViT-B@112
features extracted ONCE per (arm, epoch) into a device-resident bf16
stack, EP32+LARS head, 24 epochs, >=5 seeds, best-val top-1 per seed.

Output: DEVICE_AUG_STUDY.json + a table for PERFORMANCE.md.

Usage: python scripts/device_aug_study.py [--seeds 5] [--alpha 0.3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMG, STAGE, PATCH = 112, 128, 16
H0, W0 = 150, 200                # rectangular originals (3:4)
C = 20
NOISE_FRAC = 0.10
N_TRAIN, N_VAL, BS = 1024, 512, 256
EPOCHS = 24
ARMS = ["rect", "square"]


def _log(m):
    print(f"[device-aug-study] {m}", file=sys.stderr, flush=True)


def _up1d(coarse, n_out, axis):
    """Separable bilinear upsample of a coarse grid along one axis."""
    n_in = coarse.shape[axis]
    xs = np.linspace(0, n_in - 2, n_out)
    i0 = np.clip(xs.astype(int), 0, n_in - 2)
    fr = (xs - i0).astype("f")
    a = np.take(coarse, i0, axis=axis)
    b = np.take(coarse, i0 + 1, axis=axis)
    shape = [1] * coarse.ndim
    shape[axis] = n_out
    fr = fr.reshape(shape)
    return a * (1 - fr) + b * fr


def make_task(alpha, seed=0):
    """Rectangular u8 originals with a SMOOTH (low-frequency) full-field
    prototype signal plus i.i.d. pixel noise. Smooth because white-noise
    prototypes are not crop-stable (a crop bicubic-resized from a noise
    pattern decorrelates; measured in the cache-augs study probes), while
    a low-frequency pattern keeps its class structure under any crop
    window — including the aspect distortion this study measures."""
    rng = np.random.default_rng(seed)
    coarse = rng.normal(size=(C, 5, 6, 3)).astype("f")
    protos = _up1d(_up1d(coarse, H0, 1), W0, 2)
    protos /= np.linalg.norm(
        protos.reshape(C, -1), axis=1).reshape(C, 1, 1, 1)
    protos *= np.sqrt(protos[0].size)

    def gen(n, seed2):
        r = np.random.default_rng(seed2)
        labels = r.integers(0, C, size=(n,)).astype(np.int32)
        x = alpha * protos[labels] + r.normal(
            size=(n, H0, W0, 3)).astype("f")
        return np.clip(128.0 + 36.0 * x, 0, 255).astype(np.uint8), labels

    xtr, ytr = gen(N_TRAIN, 1)
    xva, yva = gen(N_VAL, 2)
    flip = np.random.default_rng(3)
    idx = flip.choice(N_TRAIN, int(NOISE_FRAC * N_TRAIN), replace=False)
    ytr[idx] = flip.integers(0, C, size=len(idx)).astype(np.int32)
    return (xtr, ytr), (xva, yva)


def host_boxes_epoch(epoch, n):
    """Reference-protocol crop boxes for one epoch: the product host
    sampler (tf_random_resized_crop_params = util/crop.py:16-35) over the
    TRUE rectangle. Returns (i, j, h, w) float32 arrays of shape (n,)."""
    from ep_tpu.data.transforms import tf_random_resized_crop_params
    rng = np.random.default_rng((11, epoch))
    boxes = np.array([tf_random_resized_crop_params(rng, W0, H0)
                      for _ in range(n)], np.float32)
    return boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--alpha", type=float, default=0.3)
    ap.add_argument("--out", default="DEVICE_AUG_STUDY.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ep_tpu.configs import TrainConfig
    from ep_tpu.data.device_aug import (StageTrainTransform,
                                        StageValTransform,
                                        augment_train_batch, _norm_affine,
                                        normalize_u8_batch, resample_crop)
    from ep_tpu.models.vit import ViTConfig, VisionTransformer
    from ep_tpu.poolings.registry import ProbeHead
    from ep_tpu.train.lars import build_optimizer
    from ep_tpu.train.schedule import make_lr_fn

    from ep_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    MEAN = tuple(np.asarray(IMAGENET_MEAN).tolist())
    STD = tuple(np.asarray(IMAGENET_STD).tolist())

    (xtr_u8, ytr), (xva_u8, yva) = make_task(args.alpha)

    # host staging (epoch-invariant — what StagedImageCache would hold)
    stager = StageTrainTransform(STAGE)
    xtr_sq = np.stack([stager(f) for f in xtr_u8])   # (N, 128, 128, 3) u8

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

    # each image set ships ONCE; each arm's full extraction is ONE
    # dispatch (lax.map over epochs) — in-flight dispatches leak client
    # buffers through the relay (see scripts/cache_augs_study.py)
    rect_dev = jax.device_put(jnp.asarray(xtr_u8))
    sq_dev = jax.device_put(jnp.asarray(xtr_sq))

    @jax.jit
    def extract_rect_all(params, u8_all, bi, bj, bh, bw):
        def one(e):
            x = resample_crop(u8_all, bi[e], bj[e], bh[e], bw[e], IMG)
            flip = jax.random.bernoulli(
                jax.random.fold_in(jax.random.key(42), e), 0.5, (N_TRAIN,))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
            nscale, nbias = _norm_affine(MEAN, STD)
            x = (jnp.clip(x, 0.0, 255.0) * nscale
                 + nbias).astype(jnp.bfloat16)
            feats, _, _ = model.apply({"params": params}, x, "pos")
            return feats.astype(jnp.bfloat16)
        return jax.lax.map(one, jnp.arange(EPOCHS, dtype=jnp.int32))

    @jax.jit
    def extract_square_all(params, u8_all):
        def one(e):
            key = jax.random.fold_in(jax.random.key(0), e)
            x = augment_train_batch(key, u8_all, IMG, (0.08, 1.0),
                                    (3.0 / 4.0, 4.0 / 3.0), MEAN, STD,
                                    jnp.bfloat16, hflip=True)
            feats, _, _ = model.apply({"params": params}, x, "pos")
            return feats.astype(jnp.bfloat16)
        return jax.lax.map(one, jnp.arange(EPOCHS, dtype=jnp.int32))

    @jax.jit
    def extract_val(params, u8_all):
        x = normalize_u8_batch(u8_all, MEAN, STD, jnp.bfloat16)
        feats, _, _ = model.apply({"params": params}, x, "pos")
        return feats.astype(jnp.bfloat16)

    _log(f"extracting {len(ARMS)}x{EPOCHS} train sets + val "
         f"({len(ARMS) * EPOCHS * N_TRAIN // 1000}k encodes) ...")
    t0 = time.time()
    boxes = [host_boxes_epoch(e, N_TRAIN) for e in range(EPOCHS)]
    bi, bj, bh, bw = (jnp.asarray(np.stack([b[k] for b in boxes]))
                      for k in range(4))
    rect_stack = extract_rect_all(params, rect_dev, bi, bj, bh, bw)
    rect_stack.block_until_ready()
    _log(f"rect arm done (compile included) {time.time() - t0:.0f}s")
    sq_stack = extract_square_all(params, sq_dev)
    sq_stack.block_until_ready()
    _log(f"square arm done {time.time() - t0:.0f}s")
    feats_stack = jnp.concatenate([rect_stack, sq_stack])  # (48, N, T, D)
    arm_base = {"rect": 0, "square": EPOCHS}
    del rect_stack, sq_stack

    # val: reference protocol (short side -> 128, center crop 112), u8 +
    # device normalize; identical for both arms
    vt = StageValTransform(IMG)
    xva_c = np.stack([vt(f) for f in xva_u8])
    fva = extract_val(params, jax.device_put(jnp.asarray(xva_c)))
    fva.block_until_ready()
    N, D = int(feats_stack.shape[2]), int(feats_stack.shape[3])
    _log(f"extraction done in {time.time() - t0:.0f}s; stack "
         f"{tuple(feats_stack.shape)} bf16 on device")

    # ---------------- EP32 head training (TPU, in-jit gather) ----------
    cfg = TrainConfig(cls_features="ep", ep_queries=32, d_out=1,
                      nb_classes=C, batch_size=BS, eff_batch_size=BS,
                      epochs=EPOCHS, warmup_epochs=2, blr=0.1,
                      pallas_pool=False)
    head = ProbeHead(cfg, D, N, dtype=jnp.float32)
    tx = build_optimizer("lars", 0.0)
    lr_fn = make_lr_fn(cfg, N_TRAIN // BS)
    yd = jax.device_put(jnp.asarray(ytr))
    yvad = jax.device_put(jnp.asarray(yva))

    def init_state(seed):
        with ctx:
            v = head.init(jax.random.key(seed),
                          jnp.zeros((2, N, D), jnp.float32), train=True)
        return jax.device_put({"params": v["params"],
                               "stats": v.get("batch_stats", {}),
                               "opt": tx.init(v["params"]),
                               "step": jnp.zeros((), jnp.int32)})

    def loss_fn(p, stats, fb, yb):
        out, updates = head.apply(
            {"params": p, "batch_stats": stats}, fb.astype(jnp.float32),
            train=True, mutable=["batch_stats"])
        logits = out[0] if isinstance(out, tuple) else out
        logp = jax.nn.log_softmax(logits)
        return (-jnp.take_along_axis(logp, yb[:, None], 1).mean(),
                updates["batch_stats"])

    @jax.jit
    def train_step(st, feats_stack, var, sel):
        fb = jnp.take(jnp.take(feats_stack, var, axis=0), sel, axis=0)
        yb = jnp.take(yd, sel, axis=0)
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st["params"], st["stats"], fb, yb)
        # LARS contract (train/lars.py): tx emits the RAW momentum update;
        # the step applies -lr(step)
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

    def run_arm(arm, seed):
        st = init_state(seed)
        order_rng = np.random.default_rng(seed)
        best = 0.0
        for epoch in range(EPOCHS):
            var = arm_base[arm] + epoch
            order = order_rng.permutation(N_TRAIN)
            for s in range(0, N_TRAIN - BS + 1, BS):
                st, _ = train_step(st, feats_stack, jnp.int32(var),
                                   jnp.asarray(order[s:s + BS]))
            correct = sum(
                int(eval_chunk(st, fva[b:b + BS], yvad[b:b + BS]))
                for b in range(0, N_VAL, BS))
            best = max(best, 100.0 * correct / N_VAL)
        return best

    results = {a: [] for a in ARMS}
    t0 = time.time()
    for seed in range(args.seeds):
        for arm in ARMS:
            acc = run_arm(arm, seed)
            results[arm].append(round(acc, 2))
            _log(f"seed {seed} {arm}: {acc:.2f} ({time.time() - t0:.0f}s)")

    summary = {
        "task": (f"{C}-class full-field prototypes alpha={args.alpha} on "
                 f"{H0}x{W0} u8 rectangles, {int(NOISE_FRAC*100)}% train "
                 f"label noise, {N_TRAIN}/{N_VAL} imgs, random-init "
                 f"ViT-B@{IMG}px, EP32 head, {EPOCHS} epochs, LARS blr0.1; "
                 f"fresh crops every epoch in BOTH arms"),
        "arms_protocol": {
            "rect": "reference crop geometry: TF/BYOL boxes over the true "
                    "rectangle (util/crop.py semantics, product host "
                    "sampler), device bicubic resample",
            "square": f"--device_aug protocol: staged to {STAGE}px square "
                      "once, in-jit crop/flip (data/device_aug.py)",
        },
        "isolates": ("crop geometry only — both arms share the device "
                     "bicubic resampler; sampler/resampler implementation "
                     "parity is pinned in tests/test_device_aug.py"),
        "arms": {a: {"top1": v,
                     "mean": round(float(np.mean(v)), 2),
                     "std": round(float(np.std(v)), 2)}
                 for a, v in results.items()},
        "seeds": args.seeds,
    }
    d = np.asarray(results["square"]) - np.asarray(results["rect"])
    summary["arms"]["square"]["delta_vs_rect"] = {
        "per_seed": [round(float(x), 2) for x in d],
        "mean": round(float(d.mean()), 2),
        "worst": round(float(d.min()), 2)}
    print(json.dumps(summary, indent=1))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    _log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
