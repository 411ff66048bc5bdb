#!/usr/bin/env python3
"""Zoo sweep: train EVERY pooling head for a few epochs on the synthetic
dataset and print an accuracy table — fast end-to-end proof that each
--cls_features value trains (the reference's zoo sweep protocol at demo
scale; BASELINE.json config #3).

    python tools/validate_zoo.py [--epochs 4] [--device cpu] [--out FILE]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADS = ["cls", "pos", "ep", "ep_all", "abmilp", "simpool", "esimpool",
         "siglip", "aim", "cbam", "coca", "cait", "dinovit", "jepa",
         "dolg", "cae"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--blr", type=float, default=8.0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import ep_tpu.cli.linprobe as linprobe
    from ep_tpu.configs import TrainConfig
    from ep_tpu.models.vit import ViTConfig

    tiny = ViTConfig(img_size=16, patch_size=4, embed_dim=48, depth=2,
                     num_heads=4, dtype=jnp.float32)
    linprobe.build_backbone_config = lambda cfg: tiny

    results = {}
    for head in HEADS:
        cfg = TrainConfig(
            dataset_name="fake", nb_classes=4, image_size=16, batch_size=32,
            cls_features=head, epochs=args.epochs, warmup_epochs=1,
            blr=args.blr, num_heads=4, ep_queries=4, output_dir="",
            num_workers=2, amp="float32", seed=0, pallas_pool=False)
        t0 = time.time()
        try:
            res = linprobe.main(cfg)
            results[head] = {"max_acc": round(res["max_accuracy"], 2),
                             "seconds": round(time.time() - t0, 1)}
        except Exception as e:  # keep sweeping; report the failure
            results[head] = {"error": f"{type(e).__name__}: {e}"}
        print(f"ZOO {head:12s} -> {results[head]}", flush=True)

    print("\n| head | max acc (4 classes, chance 25%) | time (s) |")
    print("|---|---:|---:|")
    for head, r in results.items():
        if "error" in r:
            print(f"| {head} | ERROR: {r['error'][:60]} | - |")
        else:
            print(f"| {head} | {r['max_acc']} | {r['seconds']} |")
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    failures = [h for h, r in results.items() if "error" in r]
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
