"""Attention-statistics driver — main_attention_stats.py equivalent.

Collects per-block attention diagnostics over the val set using the
backbone's opt-in capture mode (the 5-kind stack of models_vit.py:246-264
plus residual magnitudes), averages them over the dataset, logs per-block
line charts to wandb when configured, writes a JSON summary, and optionally
draws a t-SNE scatter of pooled features (main_attention_stats.py:66-293).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ep_tpu.configs import TrainConfig
from ep_tpu.data.datasets import build_datasets
from ep_tpu.data.loader import DataLoader
from ep_tpu.data.transforms import build_transforms_v2
from ep_tpu.models.assembly import build_backbone_config
from ep_tpu.models.vit import VisionTransformer
from ep_tpu.parallel.mesh import make_mesh, set_current_mesh, shard_batch
from ep_tpu.utils.logging import maybe_setup_wandb


def get_args_parser():
    p = argparse.ArgumentParser("attention statistics", add_help=False)
    p.add_argument("--batch_size", default=512, type=int)
    p.add_argument("--model", default="vit_base_patch16", type=str)
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--simmim", action="store_true", default=False)
    p.add_argument("--finetune", default="")
    p.add_argument("--checkpoint_key", default="model", type=str)
    p.add_argument("--data_path", default="/datasets01/imagenet", type=Path)
    p.add_argument("--dataset_name", default="imagenet1k", type=str)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--num_workers", default=10, type=int)
    p.add_argument("--max_batches", default=0, type=int,
                   help="cap the number of val batches (0 = all)")
    p.add_argument("--draw_2d_embeddings", action="store_true", default=False)
    p.add_argument("--amp", default="bfloat16", type=str)
    p.add_argument("--dino_aug", action="store_true", default=False,
                   help="DINO-style train augmentation in the v2 dataset "
                        "builder (util/datasets.py:21-34); the stats pass "
                        "itself always reads the val split")
    return p


def collect_features(model, params, loader, mesh, max_batches=0):
    """Per-batch capture of (features, attn-stat stack, magnitudes),
    averaged incrementally (main_attention_stats.py:225-286)."""

    # params as an argument, not a closure (HLO-constant pitfall)
    @jax.jit
    def _step(p, images):
        feats, stats, magn = model.apply(
            p, images, "cls", capture_stats=True)
        # mean over batch & heads on device to keep transfers tiny:
        # stats (5, B, blocks, H, T) → (8, blocks): split cls vs pos token means
        s = stats.astype(jnp.float32)
        cls_self = s[0, :, :, :, 0].mean(axis=(0, 2))
        pos_self = s[0, :, :, :, 1:].mean(axis=(0, 2, 3))
        cls_self_adj = s[1, :, :, :, 0].mean(axis=(0, 2))
        pos_self_adj = s[1, :, :, :, 1:].mean(axis=(0, 2, 3))
        cls_pos = s[2, :, :, :, 1:].mean(axis=(0, 2, 3))
        pos_cls = s[3, :, :, :, 1:].mean(axis=(0, 2, 3))
        cls_pos_ent = s[4, :, :, :, 0].mean(axis=(0, 2))
        pos_pos_ent = s[4, :, :, :, 1:].mean(axis=(0, 2, 3))
        m = magn.astype(jnp.float32)  # (2, B, blocks, T)
        cls_mag = m[:, :, :, 0].mean(axis=(0, 1))
        pos_mag = m[:, :, :, 1:].mean(axis=(0, 1, 3))
        per_block = jnp.stack([cls_self, pos_self, cls_self_adj, pos_self_adj,
                               cls_pos, pos_cls, cls_pos_ent, pos_pos_ent,
                               cls_mag, pos_mag])  # (10, blocks)
        return feats, per_block

    feats_all, labels_all, blocks_sum, n = [], [], None, 0
    for i, (images, labels, valid) in enumerate(iter(loader)):
        if max_batches and i >= max_batches:
            break
        images = shard_batch(images, mesh)
        feats, per_block = _step(params, images)
        keep = valid > 0
        feats_all.append(np.asarray(feats)[keep])
        labels_all.append(labels[keep])
        pb = np.asarray(per_block)
        blocks_sum = pb if blocks_sum is None else blocks_sum + pb
        n += 1
    return (np.concatenate(feats_all), np.concatenate(labels_all),
            blocks_sum / max(n, 1))


STAT_NAMES = [
    "cls_cls_attention", "pos_self_attention",
    "cls_cls_attention_adj_for_cls", "pos_self_attention_adj_for_cls",
    "cls_pos_attention", "pos_cls_attention",
    "cls_pos_entropy", "pos_pos_entropy",
    "cls_magnitude", "pos_magnitude",
]


def main(args):
    print(f"attention-stats config: {args}")
    cfg = TrainConfig(
        model=args.model, simmim=args.simmim, finetune=args.finetune,
        checkpoint_key=args.checkpoint_key, image_size=args.input_size,
        dataset_name=args.dataset_name, data_path=args.data_path,
        amp=args.amp, batch_size=args.batch_size,
        num_workers=args.num_workers, seed=args.seed,
    )
    mesh = make_mesh()
    set_current_mesh(mesh)
    backbone_cfg = build_backbone_config(cfg)
    model = VisionTransformer(backbone_cfg)
    dummy = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = model.init(jax.random.key(args.seed), dummy, "cls")

    if args.finetune:
        from ep_tpu.convert.torch_vit import (load_torch_state_dict,
                                              torch_vit_to_flax)
        sd = load_torch_state_dict(args.finetune, args.checkpoint_key)
        variables = {"params": torch_vit_to_flax(sd, variables["params"],
                                                 backbone_cfg)}

    # the v2 (DINO-style) dataset builder's val protocol: Resize(16/14) +
    # CenterCrop, or plain Normalize(0.5,0.5) for cifar
    # (main_attention_stats.py:81 → util/datasets.py:13-63)
    _, transform_val = build_transforms_v2(
        cfg.image_size, cfg.dataset_name, getattr(args, "dino_aug", False))
    _, dataset_val = build_datasets(cfg)
    loader = DataLoader(dataset_val, cfg.batch_size, transform_val,
                        num_workers=cfg.num_workers)

    if args.output_dir:
        maybe_setup_wandb(args.output_dir, cfg, job_type="attn_stats")

    feats, labels, per_block = collect_features(
        model, variables, loader, mesh, args.max_batches)

    summary = {name: per_block[i].tolist()
               for i, name in enumerate(STAT_NAMES)}
    try:
        import wandb
        if wandb.run is not None:
            for b in range(per_block.shape[1]):
                wandb.log({f"test_attn/{n}": float(per_block[i, b])
                           for i, n in enumerate(STAT_NAMES)} |
                          {"test_attn/vit_block": b})
    except ImportError:
        pass

    if args.output_dir:
        out = Path(args.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "attention_stats.json").write_text(json.dumps(summary, indent=2))
        print(f"wrote {out / 'attention_stats.json'}")
        if args.draw_2d_embeddings:
            _draw_tsne(feats, labels, out)
    return summary


def _draw_tsne(feats, labels, out: Path):
    from sklearn.manifold import TSNE
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    latent_2d = TSNE().fit_transform(feats)
    fig, ax = plt.subplots()
    for label in range(10):
        sub = latent_2d[labels == label][:25]
        ax.scatter(sub[:, 0], sub[:, 1], label=label)
    ax.legend()
    fig.savefig(out / "tsne.png", dpi=150, bbox_inches="tight")
    print(f"wrote {out / 'tsne.png'}")


def cli():
    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    main(parser.parse_args())


if __name__ == "__main__":
    cli()
