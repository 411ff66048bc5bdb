#!/usr/bin/env python3
"""Extract pooling-head attention maps (the paper's qualitative figures).

Runs the probe model on a batch of validation images and saves each head's
attention over the patch grid (EP: per-query maps (B, Q, N); other attentive
heads: their own attention layout) plus optional PNG heatmap grids.

    python tools/extract_pool_attention.py --dataset_name fake \
        --cls_features ep --ep_queries 4 --resume ckpt.msgpack \
        --out attn.npz [--png attn.png] [--device cpu]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from ep_tpu.configs import config_from_args, get_args_parser

    ap = argparse.ArgumentParser(parents=[get_args_parser()])
    ap.add_argument("--out", default="pool_attention.npz")
    ap.add_argument("--png", default="")
    ap.add_argument("--n_images", type=int, default=8)
    args = ap.parse_args()
    cfg = config_from_args(args)

    import jax
    if cfg.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ep_tpu.data.datasets import build_datasets
    from ep_tpu.data.loader import DataLoader
    from ep_tpu.data.transforms import build_transforms
    from ep_tpu.models.assembly import ProbeModel, build_backbone_config
    from ep_tpu.runtime.checkpoint import load_model
    from ep_tpu.train.lars import build_optimizer
    from ep_tpu.train.state import create_train_state

    backbone_cfg = build_backbone_config(cfg)
    model = ProbeModel(backbone_cfg, cfg)
    variables = model.init(jax.random.key(cfg.seed),
                           jnp.zeros((2, cfg.image_size, cfg.image_size, 3)),
                           train=False)
    if cfg.finetune:
        from ep_tpu.convert.torch_vit import load_pretrained_backbone
        variables = load_pretrained_backbone(cfg, backbone_cfg, variables)
    state = create_train_state(variables,
                               build_optimizer(cfg.optimizer, 0.0),
                               cfg.finetuning)
    if cfg.resume:
        state, _, _ = load_model(cfg, state)

    _, dataset_val = build_datasets(cfg)
    _, transform_val = build_transforms(cfg)
    loader = DataLoader(dataset_val, args.n_images, transform_val,
                        num_workers=cfg.num_workers)
    images, labels, _ = next(iter(loader))

    @jax.jit
    def extract(params, batch_stats, imgs):
        vs = {"params": params}
        if batch_stats:
            vs["batch_stats"] = batch_stats
        logits, _feats, attn = model.apply(
            vs, imgs, train=False, return_backbone_features=True,
            return_attn=True)
        return logits, attn

    logits, attn = extract(state.full_params(), state.batch_stats,
                           jnp.asarray(images))
    if attn is None:
        sys.exit(f"--cls_features {cfg.cls_features} has no attention map "
                 f"(plain LP or grid-conv head)")
    attn = np.asarray(attn, np.float32)
    preds = np.asarray(logits.argmax(-1))
    np.savez(args.out, attention=attn, labels=labels, preds=preds)
    print(f"wrote {args.out}: attention {attn.shape}, "
          f"acc {float((preds == labels).mean()):.2f}")

    if args.png:
        _render(images, attn, args.png)


def _render(images, attn, path):
    """PNG grid: image rows × (image + per-query heatmaps)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from ep_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    a = attn
    if a.ndim == 2:  # (B, N) single map
        a = a[:, None, :]
    elif a.ndim == 4:  # (B, H, Q, N) multi-head → mean heads
        a = a.mean(axis=1)
    B, Q, N = a.shape[:3]
    hw = int(round(N ** 0.5))
    n_show = min(4, B)
    q_show = min(4, Q)
    fig, axes = plt.subplots(n_show, q_show + 1,
                             figsize=(2 * (q_show + 1), 2 * n_show),
                             squeeze=False)
    for i in range(n_show):
        img = images[i] * IMAGENET_STD + IMAGENET_MEAN
        axes[i][0].imshow(np.clip(img, 0, 1))
        axes[i][0].set_axis_off()
        for qi in range(q_show):
            axes[i][qi + 1].imshow(a[i, qi].reshape(hw, hw), cmap="viridis")
            axes[i][qi + 1].set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
