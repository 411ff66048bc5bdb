#!/usr/bin/env python3
"""Batch feature extraction: frozen backbone (+ optional trained pooling
head) over a dataset split → .npz of descriptors + labels.

The reference only extracts features transiently inside its kNN path
(engine_finetune.py:168-213); this tool makes extraction a first-class
serving surface: descriptors for retrieval/indexing, kNN source features,
or inputs to downstream probes.

    python tools/extract_features.py --model vit_base_patch16 \
        --finetune mae_vitb16.pth --dataset_name imagenet1k \
        --data_path /data/in1k --cls_features cls --split val \
        --out feats_val.npz [--head_ckpt checkpoint-.msgpack]

With --head_ckpt the trained probe head runs too and the npz additionally
holds the head logits; without it the raw pooled backbone features are
written (cls/pos/gap modes need no trained weights).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from ep_tpu.configs import get_args_parser, config_from_args

    ap = argparse.ArgumentParser(description=__doc__,
                                 parents=[get_args_parser()])
    ap.add_argument("--split", choices=["train", "val"], default="val")
    ap.add_argument("--out", required=True)
    ap.add_argument("--head_ckpt", default="",
                    help="trained probe checkpoint (writes logits too)")
    args = ap.parse_args()
    cfg = config_from_args(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ep_tpu.data.datasets import build_datasets
    from ep_tpu.data.loader import DataLoader
    from ep_tpu.data.transforms import build_transforms
    from ep_tpu.models.assembly import ProbeModel, build_backbone_config
    from ep_tpu.parallel.mesh import make_mesh, set_current_mesh, shard_batch

    mesh = make_mesh()
    set_current_mesh(mesh)
    backbone_cfg = build_backbone_config(cfg)
    model = ProbeModel(backbone_cfg, cfg)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib
    with jax.default_device(cpu) if cpu else contextlib.nullcontext():
        variables = model.init(
            jax.random.key(cfg.seed),
            jnp.zeros((2, cfg.image_size, cfg.image_size, 3)), train=False)
    if cfg.finetune:
        from ep_tpu.convert.torch_vit import load_pretrained_backbone
        variables = load_pretrained_backbone(cfg, backbone_cfg, variables)
    if args.head_ckpt:
        from ep_tpu.runtime.checkpoint import load_model
        from ep_tpu.train.lars import build_optimizer
        from ep_tpu.train.state import create_train_state
        state = create_train_state(variables, build_optimizer("lars", 0.0),
                                   cfg.finetuning)
        state, _, _ = load_model(cfg.replace(resume=args.head_ckpt), state)
        variables = {"params": state.full_params(),
                     "batch_stats": state.batch_stats}

    _, transform_val = build_transforms(cfg)
    ds_train, ds_val = build_datasets(cfg)
    dataset = ds_train if args.split == "train" else ds_val
    loader = DataLoader(dataset, cfg.batch_size, transform_val,
                        num_workers=cfg.num_workers,
                        num_processes=jax.process_count(),
                        process_index=jax.process_index())

    @jax.jit
    def step(vs, images):
        logits, feats = model.apply(vs, images, train=False,
                                    return_backbone_features=True)
        return logits, feats

    feats_all, logits_all, labels_all = [], [], []
    for i, (images, labels, valid) in enumerate(iter(loader)):
        images = shard_batch(images, mesh)
        logits, feats = step(variables, images)
        keep = valid > 0
        feats_all.append(np.asarray(jax.device_get(feats))[keep])
        logits_all.append(np.asarray(jax.device_get(logits))[keep])
        labels_all.append(labels[keep])
        if i % 20 == 0:
            print(f"[extract] batch {i}/{len(loader)}")

    feats = np.concatenate(feats_all)
    labels = np.concatenate(labels_all)
    payload = {"features": feats, "labels": labels,
               "cls_features": cfg.cls_features, "model": cfg.model}
    if args.head_ckpt:
        payload["logits"] = np.concatenate(logits_all)
    np.savez(args.out, **payload)
    print(f"[extract] wrote {args.out}: features {feats.shape}, "
          f"labels {labels.shape}")


if __name__ == "__main__":
    main()
