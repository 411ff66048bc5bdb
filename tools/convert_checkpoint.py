#!/usr/bin/env python3
"""Offline torch → flax checkpoint converter.

Converts a torch ``.pth`` state dict (MAE / SimMIM / timm / DeiT layouts)
into an ep_tpu flax backbone checkpoint (msgpack) so that torch never has to
be importable on the training hosts:

    python tools/convert_checkpoint.py \
        --model vit_base_patch16 --finetune mae_pretrain_vit_base.pth \
        --out mae_vitb16.eptpu.msgpack [--simmim] [--image_size 224]

The linprobe driver accepts either format for --finetune (it sniffs the
msgpack magic).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--finetune", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint_key", default="model")
    ap.add_argument("--simmim", action="store_true")
    ap.add_argument("--openclip", action="store_true",
                    help="OpenCLIP visual tower (--model ViT-B-16 etc.)")
    ap.add_argument("--openclip_pretrain", default="openai")
    ap.add_argument("--no_cls_token", action="store_true")
    ap.add_argument("--image_size", type=int, default=224)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import flax.serialization as fser

    from ep_tpu.configs import TrainConfig
    from ep_tpu.convert.torch_vit import load_torch_state_dict, torch_vit_to_flax
    from ep_tpu.models.assembly import build_backbone_config
    from ep_tpu.models.vit import VisionTransformer

    cfg = TrainConfig(model=args.model, simmim=args.simmim,
                      openclip=args.openclip,
                      openclip_pretrain=args.openclip_pretrain,
                      no_cls_token=args.no_cls_token,
                      image_size=args.image_size, amp="float32")
    backbone_cfg = build_backbone_config(cfg)
    m = VisionTransformer(backbone_cfg)
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3))
    template = m.init(jax.random.key(0), dummy, "cls")["params"]

    sd = load_torch_state_dict(args.finetune, args.checkpoint_key)
    params = torch_vit_to_flax(sd, template, backbone_cfg)
    with open(args.out, "wb") as f:
        f.write(fser.msgpack_serialize({"backbone": params,
                                        "model": args.model}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
