"""Backbone + probe-head assembly (the reference's "model assembly" layer,
main_linprobe.py:338-562, rebuilt functionally).

``ProbeModel`` composes a frozen (or finetunable) backbone with the grafted
head. In probing mode the backbone output is wrapped in stop_gradient so XLA
compiles it as a pure inference subgraph — unlike the reference, which runs
the frozen backbone inside autodiff with requires_grad=False + DDP
find_unused_parameters (main_linprobe.py:553-562,619).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ep_tpu.configs import TrainConfig
from ep_tpu.poolings.registry import ProbeHead
from .vit import ViTConfig, VisionTransformer, remap_features, VIT_CONFIGS
from .vit import simmim_vit_base_patch16


def build_backbone_config(cfg: TrainConfig) -> ViTConfig:
    """Model-name dispatch (main_linprobe.py:338-371)."""
    import jax.numpy as jnp
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
             "none": jnp.float32, "float16": jnp.bfloat16}[cfg.amp]
    kw = dict(img_size=cfg.image_size, dtype=dtype,
              attn_impl=getattr(cfg, "attn_impl", "xla"),
              scan_blocks=getattr(cfg, "scan_blocks", False),
              remat_blocks=getattr(cfg, "remat_blocks", False),
              remat_policy=getattr(cfg, "remat_policy", "none"),
              int8_mlp=getattr(cfg, "int8_mlp", False))
    if cfg.simmim:
        return simmim_vit_base_patch16(**kw)
    if cfg.openclip:
        from .wrappers import openclip_vit_config
        return openclip_vit_config(
            cfg.model, cfg.image_size, dtype,
            pretrain=getattr(cfg, "openclip_pretrain", "openai"),
        ).replace(attn_impl=kw["attn_impl"])
    name = cfg.model
    if name.startswith("mae_vit"):
        # probe the MAE autoencoder's encoder latent. The reference's
        # MaskedAutoencoderViT branches (engine_finetune.py:133-135,193-196)
        # are vestigial — no driver constructs one, and the 4-tuple unpack
        # doesn't match MAE's (loss, pred, mask) return — so this is the
        # working equivalent: full-token (mask_ratio=0) encoder pass.
        from .mae import (mae_vit_base_patch16, mae_vit_huge_patch14,
                          mae_vit_large_patch16)
        builders = {"mae_vit_base_patch16": mae_vit_base_patch16,
                    "mae_vit_large_patch16": mae_vit_large_patch16,
                    "mae_vit_huge_patch14": mae_vit_huge_patch14}
        if name not in builders:
            raise ValueError(f"unknown MAE model {name}")
        return builders[name](img_size=cfg.image_size, dtype=dtype)
    if name.startswith("capi"):
        # CAPI ViT-L/14 (models_capi.py): no [CLS], 16 registers, register-
        # mean global repr; config from wrappers.py (single source of truth)
        from .wrappers import capi_config
        return capi_config(cfg.image_size, dtype).replace(
            attn_impl=kw["attn_impl"], scan_blocks=kw["scan_blocks"],
            remat_blocks=kw["remat_blocks"],
            remat_policy=kw["remat_policy"])
    if name.startswith("dinov2"):
        from .wrappers import dinov2_config
        return dinov2_config(name, cfg.image_size, dtype).replace(
            attn_impl=kw["attn_impl"], scan_blocks=kw["scan_blocks"],
            remat_blocks=kw["remat_blocks"],
            remat_policy=kw["remat_policy"])
    if name not in VIT_CONFIGS:
        raise ValueError(f"unknown model {name}")
    extra = {}
    if "huge" in name:
        extra["class_token"] = not cfg.no_cls_token
    return VIT_CONFIGS[name](**extra).replace(**kw)


def oracle_config(backbone_cfg: ViTConfig) -> ViTConfig:
    """Config of the frozen DINO-teacher oracle used by the `dino` feature
    mode (models_vit.py:462-476 `_timm_oracle`: timm vit_base_patch16_224.dino
    for real-size backbones; a plain twin for tiny test backbones)."""
    cfg = backbone_cfg.replace(
        init_values=None, rel_pos_bias="none", use_abs_pos_emb=True,
        qkv_bias_mode="full", class_token=True, reg_tokens=0,
        cls_from_registers=False, pre_norm=False, proj_dim=None,
        scan_blocks=False)  # the oracle needs its final attention
    if backbone_cfg.embed_dim >= 384:  # real runs: DINO ViT-B/16
        cfg = cfg.replace(embed_dim=768, depth=12, num_heads=12,
                          patch_size=16)
    return cfg


class ProbeModel(nn.Module):
    """backbone(features mode) → head(pool, BN, linear)."""

    backbone_cfg: ViTConfig
    cfg: TrainConfig

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) NHWC
        train: bool = False,
        return_backbone_features: bool = False,
        return_attn: bool = False,
    ):
        cfg = self.cfg
        mode = remap_features(cfg.cls_features)

        from .mae import MAEConfig, MaskedAutoencoderViT
        if isinstance(self.backbone_cfg, MAEConfig):
            # MAE-latent probing (working stand-in for the reference's
            # vestigial MaskedAutoencoderViT eval/extract branches,
            # engine_finetune.py:133-135,193-196): deterministic full-token
            # encoder pass, then the same token-mode selection as the ViT.
            latent, _, _ = MaskedAutoencoderViT(
                self.backbone_cfg, name="backbone")(
                images, mask_ratio=0.0, return_latent=True)
            feats = VisionTransformer._select_features(
                mode, latent, latent[:, 0], latent[:, 1:], None,
                self.backbone_cfg)
        elif mode == "dino":
            # oracle-weighted pooling (models_vit.py:350-363): patch tokens of
            # the probed backbone weighted by a frozen DINO teacher's final
            # cls→patch attention. Oracle weights come from the converter
            # (timm vit_base_patch16_224.dino); random init otherwise.
            raw, _, _ = VisionTransformer(self.backbone_cfg, name="backbone")(
                images, "raw", cfg.return_block)
            fm = raw[:, self.backbone_cfg.num_prefix_tokens:]
            _, _, _, (d_attn, _) = VisionTransformer(
                oracle_config(self.backbone_cfg), name="oracle")(
                images, "cls", return_final_attn=True)
            d_attn = jax.lax.stop_gradient(d_attn[:, :, 0, 1:])  # (B, H, N)
            feats = (fm[:, None] * d_attn[..., None].astype(fm.dtype)
                     ).mean(axis=(1, 2))
        else:
            feats, _, _ = VisionTransformer(
                self.backbone_cfg, name="backbone")(
                images, mode, cfg.return_block)
        if not cfg.finetuning:
            feats = jax.lax.stop_gradient(feats)
        head = ProbeHead(
            cfg, self.backbone_cfg.embed_dim, self.backbone_cfg.num_patches,
            dtype=self.backbone_cfg.dtype, name="head",
        )
        out = head(feats, train=train, return_attn=return_attn)
        if return_backbone_features:
            if return_attn:
                logits, attn = out
                return logits, feats, attn
            return out, feats
        return out


def init_probe_model(cfg: TrainConfig, rng: jax.Array,
                     backbone_cfg: Optional[ViTConfig] = None):
    """Initialize the model; returns (model, variables)."""
    backbone_cfg = backbone_cfg or build_backbone_config(cfg)
    model = ProbeModel(backbone_cfg, cfg)
    dummy = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=True)
    return model, variables
