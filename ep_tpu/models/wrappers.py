"""Token-source wrappers for hub-style backbones (CAPI / DINOv2 / OpenCLIP).

The reference wraps torch.hub/open_clip models and routes cls vs patch tokens
to the head (models_capi.py:4-33, models_more.py:5-107). Zero-egress
TPU-native equivalent: the backbone is a converted param pytree run through
our generic ViT (with the right arch options — register tokens, final norm,
LayerScale), and the wrapper reproduces the token routing:

  * ``cls``   → pooled/class token → head
  * ``*_all`` → [CLS]+patch tokens → head
  * else      → patch tokens → head

Register tokens (DINOv2) are excluded from the patch stream, like
get_intermediate_layers(return_class_token=True) does.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ep_tpu.configs import TrainConfig
from ep_tpu.poolings.registry import ProbeHead
from .vit import ViTConfig, VisionTransformer


class TokenSourceWrapper(nn.Module):
    """Generic (cls, patch)-token router + grafted head — covers the
    CapiWrapper / DinoWrapper / CLIPWrapper call protocol."""

    backbone_cfg: ViTConfig
    cfg: TrainConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 return_backbone_features: bool = False):
        cfg = self.cfg
        feats, _, _ = VisionTransformer(self.backbone_cfg, name="backbone")(
            images, "both")  # (B, 1+N, D); register tokens already excluded
        if not cfg.finetuning:
            feats = jax.lax.stop_gradient(feats)
        cls_tok, patch_tok = feats[:, 0], feats[:, 1:]

        if cfg.cls_features == "cls":
            head_in = cls_tok
        elif "all" in cfg.cls_features:
            head_in = feats
        else:
            head_in = patch_tok

        head = ProbeHead(cfg, self.backbone_cfg.embed_dim,
                         self.backbone_cfg.num_patches,
                         dtype=self.backbone_cfg.dtype, name="head")
        out = head(head_in, train=train)
        if return_backbone_features:
            backbone_feats = cls_tok if cfg.cls_features == "cls" else patch_tok
            return out, backbone_feats
        return out


def dinov2_config(name: str, image_size: int = 224,
                  dtype: Any = jnp.bfloat16) -> ViTConfig:
    """DINOv2 towers: patch 14, LayerScale, final LN, (registers for v2-reg)."""
    dims = {"vits14": (384, 12, 6), "vitb14": (768, 12, 12),
            "vitl14": (1024, 24, 16), "vitg14": (1536, 40, 24)}
    key = name.split("_")[-1].replace("_reg", "")
    d, depth, heads = dims.get(key, (1024, 24, 16))
    reg = 4 if "reg" in name else 0
    return ViTConfig(
        img_size=image_size, patch_size=14, embed_dim=d, depth=depth,
        num_heads=heads, init_values=1e-5, final_norm="ln",
        reg_tokens=reg, mlp_type="swiglu" if "g14" in key else "gelu",
        dtype=dtype,
    )


def capi_config(image_size: int = 224, dtype: Any = jnp.bfloat16) -> ViTConfig:
    """CAPI ViT-L/14 (models_capi.py wraps hub 'capi_vitl14_in1k')."""
    return ViTConfig(img_size=image_size, patch_size=14, embed_dim=1024,
                     depth=24, num_heads=16, final_norm="ln",
                     class_token=False, reg_tokens=16, dtype=dtype)


def openclip_vit_config(name: str, image_size: int = 224,
                        dtype: Any = jnp.bfloat16) -> ViTConfig:
    """OpenCLIP visual towers as generic ViTs (pre-norm, final LN).

    The cls-path output projection (different embed dim for cls vs patch
    tokens, models_more.py:55-60) is handled by the converter exporting
    the PROJECTED cls token dimension when --cls_features cls."""
    dims = {"ViT-B-16": (768, 12, 12, 16), "ViT-L-14": (1024, 24, 16, 14),
            "ViT-L-16": (1024, 24, 16, 16)}
    d, depth, heads, patch = dims.get(name, (1024, 24, 16, 14))
    return ViTConfig(img_size=image_size, patch_size=patch, embed_dim=d,
                     depth=depth, num_heads=heads, final_norm="ln",
                     norm_eps=1e-5, dtype=dtype)
