"""Backbone configs for hub-style model families (CAPI / DINOv2 / OpenCLIP).

Single source of truth consumed by ``assembly.build_backbone_config``. The
reference wraps torch.hub/open_clip models in thin nn.Modules that route
cls vs patch tokens to the head (models_capi.py:4-33, models_more.py:5-107);
here that routing is native to the generic ViT's feature modes
(``VisionTransformer._select_features``), so all a family needs is the
right ``ViTConfig`` (+ a converter key-map in ``convert/torch_vit.py``).

Token routing parity notes:
  * DINOv2 (models_more.py:16-34): get_intermediate_layers with
    return_class_token=True — register tokens excluded from the patch
    stream. Our ViT slices them off via num_prefix_tokens.
  * CAPI (models_capi.py:19-27): forward returns (global_repr, registers,
    feature_map); there is no [CLS] — ``cls`` mode uses the register mean
    (cls_from_registers=True), other modes use the patch feature map.
  * OpenCLIP (models_more.py:65-100): cls path applies the visual
    projection (different output dim); the converter exports the projected
    head input when --cls_features cls (see convert/torch_vit.py).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .vit import ViTConfig


def dinov2_config(name: str, image_size: int = 224,
                  dtype: Any = jnp.bfloat16) -> ViTConfig:
    """DINOv2 towers: patch 14, LayerScale 1e-5, final LN; '_reg' variants
    carry 4 register tokens; the giant tower uses SwiGLU."""
    dims = {"vits14": (384, 12, 6), "vitb14": (768, 12, 12),
            "vitl14": (1024, 24, 16), "vitg14": (1536, 40, 24)}
    core = name.replace("dinov2_", "").replace("_reg", "")
    d, depth, heads = dims.get(core, (1024, 24, 16))
    reg = 4 if name.endswith("_reg") else 0
    return ViTConfig(
        img_size=image_size, patch_size=14, embed_dim=d, depth=depth,
        num_heads=heads, init_values=1e-5, final_norm="ln",
        reg_tokens=reg, mlp_type="swiglu" if core == "vitg14" else "gelu",
        dtype=dtype,
    )


def capi_config(image_size: int = 224, dtype: Any = jnp.bfloat16) -> ViTConfig:
    """CAPI ViT-L/14 (models_capi.py wraps hub 'capi_vitl14_*'): no [CLS],
    16 register tokens, global_repr = register mean, final LN."""
    return ViTConfig(img_size=image_size, patch_size=14, embed_dim=1024,
                     depth=24, num_heads=16, final_norm="ln",
                     class_token=False, reg_tokens=16,
                     cls_from_registers=True, dtype=dtype)


def openclip_vit_config(name: str, image_size: int = 224,
                        dtype: Any = jnp.bfloat16,
                        pretrain: str = "openai") -> ViTConfig:
    """OpenCLIP visual towers as generic ViTs: ln_pre (pre_norm), final LN
    (ln_post over all tokens), cls-only visual projection (proj_dim — the
    cls-path embed dim differs from the patch width, models_more.py:55-60).
    OpenAI-pretrained towers use QuickGELU; laion-trained ones plain GELU."""
    dims = {"ViT-B-16": (768, 12, 12, 16, 512),
            "ViT-L-14": (1024, 24, 16, 14, 768),
            "ViT-L-16": (1024, 24, 16, 16, 768)}
    d, depth, heads, patch, proj = dims.get(name, (1024, 24, 16, 14, 768))
    return ViTConfig(img_size=image_size, patch_size=patch, embed_dim=d,
                     depth=depth, num_heads=heads, final_norm="ln",
                     norm_eps=1e-5, pre_norm=True, proj_dim=proj,
                     mlp_type="quick_gelu" if pretrain == "openai" else "gelu",
                     dtype=dtype)
