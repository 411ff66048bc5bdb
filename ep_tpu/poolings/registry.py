"""Pooling zoo registry + probe-head assembly.

The reference grafts ``model.head = Sequential(pool, BatchNorm1d(D',
affine=False, eps=1e-6), Linear(D', nb_classes))`` (main_linprobe.py:413-551;
plain LP gets Sequential(BN, Linear) at :551). ``ProbeHead`` is the same
composition as one flax module: pooled-descriptor BatchNorm runs on batch
stats in training (global-batch stats under GSPMD — documented SyncBN-style
difference from the reference's per-GPU stats) and running stats in eval.
Running-statistic updates are torch-exact (Bessel-corrected running var,
poolings/batchnorm.py) — flax's biased-var update drifted eval predictions
in short runs (see tests/test_engine_parity.py).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ep_tpu.configs import TrainConfig
from .abmilp import ABMILPHead
from .batchnorm import TorchBatchNorm
from .aim import AIMAttentionPooling
from .cae import CAEAttentiveBlock
from .cait import CaiTPooling
from .cbam import CbamPooling
from .clip_pool import CLIPAttentionPool2d, SigLIPAttentionPool
from .coca import CoCaCrossAttnPooling
from .common import dense
from .dinovit import DinoViTBlockPooling
from .dolg import DOLGSpatialAttention
from .ep import EfficientProbing
from .jepa import JEPAAttentivePooler
from .simpool import SimPool, SimPoolNoLinears

# pooling heads whose forward needs the train flag (they hold BatchNorm state)
_BN_POOLS = ("aim", "cbam", "dolg")


def base_name(cls_features: str) -> str:
    return cls_features[:-4] if cls_features.endswith("_all") else cls_features


def build_pooling(cfg: TrainConfig, dim: int, num_patches: int,
                  dtype: Any = jnp.bfloat16) -> Optional[nn.Module]:
    """Instantiate the pooling module for --cls_features, or None for LP."""
    name = base_name(cfg.cls_features)
    if cfg.cls_features.endswith("_all") and name in ("clip", "cbam", "dolg"):
        # The _all variants prepend [CLS], so the pool sees N+1 tokens —
        # never a square grid. These three reshape tokens to (H, W, C) (or
        # add a feat_size²+1-row pos_embed after prepending their own mean
        # token), so the reference's own modules crash on every _all input
        # too (attention_pool2d.py:158 broadcast, cbam.py / dolg.py square
        # reshape). Fail early with the reason instead of an opaque
        # broadcast/reshape error deep inside tracing.
        raise ValueError(
            f"--cls_features {cfg.cls_features}: the grid-reshaping "
            f"poolings (clip/cbam/dolg) cannot consume the [CLS]-prepended "
            f"N+1 token sequence the _all variants produce (N+1 is never a "
            f"square grid); the reference CLI exposes this name but its own "
            f"module crashes identically. Use '{name}' (patch tokens only).")
    if name == "abmilp":
        return ABMILPHead(
            dim=dim, self_attention_apply_to=cfg.abmilp_sa,
            activation=cfg.abmilp_act, depth=cfg.abmilp_depth,
            cond=cfg.abmilp_cond, content=cfg.abmilp_content,
            num_patches=num_patches, dtype=dtype, name="pool",
        )
    if name == "simpool":
        return SimPool(dim=dim, num_heads=1, dtype=dtype, name="pool")
    if name == "esimpool":
        return SimPoolNoLinears(dim=dim, num_heads=12, dtype=dtype, name="pool")
    if name == "clip":
        # feat_size 16 for CAPI, else 14 (main_linprobe.py:458-462). The
        # reference hardcodes these and breaks on any backbone whose token
        # grid differs (pos_embed has feat_size^2+1 rows and is added to
        # N+1 tokens, attention_pool2d.py:158) — fall back to the actual
        # grid so non-224px/16 backbones still run.
        feat_size = 16 if cfg.model == "capi_vitl14_in1k" else 14
        if feat_size * feat_size != num_patches:
            feat_size = int(round(num_patches ** 0.5))
            if feat_size * feat_size != num_patches:
                raise ValueError(
                    f"clip pooling requires a square token grid; got "
                    f"{num_patches} patch tokens (no integer feat_size)")
        return CLIPAttentionPool2d(in_features=dim, feat_size=feat_size,
                                   dtype=dtype, name="pool")
    if name == "siglip":
        return SigLIPAttentionPool(in_features=dim, dtype=dtype, name="pool")
    if name == "aim":
        return AIMAttentionPooling(dim=dim, num_heads=cfg.num_heads,
                                   dtype=dtype, name="pool")
    if name == "ep":
        return EfficientProbing(
            dim=dim, num_queries=cfg.ep_queries, d_out=cfg.d_out,
            dtype=dtype, use_pallas=cfg.pallas_pool, name="pool",
        )
    if name == "cbam":
        return CbamPooling(channels=dim, spatial_kernel_size=7,
                           dtype=dtype, name="pool")
    if name == "coca":
        return CoCaCrossAttnPooling(dim=dim, dtype=dtype, name="pool")
    if name == "cait":
        return CaiTPooling(embed_dim=dim, dtype=dtype, name="pool")
    if name == "dinovit":
        return DinoViTBlockPooling(d_model=dim, dtype=dtype, name="pool")
    if name == "jepa":
        return JEPAAttentivePooler(embed_dim=dim, num_heads=cfg.num_heads,
                                   dtype=dtype, name="pool")
    if name == "dolg":
        return DOLGSpatialAttention(in_c=dim, s3_dim=dim, dtype=dtype,
                                    name="pool")
    if name == "cae":
        return CAEAttentiveBlock(dim=dim, dtype=dtype, name="pool")
    return None  # plain LP: BN + Linear only


def head_in_features(cfg: TrainConfig, dim: int) -> int:
    """Descriptor size entering the BN+Linear classifier."""
    if base_name(cfg.cls_features) == "ep":
        return dim // cfg.d_out
    return dim


class ProbeHead(nn.Module):
    """pool → BatchNorm1d(affine=False, eps 1e-6) → Linear(nb_classes)."""

    cfg: TrainConfig
    dim: int
    num_patches: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_attn: bool = False):
        cfg = self.cfg
        pool = build_pooling(cfg, self.dim, self.num_patches, self.dtype)
        attn = None
        if pool is None and x.ndim == 3:
            # plain LP fed token-shaped (B, N, D) input: the reference's
            # Sequential(BN1d, Linear) crashes on this (--cls_features
            # both/raw/pos into LP, main_linprobe.py:551); we run BN over
            # the flattened token axis, which is probably not what the
            # user meant — warn loudly instead of failing silently.
            print(f"[warn] --cls_features {cfg.cls_features} feeds "
                  f"token-shaped {tuple(x.shape)} features into a plain "
                  f"LP head (the reference errors here); did you mean a "
                  f"pooling head or cls/gap?")
        if pool is not None:
            if base_name(cfg.cls_features) in _BN_POOLS:
                out = pool(x, train=train, return_attn=return_attn)
            else:
                out = pool(x, return_attn=return_attn)
            if return_attn:
                x, attn = out
            else:
                x = out
        # descriptor BatchNorm, no affine (main_linprobe.py:426 etc.);
        # torch-exact running stats (poolings/batchnorm.py)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-6,
            use_bias=False, use_scale=False, dtype=self.dtype, name="bn",
        )(x)
        d_in = head_in_features(cfg, self.dim)
        logits = dense(cfg.nb_classes, dtype=self.dtype, fan_in=d_in,
                       name="fc")(x)
        logits = logits.astype(jnp.float32)
        if return_attn:
            return logits, attn
        return logits
