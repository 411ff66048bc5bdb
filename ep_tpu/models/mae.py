"""MAE masked-autoencoder (encoder + decoder), flax.

Counterpart of the reference's models_mae.py:22-250: fixed 2-D sin-cos pos
embeddings, argsort-of-noise random masking, shallow decoder, per-patch MSE
on masked patches (optionally pixel-normalized). The probing path never uses
this (probing consumes the plain ViT encoder); it exists for the
MaskedAutoencoderViT branches of evaluate()/extract_features()
(engine_finetune.py:133-135,193-195) and for reconstruction experiments.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ep_tpu.utils.pos_embed import get_2d_sincos_pos_embed
from .vit import Block, ViTConfig


@dataclass(frozen=True)
class MAEConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def encoder_vit(self) -> ViTConfig:
        return ViTConfig(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=True, dtype=self.dtype,
        )

    def decoder_vit(self) -> ViTConfig:
        return ViTConfig(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.decoder_embed_dim, depth=self.decoder_depth,
            num_heads=self.decoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=True, dtype=self.dtype,
        )


def random_masking(x: jnp.ndarray, mask_ratio: float, rng: jax.Array):
    """Per-sample masking by argsort of uniform noise (models_mae.py:123-149)."""
    N, L, D = x.shape
    len_keep = int(L * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (N, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((N, L))
    mask = mask.at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


class MaskedAutoencoderViT(nn.Module):
    cfg: MAEConfig

    def patchify(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) NHWC -> (N, L, p*p*3), channel-last within a patch
        matching torch's 'nchpwq -> nhwpqc' ordering (models_mae.py:96-107)."""
        p = self.cfg.patch_size
        n, H, W, c = imgs.shape
        h, w = H // p, W // p
        x = imgs.reshape(n, h, p, w, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # n h w p q c
        return x.reshape(n, h * w, p * p * c)

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.patch_size
        n, L, _ = x.shape
        h = w = int(np.sqrt(L))
        x = x.reshape(n, h, w, p, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, h * p, w * p, 3)

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, mask_ratio: float = 0.75,
                 *, rng: jax.Array = None, return_latent: bool = False):
        c = self.cfg
        if mask_ratio > 0.0:
            rng = rng if rng is not None else self.make_rng("masking")

        # --- encoder (models_mae.py:151-171) --------------------------------
        pos = jnp.asarray(get_2d_sincos_pos_embed(
            c.embed_dim, int(c.num_patches ** 0.5), cls_token=True))[None]
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(imgs.astype(c.dtype))
        x = x.reshape(imgs.shape[0], -1, c.embed_dim)
        x = x + pos[:, 1:].astype(c.dtype)
        if mask_ratio > 0.0:
            x, mask, ids_restore = random_masking(x, mask_ratio, rng)
        else:
            # deterministic full-token pass (probing on the MAE latent):
            # no shuffle, so patch tokens stay in spatial order
            B_, L_ = x.shape[0], x.shape[1]
            mask = jnp.zeros((B_, L_))
            ids_restore = jnp.broadcast_to(jnp.arange(L_), (B_, L_))
        cls_tok = self.param("cls_token", nn.initializers.normal(0.02),
                             (1, 1, c.embed_dim), jnp.float32)
        cls = (cls_tok + pos[:, :1]).astype(c.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (x.shape[0], 1, c.embed_dim)), x], axis=1)
        enc_cfg = c.encoder_vit()
        for i in range(c.depth):
            x, _ = Block(enc_cfg, layer_idx=i, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="norm")(x)
        latent = x
        if return_latent:
            return latent, mask, ids_restore

        # --- decoder (models_mae.py:173-198) --------------------------------
        dec_pos = jnp.asarray(get_2d_sincos_pos_embed(
            c.decoder_embed_dim, int(c.num_patches ** 0.5), cls_token=True))[None]
        y = nn.Dense(c.decoder_embed_dim, dtype=c.dtype, name="decoder_embed")(latent)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, c.decoder_embed_dim), jnp.float32)
        B = y.shape[0]
        n_masked = ids_restore.shape[1] + 1 - y.shape[1]
        mask_tokens = jnp.broadcast_to(
            mask_token.astype(c.dtype), (B, n_masked, c.decoder_embed_dim))
        y_ = jnp.concatenate([y[:, 1:], mask_tokens], axis=1)
        y_ = jnp.take_along_axis(y_, ids_restore[:, :, None], axis=1)
        y = jnp.concatenate([y[:, :1], y_], axis=1)
        y = y + dec_pos.astype(c.dtype)
        dec_cfg = c.decoder_vit()
        for i in range(c.decoder_depth):
            y, _ = Block(dec_cfg, layer_idx=i, name=f"decoder_blocks_{i}")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="decoder_norm")(y)
        pred = nn.Dense(c.patch_size ** 2 * c.in_chans, dtype=c.dtype,
                        name="decoder_pred")(y)
        pred = pred[:, 1:]

        # --- loss (models_mae.py:200-218) ------------------------------------
        target = self.patchify(imgs.astype(jnp.float32))
        if c.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / (var + 1e-6) ** 0.5
        loss = ((pred.astype(jnp.float32) - target) ** 2).mean(axis=-1)
        loss = (loss * mask).sum() / mask.sum()
        return loss, pred, mask


def mae_vit_base_patch16(**kw) -> MAEConfig:
    return MAEConfig(embed_dim=768, depth=12, num_heads=12, **kw)


def mae_vit_large_patch16(**kw) -> MAEConfig:
    return MAEConfig(embed_dim=1024, depth=24, num_heads=16, **kw)


def mae_vit_huge_patch14(**kw) -> MAEConfig:
    return MAEConfig(patch_size=14, embed_dim=1280, depth=32, num_heads=16,
                     **kw)
