"""2-D sine-cosine position embeddings and pos-embed interpolation.

TPU-native counterpart of the reference's ``util/pos_embed.py``
(/root/reference/util/pos_embed.py:11-87): same math, expressed in numpy/jax
so it can run at model-build time (numpy) or inside jit (jnp).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) sin/cos embedding."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed_from_grid(embed_dim: int, grid: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> np.ndarray:
    """Fixed 2-D sin-cos position embedding.

    Returns (grid_size**2 [+1], embed_dim) float32, with a zero row prepended
    when ``cls_token`` (matching util/pos_embed.py:11-27).
    """
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    pos_embed = get_2d_sincos_pos_embed_from_grid(embed_dim, grid)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, new_num_patches: int, num_extra_tokens: int = 1
) -> jnp.ndarray:
    """Bicubic-resize the patch part of a (1, T, D) position embedding.

    Counterpart of util/pos_embed.py:66-87 (DeiT-style): extra (cls/register)
    tokens are kept, the grid part is resized from its original square size to
    the new square size using bicubic interpolation.
    """
    embedding_size = pos_embed.shape[-1]
    orig_size = int((pos_embed.shape[-2] - num_extra_tokens) ** 0.5)
    new_size = int(new_num_patches ** 0.5)
    if orig_size == new_size:
        return pos_embed
    extra_tokens = pos_embed[:, :num_extra_tokens]
    pos_tokens = pos_embed[:, num_extra_tokens:]
    pos_tokens = pos_tokens.reshape(1, orig_size, orig_size, embedding_size)
    pos_tokens = jax.image.resize(
        pos_tokens, (1, new_size, new_size, embedding_size), method="bicubic"
    )
    pos_tokens = pos_tokens.reshape(1, new_size * new_size, embedding_size)
    return jnp.concatenate([extra_tokens, pos_tokens], axis=1)
