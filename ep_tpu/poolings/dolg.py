"""DOLG local-branch spatial attention pooling ("dolg").

Semantics of reference poolings/dolg/dolg.py:19-71 (SpatialAttention2d,
grafted with in_c = s3_dim = embed_dim, no ASPP, main_linprobe.py:532-541):
  * tokens → square grid; 1×1 conv (C→C, ResNet-style normal init
    std=√(2/fan_out), dolg/net.py:16-21) + BatchNorm2d(eps 1e-5);
  * the BN output is L2-normalized over channels (BEFORE the ReLU);
  * ReLU → 1×1 conv (C→1) → softplus attention score;
  * descriptor = spatial mean of score × normalized features → (B, C).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .batchnorm import TorchBatchNorm
from .common import tokens_to_grid


def _resnet_conv_init(key, shape, dtype=jnp.float32):
    # flax conv kernel shape: (kh, kw, in, out); fan_out = kh*kw*out
    fan_out = shape[0] * shape[1] * shape[-1]
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class DOLGSpatialAttention(nn.Module):
    in_c: int
    s3_dim: int = 1024
    act_fn: str = "relu"
    bn_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_attn: bool = False):
        g = tokens_to_grid(x)  # (B, H, W, C)
        g = nn.Conv(self.s3_dim, (1, 1), dtype=self.dtype,
                    kernel_init=_resnet_conv_init, name="conv1")(g)
        g = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=self.bn_eps, dtype=self.dtype,
                           name="bn")(g)

        fmap_norm = g / (
            jnp.linalg.norm(g.astype(jnp.float32), axis=-1, keepdims=True)
            .clip(1e-12).astype(g.dtype)
        )

        h = nn.relu(g) if self.act_fn == "relu" else nn.leaky_relu(g)
        h = nn.Conv(1, (1, 1), dtype=self.dtype,
                    kernel_init=_resnet_conv_init, name="conv2")(h)
        att = jax.nn.softplus(h.astype(jnp.float32)).astype(g.dtype)

        out = (att * fmap_norm).mean(axis=(1, 2))  # (B, C)
        if return_attn:
            return out, att
        return out
