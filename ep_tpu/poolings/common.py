"""Shared initializers/util for the pooling zoo.

The heads are trained from scratch, so initialization distributions matter
for parity with the reference's torch defaults:
  * torch ``nn.Linear`` default: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in) for the
    weight, U(±1/√fan_in) for the bias.
  * timm ``trunc_normal_(std)``: normal truncated at ±2σ.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

# U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch Linear default weight init.
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense(features: int, use_bias: bool = True, name: str = None,
          dtype=jnp.bfloat16, fan_in: int = None,
          kernel_init=None, bias_init=None) -> nn.Dense:
    """Dense with torch-Linear default initialization."""
    return nn.Dense(
        features, use_bias=use_bias, dtype=dtype, name=name,
        kernel_init=kernel_init or torch_linear_init,
        bias_init=bias_init or (torch_bias_init(fan_in) if fan_in else nn.initializers.zeros),
    )


def trunc_normal(std: float):
    return nn.initializers.truncated_normal(stddev=std)


def normal(std: float):
    return nn.initializers.normal(stddev=std)


def tokens_to_grid(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) tokens -> (B, H, W, C) square grid (NHWC)."""
    B, N, C = x.shape
    hw = int(round(N ** 0.5))
    assert hw * hw == N, f"N={N} must be a perfect square"
    return x.reshape(B, hw, hw, C)
