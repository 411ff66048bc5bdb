"""Extra CNN-era poolings (not reachable from the CLI, like the reference).

The reference carries a collection of classical poolings in
poolings/other_pool.py:14-388 that no --cls_features value dispatches to
(SURVEY.md §2.3 "unused extras"). Provided here for API completeness:
LSE, GeM, generalized max-pooling, and a slot-attention pooling.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import dense


class LSEPool(nn.Module):
    """Log-sum-exp pooling with learnable temperature r."""

    r_init: float = 10.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, N, C)
        r = self.param("r", nn.initializers.constant(self.r_init), (),
                       jnp.float32)
        xr = x.astype(jnp.float32) * r
        return (jax.nn.logsumexp(xr, axis=1) - jnp.log(x.shape[1])) / r


class GeMPool(nn.Module):
    """Generalized-mean pooling with learnable exponent p."""

    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.param("p", nn.initializers.constant(self.p_init), (),
                       jnp.float32)
        xc = jnp.clip(x.astype(jnp.float32), self.eps, None)
        return (xc ** p).mean(axis=1) ** (1.0 / p)


class GeneralizedMaxPool(nn.Module):
    """Generalized max pooling: solves for weights that equalize each
    token's dot product with the pooled vector (ridge-regularized)."""

    lam: float = 1e2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        xf = x.astype(jnp.float32)
        K = jnp.einsum("bnc,bmc->bnm", xf, xf)
        A = K + self.lam * jnp.eye(N)
        ones = jnp.ones((B, N, 1))
        alpha = jnp.linalg.solve(A, ones)
        return jnp.einsum("bn,bnc->bc", alpha[..., 0], xf)


class SlotPooling(nn.Module):
    """Slot-attention pooling (other_pool.py:322-388): iterative slot updates
    with a GRU-free simplification (residual MLP instead of GRUCell), max
    over slots."""

    dim: int
    num_slots: int = 4
    iters: int = 3
    eps: float = 1e-8
    hidden_dim: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, rng: jax.Array = None) -> jnp.ndarray:
        B, N, D = x.shape
        scale = D ** -0.5
        mu = self.param("slots_mu", nn.initializers.normal(1.0), (1, 1, D),
                        jnp.float32)
        slots = jnp.broadcast_to(mu.astype(x.dtype),
                                 (B, self.num_slots, D))
        xin = nn.LayerNorm(dtype=self.dtype, name="norm_input")(x)
        k = dense(D, dtype=self.dtype, fan_in=D, name="to_k")(xin)
        v = dense(D, dtype=self.dtype, fan_in=D, name="to_v")(xin)
        norm_slots = nn.LayerNorm(dtype=self.dtype, name="norm_slots")
        norm_ff = nn.LayerNorm(dtype=self.dtype, name="norm_pre_ff")
        to_q = dense(D, dtype=self.dtype, fan_in=D, name="to_q")
        hidden = max(D, self.hidden_dim)
        fc1 = dense(hidden, dtype=self.dtype, fan_in=D, name="mlp_fc1")
        fc2 = dense(D, dtype=self.dtype, fan_in=hidden, name="mlp_fc2")
        upd = dense(D, dtype=self.dtype, fan_in=2 * D, name="update")

        for _ in range(self.iters):
            q = to_q(norm_slots(slots))
            dots = jnp.einsum("bid,bjd->bij", q, k,
                              preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(dots, axis=1) + self.eps
            attn = attn / attn.sum(axis=-1, keepdims=True)
            updates = jnp.einsum("bjd,bij->bid", v, attn.astype(v.dtype))
            slots = slots + upd(jnp.concatenate([slots, updates], axis=-1))
            slots = slots + fc2(nn.relu(fc1(norm_ff(slots))))
        return slots.max(axis=1)
