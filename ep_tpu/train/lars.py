"""LARS optimizer in optax, matching the reference's semantics exactly.

Reference util/lars.py:4-37: for parameters with ndim > 1,
    dp = grad + weight_decay * p
    q  = trust_coefficient * ||p|| / ||dp||   (1 where either norm is 0)
    dp = dp * q
for ndim <= 1 parameters (norm scales/biases), NO weight decay and NO trust
scaling. Then heavy-ball momentum:  mu = momentum*mu + dp;  p -= lr*mu.

Note the skip rule is by tensor rank, not by name — optax.lars's masking
defaults differ, so we implement it directly. The transforms here emit the
RAW update (momentum buffer); the train step multiplies by -lr(step) to
drive the per-iteration warmup-cosine schedule (engine_finetune.py:43-44).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LarsState(NamedTuple):
    mu: optax.Updates


def scaled_lars(weight_decay: float = 0.0, momentum: float = 0.9,
                trust_coefficient: float = 0.001,
                mu_dtype=jnp.float32) -> optax.GradientTransformation:
    """mu_dtype=bfloat16 halves the momentum buffer's HBM (the update math
    still runs in f32; only the carried state rounds) — with 632M-param
    ViT-H full finetune this recovers ~1.3 GB and unlocks bs256 on a 16 GB
    chip. The reference implicitly keeps f32 (torch) momentum."""
    def init_fn(params):
        return LarsState(mu=jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype), params))

    def update_fn(updates, state, params):
        assert params is not None, "LARS requires params"

        def one(g, p, mu):
            dp = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if p.ndim > 1:
                dp = dp + weight_decay * p32
                param_norm = jnp.linalg.norm(p32)
                update_norm = jnp.linalg.norm(dp)
                one_ = jnp.ones_like(param_norm)
                q = jnp.where(
                    param_norm > 0.0,
                    jnp.where(update_norm > 0.0,
                              trust_coefficient * param_norm / update_norm,
                              one_),
                    one_,
                )
                dp = dp * q
            return momentum * mu.astype(jnp.float32) + dp

        new_mu = jax.tree_util.tree_map(one, updates, params, state.mu)
        carried = jax.tree_util.tree_map(lambda m: m.astype(mu_dtype), new_mu)
        return new_mu, LarsState(mu=carried)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(name: str, weight_decay: float,
                    mu_dtype=jnp.float32) -> optax.GradientTransformation:
    """lars | adamw | sgd, each emitting a raw update to be scaled by -lr(step)
    (mirrors main_linprobe.py:625-630; defaults match the torch optimizers).
    mu_dtype: storage dtype of the first-moment/momentum state (bfloat16
    halves it; see scaled_lars)."""
    if name == "lars":
        return scaled_lars(weight_decay=weight_decay, mu_dtype=mu_dtype)
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                mu_dtype=mu_dtype),
            optax.add_decayed_weights(weight_decay),
        )
    if name == "sgd":
        # torch.optim.SGD at the reference graft site: no momentum
        return optax.chain(optax.add_decayed_weights(weight_decay))
    raise ValueError(name)
