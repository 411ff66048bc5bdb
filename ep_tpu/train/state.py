"""Train state: trainable head params, frozen backbone, BN stats, optimizer.

Mirrors the reference's freeze/unfreeze rule (main_linprobe.py:553-562):
probing trains head params only; --finetuning puts the backbone into the
trainable tree as well. BN running stats (flax "batch_stats" collection)
ride along and are checkpointed with the head.
"""
from __future__ import annotations

from typing import Any, Dict

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    trainable: Dict[str, Any]  # params being optimized
    frozen: Dict[str, Any]  # params kept fixed (backbone in probing mode)
    batch_stats: Dict[str, Any]  # BN running stats
    opt_state: optax.OptState

    def full_params(self) -> Dict[str, Any]:
        return {**self.frozen, **self.trainable}


def split_params(params: Dict[str, Any], finetuning: bool):
    """{'backbone': ..., 'head': ...} → (trainable, frozen)."""
    if finetuning:
        return dict(params), {}
    trainable = {"head": params["head"]}
    frozen = {k: v for k, v in params.items() if k != "head"}
    return trainable, frozen


def create_train_state(variables: Dict[str, Any], tx: optax.GradientTransformation,
                       finetuning: bool) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    trainable, frozen = split_params(params, finetuning)
    opt_state = tx.init(trainable)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def cast_frozen(state: TrainState, dtype) -> TrainState:
    """Store the frozen backbone in the compute dtype.

    Probing never updates the backbone, and every matmul casts its weights
    to the compute dtype (bf16) anyway — keeping the frozen tree in f32
    just doubles the HBM bytes each step reads (and, under scan-over-
    layers, the per-layer dynamic-slice traffic). Call this only for
    probing + bf16 AMP; finetuning keeps f32 master weights."""
    return state.replace(frozen=jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") else x,
        state.frozen))


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) if hasattr(x, "shape") else 0
               for x in jax.tree_util.tree_leaves(tree))
