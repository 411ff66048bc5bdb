"""Tensor-parallel partition rules for the backbone over the ``model`` axis.

The reference has data parallelism only (SURVEY.md §2.6); the mesh here keeps
room for more: Megatron-style column/row sharding of the ViT's big matmuls so
huge backbones (ViT-H/SO400M) can split over ICI. XLA inserts the
all-reduces after attn.proj / mlp.fc2 from these shardings alone.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_for(path: tuple, leaf, model_size: int) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    shape = np.shape(leaf)

    def div(dim_idx: int) -> bool:
        return len(shape) > dim_idx and shape[dim_idx] % model_size == 0

    if "attn" in joined and joined.endswith("qkv/kernel") and div(1):
        return P(None, MODEL_AXIS)  # column parallel
    if "attn" in joined and joined.endswith("proj/kernel") and div(0):
        return P(MODEL_AXIS, None)  # row parallel (all-reduce after)
    if "mlp" in joined and joined.endswith(("fc1/kernel", "w12/kernel")) and div(1):
        return P(None, MODEL_AXIS)
    if "mlp" in joined and joined.endswith(("fc2/kernel", "w3/kernel")) and div(0):
        return P(MODEL_AXIS, None)
    if "attn" in joined and joined.endswith("qkv/bias") and div(0):
        return P(MODEL_AXIS)
    if "mlp" in joined and joined.endswith(("fc1/bias", "w12/bias")) and div(0):
        return P(MODEL_AXIS)
    return P()


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: backbone TP-sharded over ``model``
    (when the axis has size > 1), everything else replicated."""
    model_size = mesh.shape[MODEL_AXIS]

    def shard_tree(tree, use_tp: bool):
        def place(path, leaf):
            spec = _spec_for(path, leaf, model_size) if use_tp else P()
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.tree_util.tree_map_with_path(place, tree)

    frozen = shard_tree(state.frozen, use_tp=model_size > 1)
    trainable = shard_tree(state.trainable, use_tp=False)
    batch_stats = shard_tree(state.batch_stats, use_tp=False)
    opt_state = shard_tree(state.opt_state, use_tp=False)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return state.replace(step=step, trainable=trainable, frozen=frozen,
                         batch_stats=batch_stats, opt_state=opt_state)
