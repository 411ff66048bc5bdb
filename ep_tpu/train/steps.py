"""Jitted train/eval steps over the device mesh.

One jit region per step: frozen-backbone feature extraction (inference
subgraph, bf16, never differentiated), head forward+backward, LARS update
with the per-iteration warmup-cosine LR, and metric reduction — gradients and
metrics are globally correct by construction because the batch is sharded
over the ``data`` mesh axis and XLA inserts the ICI collectives (this
replaces DDP's NCCL all-reduce, main_linprobe.py:618-620, and the metric
all_reduce in util/misc.py:40-51 / engine_finetune.py:150-156).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ep_tpu.parallel.mesh import DATA_AXIS
from .state import TrainState


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def topk_correct(logits: jnp.ndarray, labels: jnp.ndarray, k: int) -> jnp.ndarray:
    """float (B,) indicator that the label is within the top-k logits."""
    _, idx = jax.lax.top_k(logits, min(k, logits.shape[-1]))
    return (idx == labels[:, None]).any(axis=1).astype(jnp.float32)


def global_grad_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    lr_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    device_aug=None,
):
    """Returns train_step(state, images, labels) -> (state, metrics).

    With ``device_aug`` (data/device_aug.DeviceAug), images arrive as u8
    staged batches and the random crop/flip/normalize runs here, inside
    the jit — keyed by the state's step counter, so identical under
    resume and at any process count."""

    def train_step(state: TrainState, images, labels):
        images = jax.lax.with_sharding_constraint(
            images, NamedSharding(mesh, P(DATA_AXIS)))
        labels = jax.lax.with_sharding_constraint(
            labels, NamedSharding(mesh, P(DATA_AXIS)))
        if device_aug is not None:
            images = device_aug.train_fn(state.step, images)

        def loss_fn(trainable):
            variables = {"params": {**state.frozen, **trainable}}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits, updates = model.apply(
                variables, images, train=True, mutable=["batch_stats"],
            )
            loss = cross_entropy(logits, labels).mean()
            return loss, (logits, updates.get("batch_stats", {}))

        (loss, (logits, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)

        lr = lr_fn(state.step)
        raw_updates, new_opt_state = tx.update(
            grads, state.opt_state, state.trainable)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, raw_updates)
        new_trainable = jax.tree_util.tree_map(
            lambda p, u: (p.astype(jnp.float32) + u).astype(p.dtype),
            state.trainable, updates)

        metrics = {
            "loss": loss,
            "acc1": topk_correct(logits, labels, 1).mean() * 100.0,
            "acc5": topk_correct(logits, labels, 5).mean() * 100.0,
            "lr": lr,
            "grad_norm": global_grad_norm(grads),
        }
        new_state = state.replace(
            step=state.step + 1,
            trainable=new_trainable,
            batch_stats=new_bn,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,))
    jitted.raw = train_step  # unjitted body, composable into lax.scan loops
    return jitted


def make_eval_step(model, mesh: Mesh, device_aug=None):
    """eval_step(state, images, labels, valid) -> summed metrics.

    ``valid`` masks padding rows of the (static-shape) final batch; sums are
    weighted so the host can divide by the true sample count — matching the
    reference's batch-size-weighted meters (engine_finetune.py:150-153).
    """

    def eval_step(state: TrainState, images, labels, valid):
        images = jax.lax.with_sharding_constraint(
            images, NamedSharding(mesh, P(DATA_AXIS)))
        if device_aug is not None:
            images = device_aug.eval_fn(images)
        variables = {"params": state.full_params()}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, images, train=False)
        loss = cross_entropy(logits, labels)
        c1 = topk_correct(logits, labels, 1)
        c5 = topk_correct(logits, labels, 5)
        preds = logits.argmax(axis=-1)
        return {
            "loss_sum": (loss * valid).sum(),
            "acc1_sum": (c1 * valid).sum() * 100.0,
            "acc5_sum": (c5 * valid).sum() * 100.0,
            "count": valid.sum(),
        }, preds

    return jax.jit(eval_step)


def make_extract_step(model, mesh: Mesh, device_aug=None):
    """Pooled-descriptor extraction for kNN (engine_finetune.py:168-213)."""

    def extract_step(state: TrainState, images):
        images = jax.lax.with_sharding_constraint(
            images, NamedSharding(mesh, P(DATA_AXIS)))
        if device_aug is not None:
            images = device_aug.eval_fn(images)
        variables = {"params": state.full_params()}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        _, feats = model.apply(
            variables, images, train=False, return_backbone_features=True)
        return feats

    return jax.jit(extract_step)
