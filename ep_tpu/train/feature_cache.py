"""Feature-cache probing: extract frozen-backbone features ONCE, then train
the head on cached descriptors/tokens.

The reference re-runs the frozen encoder on every epoch of every probe run
(90 epochs × the full dataset, models_vit.py:198-398 inside the train loop).
With the backbone frozen and val-style determinism this is redundant work;
this mode (our --cache_features extension, SURVEY.md §7 design decision 1)
runs the encoder one time per split and then trains the head at
memory-bandwidth speed.

Semantics notes (documented differences from no-cache training):
  * train images are transformed ONCE with the epoch-0 augmentation draw, so
    later epochs reuse the same crops (like the reference's kNN path, which
    forces the val transform on train, main_linprobe.py:236-237);
  * features are stored float16 in a disk-backed memmap when they exceed
    2 GiB, float32 in RAM otherwise.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ep_tpu.parallel.mesh import shard_batch


def extract_split(backbone_apply, loader, mesh, cache_dir: str, name: str,
                  memmap_threshold: int = 2 << 30):
    """Run the frozen backbone over a split → (features array, labels).

    The RAM-vs-memmap decision is made ONCE, at the first batch, from
    dataset-length × per-row bytes (valid-mask filtering can shrink early
    batches, so a per-batch estimate could flip mid-stream and strand
    already-accumulated rows — round-1 Weak #4)."""
    multi = jax.process_count() > 1
    if multi:
        from jax.experimental import multihost_utils

    feats_list, labels_list = [], []
    memmap = None
    use_memmap = None
    n_written = 0

    def consume(fd, labels, valid):
        """Materialize one batch and append/write it."""
        nonlocal memmap, use_memmap, n_written
        if multi:
            # every host contributed its local loader shard to the global
            # batch; gather the full batch (and host-side labels/masks) so
            # all hosts end up with the complete cache and can train on
            # identically-shuffled epochs
            f = np.asarray(multihost_utils.process_allgather(fd,
                                                             tiled=True))
            labels = np.concatenate(
                multihost_utils.process_allgather(labels))
            valid = np.concatenate(multihost_utils.process_allgather(valid))
        else:
            f = np.asarray(jax.device_get(fd))
        keep = valid > 0
        f = f[keep]
        labels_list.append(labels[keep])
        if use_memmap is None:
            per_row = int(np.prod(f.shape[1:])) * f.dtype.itemsize
            use_memmap = bool(cache_dir) and \
                per_row * len(loader.dataset) > memmap_threshold
            if use_memmap:
                os.makedirs(cache_dir, exist_ok=True)
                memmap = np.lib.format.open_memmap(
                    os.path.join(cache_dir, f"feat_cache_{name}.npy"),
                    mode="w+", dtype=np.float16,
                    shape=(len(loader.dataset),) + f.shape[1:])
        if memmap is not None:
            memmap[n_written:n_written + len(f)] = f.astype(np.float16)
        else:
            feats_list.append(f)
        n_written += len(f)

    # one-batch-lag materialization (single-host): the next forward is
    # already dispatched while the previous features transfer, instead of
    # paying the ~26 ms relay RTT per batch. Multi-host consumes eagerly
    # (process_allgather is a collective; deferring it buys nothing).
    pending = None
    for images, labels, valid in iter(loader):
        images = shard_batch(images, mesh)
        fd = backbone_apply(images)
        if multi:
            consume(fd, labels, valid)
            continue
        if pending is not None:
            consume(*pending)
        pending = (fd, labels, valid)
    if pending is not None:
        consume(*pending)
    labels = np.concatenate(labels_list)
    if memmap is not None:
        memmap.flush()
        return memmap[:n_written], labels
    return np.concatenate(feats_list), labels


def make_head_steps(head, mesh, tx, lr_fn):
    """Jitted train/eval steps that consume cached features directly."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ep_tpu.parallel.mesh import DATA_AXIS
    from ep_tpu.train.steps import cross_entropy, topk_correct, global_grad_norm

    def train_step(state, feats, labels):
        feats = jax.lax.with_sharding_constraint(
            feats, NamedSharding(mesh, P(DATA_AXIS)))

        def loss_fn(trainable):
            variables = {"params": trainable["head"]}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats.get("head", {})
            logits, updates = head.apply(
                variables, feats, train=True, mutable=["batch_stats"])
            loss = cross_entropy(logits, labels).mean()
            return loss, (logits, {"head": updates.get("batch_stats", {})})

        (loss, (logits, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        lr = lr_fn(state.step)
        raw, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = jax.tree_util.tree_map(
            lambda p, u: (p.astype(jnp.float32) - lr * u).astype(p.dtype),
            state.trainable, raw)
        metrics = {
            "loss": loss,
            "acc1": topk_correct(logits, labels, 1).mean() * 100.0,
            "acc5": topk_correct(logits, labels, 5).mean() * 100.0,
            "lr": lr, "grad_norm": global_grad_norm(grads),
        }
        return state.replace(step=state.step + 1, trainable=new_trainable,
                             batch_stats=new_bn, opt_state=new_opt), metrics

    def eval_step(state, feats, labels, valid):
        variables = {"params": state.trainable["head"]}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats.get("head", {})
        logits = head.apply(variables, feats, train=False)
        loss = cross_entropy(logits, labels)
        return {
            "loss_sum": (loss * valid).sum(),
            "acc1_sum": (topk_correct(logits, labels, 1) * valid).sum() * 100.0,
            "acc5_sum": (topk_correct(logits, labels, 5) * valid).sum() * 100.0,
            "count": valid.sum(),
        }, logits.argmax(axis=-1)

    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


class CachedFeatureLoader:
    """Batches over cached features with per-epoch shuffling; mirrors the
    DataLoader protocol (set_epoch / __len__ / iteration with masks).

    ``feats`` may be a LIST of per-augmentation variants (--cache_augs K:
    K epoch-seeded crops of every image, extracted in dataset order so the
    labels align across variants); epoch e trains on variant e % K, so
    successive epochs see different crops like no-cache training does."""

    def __init__(self, feats, labels, batch_size: int, shuffle: bool,
                 drop_last: bool, seed: int = 0):
        self.variants = list(feats) if isinstance(feats, (list, tuple)) \
            else [feats]
        self.labels = labels.astype(np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.labels)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        n = len(self.labels)
        idx = (np.random.default_rng((self.seed, self.epoch)).permutation(n)
               if self.shuffle else np.arange(n))
        feats = self.variants[self.epoch % len(self.variants)]
        bs = self.batch_size
        for b in range(len(self)):
            sel = idx[b * bs:(b + 1) * bs]
            f = np.asarray(feats[sel], np.float32)
            l = self.labels[sel]
            valid = np.ones(len(sel), np.float32)
            if len(sel) < bs:
                pad = bs - len(sel)
                f = np.concatenate([f, np.zeros((pad,) + f.shape[1:], f.dtype)])
                l = np.concatenate([l, np.zeros(pad, l.dtype)])
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            yield f, l, valid
