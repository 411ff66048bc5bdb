"""Host-side train/eval/extract/kNN loops (engine_finetune.py rebuilt).

The hot math lives in the jitted steps (train/steps.py); these loops feed
sharded batches, meter already-global metrics, and implement the reference's
protocol details: per-iteration LR (inside the step), loss-finiteness abort
(engine_finetune.py:68-70), batch-size-weighted eval meters (:150-153), and
the chunked kNN classifier (:216-257) on device.
"""
from __future__ import annotations

import math
import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ep_tpu.parallel.mesh import shard_batch
from ep_tpu.utils.logging import MetricLogger, SmoothedValue


def _host_cast(images: np.ndarray, cfg) -> np.ndarray:
    """Cast images to bf16 on the host when the model computes in bf16 —
    halves host→device transfer bandwidth, which is the input-pipeline
    bottleneck on thin links."""
    if images.dtype == np.uint8:
        return images  # --device_aug staged batches ship as u8 (¼ of f32)
    if cfg is not None and cfg.amp in ("bfloat16", "float16"):
        import ml_dtypes
        return images.astype(ml_dtypes.bfloat16)
    return images


def train_one_epoch(train_step, state, loader, mesh, epoch: int, cfg,
                    log_writer=None) -> tuple:
    metric_logger = MetricLogger(delimiter="  ")
    metric_logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"
    print_freq = 20
    length = len(loader)

    # Metrics are materialized with a one-step lag so the host never blocks
    # the device pipeline on the current step's results (the reference
    # torch.cuda.synchronize()s every step, engine_finetune.py:79-80 — a
    # stall we deliberately avoid). The NaN abort therefore fires one step
    # late, which changes nothing observable.
    pending = None  # (it, metrics) from the previous step

    def drain(entry):
        it_prev, m = entry
        loss_value = float(m["loss"])
        if not math.isfinite(loss_value):
            print(f"Loss is {loss_value}, stopping training")
            sys.exit(1)
        metric_logger.update(
            loss=loss_value,
            acc1=float(m["acc1"]),
            acc5=float(m["acc5"]),
            lr=float(m["lr"]),
            grad_norm=float(m["grad_norm"]),
        )
        if log_writer is not None and (it_prev + 1) % cfg.accum_iter == 0:
            # epoch_1000x x-axis calibration (engine_finetune.py:92-98)
            epoch_1000x = int((it_prev / length + epoch) * 1000)
            log_writer.add_scalar("loss", loss_value, epoch_1000x)
            log_writer.add_scalar("lr", float(m["lr"]), epoch_1000x)

    for it, (images, labels, _valid) in enumerate(
            metric_logger.log_every(iter(loader), print_freq, header,
                                    length=length)):
        images, labels = shard_batch((_host_cast(images, cfg), labels), mesh)
        state, metrics = train_step(state, images, labels)
        if pending is not None:
            drain(pending)
        pending = (it, metrics)

    if pending is not None:
        drain(pending)

    print("Averaged stats:", metric_logger)
    return state, metric_logger.stats()


def evaluate(eval_step, state, loader, mesh, cfg=None,
             return_targets_and_preds: bool = False) -> Dict[str, float]:
    metric_logger = MetricLogger(delimiter="  ")
    header = "Test:"
    sums = {"loss_sum": 0.0, "acc1_sum": 0.0, "acc5_sum": 0.0, "count": 0.0}
    targets, preds = [], []

    # one-batch-lag drain, like train_one_epoch: the per-batch float()
    # sync otherwise costs the full dispatch RTT (~26 ms through the
    # relay) per eval batch — ~25% of an eval epoch at bs512.
    # Consequence: log_every's periodic prints show meters one batch
    # behind (final stats below drain everything and are exact).
    pending = None

    def drain(entry):
        batch_sums, batch_preds, host_labels, host_valid = entry
        if return_targets_and_preds:
            keep = host_valid > 0
            targets.append(host_labels[keep])
            preds.append(np.asarray(jax.device_get(batch_preds))[keep])
        for k in sums:
            sums[k] += float(batch_sums[k])
        n = max(float(batch_sums["count"]), 1.0)
        metric_logger.update_n(
            int(n),
            loss=float(batch_sums["loss_sum"]) / n,
            acc1=float(batch_sums["acc1_sum"]) / n,
            acc5=float(batch_sums["acc5_sum"]) / n,
        )

    for images, labels, valid in metric_logger.log_every(
            iter(loader), 10, header, length=len(loader)):
        host_labels, host_valid = labels, valid
        images, labels, valid = shard_batch(
            (_host_cast(images, cfg), labels, valid), mesh)
        batch_sums, batch_preds = eval_step(state, images, labels, valid)
        if pending is not None:
            drain(pending)
        pending = (batch_sums, batch_preds, host_labels, host_valid)
    if pending is not None:
        drain(pending)

    count = max(sums["count"], 1.0)
    stats = {
        "loss": sums["loss_sum"] / count,
        "acc1": sums["acc1_sum"] / count,
        "acc5": sums["acc5_sum"] / count,
    }
    print("* Acc@1 {:.3f} Acc@5 {:.3f} loss {:.3f}".format(
        stats["acc1"], stats["acc5"], stats["loss"]))
    if return_targets_and_preds:
        stats["targets"] = np.concatenate(targets) if targets else np.array([])
        stats["preds"] = np.concatenate(preds) if preds else np.array([])
    return stats


def extract_features(extract_step, state, loader, mesh):
    """Pooled descriptors + targets over a loader (engine_finetune.py:168-213).

    One-batch-lag device_get so the next batch's forward is already in
    flight while the previous features transfer (the per-batch sync costs
    the full ~26 ms relay RTT otherwise)."""
    feats, targets = [], []
    pending = None

    def drain(entry):
        f, labels, valid = entry
        fa = np.asarray(jax.device_get(f))
        keep = valid > 0
        feats.append(fa[keep])
        targets.append(labels[keep])

    for images, labels, valid in iter(loader):
        images = shard_batch(images, mesh)
        f = extract_step(state, images)
        if pending is not None:
            drain(pending)
        pending = (f, labels, valid)
    if pending is not None:
        drain(pending)
    return np.concatenate(feats), np.concatenate(targets)


def knn_classifier(train_features, train_labels, test_features, test_labels,
                   k: int, T: float, num_classes: int = 1000,
                   num_chunks: int = 500):
    """Temperature-weighted cosine kNN (engine_finetune.py:216-257), chunked
    (chunk × N_train) matmuls on device."""
    return knn_classifier_multi(
        train_features, train_labels, test_features, test_labels, [k], T,
        num_classes, num_chunks)[k]


def knn_classifier_multi(train_features, train_labels, test_features,
                         test_labels, ks, T: float, num_classes: int = 1000,
                         num_chunks: int = 500):
    """kNN for SEVERAL k values from one device pass.

    Returns {} when ks is empty (e.g. a train split smaller than every
    sweep k) instead of crashing on max(ks).

    The reference re-runs the full (test × train) similarity for every k
    in its sweep (main_linprobe.py:668-672 calls knn_classifier per k);
    here the device computes the top-max(k) neighbor list once — top_k's
    k is a static shape, so per-k calls would also mean one multi-minute
    remote compile each — and the per-k temperature-weighted vote runs on
    the host over that list. Identical math: the k-NN vote only reads the
    first k columns of the max(k)-sorted neighbor list."""
    if not ks:
        return {}
    # train features/labels travel as ARGUMENTS to the jitted fn: closing
    # over them would embed the full train matrix as an HLO constant and
    # balloon the (remote) compile payload — the same pitfall make_train_step
    # avoids for params (CLAUDE.md perf notes).
    train_features = jax.device_put(jnp.asarray(train_features))  # (N, D)
    train_labels = jax.device_put(jnp.asarray(train_labels, jnp.int32))
    test_features = np.asarray(test_features)

    n_test = test_features.shape[0]
    # the reference's num_chunks=500 is a GPU-memory knob; at its chunk
    # sizes the (chunk, N_train) matmul runs a handful of MXU rows and —
    # through the dispatch relay — one hard sync per chunk cost ~26 ms
    # each (measured 78 img/s end-to-end). Identical math at TPU-sized
    # chunks with the device_get deferred past the loop (dispatches
    # pipeline) measures ~100x faster; the (chunk, N_train) f32 sim
    # buffer stays ≤ a few hundred MB of HBM.
    imgs_per_chunk = min(max(256, n_test // num_chunks), n_test)
    k_max = min(max(ks), train_features.shape[0])

    @jax.jit
    def chunk_topk(feats, tr_feats, tr_labels):
        sim = feats @ tr_feats.T  # (chunk, N_train)
        dist, idx = jax.lax.top_k(sim, k_max)
        return dist, tr_labels[idx]  # (chunk, k_max) each

    outs, spans = [], []
    test_labels = np.asarray(test_labels)
    for s in range(0, n_test, imgs_per_chunk):
        e = min(s + imgs_per_chunk, n_test)
        feats = test_features[s:e]
        if len(feats) < imgs_per_chunk:
            # pad the ragged tail to the static chunk shape: one compiled
            # program instead of a second multi-minute remote compile
            feats = np.concatenate(
                [feats, np.zeros((imgs_per_chunk - len(feats),) + feats.shape[1:],
                                 feats.dtype)])
        outs.append(chunk_topk(feats, train_features, train_labels))
        spans.append((s, e))

    # drain the pipelined chain, then vote per k on host
    dists = np.concatenate([np.asarray(jax.device_get(d))[:e - s]
                            for (s, e), (d, _) in zip(spans, outs)])
    neigh = np.concatenate([np.asarray(jax.device_get(nb))[:e - s]
                            for (s, e), (_, nb) in zip(spans, outs)])
    rows = np.arange(n_test)
    results = {}
    # one reused f32 vote buffer across the k sweep: a fresh float64
    # (n_test, num_classes) per k is ~400 MB × 7 at 50k×1000 on the
    # single-core host; f32 keeps the exp-weighted vote well above the
    # ranking noise floor (weights are O(e^{1/T}) apart)
    probs = np.zeros((n_test, num_classes), np.float32)
    for k in ks:
        kk = min(k, k_max)
        weights = np.exp(dists[:, :kk].astype(np.float32) / T)
        probs.fill(0.0)
        np.add.at(probs, (rows[:, None], neigh[:, :kk]), weights)
        pred5 = np.argsort(-probs, axis=1)[:, :5]
        top1 = (pred5[:, 0] == test_labels).sum() * 100.0 / n_test
        top5 = (pred5 == test_labels[:, None]).any(axis=1).sum() \
            * 100.0 / n_test
        results[k] = (top1, top5)
    return results
