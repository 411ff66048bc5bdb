"""Per-iteration warmup + half-cycle cosine LR schedule.

Reference util/lr_sched.py:3-15, called with the FRACTIONAL epoch
``data_iter_step / len(loader) + epoch`` every accum boundary
(engine_finetune.py:43-44). Base-LR scaling: lr = blr * eff_batch / 256
(main_linprobe.py:609-610).
"""
from __future__ import annotations

import jax.numpy as jnp


def lr_at_epoch(frac_epoch, lr: float, min_lr: float, warmup_epochs: float,
                epochs: float):
    """LR as a function of fractional epoch (traceable)."""
    frac_epoch = jnp.asarray(frac_epoch, jnp.float32)
    warm = lr * frac_epoch / jnp.maximum(warmup_epochs, 1e-8)
    denom = jnp.maximum(epochs - warmup_epochs, 1e-8)
    cos = min_lr + (lr - min_lr) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * (frac_epoch - warmup_epochs) / denom)
    )
    if warmup_epochs <= 0:
        return cos
    return jnp.where(frac_epoch < warmup_epochs, warm, cos)


def make_lr_fn(cfg, steps_per_epoch: int):
    """step index -> lr, reproducing the per-iteration fractional-epoch call."""
    lr = cfg.lr if cfg.lr is not None else cfg.blr * cfg.eff_batch_size / 256.0

    def lr_fn(step):
        frac_epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
        return lr_at_epoch(frac_epoch, lr, cfg.min_lr, cfg.warmup_epochs,
                           cfg.epochs)

    return lr_fn


def resolve_lr(cfg) -> float:
    return cfg.lr if cfg.lr is not None else cfg.blr * cfg.eff_batch_size / 256.0
