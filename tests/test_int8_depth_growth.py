"""Bound the int8 MLP kernel's feature-error growth with depth.

VERDICT r2 (Weak #2): the ~1.2%% feature-error claim needs a test that
pins error PROPAGATION, not just one block. Uses the tapped scan from
scripts/int8_accuracy_study.py in interpret mode: same weights down the
bf16 path and the int8 path, per-block mean relative error must stay
bounded and must not compound (LN at every block re-normalizes, so the
error should plateau, not grow multiplicatively).

The on-TPU counterpart (real kernels, ViT-B/H widths, top-1 deltas) is
scripts/int8_accuracy_study.py; its measured numbers live in
PERFORMANCE.md.
"""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent


def _load_study():
    spec = importlib.util.spec_from_file_location(
        "int8_accuracy_study", REPO / "scripts" / "int8_accuracy_study.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("int8_accuracy_study", mod)
    spec.loader.exec_module(mod)
    return mod


DEPTH = 8


def test_int8_error_bounded_and_non_compounding(monkeypatch):
    monkeypatch.setenv("EP_TPU_PALLAS_INTERPRET", "1")
    study = _load_study()
    from ep_tpu.models.vit import ViTConfig, VisionTransformer

    cfg_b = ViTConfig(img_size=32, patch_size=4, embed_dim=256, depth=DEPTH,
                      num_heads=4, dtype=jnp.float32, attn_impl="pallas",
                      scan_blocks=True)
    cfg_i = cfg_b.replace(int8_mlp=True)

    variables = VisionTransformer(cfg_b).init(
        jax.random.key(0), jnp.zeros((2, 32, 32, 3), jnp.float32), "pos")
    params = variables["params"]

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype("f"))

    def err_curve():
        ys_b = study.TapViT(cfg_b).apply({"params": params}, imgs)
        ys_i = study.TapViT(cfg_i).apply({"params": params}, imgs)
        ys_b = np.asarray(ys_b, np.float32)
        ys_i = np.asarray(ys_i, np.float32)
        num = np.abs(ys_i - ys_b).mean(axis=(1, 2, 3))
        den = np.abs(ys_b).mean(axis=(1, 2, 3)) + 1e-8
        return num / den

    err = err_curve()
    # every depth bounded: int8 stays a few-percent approximation
    assert err.max() < 0.05, err
    # non-compounding: the back half must not keep growing the way a
    # multiplicative cascade would (allow drift, forbid doubling)
    assert err[-1] < 2.0 * max(err[DEPTH // 2], 1e-4), err
