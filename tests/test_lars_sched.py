"""LARS update rule and warmup-cosine schedule vs closed-form numpy."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ep_tpu.configs import TrainConfig
from ep_tpu.train.lars import scaled_lars, build_optimizer
from ep_tpu.train.schedule import lr_at_epoch, make_lr_fn


def test_lars_matches_reference_rule():
    """Reference util/lars.py:12-37: trust scaling + wd only for ndim>1."""
    wd, mom, trust, lr = 0.01, 0.9, 0.001, 0.5
    params = {"w": jnp.array([[3.0, 0.0], [0.0, 4.0]]), "b": jnp.array([1.0, 2.0])}
    grads = {"w": jnp.array([[0.6, 0.0], [0.0, 0.8]]), "b": jnp.array([0.5, 0.5])}
    tx = scaled_lars(weight_decay=wd, momentum=mom, trust_coefficient=trust)
    st = tx.init(params)

    # step 1
    upd, st = tx.update(grads, st, params)
    # ndim>1: dp = g + wd*p ; q = trust*||p||/||dp|| ; mu = dp*q
    dp = np.asarray(grads["w"]) + wd * np.asarray(params["w"])
    q = trust * np.linalg.norm(params["w"]) / np.linalg.norm(dp)
    np.testing.assert_allclose(np.asarray(upd["w"]), dp * q, rtol=1e-6)
    # ndim==1: no wd, no trust
    np.testing.assert_allclose(np.asarray(upd["b"]), np.asarray(grads["b"]),
                               rtol=1e-6)

    # step 2 momentum accumulates: mu2 = mom*mu1 + dp*q (same grads/params)
    upd2, st = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(upd2["b"]),
                               (1 + mom) * np.asarray(grads["b"]), rtol=1e-6)

    # zero-norm param: trust factor falls back to 1
    p0 = {"w": jnp.zeros((2, 2))}
    g0 = {"w": jnp.ones((2, 2))}
    st0 = tx.init(p0)
    u0, _ = tx.update(g0, st0, p0)
    np.testing.assert_allclose(np.asarray(u0["w"]), np.asarray(g0["w"]),
                               rtol=1e-6)


def test_schedule_matches_reference_formula():
    """util/lr_sched.py:3-15 as a function of fractional epoch."""
    lr, min_lr, warm, epochs = 0.8, 0.01, 10, 90
    for e in [0.0, 0.5, 5.0, 9.99, 10.0, 42.3, 89.9]:
        got = float(lr_at_epoch(e, lr, min_lr, warm, epochs))
        if e < warm:
            want = lr * e / warm
        else:
            want = min_lr + (lr - min_lr) * 0.5 * (
                1 + math.cos(math.pi * (e - warm) / (epochs - warm)))
        assert abs(got - want) < 1e-6, e


def test_lr_fn_blr_scaling():
    """lr = blr * eff_batch / 256 (main_linprobe.py:609-610), per-iteration
    fractional epoch (engine_finetune.py:43-44)."""
    cfg = TrainConfig(blr=0.1, epochs=4, warmup_epochs=1, min_lr=0.0,
                      eff_batch_size=1024)
    lr_fn = make_lr_fn(cfg, steps_per_epoch=10)
    peak = 0.1 * 1024 / 256
    # end of warmup == step 10
    assert abs(float(lr_fn(10)) - peak) < 1e-6
    # mid-warmup
    assert abs(float(lr_fn(5)) - 0.5 * peak) < 1e-6
    # decays monotonically after warmup
    vals = [float(lr_fn(s)) for s in range(10, 40)]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))


def test_schedule_edges():
    # warmup_epochs=0: cosine from step 0, starting at full lr
    assert abs(float(lr_at_epoch(0.0, 1.0, 0.0, 0, 10)) - 1.0) < 1e-6
    # min_lr floor at the end of the cycle
    assert abs(float(lr_at_epoch(90.0, 1.0, 0.05, 10, 90)) - 0.05) < 1e-6
    # lr explicitly set overrides blr scaling
    cfg = TrainConfig(lr=0.123, blr=9.9, eff_batch_size=4096)
    from ep_tpu.train.schedule import resolve_lr
    assert resolve_lr(cfg) == 0.123


def test_build_optimizer_variants():
    for name in ["lars", "adamw", "sgd"]:
        tx = build_optimizer(name, 0.0)
        p = {"w": jnp.ones((2, 2))}
        st = tx.init(p)
        upd, _ = tx.update({"w": jnp.ones((2, 2))}, st, p)
        assert jnp.isfinite(upd["w"]).all()


def test_lars_bf16_momentum_tracks_f32():
    """mu_dtype=bfloat16 stores the carried state rounded; the emitted raw
    update stays f32 and must track the f32-state trajectory closely."""
    import jax
    import jax.numpy as jnp
    params = {"w": jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 8)).astype(np.float32))}
    tx32 = scaled_lars(weight_decay=1e-4)
    tx16 = scaled_lars(weight_decay=1e-4, mu_dtype=jnp.bfloat16)
    s32, s16 = tx32.init(params), tx16.init(params)
    assert s16.mu["w"].dtype == jnp.bfloat16
    assert s32.mu["w"].dtype == jnp.float32
    p32 = p16 = params
    for i in range(5):
        g = {"w": jnp.asarray(np.random.default_rng(i + 1).normal(
            size=(8, 8)).astype(np.float32))}
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        assert u16["w"].dtype == jnp.float32  # update math stays f32
        p32 = jax.tree_util.tree_map(lambda p, u: p - 0.1 * u, p32, u32)
        p16 = jax.tree_util.tree_map(lambda p, u: p - 0.1 * u, p16, u16)
    err = float(jnp.abs(p32["w"] - p16["w"]).max()
                / jnp.abs(p32["w"]).max())
    assert err < 5e-3, err
