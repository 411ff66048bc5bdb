"""Pallas kernels under GSPMD: per-shard execution via shard_map.

pallas_call is an opaque custom call — no SPMD partitioning rule — so the
kernels must run under jax.shard_map over the mesh's data axis
(parallel/mesh.py::data_parallel_call). These tests validate that bridge on
the 8-device virtual CPU mesh (kernels in interpret mode): outputs and
gradients match the unsharded/XLA compositions, and the manual region
introduces no all-gather of the batch.

Counterpart behavior in the reference: each DDP replica runs its CUDA
kernels on the local batch only (main_linprobe.py:618-620).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.parallel import mesh as M


@pytest.fixture
def mesh8():
    prev = M.current_mesh()
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m = M.make_mesh(8, 1)
    M.set_current_mesh(m)
    yield m
    M.set_current_mesh(prev)


def _shard(x, mesh):
    return jax.device_put(x, M.batch_sharding(mesh))


def test_attn_fused_sharded_matches_unsharded(mesh8):
    from ep_tpu.ops.attn_fused_pallas import attention_qkv_fused

    rng = np.random.default_rng(0)
    B, T, H, Dh = 16, 8, 2, 4
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * H * Dh)).astype(np.float32))
    scale = Dh ** -0.5

    ref = attention_qkv_fused(qkv, H, scale, 1.0, True)

    fn = jax.jit(lambda t: M.data_parallel_call(
        lambda tt: attention_qkv_fused(tt, H, scale, 1.0, True),
        (t,), (True,)))
    out = fn(_shard(qkv, mesh8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # shard_map is manual partitioning: the batch must not be all-gathered
    txt = fn.lower(_shard(qkv, mesh8)).compile().as_text()
    assert "all-gather" not in txt


def test_supercell_sharded_matches_ref(mesh8):
    from ep_tpu.ops.attn_block_pallas import _ref_forward, attn_supercell

    rng = np.random.default_rng(1)
    B, T, D, H = 16, 8, 16, 2
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    wq = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.1)
    bq = jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.1)
    g = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    wp = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    scale = (D // H) ** -0.5

    ref = _ref_forward(x, wq, bq, g, b, wp, bp, H, scale, 1.0, 1e-6)

    out = M.data_parallel_call(
        lambda x_, *w: attn_supercell(x_, *w, H, scale, 1.0, 1e-6, True),
        (_shard(x, mesh8), wq, bq, g, b, wp, bp),
        (True, False, False, False, False, False, False))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ep_pool_sharded_values_and_grads(mesh8):
    from ep_tpu.ops.pool_attn_pallas import ep_pool_attend, ep_pool_attend_xla

    rng = np.random.default_rng(2)
    B, N, C, Q = 16, 10, 32, 4
    cq = C // Q
    q = jnp.asarray(rng.normal(size=(Q, C)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, Q, cq)).astype(np.float32))

    def loss_kernel(q_, x_, v_):
        out = M.data_parallel_call(
            lambda a, b_, c_: ep_pool_attend(a, b_, c_, True),
            (q_, x_, v_), (False, True, True))
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_xla(q_, x_, v_):
        out = ep_pool_attend_xla(q_, x_, v_)
        return (out.astype(jnp.float32) ** 2).sum()

    xs, vs = _shard(x, mesh8), _shard(v, mesh8)
    val, grads = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2))(q, xs, vs)
    ref_val, ref_grads = jax.value_and_grad(
        loss_xla, argnums=(0, 1, 2))(q, x, v)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    for got, ref in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_ep_pool_fused_proj_sharded_values_and_grads(mesh8):
    from ep_tpu.ops.pool_attn_pallas import (ep_pool_proj_attend,
                                             ep_pool_proj_attend_xla)

    rng = np.random.default_rng(3)
    B, N, C, Q = 16, 10, 32, 4
    q = jnp.asarray(rng.normal(size=(Q, C)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.1)

    def loss_kernel(q_, x_, w_):
        out = M.data_parallel_call(
            lambda a, b_, c_: ep_pool_proj_attend(a, b_, c_, True),
            (q_, x_, w_), (False, True, False))
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_xla(q_, x_, w_):
        return (ep_pool_proj_attend_xla(q_, x_, w_)
                .astype(jnp.float32) ** 2).sum()

    xs = _shard(x, mesh8)
    val, grads = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2))(q, xs, w)
    ref_val, ref_grads = jax.value_and_grad(
        loss_xla, argnums=(0, 1, 2))(q, x, w)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    for got, ref in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_attn_impl_auto_gate_mesh_shapes():
    """auto enables kernels on data-parallel-only meshes and disables them
    when a tensor-parallel axis is active (qkv is head-sharded there);
    data_parallel_call likewise passes through unwrapped on TP meshes."""
    from ep_tpu.models.vit import ViTConfig, _pallas_attn_enabled

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    auto = ViTConfig(attn_impl="auto")
    with M.use_mesh(M.make_mesh(8, 1)):
        assert _pallas_attn_enabled(auto)
    with M.use_mesh(M.make_mesh(4, 2)) as tp_mesh:
        assert not _pallas_attn_enabled(auto)
        assert _pallas_attn_enabled(ViTConfig(attn_impl="pallas"))
        # TP mesh: the bridge must not shard_map (weights aren't replicated)
        called = {}

        def f(t):
            called["direct"] = True
            return t + 1

        out = M.data_parallel_call(f, (jnp.zeros((8, 2)),), (True,),
                                   mesh=tp_mesh)
        assert called.get("direct") and out.shape == (8, 2)
    M.set_current_mesh(None)
    assert not _pallas_attn_enabled(auto) or jax.device_count() == 1


def test_train_step_pallas_path_on_virtual_mesh(mesh8, monkeypatch):
    """Full jitted train step with BOTH fused kernels engaged (interpret
    mode via EP_TPU_PALLAS_INTERPRET) on an 8-device data mesh: the loss
    matches the pure-XLA path bit-for-tolerance."""
    monkeypatch.setenv("EP_TPU_PALLAS_INTERPRET", "1")

    from ep_tpu.configs import TrainConfig
    from ep_tpu.models.assembly import ProbeModel
    from ep_tpu.models.vit import ViTConfig
    from ep_tpu.parallel.partition import shard_state
    from ep_tpu.train.lars import build_optimizer
    from ep_tpu.train.schedule import make_lr_fn
    from ep_tpu.train.state import create_train_state
    from ep_tpu.train.steps import make_train_step

    rng = np.random.default_rng(3)
    images = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 8, size=(16,)).astype(np.int32)

    losses = {}
    for impl in ("pallas", "xla"):
        cfg = TrainConfig(
            model="vit_tiny_patch16", cls_features="ep", ep_queries=4,
            d_out=1, nb_classes=8, image_size=32, batch_size=16,
            eff_batch_size=16, amp="float32",
            pallas_pool=(impl == "pallas"), attn_impl=impl)
        backbone_cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64,
                                 depth=2, num_heads=4, dtype=jnp.float32,
                                 attn_impl=impl)
        model = ProbeModel(backbone_cfg, cfg)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((2, 32, 32, 3)), train=True)
        tx = build_optimizer("lars", 0.0)
        state = shard_state(create_train_state(variables, tx,
                                               finetuning=False), mesh8)
        step = make_train_step(model, tx, make_lr_fn(cfg, 10), mesh8)
        d_imgs = M.shard_batch(images, mesh8)
        d_lbls = M.shard_batch(labels, mesh8)
        _, metrics = step(state, d_imgs, d_lbls)
        losses[impl] = float(jax.device_get(metrics["loss"]))

    assert losses["pallas"] == pytest.approx(losses["xla"], rel=1e-4)
