"""N-device vs 1-device training-trajectory equivalence.

Round-2 verdict, Weak #5: single-call sharded parity existed
(test_pallas_gspmd) but nothing asserted that a multi-step TRAINING
trajectory on a sharded mesh equals the single-device one — the property
that would catch BN-stat, grad-accum or update-order divergence under
GSPMD. This is DDP's implicit guarantee in the reference
(main_linprobe.py:618-620: gradients all-reduce, so every replica steps
identically); here it must hold by construction of the jitted step over
the mesh, and these tests pin it.

Runs on the 8-virtual-CPU-device backend from conftest.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ep_tpu.configs import TrainConfig
from ep_tpu.models.assembly import ProbeModel
from ep_tpu.models.vit import ViTConfig
from ep_tpu.parallel import mesh as M
from ep_tpu.train.lars import build_optimizer
from ep_tpu.train.schedule import make_lr_fn
from ep_tpu.train.state import create_train_state
from ep_tpu.train.steps import make_train_step

IMG, C, B = 16, 5, 16
STEPS_PER_EPOCH = 4


def _tiny(attn_impl="xla"):
    return ViTConfig(img_size=IMG, patch_size=4, embed_dim=32, depth=2,
                     num_heads=4, dtype=jnp.float32, attn_impl=attn_impl)


def _cfg(pallas=False, accum=1):
    return TrainConfig(
        model="vit_tiny_patch16", cls_features="ep", ep_queries=4, d_out=1,
        nb_classes=C, image_size=IMG, batch_size=B, epochs=3,
        warmup_epochs=1.0, lr=0.2, min_lr=0.0, amp="float32",
        pallas_pool=pallas, accum_iter=accum, eff_batch_size=B * accum)


def _data(n_steps, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, C, size=(n_steps, B)).astype(np.int32)
    means = rng.normal(size=(C, 1, 1, 3)).astype("f")
    imgs = (means[labels] +
            0.5 * rng.normal(size=(n_steps, B, IMG, IMG, 3)).astype("f"))
    return imgs, labels


def _run_trajectory(n_devices, variables, imgs, labels, cfg, backbone_cfg,
                    accum=1):
    """Train len(imgs) steps on an n-device data mesh; return (losses,
    final trainable, final batch_stats) as host trees."""
    devices = jax.devices()[:n_devices]
    mesh = M.make_mesh(n_devices, 1, devices=devices)
    with M.use_mesh(mesh):
        model = ProbeModel(backbone_cfg, cfg)
        tx = build_optimizer("lars", 0.0)
        if accum > 1:
            import optax
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        # fresh state per mesh from the same host-side variable tree
        v = jax.tree_util.tree_map(np.array, variables)
        state = create_train_state(v, tx, finetuning=False)
        step = make_train_step(model, tx, make_lr_fn(cfg, STEPS_PER_EPOCH),
                               mesh)
        losses = []
        for i in range(len(imgs)):
            x = M.shard_batch(imgs[i], mesh)
            y = M.shard_batch(labels[i], mesh)
            state, metrics = step(state, x, y)
            losses.append(float(metrics["loss"]))
        return (np.asarray(losses),
                jax.tree_util.tree_map(np.asarray, state.trainable),
                jax.tree_util.tree_map(np.asarray, state.batch_stats))


def _assert_tree_close(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(la, lb, rtol=rtol, atol=atol,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.fixture(autouse=True)
def _needs_8(monkeypatch):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    prev = M.current_mesh()
    yield
    M.set_current_mesh(prev)


@pytest.mark.parametrize("accum", [1, 2])
def test_sharded_trajectory_matches_single_device(accum):
    """20 train steps (incl. warmup->cosine LR transition), same seed and
    data: the 8-device trajectory must equal the 1-device one — losses,
    final head params, and the BN running stats (which are global-batch by
    construction under GSPMD, so sharding must not change them)."""
    cfg = _cfg(accum=accum)
    backbone_cfg = _tiny()
    model = ProbeModel(backbone_cfg, cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, IMG, IMG, 3), jnp.float32),
        train=True)
    imgs, labels = _data(20)

    loss1, tr1, bn1 = _run_trajectory(1, variables, imgs, labels, cfg,
                                      backbone_cfg, accum)
    loss8, tr8, bn8 = _run_trajectory(8, variables, imgs, labels, cfg,
                                      backbone_cfg, accum)

    # cross-device reduction order can reorder float adds; nothing else may
    np.testing.assert_allclose(loss1, loss8, rtol=2e-5, atol=2e-5)
    _assert_tree_close(tr1, tr8, rtol=2e-4, atol=2e-5)
    _assert_tree_close(bn1, bn8, rtol=2e-4, atol=2e-5)


def test_sharded_trajectory_pallas_kernels(monkeypatch):
    """Same equivalence with the Pallas kernels engaged (interpret mode,
    shard_map-per-data-shard bridge): 8 steps, EP-pool fused kernel +
    fused attention path, 8 devices vs 1."""
    monkeypatch.setenv("EP_TPU_PALLAS_INTERPRET", "1")
    cfg = _cfg(pallas=True)
    backbone_cfg = _tiny(attn_impl="pallas")
    model = ProbeModel(backbone_cfg, cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, IMG, IMG, 3), jnp.float32),
        train=True)
    imgs, labels = _data(8, seed=1)

    loss1, tr1, bn1 = _run_trajectory(1, variables, imgs, labels, cfg,
                                      backbone_cfg)
    loss8, tr8, bn8 = _run_trajectory(8, variables, imgs, labels, cfg,
                                      backbone_cfg)

    np.testing.assert_allclose(loss1, loss8, rtol=2e-5, atol=2e-5)
    _assert_tree_close(tr1, tr8, rtol=2e-4, atol=2e-5)
    _assert_tree_close(bn1, bn8, rtol=2e-4, atol=2e-5)
