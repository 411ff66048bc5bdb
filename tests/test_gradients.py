"""Gradient-flow checks: every pooling head's params receive nonzero
gradients through the ProbeHead, and the frozen backbone receives none
(the reference's freeze rule, main_linprobe.py:553-562)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.configs import TrainConfig
from ep_tpu.models.assembly import ProbeModel
from ep_tpu.models.vit import ViTConfig
from ep_tpu.poolings.registry import ProbeHead
from ep_tpu.train.steps import cross_entropy

D, N, B = 48, 16, 4  # divisible by esimpool's hardcoded 12 heads

ALL_HEADS = ["ep", "abmilp", "simpool", "esimpool", "siglip", "aim", "cbam",
             "coca", "cait", "dinovit", "jepa", "dolg", "cae"]

# leaves whose gradient is exactly zero at init BY CONSTRUCTION, identically
# to the reference: CAE's query token initializes to zeros
# (poolings/cae_att.py:89), so LN₁q(0)=bias=0 ⇒ q≡0 ⇒ uniform attention that
# is independent of the keys — the q/k paths only start learning once the
# query token itself (which DOES get gradients through the LN Jacobian)
# moves off zero.
EXPECTED_ZERO_AT_INIT = {
    "cae": {"pool/q/kernel", "pool/k/kernel", "pool/norm1_k/bias",
            "pool/norm1_k/scale", "pool/norm1_q/scale"},
}


@pytest.mark.parametrize("name", ALL_HEADS)
def test_pool_params_get_grads(rng, name):
    cfg = TrainConfig(cls_features=name, nb_classes=5, ep_queries=4, d_out=1,
                      num_heads=4, pallas_pool=False)
    head = ProbeHead(cfg, D, N, dtype=jnp.float32)
    x = jax.random.normal(rng, (B, N, D))
    labels = jnp.arange(B) % 5
    vs = head.init(rng, x, train=True)

    def loss_fn(params):
        logits, _ = head.apply({**vs, "params": params}, x, train=True,
                               mutable=["batch_stats"])
        return cross_entropy(logits, labels).mean()

    grads = jax.grad(loss_fn)(vs["params"])
    zero_leaves = {
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]
        if float(jnp.abs(g).max()) == 0.0
    }
    zero_leaves -= EXPECTED_ZERO_AT_INIT.get(name, set())
    assert not zero_leaves, zero_leaves


def test_backbone_frozen_in_probe_model(rng):
    bcfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                     num_heads=2, dtype=jnp.float32)
    cfg = TrainConfig(cls_features="gap", nb_classes=3)
    model = ProbeModel(bcfg, cfg)
    imgs = jax.random.normal(rng, (2, 16, 16, 3))
    vs = model.init(rng, imgs, train=True)
    labels = jnp.array([0, 1])

    def loss_fn(params):
        logits, _ = model.apply({"params": params}, imgs, train=True,
                                mutable=["batch_stats"])
        return cross_entropy(logits, labels).mean()

    grads = jax.grad(loss_fn)(vs["params"])
    bb_norm = sum(float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(grads["backbone"]))
    head_norm = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads["head"]))
    assert bb_norm == 0.0  # stop_gradient wall
    assert head_norm > 0.0


def test_backbone_gets_grads_when_finetuning(rng):
    bcfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                     num_heads=2, dtype=jnp.float32)
    cfg = TrainConfig(cls_features="gap", nb_classes=3, finetuning=True)
    model = ProbeModel(bcfg, cfg)
    imgs = jax.random.normal(rng, (2, 16, 16, 3))
    vs = model.init(rng, imgs, train=True)
    labels = jnp.array([0, 1])

    def loss_fn(params):
        logits, _ = model.apply({"params": params}, imgs, train=True,
                                mutable=["batch_stats"])
        return cross_entropy(logits, labels).mean()

    grads = jax.grad(loss_fn)(vs["params"])
    bb_norm = sum(float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(grads["backbone"]))
    assert bb_norm > 0.0
