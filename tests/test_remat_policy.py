"""Selective rematerialization (ViTConfig.remat_policy).

Every policy must compute THE SAME gradients as blanket remat ("none") —
policies only change what the backward keeps vs recomputes, never the math
(jax.checkpoint docs; models/vit.py::_remat_policy). Run in f32 so equality
is exact up to reduction order.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.models.vit import ViTConfig, VisionTransformer, _remat_policy

POLICIES = ["none", "attn_out", "attn_fc1", "dots"]


def _tiny(policy):
    return ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=3,
                     num_heads=4, scan_blocks=True, remat_blocks=True,
                     remat_policy=policy, dtype=jnp.float32)


def _loss_grads(cfg, x):
    model = VisionTransformer(cfg)
    variables = model.init(jax.random.key(0), x, "gap")

    def loss(params):
        feats, _, _ = model.apply({"params": params}, x, "gap")
        return jnp.sum(feats ** 2)

    return jax.jit(jax.grad(loss))(variables["params"])


@pytest.mark.parametrize("policy", POLICIES[1:])
def test_policy_grads_match_blanket_remat(policy):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 16, 3)).astype(np.float32))
    ref = _loss_grads(_tiny("none"), x)
    got = _loss_grads(_tiny(policy), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
        ref, got)


def test_unknown_policy_raises():
    with pytest.raises(ValueError, match="remat_policy"):
        _remat_policy("everything")


def test_policy_requires_no_change_in_forward():
    # forward values are identical regardless of policy (tags are no-ops)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 16, 16, 3)).astype(np.float32))
    cfg = _tiny("none").replace(remat_blocks=False)
    model = VisionTransformer(cfg)
    variables = model.init(jax.random.key(0), x, "gap")
    a, _, _ = model.apply(variables, x, "gap")
    cfgb = _tiny("attn_fc1")
    b, _, _ = VisionTransformer(cfgb).apply(variables, x, "gap")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
