"""End-to-end coverage of the `_all` pooling variants ([CLS] + patch tokens).

The reference exposes 14 `<pool>_all` names (models_vit.py:32-36) that remap
to the "both" token mode — the pool consumes the [CLS]-prepended (B, N+1, D)
sequence instead of patches only (models_vit.py:414-417, 308-310). Module- and
remap-level parity exists elsewhere (test_vit.py:23-27, :49-50); this file
pins the assembled behavior through ProbeModel:

  * 11 token-count-agnostic families run end-to-end: forward shape, finite
    loss, nonzero pool gradients, AND the _all output genuinely differs from
    the base variant on identical weights (proves [CLS] actually enters the
    pool rather than the remap being a no-op).
  * 3 grid-reshaping families (clip/cbam/dolg) are NON-FUNCTIONAL in the
    reference itself — N+1 tokens are never a square grid, so its own
    modules crash (attention_pool2d.py:158 pos-embed broadcast, cbam.py /
    dolg.py square reshape; verified empirically). We mirror that contract
    but fail early with a clear ValueError (poolings/registry.py) instead of
    an opaque broadcast error mid-trace.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.configs import TrainConfig
from ep_tpu.models.assembly import ProbeModel
from ep_tpu.models.vit import ViTConfig
from ep_tpu.train.steps import cross_entropy

IMG, PATCH, D, DEPTH, HEADS, C, B = 16, 4, 32, 2, 4, 5, 4

WORKING_ALL = ["abmilp", "simpool", "esimpool", "siglip", "aim", "ep",
               "coca", "cait", "dinovit", "jepa", "cae"]
GRID_ALL = ["clip", "cbam", "dolg"]  # broken in the reference too


def _backbone_cfg():
    return ViTConfig(img_size=IMG, patch_size=PATCH, embed_dim=D,
                     depth=DEPTH, num_heads=HEADS, final_norm="none",
                     dtype=jnp.float32)


def _cfg(cls_features):
    # esimpool's hardcoded 12 heads don't divide D=32 — like the engine
    # parity test, a tiny-twin adaptation applied to BOTH variants equally
    num_heads = 8 if cls_features.startswith("esimpool") else HEADS
    return TrainConfig(model="vit_tiny_patch16", cls_features=cls_features,
                       ep_queries=4, d_out=1, nb_classes=C, image_size=IMG,
                       batch_size=B, amp="float32", pallas_pool=False,
                       num_heads=num_heads)


@pytest.fixture(scope="module")
def esimpool_tiny_heads():
    # SimPoolNoLinears hardcodes 12 heads at the registry level
    # (main_linprobe.py:445-457 does the same); 12 ∤ 32 on the tiny twin
    from unittest import mock

    from ep_tpu.poolings import registry as reg
    from ep_tpu.poolings.simpool import SimPoolNoLinears
    with mock.patch.object(
            reg, "SimPoolNoLinears",
            lambda dim, num_heads, dtype, name: SimPoolNoLinears(
                dim=dim, num_heads=8, dtype=dtype, name=name)):
        yield


@pytest.mark.parametrize("name", WORKING_ALL)
def test_all_variant_trains_and_uses_cls(name, esimpool_tiny_heads):
    x = jax.random.normal(jax.random.key(1), (B, IMG, IMG, 3), jnp.float32)
    labels = jnp.arange(B) % C

    model_all = ProbeModel(_backbone_cfg(), _cfg(f"{name}_all"))
    model_base = ProbeModel(_backbone_cfg(), _cfg(name))
    vs = model_all.init(jax.random.key(0), x, train=True)

    # identical module tree + rng key ⇒ identical params: every pool here
    # is token-count-agnostic, so the base variant accepts the same weights
    vs_base = model_base.init(jax.random.key(0), x, train=True)
    np.testing.assert_array_equal(
        np.sort([str(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(vs["params"])[0]]),
        np.sort([str(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(vs_base["params"])[0]]))

    out_all = model_all.apply(vs, x, train=False)
    out_base = model_base.apply(vs, x, train=False)
    assert out_all.shape == (B, C)
    assert np.all(np.isfinite(np.asarray(out_all)))
    # the [CLS] token must actually reach the pool: same weights, same
    # images, different token set ⇒ different logits
    assert float(jnp.abs(out_all - out_base).max()) > 1e-6, (
        f"{name}_all output identical to {name} — _all remap is a no-op")

    def loss_fn(params):
        logits, _ = model_all.apply(
            {**vs, "params": params}, x, train=True,
            mutable=["batch_stats"])
        return cross_entropy(logits, labels).mean()

    loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
    assert np.isfinite(float(loss))
    pool_grads = jax.tree_util.tree_leaves(grads["head"])
    assert any(float(jnp.abs(g).max()) > 0 for g in pool_grads), (
        f"{name}_all: no head gradient flows")


@pytest.mark.parametrize("name", GRID_ALL)
def test_grid_all_variants_fail_clearly(name):
    """clip/cbam/dolg _all: non-functional in the reference (its modules
    crash on N+1 tokens); our registry raises the reason up front."""
    x = jnp.zeros((B, IMG, IMG, 3), jnp.float32)
    model = ProbeModel(_backbone_cfg(), _cfg(f"{name}_all"))
    with pytest.raises(ValueError, match="_all"):
        model.init(jax.random.key(0), x, train=True)
