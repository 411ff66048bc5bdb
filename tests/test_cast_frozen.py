"""bf16 frozen-backbone storage (train/state.cast_frozen) is numerically
a no-op for bf16 compute: every matmul casts weights to the compute dtype
anyway, so storing them cast changes nothing but the bytes read."""
import jax
import jax.numpy as jnp
import numpy as np

from ep_tpu.configs import TrainConfig
from ep_tpu.models.assembly import ProbeModel
from ep_tpu.models.vit import ViTConfig
from ep_tpu.train.lars import build_optimizer
from ep_tpu.train.state import cast_frozen, create_train_state


def test_cast_frozen_logits_parity():
    cfg = TrainConfig(cls_features="ep", ep_queries=4, d_out=1,
                      nb_classes=8, image_size=32, batch_size=8,
                      eff_batch_size=8, amp="bfloat16")
    bcfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                     num_heads=4, dtype=jnp.bfloat16)
    model = ProbeModel(bcfg, cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                           train=True)
    tx = build_optimizer("lars", 0.0)
    state = create_train_state(variables, tx, finetuning=False)

    def logits(st):
        out = model.apply(
            {"params": {**st.frozen, **st.trainable},
             "batch_stats": st.batch_stats}, x, train=False)
        return np.asarray(out, np.float32)

    ref = logits(state)
    cast = logits(cast_frozen(state, jnp.bfloat16))
    # same bf16 rounding happens at use-time either way; only params that
    # feed f32 side-paths (pos-embed add) can differ, by ≤ 1 bf16 ulp
    np.testing.assert_allclose(cast, ref, rtol=0.05, atol=0.05)

    # trainable head must be untouched (stays f32 master weights)
    for leaf in jax.tree_util.tree_leaves(
            cast_frozen(state, jnp.bfloat16).trainable):
        assert leaf.dtype == jnp.float32
