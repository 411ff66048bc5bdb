"""MAE autoencoder, token-source wrappers, SimMIM converter layout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.configs import TrainConfig
from ep_tpu.models.mae import MAEConfig, MaskedAutoencoderViT, random_masking
from ep_tpu.models.vit import ViTConfig
from ep_tpu.models.wrappers import TokenSourceWrapper


def test_random_masking_semantics(rng):
    x = jax.random.normal(rng, (2, 16, 8))
    xm, mask, ids_restore = random_masking(x, 0.75, rng)
    assert xm.shape == (2, 4, 8)
    # mask: 1 = removed; exactly L*ratio ones per row
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), [12, 12])
    # kept tokens are a subset of the originals
    x_np, xm_np = np.asarray(x), np.asarray(xm)
    for b in range(2):
        for t in range(4):
            assert any(np.allclose(xm_np[b, t], x_np[b, i]) for i in range(16))


def test_mae_forward_loss(rng):
    cfg = MAEConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                    num_heads=2, decoder_embed_dim=16, decoder_depth=1,
                    decoder_num_heads=2, dtype=jnp.float32)
    m = MaskedAutoencoderViT(cfg)
    imgs = jax.random.normal(rng, (2, 16, 16, 3))
    vars_ = m.init({"params": rng, "masking": rng}, imgs)
    loss, pred, mask = m.apply(vars_, imgs, rngs={"masking": rng})
    assert pred.shape == (2, 16, 4 * 4 * 3)
    assert float(loss) > 0 and np.isfinite(float(loss))
    # patchify/unpatchify roundtrip
    p = m.patchify(imgs)
    np.testing.assert_allclose(np.asarray(m.unpatchify(p)), np.asarray(imgs),
                               atol=1e-6)


@pytest.mark.parametrize("cls_features", ["cls", "ep", "ep_all"])
def test_token_source_wrapper(rng, cls_features):
    bcfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                     num_heads=2, dtype=jnp.float32, final_norm="ln")
    cfg = TrainConfig(cls_features=cls_features, nb_classes=5, ep_queries=4,
                      pallas_pool=False)
    w = TokenSourceWrapper(bcfg, cfg)
    imgs = jax.random.normal(rng, (2, 16, 16, 3))
    vars_ = w.init(rng, imgs, train=True)
    (logits, feats), _ = w.apply(vars_, imgs, train=True,
                                 return_backbone_features=True,
                                 mutable=["batch_stats"])
    assert logits.shape == (2, 5)
    if cls_features == "cls":
        assert feats.shape == (2, 32)
    else:
        assert feats.shape == (2, 16, 32)


def test_simmim_converter_roundtrip(rng):
    """SimMIM-layout torch keys (encoder. prefix, q/v bias, shared rel-pos
    table, gamma LayerScale) land in the right flax leaves."""
    from ep_tpu.convert.torch_vit import torch_vit_to_flax
    from ep_tpu.models.vit import VisionTransformer

    cfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                    num_heads=2, use_abs_pos_emb=False, rel_pos_bias="shared",
                    qkv_bias_mode="qv_only", init_values=0.1,
                    dtype=jnp.float32)
    m = VisionTransformer(cfg)
    params = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), "cls")

    g = np.random.default_rng(0)
    num_rel = (2 * 4 - 1) ** 2 + 3
    sd = {
        "patch_embed.proj.weight": g.normal(size=(32, 3, 4, 4)).astype("f"),
        "patch_embed.proj.bias": g.normal(size=(32,)).astype("f"),
        "cls_token": g.normal(size=(1, 1, 32)).astype("f"),
        "rel_pos_bias.relative_position_bias_table":
            g.normal(size=(num_rel, 2)).astype("f"),
        "blocks.0.norm1.weight": np.ones(32, "f"),
        "blocks.0.norm1.bias": np.zeros(32, "f"),
        "blocks.0.attn.qkv.weight": g.normal(size=(96, 32)).astype("f"),
        "blocks.0.attn.q_bias": g.normal(size=(32,)).astype("f"),
        "blocks.0.attn.v_bias": g.normal(size=(32,)).astype("f"),
        "blocks.0.attn.proj.weight": g.normal(size=(32, 32)).astype("f"),
        "blocks.0.attn.proj.bias": g.normal(size=(32,)).astype("f"),
        "blocks.0.norm2.weight": np.ones(32, "f"),
        "blocks.0.norm2.bias": np.zeros(32, "f"),
        "blocks.0.mlp.fc1.weight": g.normal(size=(128, 32)).astype("f"),
        "blocks.0.mlp.fc1.bias": g.normal(size=(128,)).astype("f"),
        "blocks.0.mlp.fc2.weight": g.normal(size=(32, 128)).astype("f"),
        "blocks.0.mlp.fc2.bias": g.normal(size=(32,)).astype("f"),
        "blocks.0.gamma_1": np.full(32, 0.1, "f"),
        "blocks.0.gamma_2": np.full(32, 0.1, "f"),
    }
    out = torch_vit_to_flax(sd, params["params"], cfg)
    np.testing.assert_allclose(
        out["rel_pos_bias"]["relative_position_bias_table"],
        sd["rel_pos_bias.relative_position_bias_table"])
    np.testing.assert_allclose(out["blocks_0"]["attn"]["q_bias"],
                               sd["blocks.0.attn.q_bias"])
    np.testing.assert_allclose(out["blocks_0"]["ls1"]["gamma_1"],
                               sd["blocks.0.gamma_1"])
    np.testing.assert_allclose(out["blocks_0"]["attn"]["qkv"]["kernel"],
                               sd["blocks.0.attn.qkv.weight"].T)
    # converted params actually run
    ret, _, _ = m.apply({"params": out}, jnp.zeros((1, 16, 16, 3)), "gap")
    assert np.isfinite(np.asarray(ret)).all()


def test_pos_embed_interpolation_in_converter(rng):
    """A 4x4-grid checkpoint loads into an 8x8-grid model via bicubic
    pos-embed interpolation (util/pos_embed.py:66-87 semantics)."""
    from ep_tpu.convert.torch_vit import torch_vit_to_flax
    from ep_tpu.models.vit import VisionTransformer

    cfg = ViTConfig(img_size=32, patch_size=4, embed_dim=16, depth=0,
                    num_heads=2, dtype=jnp.float32)
    m = VisionTransformer(cfg)
    params = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), "cls")
    g = np.random.default_rng(0)
    sd = {
        "patch_embed.proj.weight": g.normal(size=(16, 3, 4, 4)).astype("f"),
        "patch_embed.proj.bias": g.normal(size=(16,)).astype("f"),
        "cls_token": g.normal(size=(1, 1, 16)).astype("f"),
        "pos_embed": g.normal(size=(1, 17, 16)).astype("f"),  # 4x4 + cls
    }
    out = torch_vit_to_flax(sd, params["params"], cfg)
    assert out["pos_embed"].shape == (1, 65, 16)  # 8x8 + cls
    np.testing.assert_allclose(out["pos_embed"][0, 0], sd["pos_embed"][0, 0],
                               atol=1e-6)  # cls row untouched
