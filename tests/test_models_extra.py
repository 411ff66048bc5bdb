"""MAE autoencoder, hub-family backbone configs, SimMIM converter layout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.configs import TrainConfig
from ep_tpu.models.mae import MAEConfig, MaskedAutoencoderViT, random_masking
from ep_tpu.models.vit import ViTConfig


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


def test_hub_family_config_dispatch():
    """assembly and wrappers agree (round-1 Weak #3: they diverged); the
    CLI's capi/dinov2/openclip model names resolve to the wrappers configs."""
    from ep_tpu.models.assembly import build_backbone_config
    from ep_tpu.models.wrappers import capi_config, dinov2_config

    cfg = TrainConfig(model="capi_vitl14_in1k", amp="float32")
    got = build_backbone_config(cfg)
    want = capi_config(224, jnp.float32)
    assert (got.class_token, got.reg_tokens, got.cls_from_registers,
            got.patch_size, got.embed_dim, got.depth) == \
        (want.class_token, want.reg_tokens, want.cls_from_registers,
         want.patch_size, want.embed_dim, want.depth)
    assert got.reg_tokens == 16 and not got.class_token

    got = build_backbone_config(TrainConfig(model="dinov2_vitb14",
                                            amp="float32"))
    assert (got.embed_dim, got.depth, got.reg_tokens) == (768, 12, 0)
    got = build_backbone_config(TrainConfig(model="dinov2_vitb14_reg",
                                            amp="float32"))
    assert (got.embed_dim, got.reg_tokens) == (768, 4)
    # giant tower: SwiGLU
    assert dinov2_config("dinov2_vitg14").mlp_type == "swiglu"
    assert dinov2_config("dinov2_vitb14").mlp_type == "gelu"


def test_mae_model_dispatch():
    from ep_tpu.models.assembly import build_backbone_config
    got = build_backbone_config(
        TrainConfig(model="mae_vit_base_patch16", amp="float32"))
    assert isinstance(got, MAEConfig)
    assert (got.embed_dim, got.depth) == (768, 12)


def test_cls_from_registers(rng):
    """CAPI-style global repr: with no [CLS], `cls` mode returns the mean of
    the register tokens, not zeros (models_capi.py:21)."""
    bcfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                     num_heads=2, class_token=False, reg_tokens=3,
                     cls_from_registers=True, final_norm="ln",
                     dtype=jnp.float32)
    from ep_tpu.models.vit import VisionTransformer
    m = VisionTransformer(bcfg)
    imgs = jax.random.normal(rng, (2, 16, 16, 3))
    vars_ = m.init(rng, imgs, "cls")
    x_cls, _, _ = m.apply(vars_, imgs, "cls")
    raw, _, _ = m.apply(vars_, imgs, "raw")
    np.testing.assert_allclose(np.asarray(x_cls),
                               np.asarray(raw[:, :3].mean(axis=1)),
                               rtol=1e-5, atol=1e-5)
    # patch stream excludes registers
    pos, _, _ = m.apply(vars_, imgs, "pos")
    assert pos.shape == (2, 16, 32)
    # without the flag, the reference's zero-padding behavior is kept
    m0 = VisionTransformer(bcfg.replace(cls_from_registers=False))
    z, _, _ = m0.apply(vars_, imgs, "cls")
    assert float(np.abs(np.asarray(z)).sum()) == 0.0


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
