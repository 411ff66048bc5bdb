"""Offline converter tool: torch .pth → msgpack → driver load roundtrip."""
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_msgpack_backbone_roundtrip(tmp_path, rng):
    """A pre-converted flax backbone loads through load_pretrained_backbone."""
    import flax.serialization as fser
    from ep_tpu.configs import TrainConfig
    from ep_tpu.convert.torch_vit import load_pretrained_backbone
    from ep_tpu.models.assembly import ProbeModel
    from ep_tpu.models.vit import ViTConfig

    bcfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                     num_heads=2, dtype=jnp.float32)
    cfg = TrainConfig(cls_features="gap", nb_classes=3, image_size=16)
    model = ProbeModel(bcfg, cfg)
    vs = model.init(rng, jnp.zeros((1, 16, 16, 3)), train=False)

    # fabricate a "converted" checkpoint with recognizable values
    marked = jax.tree_util.tree_map(lambda x: np.full_like(x, 0.5),
                                    vs["params"]["backbone"])
    ckpt = tmp_path / "b.eptpu.msgpack"
    ckpt.write_bytes(fser.msgpack_serialize(
        {"backbone": marked, "model": "tiny"}))

    cfg = cfg.replace(finetune=str(ckpt))
    out = load_pretrained_backbone(cfg, bcfg, vs)
    leaf = jax.tree_util.tree_leaves(out["params"]["backbone"])[0]
    assert float(np.asarray(leaf).ravel()[0]) == 0.5
    # head untouched
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(out["params"]["head"])[0]),
        np.asarray(jax.tree_util.tree_leaves(vs["params"]["head"])[0]))


def test_convert_checkpoint_tool_end_to_end(tmp_path):
    """Write a torch MAE-layout .pth, convert with the CLI tool, check the
    msgpack loads."""
    torch = pytest.importorskip("torch")
    import flax.serialization as fser

    d, depth = 192, 12  # vit_tiny_patch16
    sd = {
        "patch_embed.proj.weight": torch.randn(d, 3, 16, 16),
        "patch_embed.proj.bias": torch.randn(d),
        "cls_token": torch.randn(1, 1, d),
        "pos_embed": torch.randn(1, 197, d),
    }
    for i in range(depth):
        sd.update({
            f"blocks.{i}.norm1.weight": torch.ones(d),
            f"blocks.{i}.norm1.bias": torch.zeros(d),
            f"blocks.{i}.attn.qkv.weight": torch.randn(3 * d, d),
            f"blocks.{i}.attn.qkv.bias": torch.randn(3 * d),
            f"blocks.{i}.attn.proj.weight": torch.randn(d, d),
            f"blocks.{i}.attn.proj.bias": torch.randn(d),
            f"blocks.{i}.norm2.weight": torch.ones(d),
            f"blocks.{i}.norm2.bias": torch.zeros(d),
            f"blocks.{i}.mlp.fc1.weight": torch.randn(4 * d, d),
            f"blocks.{i}.mlp.fc1.bias": torch.randn(4 * d),
            f"blocks.{i}.mlp.fc2.weight": torch.randn(d, 4 * d),
            f"blocks.{i}.mlp.fc2.bias": torch.randn(d),
        })
    pth = tmp_path / "tiny.pth"
    torch.save({"model": sd}, pth)

    out = tmp_path / "tiny.eptpu.msgpack"
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_checkpoint.py"),
         "--model", "vit_tiny_patch16", "--finetune", str(pth),
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO)
    assert res.returncode == 0, res.stderr[-2000:]
    payload = fser.msgpack_restore(out.read_bytes())
    assert payload["model"] == "vit_tiny_patch16"
    np.testing.assert_allclose(
        payload["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"],
        sd["blocks.0.attn.qkv.weight"].numpy().T)


def test_openclip_layout_converts(tmp_path, rng):
    """Full-CLIP checkpoint (visual.* + text tower decoys) → our pre-norm
    ViT: in_proj fusion, ln_pre/ln_post, class_embedding/positional_embedding
    reshapes, cls-only visual projection (models_more.py:43-107 protocol)."""
    torch = pytest.importorskip("torch")
    from ep_tpu.convert.torch_vit import (load_torch_state_dict,
                                          torch_vit_to_flax)
    from ep_tpu.models.vit import ViTConfig, VisionTransformer

    d, hid, pj = 32, 128, 8
    cfg = ViTConfig(img_size=16, patch_size=4, embed_dim=d, depth=1,
                    num_heads=2, final_norm="ln", pre_norm=True, proj_dim=pj,
                    mlp_type="quick_gelu", norm_eps=1e-5, dtype=jnp.float32)
    m = VisionTransformer(cfg)
    template = m.init(rng, jnp.zeros((1, 16, 16, 3)), "cls")["params"]

    g = np.random.default_rng(0)
    t = lambda *s: torch.tensor(g.normal(size=s).astype("f"))
    sd = {
        "visual.conv1.weight": t(d, 3, 4, 4),  # no bias in CLIP
        "visual.class_embedding": t(d),
        "visual.positional_embedding": t(17, d),
        "visual.ln_pre.weight": t(d), "visual.ln_pre.bias": t(d),
        "visual.transformer.resblocks.0.ln_1.weight": t(d),
        "visual.transformer.resblocks.0.ln_1.bias": t(d),
        "visual.transformer.resblocks.0.attn.in_proj_weight": t(3 * d, d),
        "visual.transformer.resblocks.0.attn.in_proj_bias": t(3 * d),
        "visual.transformer.resblocks.0.attn.out_proj.weight": t(d, d),
        "visual.transformer.resblocks.0.attn.out_proj.bias": t(d),
        "visual.transformer.resblocks.0.ln_2.weight": t(d),
        "visual.transformer.resblocks.0.ln_2.bias": t(d),
        "visual.transformer.resblocks.0.mlp.c_fc.weight": t(hid, d),
        "visual.transformer.resblocks.0.mlp.c_fc.bias": t(hid),
        "visual.transformer.resblocks.0.mlp.c_proj.weight": t(d, hid),
        "visual.transformer.resblocks.0.mlp.c_proj.bias": t(d),
        "visual.ln_post.weight": t(d), "visual.ln_post.bias": t(d),
        "visual.proj": t(d, pj),
        # text-tower decoys that MUST be dropped (same resblocks naming)
        "transformer.resblocks.0.ln_1.weight": t(64),
        "token_embedding.weight": t(49408, 64),
        "logit_scale": t(),
    }
    pth = tmp_path / "clip.pth"
    torch.save(sd, pth)
    out = torch_vit_to_flax(load_torch_state_dict(str(pth)), template, cfg)

    np.testing.assert_allclose(out["cls_token"][0, 0],
                               sd["visual.class_embedding"].numpy())
    np.testing.assert_allclose(out["pos_embed"][0],
                               sd["visual.positional_embedding"].numpy())
    np.testing.assert_allclose(
        out["blocks_0"]["attn"]["qkv"]["kernel"],
        sd["visual.transformer.resblocks.0.attn.in_proj_weight"].numpy().T)
    np.testing.assert_allclose(out["norm_pre"]["scale"],
                               sd["visual.ln_pre.weight"].numpy())
    np.testing.assert_allclose(out["proj"], sd["visual.proj"].numpy())
    # converted tower runs; cls output carries the projection dim
    x_cls, _, _ = m.apply({"params": out}, jnp.ones((2, 16, 16, 3)), "cls")
    assert x_cls.shape == (2, pj) and np.isfinite(np.asarray(x_cls)).all()
    pos, _, _ = m.apply({"params": out}, jnp.ones((2, 16, 16, 3)), "pos")
    assert pos.shape == (2, 16, d)


def test_capi_layout_converts(rng):
    """CAPI hub layout: dinov2-style keys, storage_tokens registers, no
    [CLS] (models_capi.py wraps facebookresearch/capi)."""
    from ep_tpu.convert.torch_vit import torch_vit_to_flax
    from ep_tpu.models.vit import ViTConfig, VisionTransformer

    d = 32
    cfg = ViTConfig(img_size=16, patch_size=4, embed_dim=d, depth=1,
                    num_heads=2, final_norm="ln", class_token=False,
                    reg_tokens=4, cls_from_registers=True, dtype=jnp.float32)
    m = VisionTransformer(cfg)
    template = m.init(rng, jnp.zeros((1, 16, 16, 3)), "cls")["params"]
    g = np.random.default_rng(0)
    f = lambda *s: g.normal(size=s).astype("f")
    sd = {
        "patch_embed.proj.weight": f(d, 3, 4, 4),
        "patch_embed.proj.bias": f(d),
        "storage_tokens": f(1, 4, d),
        "pos_embed": f(1, 20, d),
        "blocks.0.norm1.weight": f(d), "blocks.0.norm1.bias": f(d),
        "blocks.0.attn.qkv.weight": f(3 * d, d),
        "blocks.0.attn.qkv.bias": f(3 * d),
        "blocks.0.attn.proj.weight": f(d, d), "blocks.0.attn.proj.bias": f(d),
        "blocks.0.norm2.weight": f(d), "blocks.0.norm2.bias": f(d),
        "blocks.0.mlp.fc1.weight": f(4 * d, d), "blocks.0.mlp.fc1.bias": f(4 * d),
        "blocks.0.mlp.fc2.weight": f(d, 4 * d), "blocks.0.mlp.fc2.bias": f(d),
        "norm.weight": f(d), "norm.bias": f(d),
    }
    out = torch_vit_to_flax(sd, template, cfg)
    np.testing.assert_allclose(out["reg_tokens"], sd["storage_tokens"])
    # global repr = register mean, runs with converted weights
    x_cls, _, _ = m.apply({"params": out}, jnp.ones((2, 16, 16, 3)), "cls")
    assert x_cls.shape == (2, d) and np.isfinite(np.asarray(x_cls)).all()


def test_beitv2_layout_converts(rng):
    """BEiTv2 layout: q/v-only bias, per-block relative-position tables,
    gamma_{1,2} LayerScale, no abs pos-embed (main_linprobe.py:373-411 loads
    these strict=False into the timm ViT)."""
    from ep_tpu.convert.torch_vit import torch_vit_to_flax
    from ep_tpu.models.vit import ViTConfig, VisionTransformer

    d = 32
    cfg = ViTConfig(img_size=16, patch_size=4, embed_dim=d, depth=1,
                    num_heads=2, use_abs_pos_emb=False,
                    rel_pos_bias="per_block", qkv_bias_mode="qv_only",
                    init_values=0.1, final_norm="ln", dtype=jnp.float32)
    m = VisionTransformer(cfg)
    template = m.init(rng, jnp.zeros((1, 16, 16, 3)), "cls")["params"]
    g = np.random.default_rng(0)
    f = lambda *s: g.normal(size=s).astype("f")
    num_rel = (2 * 4 - 1) ** 2 + 3
    sd = {
        "patch_embed.proj.weight": f(d, 3, 4, 4),
        "patch_embed.proj.bias": f(d),
        "cls_token": f(1, 1, d),
        "blocks.0.norm1.weight": f(d), "blocks.0.norm1.bias": f(d),
        "blocks.0.attn.qkv.weight": f(3 * d, d),
        "blocks.0.attn.q_bias": f(d), "blocks.0.attn.v_bias": f(d),
        "blocks.0.attn.relative_position_bias_table": f(num_rel, 2),
        "blocks.0.attn.proj.weight": f(d, d), "blocks.0.attn.proj.bias": f(d),
        "blocks.0.norm2.weight": f(d), "blocks.0.norm2.bias": f(d),
        "blocks.0.mlp.fc1.weight": f(4 * d, d), "blocks.0.mlp.fc1.bias": f(4 * d),
        "blocks.0.mlp.fc2.weight": f(d, 4 * d), "blocks.0.mlp.fc2.bias": f(d),
        "blocks.0.gamma_1": np.full(d, 0.1, "f"),
        "blocks.0.gamma_2": np.full(d, 0.1, "f"),
        "norm.weight": f(d), "norm.bias": f(d),
    }
    out = torch_vit_to_flax(sd, template, cfg)
    np.testing.assert_allclose(
        out["rel_pos_bias_0"]["relative_position_bias_table"],
        sd["blocks.0.attn.relative_position_bias_table"])
    np.testing.assert_allclose(out["blocks_0"]["attn"]["v_bias"],
                               sd["blocks.0.attn.v_bias"])
    ret, _, _ = m.apply({"params": out}, jnp.ones((2, 16, 16, 3)), "gap")
    assert np.isfinite(np.asarray(ret)).all()


def test_oracle_loading(tmp_path, rng):
    """--oracle_ckpt fills params['oracle'] for the dino feature mode
    (models_vit.py:462-476) while leaving the backbone alone."""
    torch = pytest.importorskip("torch")
    from ep_tpu.configs import TrainConfig
    from ep_tpu.convert.torch_vit import load_oracle
    from ep_tpu.models.assembly import ProbeModel, oracle_config
    from ep_tpu.models.vit import ViTConfig

    bcfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                     num_heads=2, dtype=jnp.float32)
    cfg = TrainConfig(cls_features="dino", nb_classes=3, image_size=16)
    model = ProbeModel(bcfg, cfg)
    vs = model.init(rng, jnp.zeros((1, 16, 16, 3)), train=False)
    assert "oracle" in vs["params"]

    ocfg = oracle_config(bcfg)
    d = ocfg.embed_dim
    g = np.random.default_rng(0)
    f = lambda *s: torch.tensor(g.normal(size=s).astype("f"))
    sd = {
        "patch_embed.proj.weight": f(d, 3, 4, 4),
        "patch_embed.proj.bias": f(d),
        "cls_token": f(1, 1, d),
        "pos_embed": f(1, 17, d),
        "blocks.0.norm1.weight": f(d), "blocks.0.norm1.bias": f(d),
        "blocks.0.attn.qkv.weight": f(3 * d, d),
        "blocks.0.attn.qkv.bias": f(3 * d),
        "blocks.0.attn.proj.weight": f(d, d), "blocks.0.attn.proj.bias": f(d),
        "blocks.0.norm2.weight": f(d), "blocks.0.norm2.bias": f(d),
        "blocks.0.mlp.fc1.weight": f(4 * d, d), "blocks.0.mlp.fc1.bias": f(4 * d),
        "blocks.0.mlp.fc2.weight": f(d, 4 * d), "blocks.0.mlp.fc2.bias": f(d),
    }
    pth = tmp_path / "dino_oracle.pth"
    torch.save({"model": sd}, pth)
    cfg = cfg.replace(oracle_ckpt=str(pth))
    out = load_oracle(cfg, bcfg, vs)
    np.testing.assert_allclose(
        out["params"]["oracle"]["cls_token"], sd["cls_token"].numpy())
    # backbone untouched
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(out["params"]["backbone"])[0]),
        np.asarray(jax.tree_util.tree_leaves(vs["params"]["backbone"])[0]))
