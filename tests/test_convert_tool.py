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
