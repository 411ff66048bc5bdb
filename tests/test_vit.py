"""Backbone tests: feature-mode protocol, attention-stat capture, and numeric
parity of the flax ViT against an independent torch implementation of the
same architecture (weights converted with convert/torch_vit.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.models.vit import (ViTConfig, VisionTransformer, remap_features)

CFG = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=2, num_heads=2,
                dtype=jnp.float32)


@pytest.fixture(scope="module")
def model_and_params():
    m = VisionTransformer(CFG)
    x = jnp.zeros((2, 16, 16, 3))
    params = m.init(jax.random.key(1), x, "cls")
    return m, params


def test_remap_features():
    assert remap_features("pos") == "gap"
    assert remap_features("ep") == "pos"
    assert remap_features("ep_all") == "both"
    assert remap_features("cls") == "cls"


def test_feature_modes(model_and_params, rng):
    m, params = model_and_params
    x = jax.random.normal(rng, (2, 16, 16, 3))
    N, D = CFG.num_patches, CFG.embed_dim
    for mode, shape in [("cls", (2, D)), ("gap", (2, D)), ("pos", (2, N, D)),
                        ("both", (2, N + 1, D)), ("raw", (2, N + 1, D)),
                        ("cp2", (2, D)), ("ca2", (2, D)),
                        ("attn-mn", (2, D)), ("attn-lcte", (2, D))]:
        ret, _, _ = m.apply(params, x, mode)
        assert ret.shape == shape, mode
        assert bool(jnp.isfinite(ret).all()), mode


def test_both_mode_is_cls_plus_pos(model_and_params, rng):
    m, params = model_and_params
    x = jax.random.normal(rng, (2, 16, 16, 3))
    both, _, _ = m.apply(params, x, "both")
    cls, _, _ = m.apply(params, x, "cls")
    pos, _, _ = m.apply(params, x, "pos")
    np.testing.assert_allclose(np.asarray(both[:, 0]), np.asarray(cls), atol=1e-6)
    np.testing.assert_allclose(np.asarray(both[:, 1:]), np.asarray(pos), atol=1e-6)


def test_return_block_early_exit(model_and_params, rng):
    m, params = model_and_params
    x = jax.random.normal(rng, (2, 16, 16, 3))
    r0, _, _ = m.apply(params, x, "cls", 0)
    r1, _, _ = m.apply(params, x, "cls", 1)
    assert not np.allclose(np.asarray(r0), np.asarray(r1))
    rdefault, _, _ = m.apply(params, x, "cls")
    np.testing.assert_allclose(np.asarray(r1), np.asarray(rdefault), atol=1e-6)


def test_attention_stats_capture(model_and_params, rng):
    m, params = model_and_params
    x = jax.random.normal(rng, (2, 16, 16, 3))
    _, stats, magn = m.apply(params, x, "cls", capture_stats=True)
    T = CFG.num_patches + 1
    # (kind, batch, blocks, heads, tokens) — models_vit.py:392-393 layout
    assert stats.shape == (5, 2, CFG.depth, CFG.num_heads, T)
    assert magn.shape == (2, 2, CFG.depth, T)
    # cls→all rows are probabilities
    cls_all = np.asarray(stats[2])
    assert (cls_all >= 0).all()
    # per-token entropies are positive
    assert (np.asarray(stats[4]) >= 0).all()


def test_shuffle_subsets(model_and_params, rng):
    """shuffle_subsets=k partitions the N patch tokens into k groups run as
    extra batch (models_vit.py:224-239); union of subset tokens must be a
    permutation of the full token set at the embedding level."""
    m, params = model_and_params
    x = jax.random.normal(rng, (2, 16, 16, 3))
    pos, _, _ = m.apply(params, x, "pos", shuffle_subsets=2,
                        shuffle_rng=jax.random.key(7))
    assert pos.shape == (2, 2, CFG.num_patches // 2, CFG.embed_dim)
    cls, _, _ = m.apply(params, x, "cls", shuffle_subsets=2,
                        shuffle_rng=jax.random.key(7))
    assert cls.shape == (2, 2, CFG.embed_dim)
    # subsets=1 is the identity w.r.t. the default path
    pos1, _, _ = m.apply(params, x, "pos", shuffle_subsets=1)
    pos_ref, _, _ = m.apply(params, x, "pos")
    np.testing.assert_allclose(np.asarray(pos1), np.asarray(pos_ref),
                               atol=1e-6)


def test_no_cls_token_variant(rng):
    cfg = CFG.replace(class_token=False)
    m = VisionTransformer(cfg)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    params = m.init(jax.random.key(2), x, "gap")
    gap, _, _ = m.apply(params, x, "gap")
    assert gap.shape == (2, cfg.embed_dim)
    # "cls" degrades to the reference's zero-padding behavior
    cls, _, _ = m.apply(params, x, "cls")
    assert np.allclose(np.asarray(cls), 0)


def test_simmim_relpos_variant(rng):
    cfg = CFG.replace(use_abs_pos_emb=False, rel_pos_bias="shared",
                      qkv_bias_mode="qv_only", init_values=0.1)
    m = VisionTransformer(cfg)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    params = m.init(jax.random.key(3), x, "cls")
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("rel_pos_bias" in n for n in names)
    assert any("q_bias" in n for n in names)
    out, _, _ = m.apply(params, x, "gap")
    assert out.shape == (2, cfg.embed_dim)


def test_torch_parity_small_vit(rng):
    """Convert a randomly-initialized torch ViT (independent re-implementation
    of timm/MAE semantics in the test) and check forward parity to ~1e-4."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    d, heads, depth, p, s = 32, 2, 2, 4, 16

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(d, eps=1e-6)
            self.attn_qkv = tnn.Linear(d, 3 * d, bias=True)
            self.attn_proj = tnn.Linear(d, d)
            self.norm2 = tnn.LayerNorm(d, eps=1e-6)
            self.fc1 = tnn.Linear(d, 4 * d)
            self.fc2 = tnn.Linear(4 * d, d)

        def forward(self, x):
            B, T, _ = x.shape
            h = self.norm1(x)
            qkv = self.attn_qkv(h).reshape(B, T, 3, heads, d // heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = (q * (d // heads) ** -0.5) @ k.transpose(-2, -1)
            a = a.softmax(-1)
            y = (a @ v).transpose(1, 2).reshape(B, T, d)
            x = x + self.attn_proj(y)
            h = self.norm2(x)
            x = x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))
            return x

    class TorchViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.patch = tnn.Conv2d(3, d, p, p)
            self.cls = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
            self.pos = tnn.Parameter(torch.randn(1, (s // p) ** 2 + 1, d) * 0.02)
            self.blocks = tnn.ModuleList([TorchBlock() for _ in range(depth)])

        def forward(self, x):
            B = x.shape[0]
            t = self.patch(x).flatten(2).transpose(1, 2)
            t = torch.cat([self.cls.expand(B, -1, -1), t], 1)
            t = t + self.pos
            for b in self.blocks:
                t = b(t)
            return t

    tm = TorchViT().eval()
    # build a reference-layout state dict
    sd = {
        "patch_embed.proj.weight": tm.patch.weight.detach().numpy(),
        "patch_embed.proj.bias": tm.patch.bias.detach().numpy(),
        "cls_token": tm.cls.detach().numpy(),
        "pos_embed": tm.pos.detach().numpy(),
    }
    for i, b in enumerate(tm.blocks):
        sd.update({
            f"blocks.{i}.norm1.weight": b.norm1.weight.detach().numpy(),
            f"blocks.{i}.norm1.bias": b.norm1.bias.detach().numpy(),
            f"blocks.{i}.attn.qkv.weight": b.attn_qkv.weight.detach().numpy(),
            f"blocks.{i}.attn.qkv.bias": b.attn_qkv.bias.detach().numpy(),
            f"blocks.{i}.attn.proj.weight": b.attn_proj.weight.detach().numpy(),
            f"blocks.{i}.attn.proj.bias": b.attn_proj.bias.detach().numpy(),
            f"blocks.{i}.norm2.weight": b.norm2.weight.detach().numpy(),
            f"blocks.{i}.norm2.bias": b.norm2.bias.detach().numpy(),
            f"blocks.{i}.mlp.fc1.weight": b.fc1.weight.detach().numpy(),
            f"blocks.{i}.mlp.fc1.bias": b.fc1.bias.detach().numpy(),
            f"blocks.{i}.mlp.fc2.weight": b.fc2.weight.detach().numpy(),
            f"blocks.{i}.mlp.fc2.bias": b.fc2.bias.detach().numpy(),
        })

    from ep_tpu.convert.torch_vit import torch_vit_to_flax
    m = VisionTransformer(CFG)
    x = jnp.zeros((2, s, s, 3))
    params = m.init(jax.random.key(4), x, "raw")
    backbone = torch_vit_to_flax(sd, params["params"], CFG)

    xin = np.random.default_rng(0).normal(size=(2, s, s, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(xin.transpose(0, 3, 1, 2))).numpy()
    j_out, _, _ = m.apply({"params": backbone}, jnp.asarray(xin), "raw")
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-4, rtol=1e-3)
