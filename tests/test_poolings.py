"""Pooling-zoo unit tests: shapes, parameter counts, attention invariants,
and EP's exact concat semantics (SURVEY.md §4 test plan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.configs import TrainConfig
from ep_tpu.poolings import (
    ABMILPHead, AIMAttentionPooling, CAEAttentiveBlock, CaiTPooling,
    CbamPooling, CLIPAttentionPool2d, CoCaCrossAttnPooling,
    DinoViTBlockPooling, DOLGSpatialAttention, EfficientProbing,
    JEPAAttentivePooler, ProbeHead, SigLIPAttentionPool, SimPool,
    SimPoolNoLinears, head_in_features,
)

D, N, B = 64, 16, 4
F32 = jnp.float32


def _toks(key, n=N, d=D, b=B):
    return jax.random.normal(key, (b, n, d), F32)


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def test_ep_shapes_and_concat_semantics(rng):
    """EP output must be the concatenation of per-query value-slice
    contractions (poolings/ep.py:37-45) — verified against a hand-rolled
    numpy computation."""
    Q, d_out = 4, 2
    mod = EfficientProbing(dim=D, num_queries=Q, d_out=d_out, dtype=F32,
                           use_pallas=False)
    x = _toks(rng)
    vs = mod.init(rng, x)
    out, attn = mod.apply(vs, x, return_attn=True)
    c_prime = D // d_out
    assert out.shape == (B, c_prime)
    assert attn.shape == (B, Q, N)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)

    # manual recomputation
    q = np.asarray(vs["params"]["cls_token"])[0] * D ** -0.5  # (Q, D)
    w = np.asarray(vs["params"]["v"]["kernel"])  # (D, c')
    xn = np.asarray(x)
    v = xn @ w  # (B, N, c')
    cq = c_prime // Q
    logits = np.einsum("qc,bnc->bqn", q, xn)
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    expected = np.concatenate(
        [np.einsum("bn,bnc->bc", a[:, i], v[..., i * cq:(i + 1) * cq])
         for i in range(Q)], axis=1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)

    # parameter count matches the reference module: query bank + v projection
    assert n_params(vs["params"]) == Q * D + D * c_prime


def test_ep_param_count_vs_reference_formula(rng):
    # ViT-B-like: dim 768, Q=32, d_out=1 → 1·32·768 + 768·768
    mod = EfficientProbing(dim=768, num_queries=32, d_out=1, dtype=F32,
                           use_pallas=False)
    x = jax.random.normal(rng, (2, 8, 768), F32)
    vs = mod.init(rng, x)
    assert n_params(vs["params"]) == 32 * 768 + 768 * 768


@pytest.mark.parametrize("cls,kw,out_dim", [
    (SimPool, dict(dim=D), D),
    (SimPoolNoLinears, dict(dim=D, num_heads=4), D),
    (ABMILPHead, dict(dim=D), D),
    (AIMAttentionPooling, dict(dim=D, num_heads=4), D),
    (SigLIPAttentionPool, dict(in_features=D, num_heads=4), D),
    (CoCaCrossAttnPooling, dict(dim=D, num_img_queries=8, heads=2), D),
    (CaiTPooling, dict(embed_dim=D), D),
    (DinoViTBlockPooling, dict(d_model=D, num_heads=4), D),
    (JEPAAttentivePooler, dict(embed_dim=D, num_heads=4), D),
    (CAEAttentiveBlock, dict(dim=D, num_heads=4), D),
])
def test_pool_output_shapes(rng, cls, kw, out_dim):
    mod = cls(dtype=F32, **kw)
    x = _toks(rng)
    vs = mod.init(rng, x)
    out = mod.apply(vs, x)
    assert out.shape == (B, out_dim)
    assert bool(jnp.isfinite(out).all())


def test_coca_fast_path_equals_full(rng):
    """coca's default path computes ONLY query 0 (the consumed one);
    return_attn keeps the full 196-query computation — the two must give
    the identical pooled descriptor."""
    mod = CoCaCrossAttnPooling(dim=D, num_img_queries=8, heads=2, dtype=F32)
    x = _toks(rng)
    vs = mod.init(rng, x)
    fast = mod.apply(vs, x)
    full, attn = mod.apply(vs, x, return_attn=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               rtol=1e-6, atol=1e-6)
    assert attn.shape[2] == 8  # full path still covers every query


def test_clip_pool_shapes(rng):
    mod = CLIPAttentionPool2d(in_features=D, feat_size=4, dtype=F32)
    x = _toks(rng)  # N = 16 = 4*4
    vs = mod.init(rng, x)
    out = mod.apply(vs, x)
    assert out.shape == (B, D)
    out2, attn = mod.apply(vs, x, return_attn=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    assert attn.shape == (B, 4, N)  # 4 heads, cls→patch attention


@pytest.mark.parametrize("cls,kw", [
    (CbamPooling, dict(channels=D)),
    (DOLGSpatialAttention, dict(in_c=D, s3_dim=D)),
])
def test_grid_pools(rng, cls, kw):
    mod = cls(dtype=F32, **kw)
    x = _toks(rng)
    vs = mod.init(rng, x, train=True)
    out, updates = mod.apply(vs, x, train=True, mutable=["batch_stats"])
    assert out.shape == (B, D)
    # eval path uses running stats
    vs2 = {**vs, "batch_stats": updates["batch_stats"]}
    out_eval = mod.apply(vs2, x, train=False)
    assert out_eval.shape == (B, D)


def test_attention_rows_sum_to_one(rng):
    mod = AIMAttentionPooling(dim=D, num_heads=4, dtype=F32)
    x = _toks(rng)
    vs = mod.init(rng, x, train=True)
    (_, attn), _ = mod.apply(vs, x, train=True, return_attn=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_probe_head_lp_is_bn_linear_only(rng):
    cfg = TrainConfig(cls_features="cls", nb_classes=7)
    head = ProbeHead(cfg, D, N, dtype=F32)
    x = jax.random.normal(rng, (B, D), F32)
    vs = head.init(rng, x, train=True)
    # only the classifier holds params (BN is affine-free)
    assert set(vs["params"].keys()) == {"fc"}
    assert n_params(vs["params"]) == D * 7 + 7
    logits, _ = head.apply(vs, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (B, 7)


def test_probe_head_ep_classifier_dim(rng):
    cfg = TrainConfig(cls_features="ep", nb_classes=5, ep_queries=4, d_out=2,
                      pallas_pool=False)
    assert head_in_features(cfg, D) == D // 2
    head = ProbeHead(cfg, D, N, dtype=F32)
    x = _toks(rng)
    vs = head.init(rng, x, train=True)
    logits, _ = head.apply(vs, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (B, 5)


def test_head_bn_running_stats_update(rng):
    """Running stats follow torch's momentum-0.1 convention
    (flax momentum 0.9): after one batch, mean = 0.1 * batch_mean."""
    cfg = TrainConfig(cls_features="cls", nb_classes=3)
    head = ProbeHead(cfg, D, N, dtype=F32)
    x = jax.random.normal(rng, (B, D), F32) * 3.0 + 1.0
    vs = head.init(rng, x, train=True)
    _, upd = head.apply(vs, x, train=True, mutable=["batch_stats"])
    bs = upd["batch_stats"]["bn"]
    np.testing.assert_allclose(np.asarray(bs["mean"]),
                               0.1 * np.asarray(x.mean(axis=0)), atol=1e-5)

    # eval path normalizes with running stats, not batch stats
    logits_eval = head.apply({**vs, "batch_stats": upd["batch_stats"]},
                             x, train=False)
    logits_eval2 = head.apply(vs, x, train=False)  # zero-init running stats
    assert not np.allclose(np.asarray(logits_eval), np.asarray(logits_eval2))
