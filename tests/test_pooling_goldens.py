"""Numeric goldens: pooling outputs recomputed by hand in numpy from the
extracted module parameters. Catches layout/normalization mistakes that
shape tests cannot (e.g. CoCa's shared single kv head, SimPool's
normalized-keys/unnormalized-query split, CLIP's mean-token + pos-embed)."""
import jax
import jax.numpy as jnp
import numpy as np

from ep_tpu.poolings.clip_pool import CLIPAttentionPool2d
from ep_tpu.poolings.coca import CoCaCrossAttnPooling
from ep_tpu.poolings.simpool import SimPool

F32 = jnp.float32


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _ln(x, scale, bias, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def test_simpool_golden(rng):
    B, N, D = 2, 6, 8
    mod = SimPool(dim=D, num_heads=1, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    # reference semantics (poolings/simpool.py:46-90): q = Wq·gap (gap is
    # NOT layernormed), k = Wk·LN(x), v = LN(x) (no projection)
    ln = _ln(xn, p["norm_patches"]["scale"], p["norm_patches"]["bias"], 1e-6)
    gap = xn.mean(axis=1, keepdims=True)
    q = gap @ p["wq"]["kernel"]
    k = ln @ p["wk"]["kernel"]
    attn = _softmax(np.einsum("bqd,bkd->bqk", q, k) * D ** -0.5)
    expected = np.einsum("bqk,bkd->bqd", attn, ln)[:, 0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_coca_golden(rng):
    B, N, D = 2, 5, 8
    Qn, H, Dh = 3, 2, 4
    mod = CoCaCrossAttnPooling(dim=D, dim_head=Dh, num_img_queries=Qn,
                               heads=H, dtype=F32)
    ctx = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, ctx)
    out = np.asarray(mod.apply(vs, ctx))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    c = np.asarray(ctx)
    queries = np.broadcast_to(p["img_queries"][None], (B, Qn, D))
    qn = _ln(queries, p["norm"]["scale"], p["norm"]["bias"], 1e-6)
    q = (qn @ p["to_q"]["kernel"]).reshape(B, Qn, H, Dh).transpose(0, 2, 1, 3)
    kv = c @ p["to_kv"]["kernel"]  # (B, N, 2*Dh) — ONE shared kv head
    k, v = kv[..., :Dh], kv[..., Dh:]
    sim = np.einsum("bhqd,bnd->bhqn", q * Dh ** -0.5, k)
    attn = _softmax(sim)
    o = np.einsum("bhqn,bnd->bhqd", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, Qn, H * Dh)
    expected = (o @ p["to_out"]["kernel"])[:, 0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_clip_pool_golden(rng):
    B, D = 2, 8
    feat = 2  # N = 4
    H = 4
    mod = CLIPAttentionPool2d(in_features=D, feat_size=feat, num_heads=H,
                              dtype=F32)
    x = jax.random.normal(rng, (B, feat * feat, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = _ln(np.asarray(x), p["norm"]["scale"], p["norm"]["bias"], 1e-6)
    seq = np.concatenate([xn.mean(axis=1, keepdims=True), xn], axis=1)
    seq = seq + p["pos_embed"][None]
    T = seq.shape[1]
    Dh = D // H
    qkv = seq @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    qkv = qkv.reshape(B, T, 3, H, Dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = _softmax(np.einsum("bhqd,bhkd->bhqk", q, k) * Dh ** -0.5)
    o = np.einsum("bhqk,bhkd->bhqd", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
    o = o @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(out, o[:, 0], atol=1e-5)
