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


def test_esimpool_golden(rng):
    from ep_tpu.poolings.simpool import SimPoolNoLinears
    B, N, D, H = 2, 6, 8, 2
    mod = SimPoolNoLinears(dim=D, num_heads=H, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    # reference poolings/simpool.py:137-171: q = LN(gap), k = LN(x), v = RAW x
    ln = lambda a: _ln(a, p["norm_patches"]["scale"],
                       p["norm_patches"]["bias"], 1e-6)
    Dh = D // H
    q = ln(xn.mean(axis=1, keepdims=True)).reshape(B, 1, H, Dh).transpose(0, 2, 1, 3)
    k = ln(xn).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    v = xn.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    attn = _softmax(np.einsum("bhqd,bhkd->bhqk", q, k) * Dh ** -0.5)
    o = np.einsum("bhqk,bhkd->bhqd", attn, v)
    expected = o.transpose(0, 2, 1, 3).reshape(B, 1, D)[:, 0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_dolg_golden(rng):
    from ep_tpu.poolings.dolg import DOLGSpatialAttention
    B, N, D = 2, 16, 8  # 4x4 grid
    mod = DOLGSpatialAttention(in_c=D, s3_dim=D, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x, train=True)
    out, _ = mod.apply(vs, x, train=True, mutable=["batch_stats"])

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    g = np.asarray(x).reshape(B, 4, 4, D)
    # conv1 1x1 + train-mode BN (batch stats over B,H,W)
    h = g @ p["conv1"]["kernel"][0, 0] + p["conv1"]["bias"]
    mu = h.mean(axis=(0, 1, 2))
    var = h.var(axis=(0, 1, 2))
    hb = (h - mu) / np.sqrt(var + 1e-5) * p["bn"]["scale"] + p["bn"]["bias"]
    fmn = hb / np.clip(np.linalg.norm(hb, axis=-1, keepdims=True), 1e-12, None)
    a = np.maximum(hb, 0) @ p["conv2"]["kernel"][0, 0] + p["conv2"]["bias"]
    att = np.log1p(np.exp(a))  # softplus
    expected = (att * fmn).mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_aim_golden(rng):
    from ep_tpu.poolings.aim import AIMAttentionPooling
    B, N, D, H = 2, 6, 8, 2
    mod = AIMAttentionPooling(dim=D, num_heads=H, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x, train=True)
    out, _ = mod.apply(vs, x, train=True, mutable=["batch_stats"])

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    # train-mode BN over (batch, tokens), affine-free (poolings/aim.py:363)
    mu = xn.mean(axis=(0, 1))
    var = xn.var(axis=(0, 1))
    xb = (xn - mu) / np.sqrt(var + 1e-6)
    Dh = D // H
    q = np.broadcast_to(p["cls_token"], (B, 1, D))
    q = q.reshape(B, 1, H, Dh).transpose(0, 2, 1, 3)
    k = (xb @ p["k"]["kernel"]).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    v = (xb @ p["v"]["kernel"]).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    attn = _softmax(np.einsum("bhqd,bhkd->bhqk", q * Dh ** -0.5, k))
    o = np.einsum("bhqk,bhkd->bhqd", attn, v)
    expected = o.transpose(0, 2, 1, 3).reshape(B, 1, D).mean(axis=1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_jepa_golden(rng):
    from ep_tpu.poolings.jepa import JEPAAttentivePooler
    B, N, D, H = 2, 5, 8, 2
    mod = JEPAAttentivePooler(embed_dim=D, num_heads=H, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    Dh = D // H
    q_in = np.broadcast_to(p["query_tokens"], (B, 1, D))
    ln1 = _ln(xn, p["norm1"]["scale"], p["norm1"]["bias"], 1e-5)
    q = (q_in @ p["xattn_q"]["kernel"] + p["xattn_q"]["bias"])
    q = q.reshape(B, 1, H, Dh).transpose(0, 2, 1, 3)
    kv = ln1 @ p["xattn_kv"]["kernel"] + p["xattn_kv"]["bias"]
    kv = kv.reshape(B, N, 2, H, Dh).transpose(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn = _softmax(np.einsum("bhqd,bhkd->bhqk", q, k) * Dh ** -0.5)
    y = np.einsum("bhqk,bhkd->bhqd", attn, v)
    y = y.transpose(0, 2, 1, 3).reshape(B, 1, D)
    y = y @ p["xattn_proj"]["kernel"] + p["xattn_proj"]["bias"]
    qo = q_in + y
    h = _ln(qo, p["norm2"]["scale"], p["norm2"]["bias"], 1e-5)
    h = h @ p["mlp_fc1"]["kernel"] + p["mlp_fc1"]["bias"]
    from scipy.special import erf
    h = h * 0.5 * (1 + erf(h / np.sqrt(2)))  # exact GELU
    h = h @ p["mlp_fc2"]["kernel"] + p["mlp_fc2"]["bias"]
    expected = (qo + h)[:, 0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_cae_golden(rng):
    from ep_tpu.poolings.cae import CAEAttentiveBlock
    B, N, D, H = 2, 5, 8, 2
    mod = CAEAttentiveBlock(dim=D, num_heads=H, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    Dh = D // H
    q_tok = np.broadcast_to(p["query_token"], (B, 1, D))
    xq = _ln(q_tok, p["norm1_q"]["scale"], p["norm1_q"]["bias"], 1e-5)
    xk = _ln(xn, p["norm1_k"]["scale"], p["norm1_k"]["bias"], 1e-5)
    xv = _ln(xn, p["norm1_v"]["scale"], p["norm1_v"]["bias"], 1e-5)
    q = (xq @ p["q"]["kernel"]).reshape(B, 1, H, Dh).transpose(0, 2, 1, 3)
    k = (xk @ p["k"]["kernel"]).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    v = (xv @ p["v"]["kernel"]).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    attn = _softmax(np.einsum("bhqd,bhkd->bhqk", q * Dh ** -0.5, k))
    o = np.einsum("bhqk,bhkd->bhqd", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, 1, D)
    expected = (o @ p["proj"]["kernel"] + p["proj"]["bias"])[:, 0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def _gelu(h):
    from scipy.special import erf
    return h * 0.5 * (1 + erf(h / np.sqrt(2)))


def test_siglip_golden(rng):
    from ep_tpu.poolings.clip_pool import SigLIPAttentionPool
    B, N, D, H = 2, 6, 8, 2
    mod = SigLIPAttentionPool(in_features=D, num_heads=H, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    Dh = D // H
    lat = np.broadcast_to(p["latent"], (B, 1, D))
    q = (lat @ p["q"]["kernel"] + p["q"]["bias"]).reshape(
        B, 1, H, Dh).transpose(0, 2, 1, 3)
    kv = xn @ p["kv"]["kernel"] + p["kv"]["bias"]
    kv = kv.reshape(B, N, 2, H, Dh).transpose(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn = _softmax(np.einsum("bhqd,bhkd->bhqk", q * Dh ** -0.5, k))
    o = np.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3)
    o = o.reshape(B, 1, D) @ p["proj"]["kernel"] + p["proj"]["bias"]
    # residual MLP without pre-norm (timm AttentionPoolLatent default)
    h = _gelu(o @ p["mlp_fc1"]["kernel"] + p["mlp_fc1"]["bias"])
    h = h @ p["mlp_fc2"]["kernel"] + p["mlp_fc2"]["bias"]
    expected = (o + h)[:, 0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_cait_golden(rng):
    from ep_tpu.poolings.cait import CaiTPooling
    B, N, D, H = 2, 6, 8, 2
    mod = CaiTPooling(embed_dim=D, num_heads=H, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    Dh = D // H
    blk = "blocks_token_only_0"
    cls = np.broadcast_to(p["cls_token"], (B, 1, D))
    u = np.concatenate([cls, xn], axis=1)
    un = _ln(u, p[f"{blk}_norm1"]["scale"], p[f"{blk}_norm1"]["bias"], 1e-6)
    a = p[f"{blk}_attn"]
    q = (un[:, :1] @ a["q"]["kernel"] + a["q"]["bias"]).reshape(
        B, 1, H, Dh).transpose(0, 2, 1, 3)
    k = (un @ a["k"]["kernel"] + a["k"]["bias"]).reshape(
        B, N + 1, H, Dh).transpose(0, 2, 1, 3)
    v = (un @ a["v"]["kernel"] + a["v"]["bias"]).reshape(
        B, N + 1, H, Dh).transpose(0, 2, 1, 3)
    attn = _softmax(np.einsum("bhqd,bhkd->bhqk", q * Dh ** -0.5, k))
    o = np.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3)
    o = o.reshape(B, 1, D) @ a["proj"]["kernel"] + a["proj"]["bias"]
    cls = cls + p[f"{blk}_gamma_1"] * o
    h = _ln(cls, p[f"{blk}_norm2"]["scale"], p[f"{blk}_norm2"]["bias"], 1e-6)
    h = _gelu(h @ p[f"{blk}_mlp_fc1"]["kernel"] + p[f"{blk}_mlp_fc1"]["bias"])
    h = h @ p[f"{blk}_mlp_fc2"]["kernel"] + p[f"{blk}_mlp_fc2"]["bias"]
    cls = cls + p[f"{blk}_gamma_2"] * h
    seq = np.concatenate([cls, xn], axis=1)
    expected = _ln(seq, p["norm"]["scale"], p["norm"]["bias"], 1e-5)[:, 0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_dinovit_golden(rng):
    from ep_tpu.poolings.dinovit import DinoViTBlockPooling
    B, N, D, H = 2, 5, 8, 2
    mod = DinoViTBlockPooling(d_model=D, num_heads=H, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    Dh = D // H
    h = _ln(xn, p["norm1"]["scale"], p["norm1"]["bias"], 1e-5)
    qkv = (h @ p["qkv"]["kernel"]).reshape(B, N, 3, H, Dh).transpose(
        2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = _softmax(np.einsum("bhqd,bhkd->bhqk", q * Dh ** -0.5, k))
    y = np.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3)
    y = y.reshape(B, N, D) @ p["proj"]["kernel"] + p["proj"]["bias"]
    xr = xn + y
    h = _ln(xr, p["norm2"]["scale"], p["norm2"]["bias"], 1e-5)
    m = _gelu(h @ p["mlp_fc1"]["kernel"] + p["mlp_fc1"]["bias"])
    m = m @ p["mlp_fc2"]["kernel"] + p["mlp_fc2"]["bias"]
    expected = (xr + m).mean(axis=1)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_abmilp_golden(rng):
    from ep_tpu.poolings.abmilp import ABMILPHead
    B, N, D = 2, 6, 8
    mod = ABMILPHead(dim=D, self_attention_apply_to="both", depth=2,
                     dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    xn = np.asarray(x)
    # 1-head self-attention pre-pass (qkv fused no bias, proj with bias)
    sa = p["self_attn"]
    qkv = xn @ sa["qkv"]["kernel"]
    q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
    attn = _softmax(np.einsum("bqd,bkd->bqk", q * D ** -0.5, k))
    y = np.einsum("bqk,bkd->bqd", attn, v)
    x_attn = y @ sa["proj"]["kernel"] + sa["proj"]["bias"]
    # MLP attention predictor over the self-attended tokens ("both")
    h = np.tanh(x_attn @ p["attention_predictor_0"]["kernel"] +
                p["attention_predictor_0"]["bias"])
    scores = h @ p["attention_predictor_2"]["kernel"] + \
        p["attention_predictor_2"]["bias"]
    w = _softmax(scores, axis=1)
    expected = (x_attn * w).sum(axis=1)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_cbam_golden(rng):
    from ep_tpu.poolings.cbam import CbamPooling
    B, N, D = 2, 16, 32  # 4x4 grid; rd = 32/16 = 2
    mod = CbamPooling(channels=D, dtype=F32)
    x = jax.random.normal(rng, (B, N, D))
    vs = mod.init(rng, x, train=True)
    out, _ = mod.apply(vs, x, train=True, mutable=["batch_stats"])

    p = jax.tree_util.tree_map(np.asarray, vs["params"])
    g = np.asarray(x).reshape(B, 4, 4, D)
    residual = g
    f1, f2 = p["fc1"]["kernel"][0, 0], p["fc2"]["kernel"][0, 0]
    x_avg = np.maximum(g.mean(axis=(1, 2), keepdims=True) @ f1, 0) @ f2
    x_max = np.maximum(g.max(axis=(1, 2), keepdims=True) @ f1, 0) @ f2
    g = g / (1 + np.exp(-(x_avg + x_max)))
    sp = np.concatenate([g.mean(-1, keepdims=True), g.max(-1, keepdims=True)],
                        axis=-1)
    # 7x7 SAME conv on a 4x4 grid + train-mode BN
    from scipy.signal import correlate
    kern = p["spatial_conv"]["kernel"]  # (7,7,2,1)
    conv = np.zeros((B, 4, 4, 1))
    padded = np.pad(sp, [(0, 0), (3, 3), (3, 3), (0, 0)])
    for b in range(B):
        acc = np.zeros((4, 4))
        for c in range(2):
            acc += correlate(padded[b, :, :, c], kern[:, :, c, 0],
                             mode="valid")
        conv[b, :, :, 0] = acc
    mu, var = conv.mean(), conv.var()
    bn = (conv - mu) / np.sqrt(var + 1e-5) * p["spatial_bn"]["scale"] + \
        p["spatial_bn"]["bias"]
    g = g / (1 + np.exp(-bn))
    expected = np.maximum(g + residual, 0).mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


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
