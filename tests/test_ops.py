"""Op-level tests: Pallas EP kernel (interpret mode on CPU) vs XLA reference,
attention-stat math, schedule/optimizer plumbing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.ops.attention import attn_stats_from_probs, mha
from ep_tpu.ops.pool_attn_pallas import ep_pool_attend, ep_pool_attend_xla


def test_ep_pallas_matches_xla_interpret(rng):
    B, N, C, Q = 3, 37, 128, 4  # deliberately unaligned N and B
    cq = C // Q
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (Q, C)) * C ** -0.5
    x = jax.random.normal(k2, (B, N, C))
    v = jax.random.normal(k3, (B, N, Q, cq))
    ref = ep_pool_attend_xla(q, x, v)
    out = ep_pool_attend(q, x, v, True)  # interpret=True on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ep_pallas_vjp_matches_xla(rng):
    B, N, C, Q = 2, 17, 64, 4
    cq = C // Q
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (Q, C)) * C ** -0.5
    x = jax.random.normal(k2, (B, N, C))
    v = jax.random.normal(k3, (B, N, Q, cq))

    def f_p(q, x, v):
        return (ep_pool_attend(q, x, v, True) ** 2).sum()

    def f_x(q, x, v):
        return (ep_pool_attend_xla(q, x, v) ** 2).sum()

    gp = jax.grad(f_p, argnums=(0, 1, 2))(q, x, v)
    gx = jax.grad(f_x, argnums=(0, 1, 2))(q, x, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_ep_fused_proj_matches_xla_interpret(rng):
    from ep_tpu.ops.pool_attn_pallas import (ep_pool_proj_attend,
                                             ep_pool_proj_attend_xla)
    B, N, C, Q = 3, 37, 128, 4  # unaligned N and B exercise batch padding
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (Q, C)) * C ** -0.5
    x = jax.random.normal(k2, (B, N, C))
    w = jax.random.normal(k3, (C, C)) * C ** -0.5
    ref = ep_pool_proj_attend_xla(q, x, w)
    out = ep_pool_proj_attend(q, x, w, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ep_fused_proj_d_out_2(rng):
    from ep_tpu.ops.pool_attn_pallas import (ep_pool_proj_attend,
                                             ep_pool_proj_attend_xla)
    B, N, C, Q, d_out = 8, 17, 128, 4, 2  # QC = C//d_out
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (Q, C)) * C ** -0.5
    x = jax.random.normal(k2, (B, N, C))
    w = jax.random.normal(k3, (C, C // d_out)) * C ** -0.5
    ref = ep_pool_proj_attend_xla(q, x, w)
    out = ep_pool_proj_attend(q, x, w, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ep_fused_proj_vjp(rng):
    from ep_tpu.ops.pool_attn_pallas import (ep_pool_proj_attend,
                                             ep_pool_proj_attend_xla)
    B, N, C, Q = 2, 17, 64, 4
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (Q, C)) * C ** -0.5
    x = jax.random.normal(k2, (B, N, C))
    w = jax.random.normal(k3, (C, C)) * C ** -0.5

    gp = jax.grad(lambda *a: (ep_pool_proj_attend(*a, True) ** 2).sum(),
                  argnums=(0, 1, 2))(q, x, w)
    gx = jax.grad(lambda *a: (ep_pool_proj_attend_xla(*a) ** 2).sum(),
                  argnums=(0, 1, 2))(q, x, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_ep_module_fused_path_matches_dense(rng):
    """EfficientProbing with use_pallas (fused in-kernel projection, via
    _VKernel param aliasing) must equal the plain dense composition on the
    same params."""
    import os
    from ep_tpu.poolings.ep import EfficientProbing

    B, N, C, Q = 5, 37, 128, 4
    x = jax.random.normal(rng, (B, N, C), jnp.float32)
    mod_ref = EfficientProbing(dim=C, num_queries=Q, dtype=jnp.float32,
                               use_pallas=False)
    params = mod_ref.init(jax.random.key(0), x)
    ref = mod_ref.apply(params, x)
    mod_k = EfficientProbing(dim=C, num_queries=Q, dtype=jnp.float32,
                             use_pallas=True)
    os.environ["EP_TPU_PALLAS_INTERPRET"] = "1"
    os.environ["EP_TPU_EP_FUSED"] = "1"  # fused path is opt-in (measured
    # slower than XLA at probe shapes; kept for long-N — PERFORMANCE.md)
    try:
        out = mod_k.apply(params, x)
    finally:
        del os.environ["EP_TPU_PALLAS_INTERPRET"]
        del os.environ["EP_TPU_EP_FUSED"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_flash_longT_route_matches_xla_interpret(rng):
    """The long-T wiring (_fwd_flash) inside attention_qkv_fused's
    dispatch: same values as the XLA fallback it replaces, and the
    VMEM-fit predicate routes the real product shapes correctly."""
    from ep_tpu.ops.attn_fused_pallas import (_flash_fits, _fwd_flash,
                                              _fwd_xla)
    B, T, H, Dh = 2, 70, 4, 16
    qkv = jax.random.normal(rng, (B, T, 3 * H * Dh))
    scale = Dh ** -0.5
    ref = _fwd_xla(qkv, H, scale, 1.0)
    out = _fwd_flash(qkv, H, scale, 1.0, True)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    # 448px/patch-14 probing (T=1025, ViT-B/H geometry) takes flash ...
    assert _flash_fits(1025, 64, 2)
    assert _flash_fits(1025, 80, 2)
    # ... and T where even one head's f32 logits overflow VMEM stays XLA
    assert not _flash_fits(2048, 64, 2)


def test_flash_attention_matches_mha_interpret(rng):
    from ep_tpu.ops.flash_attn_pallas import flash_attention
    B, H, T, Dh = 2, 4, 37, 16  # unaligned T/Dh exercise the padding
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, T, Dh))
    k = jax.random.normal(k2, (B, H, T, Dh))
    v = jax.random.normal(k3, (B, H, T, Dh))
    scale = Dh ** -0.5
    ref = mha(q, k, v, scale)
    out = flash_attention(q, k, v, scale, 1.0, True)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_flash_attention_vjp(rng):
    from ep_tpu.ops.flash_attn_pallas import flash_attention
    B, H, T, Dh = 1, 2, 17, 8
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, T, Dh))
    k = jax.random.normal(k2, (B, H, T, Dh))
    v = jax.random.normal(k3, (B, H, T, Dh))
    scale = Dh ** -0.5

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, scale, 1.0, True) ** 2).sum()

    def f_ref(q, k, v):
        return (mha(q, k, v, scale) ** 2).sum()

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_mha_softmax_rows(rng):
    B, H, T, Dh = 2, 3, 8, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, T, Dh))
    k = jax.random.normal(k2, (B, H, T, Dh))
    v = jax.random.normal(k3, (B, H, T, Dh))
    out, probs = mha(q, k, v, Dh ** -0.5, return_probs=True)
    assert out.shape == (B, H, T, Dh)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    # fused path equals capture path
    out2 = mha(q, k, v, Dh ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_attn_stats_math(rng):
    B, H, T = 2, 2, 6
    logits = jax.random.normal(rng, (B, H, T, T))
    probs = jax.nn.softmax(logits, axis=-1)
    stats = attn_stats_from_probs(probs)
    assert stats.shape == (5, B, 1, H, T)
    p = np.asarray(probs)
    # kind 0: diagonal
    np.testing.assert_allclose(np.asarray(stats[0, :, 0]),
                               np.einsum("bhtt->bht", p), atol=1e-6)
    # kind 2/3: cls row / cls column
    np.testing.assert_allclose(np.asarray(stats[2, :, 0]), p[:, :, 0, :],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats[3, :, 0]), p[:, :, :, 0],
                               atol=1e-6)
    # kind 4: renormalized-without-cls entropy, bounded by log(T-1)
    ent = np.asarray(stats[4])
    assert (ent >= -1e-5).all() and (ent <= np.log(T - 1) + 0.1).all()


def test_attention_qkv_fused_matches_mha(rng):
    """Natural-layout kernel (B,T,3D)->(B,T,D) vs the reference mha path,
    interpret mode on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.ops.attention import mha
    from ep_tpu.ops.attn_fused_pallas import attention_qkv_fused

    B, T, H, Dh = 2, 13, 4, 16
    D = H * Dh
    scale = Dh ** -0.5
    qkv = jax.random.normal(rng, (B, T, 3 * D), jnp.float32)
    out = attention_qkv_fused(qkv, H, scale, 1.0, True)
    x = qkv.reshape(B, T, 3, H, Dh).transpose(2, 0, 3, 1, 4)
    ref = mha(x[0], x[1], x[2], scale)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, T, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # custom VJP (XLA recompute) matches autodiff through the mha path
    g1 = jax.grad(lambda q: (
        attention_qkv_fused(q, H, scale, 1.0, True) ** 2).sum())(qkv)

    def f2(qkv):
        x = qkv.reshape(B, T, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        r = mha(x[0], x[1], x[2], scale)
        return (r.transpose(0, 2, 1, 3).reshape(B, T, D) ** 2).sum()

    g2 = jax.grad(f2)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


import pytest as _pytest


@_pytest.mark.parametrize("T", [9, 129])
def test_attention_qkv_fused_head_group_path(rng, T):
    """Dh that doesn't divide the 128-lane tile (ViT-H's Dh=80) routes to
    the head-group-grid kernel; parity vs the mha path, fwd + grad.
    T=129 covers a cls + lane-aligned patch-grid sequence length (like
    ViT-H's 257) on the head-group path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.ops.attention import mha
    from ep_tpu.ops.attn_fused_pallas import attention_qkv_fused

    B, H, Dh = 2, 8, 80
    D = H * Dh
    scale = Dh ** -0.5
    qkv = jax.random.normal(rng, (B, T, 3 * D), jnp.float32)
    out = attention_qkv_fused(qkv, H, scale, 1.0, True)
    x = qkv.reshape(B, T, 3, H, Dh).transpose(2, 0, 3, 1, 4)
    ref = mha(x[0], x[1], x[2], scale)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, T, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    g1 = jax.grad(lambda q: (
        attention_qkv_fused(q, H, scale, 1.0, True) ** 2).sum())(qkv)

    def f2(qkv):
        x = qkv.reshape(B, T, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        r = mha(x[0], x[1], x[2], scale)
        return (r.transpose(0, 2, 1, 3).reshape(B, T, D) ** 2).sum()

    g2 = jax.grad(f2)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


@_pytest.mark.parametrize("chunk", [8, 4, 2])
def test_attention_bwd_head_group_chunked(rng, chunk):
    """The head-group backward at full ViT-H head count (H=16 -> two
    8-head grid steps per image) against the XLA recompute backward.
    G=8 stripes are the only lane-legal blocking (Mosaic requires the
    block's second-to-last dim divisible by 8 — a rule interpret mode
    does NOT check, r3 lesson); VMEM pressure is handled by the in-kernel
    compute chunking instead, so every chunk width must stay
    value-identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.ops.attn_fused_pallas import _bwd_head_group, _bwd_xla

    B, T, H, Dh = 2, 33, 16, 80
    D3 = 3 * H * Dh
    scale = Dh ** -0.5
    qkv = jax.random.normal(rng, (B, T, D3), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(rng, 1),
                          (B, T, H * Dh), jnp.float32)
    got = _bwd_head_group(qkv, g, H, scale, 1.0, True, chunk=chunk)
    want = _bwd_xla(qkv, g, H, scale, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_attention_qkv_fused_long_t_xla_fallback(rng):
    """T long enough that even ONE head's f32 logits overflow scoped VMEM
    (T=2048: 2048x2048x4 = 16.8 MB > 13) must route to the XLA
    contraction — even off-TPU with interpret=False, since the fallback
    never reaches pallas. (Intermediate long T like 1025 routes to the
    head-split flash kernel instead — test_flash_longT_route_* above.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.ops.attention import mha
    from ep_tpu.ops.attn_fused_pallas import attention_qkv_fused

    B, T, H, Dh = 1, 2048, 12, 64
    D = H * Dh
    scale = Dh ** -0.5
    qkv = jax.random.normal(rng, (B, T, 3 * D), jnp.float32)
    out = attention_qkv_fused(qkv, H, scale, 1.0, False)
    x = qkv.reshape(B, T, 3, H, Dh).transpose(2, 0, 3, 1, 4)
    ref = mha(x[0], x[1], x[2], scale)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, T, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # the backward's VMEM gate must likewise take the XLA fallback (the
    # in-VMEM Pallas backward can't stage (2048, 2048) f32 probs)
    g1 = jax.grad(lambda q: (
        attention_qkv_fused(q, H, scale, 1.0, False) ** 2).sum())(qkv)

    def f2(qkv):
        x = qkv.reshape(B, T, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        r = mha(x[0], x[1], x[2], scale)
        return (r.transpose(0, 2, 1, 3).reshape(B, T, D) ** 2).sum()

    g2 = jax.grad(f2)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_mlp_int8_fused_close_to_bf16(rng):
    """Opt-in int8 MLP kernel (interpret): output within the documented
    ~1-2% tolerance of the bf16 composition; backward = exact bf16 VJP."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.ops.mlp_int8_pallas import _ref_forward, mlp_int8_fused

    B, T, D = 2, 9, 32
    DH = 4 * D
    ks = jax.random.split(rng, 5)
    x = jax.random.normal(ks[0], (B, T, D), jnp.float32)
    w1 = jax.random.normal(ks[1], (D, DH), jnp.float32) * 0.1
    b1 = jax.random.normal(ks[2], (DH,), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[3], (DH, D), jnp.float32) * 0.1
    b2 = jax.random.normal(ks[4], (D,), jnp.float32) * 0.05
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)

    out = mlp_int8_fused(x, w1, b1, w2, b2, g, be, 1e-6, True)
    ref = _ref_forward(x, w1, b1, w2, b2, g, be, 1e-6)
    denom = float(jnp.abs(ref).mean())
    rel = float(jnp.abs(out - ref).mean()) / denom
    assert rel < 0.05, rel

    # hidden-striped variant (the ViT-L VMEM path): same math, per-stripe
    # activation scales — stays within the same tolerance of the output
    out2 = mlp_int8_fused(x, w1, b1, w2, b2, g, be, 1e-6, True, 2)
    rel2 = float(jnp.abs(out2 - ref).mean()) / denom
    assert rel2 < 0.05, rel2

    # two-kernel split (the ViT-H path): fc1/fc2 kernels with their own
    # resident weight, int8 intermediate + per-stripe scales through HBM
    from ep_tpu.ops.mlp_int8_pallas import _fwd_two_kernel
    out3 = _fwd_two_kernel(x, w1, b1, w2, b2, g, be, 1e-6, True, 2)
    rel3 = float(jnp.abs(out3 - ref).mean()) / denom
    assert rel3 < 0.05, rel3

    # custom VJP routes through the bf16 recompute — finite, right shapes
    grads = jax.grad(lambda *a: (mlp_int8_fused(
        *a, 1e-6, True) ** 2).sum(), argnums=(0, 1, 3))(
        x, w1, b1, w2, b2, g, be)
    for got, want in zip(grads, (x, w1, w2)):
        assert got.shape == want.shape
        assert bool(jnp.isfinite(got).all())


def test_int8_mlp_model_path(rng, monkeypatch):
    """--int8_mlp through the full backbone (interpret kernels): features
    stay close to the standard path and the param tree is identical."""
    monkeypatch.setenv("EP_TPU_PALLAS_INTERPRET", "1")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.models.vit import ViTConfig, VisionTransformer

    x = jax.random.normal(rng, (2, 32, 32, 3), jnp.float32)
    outs, trees = [], []
    for int8 in (False, True):
        # scan_blocks=True mirrors the bench config: the int8 branch's
        # param holders must stack identically under nn.scan
        cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                        num_heads=4, dtype=jnp.float32, scan_blocks=True,
                        attn_impl="pallas", int8_mlp=int8)
        model = VisionTransformer(cfg)
        variables = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                               "pos")
        trees.append(jax.tree_util.tree_structure(variables))
        outs.append(np.asarray(model.apply(variables, x, "pos")[0],
                               np.float32))
    assert trees[0] == trees[1]
    denom = np.abs(outs[0]).mean()
    assert np.abs(outs[1] - outs[0]).mean() / denom < 0.05


def test_aot_cache_roundtrip(tmp_path):
    """Serialized executable reloads from disk into a fresh wrapper and
    produces identical results; key mismatch (different shapes) recompiles."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.runtime.aot_cache import AOTCache

    @jax.jit
    def f(x):
        return (x * 2 + 1).sum()

    x = jnp.arange(12.0).reshape(3, 4)
    ac1 = AOTCache(str(tmp_path))
    w1 = ac1.wrap(f, "k")
    r1 = float(w1(x))
    files = list(tmp_path.glob("aot_*.pkl"))
    if not files:  # serialize unsupported on this backend — fallback path
        import pytest
        pytest.skip("serialize_executable unsupported here")
    # fresh wrapper (simulates a new process): must load, not recompile
    w2 = AOTCache(str(tmp_path)).wrap(jax.jit(lambda x: (x * 2 + 1).sum()), "k")
    assert float(w2(x)) == r1
    # different input signature → separate entry, still correct
    y = jnp.arange(8.0).reshape(2, 4)
    assert float(w2(y)) == float((y * 2 + 1).sum())
    assert len(list(tmp_path.glob("aot_*.pkl"))) == 2


def test_attn_supercell_matches_reference(rng):
    """LN1+qkv+attn+proj+residual supercell vs the XLA composition of the
    same math, interpret mode on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.ops.attn_block_pallas import (attn_supercell, _ref_forward)

    B, T, H, Dh = 2, 11, 4, 8
    D = H * Dh
    ks = jax.random.split(rng, 7)
    x = jax.random.normal(ks[0], (B, T, D), jnp.float32)
    w_qkv = jax.random.normal(ks[1], (D, 3 * D)) * 0.05
    b_qkv = jax.random.normal(ks[2], (3 * D,)) * 0.02
    gamma = 1.0 + 0.1 * jax.random.normal(ks[3], (D,))
    beta = 0.1 * jax.random.normal(ks[4], (D,))
    w_proj = jax.random.normal(ks[5], (D, D)) * 0.05
    b_proj = jax.random.normal(ks[6], (D,)) * 0.02
    scale = Dh ** -0.5

    out = attn_supercell(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj,
                         H, scale, 1.0, 1e-6, True)
    ref = _ref_forward(x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj,
                       H, scale, 1.0, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # custom VJP (Pallas in-VMEM attention backward + XLA matmul
    # recomputes) agrees with autodiff of the reference, for every
    # argument class: tokens, both weight matrices, biases, LN affine
    g1 = jax.grad(lambda *a: (attn_supercell(
        *a, H, scale, 1.0, 1e-6, True) ** 2).sum(),
        argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj)
    g2 = jax.grad(lambda *a: (_ref_forward(
        *a, H, scale, 1.0, 1e-6) ** 2).sum(),
        argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, w_qkv, b_qkv, gamma, beta, w_proj, b_proj)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_attn_supercell_vmem_fallback():
    """D=1280 (ViT-H) exceeds the kernel's VMEM budget: the wrapper must
    fall back to the XLA composition rather than OOM the scoped limit."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ep_tpu.ops.attn_block_pallas import attn_supercell, _ref_forward

    H, Dh, T, B = 16, 80, 256, 1
    D = H * Dh  # 1280
    k = jax.random.split(jax.random.key(0), 7)
    x = jax.random.normal(k[0], (B, T, D), jnp.float32)
    args = (x, jax.random.normal(k[1], (D, 3 * D)) * 0.02,
            jnp.zeros(3 * D), jnp.ones(D), jnp.zeros(D),
            jax.random.normal(k[5], (D, D)) * 0.02, jnp.zeros(D))
    # interpret=False on CPU: only safe because the budget check falls back
    # BEFORE any pallas lowering
    out = attn_supercell(*args, H, Dh ** -0.5, 1.0, 1e-6, False)
    ref = _ref_forward(*args, H, Dh ** -0.5, 1.0, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
