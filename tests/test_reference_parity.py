"""Numeric parity against the REFERENCE's own torch modules.

Round-1 gap (VERDICT Missing #3): every golden was a re-derivation by the
same author as the implementation. Here the actual reference modules from
/root/reference (torch CPU) are loaded, identical weights are pushed into
the flax twins, and outputs must match to <=1e-5 in float32.

Vendored files that import timm/torchvision get a minimal stub (drop_path /
trunc_normal_ / FrozenBatchNorm2d and friends) — only glue the modules never
execute in eval mode.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference absent")

B, N, D = 3, 16, 64  # N=16 → 4x4 grid for the spatial heads
TOL = dict(rtol=1e-5, atol=1e-5)


from ref_stubs import install_stubs as _install_stubs  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    """Reference modules, imported once with stubs + path in place."""
    _install_stubs()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import importlib
    ns = types.SimpleNamespace()
    ns.ep = importlib.import_module("poolings.ep")
    ns.simpool = importlib.import_module("poolings.simpool")
    ns.aim = importlib.import_module("poolings.aim")
    ns.coca = importlib.import_module("poolings.coca_pytorch")
    ns.cae = importlib.import_module("poolings.cae_att")
    ns.other = importlib.import_module("poolings.other_pool")
    ns.jepa = importlib.import_module("poolings.jepa.attentive_pooler")
    ns.ap_latent = importlib.import_module("poolings.clip.attention_pool")
    ns.ap2d = importlib.import_module("poolings.clip.attention_pool2d")
    ns.dolg = importlib.import_module("poolings.dolg.dolg")
    ns.cbam = importlib.import_module("poolings.cbam")
    ns.abmilp = importlib.import_module("poolings.abmilp")
    ns.lars = importlib.import_module("util.lars")
    ns.lr_sched = importlib.import_module("util.lr_sched")
    return ns


@pytest.fixture()
def x_np():
    return np.random.default_rng(0).normal(size=(B, N, D)).astype("f") * 0.7


def t(x):
    return torch.tensor(np.ascontiguousarray(x))


def n(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def lin(sd, name):
    p = {"kernel": n(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["bias"] = n(sd[f"{name}.bias"])
    return p


def ln(sd, name):
    return {"scale": n(sd[f"{name}.weight"]), "bias": n(sd[f"{name}.bias"])}


def conv(sd, name):
    # torch (out,in,kh,kw) -> flax (kh,kw,in,out)
    p = {"kernel": n(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = n(sd[f"{name}.bias"])
    return p


def run_flax(module, params, x_np, batch_stats=None, **kw):
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    out = module.apply(variables, jnp.asarray(x_np), **kw)
    return np.asarray(out)


def check(ours, theirs, **tol):
    np.testing.assert_allclose(ours, n(theirs), **(tol or TOL))


# ---------------------------------------------------------------- heads ----

def test_ep_parity(ref, x_np):
    from ep_tpu.poolings.ep import EfficientProbing
    m = ref.ep.EfficientProbing(dim=D, num_queries=4, d_out=2).eval()
    sd = m.state_dict()
    params = {"cls_token": n(sd["cls_token"]), "v": lin(sd, "v")}
    ours = run_flax(EfficientProbing(dim=D, num_queries=4, d_out=2,
                                     dtype=jnp.float32, use_pallas=False),
                    params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def _cuda_free(monkeypatch):
    """The reference SimPool's __init__ hardcodes device='cuda' for a
    buffer (simpool.py:23); strip it so CPU torch can construct it."""
    orig = torch.tensor

    def cpu_tensor(*a, **k):
        k.pop("device", None)
        return orig(*a, **k)

    monkeypatch.setattr(torch, "tensor", cpu_tensor)


def test_simpool_parity(ref, x_np, monkeypatch):
    from ep_tpu.poolings.simpool import SimPool
    _cuda_free(monkeypatch)
    m = ref.simpool.SimPool(dim=D, num_heads=1, qkv_bias=False, gamma=None,
                            use_beta=False).eval()
    sd = m.state_dict()
    params = {"norm_patches": ln(sd, "norm_patches"),
              "wq": lin(sd, "wq"), "wk": lin(sd, "wk")}
    ours = run_flax(SimPool(dim=D, num_heads=1, dtype=jnp.float32),
                    params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_esimpool_parity(ref, x_np, monkeypatch):
    from ep_tpu.poolings.simpool import SimPoolNoLinears
    _cuda_free(monkeypatch)
    m = ref.simpool.SimPool_nolinears(dim=D, num_heads=8, gamma=None).eval()
    sd = m.state_dict()
    params = {"norm_patches": ln(sd, "norm_patches")}
    ours = run_flax(SimPoolNoLinears(dim=D, num_heads=8, dtype=jnp.float32),
                    params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_aim_parity(ref, x_np):
    from ep_tpu.poolings.aim import AIMAttentionPooling
    m = ref.aim.AttentionPoolingClassifier(dim=D, num_heads=8).eval()
    # non-trivial running stats to actually test the BN mapping
    with torch.no_grad():
        m.bn.running_mean.normal_(0, 0.1)
        m.bn.running_var.uniform_(0.5, 1.5)
    sd = m.state_dict()
    params = {"cls_token": n(sd["cls_token"]),
              "k": lin(sd, "k"), "v": lin(sd, "v")}
    stats = {"bn": {"mean": n(sd["bn.running_mean"]),
                    "var": n(sd["bn.running_var"])}}
    ours = run_flax(AIMAttentionPooling(dim=D, num_heads=8,
                                        dtype=jnp.float32),
                    params, x_np, batch_stats=stats, train=False)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_coca_parity(ref, x_np):
    from ep_tpu.poolings.coca import CoCaCrossAttnPooling
    m = ref.coca.CrossAttention(dim=D).eval()
    sd = m.state_dict()
    params = {"img_queries": n(sd["img_queries"]),
              "norm": {"scale": n(sd["norm.gamma"]),
                       "bias": n(sd["norm.beta"])},
              "to_q": lin(sd, "to_q"), "to_kv": lin(sd, "to_kv"),
              "to_out": lin(sd, "to_out")}
    ours = run_flax(CoCaCrossAttnPooling(dim=D, dtype=jnp.float32),
                    params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_cae_parity(ref, x_np):
    from ep_tpu.poolings.cae import CAEAttentiveBlock
    m = ref.cae.CAEAttentiveBlock(dim=D).eval()
    sd = m.state_dict()
    params = {"query_token": n(sd["query_token"]),
              "norm1_q": ln(sd, "norm1_q"), "norm1_k": ln(sd, "norm1_k"),
              "norm1_v": ln(sd, "norm1_v"),
              "q": lin(sd, "cross_attn.q"), "k": lin(sd, "cross_attn.k"),
              "v": lin(sd, "cross_attn.v"),
              "proj": lin(sd, "cross_attn.proj")}
    ours = run_flax(CAEAttentiveBlock(dim=D, dtype=jnp.float32), params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_cait_parity(ref, x_np):
    from ep_tpu.poolings.cait import CaiTPooling
    m = ref.other.CAPooling(embed_dim=D).eval()
    sd = m.state_dict()
    blk = "blocks_token_only.0"
    params = {
        "cls_token": n(sd["cls_token"]),
        "blocks_token_only_0_gamma_1": n(sd[f"{blk}.gamma_1"]),
        "blocks_token_only_0_gamma_2": n(sd[f"{blk}.gamma_2"]),
        "blocks_token_only_0_norm1": ln(sd, f"{blk}.norm1"),
        "blocks_token_only_0_norm2": ln(sd, f"{blk}.norm2"),
        "blocks_token_only_0_attn": {
            "q": lin(sd, f"{blk}.attn.q"), "k": lin(sd, f"{blk}.attn.k"),
            "v": lin(sd, f"{blk}.attn.v"),
            "proj": lin(sd, f"{blk}.attn.proj")},
        "blocks_token_only_0_mlp_fc1": lin(sd, f"{blk}.mlp.fc1"),
        "blocks_token_only_0_mlp_fc2": lin(sd, f"{blk}.mlp.fc2"),
        "norm": ln(sd, "norm"),
    }
    ours = run_flax(CaiTPooling(embed_dim=D, dtype=jnp.float32), params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_dinovit_parity(ref, x_np):
    from ep_tpu.poolings.dinovit import DinoViTBlockPooling
    m = ref.other.DinoViTBlockPooling(d_model=D).eval()
    sd = m.state_dict()
    params = {
        "norm1": ln(sd, "dino_block.norm1"),
        "norm2": ln(sd, "dino_block.norm2"),
        "qkv": lin(sd, "dino_block.attn.qkv"),
        "proj": lin(sd, "dino_block.attn.proj"),
        "mlp_fc1": lin(sd, "dino_block.mlp.fc1"),
        "mlp_fc2": lin(sd, "dino_block.mlp.fc2"),
    }
    ours = run_flax(DinoViTBlockPooling(d_model=D, dtype=jnp.float32),
                    params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_jepa_parity(ref, x_np):
    from ep_tpu.poolings.jepa import JEPAAttentivePooler
    m = ref.jepa.AttentivePooler(embed_dim=D, num_heads=8).eval()
    sd = m.state_dict()
    cab = "cross_attention_block"
    params = {
        "query_tokens": n(sd["query_tokens"]),
        "norm1": ln(sd, f"{cab}.norm1"), "norm2": ln(sd, f"{cab}.norm2"),
        "xattn_q": lin(sd, f"{cab}.xattn.q"),
        "xattn_kv": lin(sd, f"{cab}.xattn.kv"),
        "xattn_proj": lin(sd, f"{cab}.xattn.proj"),
        "mlp_fc1": lin(sd, f"{cab}.mlp.fc1"),
        "mlp_fc2": lin(sd, f"{cab}.mlp.fc2"),
    }
    ours = run_flax(JEPAAttentivePooler(embed_dim=D, num_heads=8,
                                        dtype=jnp.float32), params, x_np)
    with torch.no_grad():
        theirs = m(t(x_np))
    theirs = theirs.squeeze(1) if theirs.ndim == 3 else theirs
    check(ours, theirs)


def test_siglip_parity(ref, x_np):
    from ep_tpu.poolings.clip_pool import SigLIPAttentionPool
    m = ref.ap_latent.AttentionPoolLatent(in_features=D).eval()
    sd = m.state_dict()
    params = {
        "latent": n(sd["latent"]),
        "q": lin(sd, "q"), "kv": lin(sd, "kv"), "proj": lin(sd, "proj"),
        "mlp_fc1": lin(sd, "mlp.fc1"), "mlp_fc2": lin(sd, "mlp.fc2"),
    }
    ours = run_flax(SigLIPAttentionPool(in_features=D, dtype=jnp.float32),
                    params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_clip_parity(ref, x_np):
    from ep_tpu.poolings.clip_pool import CLIPAttentionPool2d
    m = ref.ap2d.AttentionPool2d(in_features=D, feat_size=4).eval()
    sd = m.state_dict()
    params = {
        "pos_embed": n(sd["pos_embed"]), "norm": ln(sd, "norm"),
        "qkv": lin(sd, "qkv"), "proj": lin(sd, "proj"),
    }
    ours = run_flax(CLIPAttentionPool2d(in_features=D, feat_size=4,
                                        dtype=jnp.float32), params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


def test_dolg_parity(ref, x_np):
    from ep_tpu.poolings.dolg import DOLGSpatialAttention
    m = ref.dolg.SpatialAttention2d(in_c=D, s3_dim=D, with_aspp=False).eval()
    with torch.no_grad():
        m.bn.running_mean.normal_(0, 0.1)
        m.bn.running_var.uniform_(0.5, 1.5)
    sd = m.state_dict()
    params = {"conv1": conv(sd, "conv1"), "conv2": conv(sd, "conv2"),
              "bn": {"scale": n(sd["bn.weight"]), "bias": n(sd["bn.bias"])}}
    stats = {"bn": {"mean": n(sd["bn.running_mean"]),
                    "var": n(sd["bn.running_var"])}}
    ours = run_flax(DOLGSpatialAttention(in_c=D, s3_dim=D, dtype=jnp.float32),
                    params, x_np, batch_stats=stats, train=False)
    with torch.no_grad():
        # reference takes TOKENS (B, N, D) and grids them itself
        # (dolg.py:48-51), returning the spatial mean (B, C)
        theirs = m(t(x_np))
    check(ours, theirs)


def test_cbam_parity(ref, x_np):
    from ep_tpu.poolings.cbam import CbamPooling
    m = ref.cbam.CbamPooling(channels=D, spatial_kernel_size=7).eval()
    with torch.no_grad():
        m.spatial.conv.bn.running_mean.normal_(0, 0.1)
        m.spatial.conv.bn.running_var.uniform_(0.5, 1.5)
    sd = m.state_dict()
    params = {
        "fc1": conv(sd, "channel.fc1"), "fc2": conv(sd, "channel.fc2"),
        "spatial_conv": conv(sd, "spatial.conv.conv"),
        "spatial_bn": {"scale": n(sd["spatial.conv.bn.weight"]),
                       "bias": n(sd["spatial.conv.bn.bias"])},
    }
    stats = {"spatial_bn": {"mean": n(sd["spatial.conv.bn.running_mean"]),
                            "var": n(sd["spatial.conv.bn.running_var"])}}
    ours = run_flax(CbamPooling(channels=D, dtype=jnp.float32), params, x_np,
                    batch_stats=stats, train=False)
    with torch.no_grad():
        theirs = m(t(x_np))
    check(ours, theirs)


@pytest.mark.parametrize("sa", ["none", "map", "both"])
def test_abmilp_parity(ref, x_np, sa):
    from ep_tpu.poolings.abmilp import ABMILPHead
    m = ref.abmilp.ABMILPHead(dim=D, self_attention_apply_to=sa,
                              activation="tanh", depth=2, cond="none",
                              content="all").eval()
    sd = m.state_dict()
    params = {
        "attention_predictor_0": lin(sd, "attention_predictor.0"),
        "attention_predictor_2": lin(sd, "attention_predictor.2"),
    }
    if sa != "none":
        params["self_attn"] = {"qkv": lin(sd, "self_attn.qkv"),
                               "proj": lin(sd, "self_attn.proj")}
    ours = run_flax(ABMILPHead(dim=D, self_attention_apply_to=sa,
                               depth=2, num_patches=N, dtype=jnp.float32),
                    params, x_np)
    with torch.no_grad():
        check(ours, m(t(x_np)))


# ------------------------------------------------------- optimizer / LR ----

def test_lars_trajectory_parity(ref):
    """5 steps on a quadratic: torch util.lars.LARS vs our raw-update LARS
    (the train step applies p -= lr * update)."""
    from ep_tpu.train.lars import scaled_lars
    g = np.random.default_rng(0)
    w0 = g.normal(size=(4, 3)).astype("f")  # ndim>1 → trust ratio applies
    b0 = g.normal(size=(3,)).astype("f")    # ndim==1 → skip rule
    tgt_w = g.normal(size=(4, 3)).astype("f")
    tgt_b = g.normal(size=(3,)).astype("f")
    lr, wd = 0.37, 0.01

    wp = torch.nn.Parameter(t(w0.copy()))
    bp = torch.nn.Parameter(t(b0.copy()))
    opt = ref.lars.LARS([wp, bp], lr=lr, weight_decay=wd)

    tx = scaled_lars(weight_decay=wd)
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    state = tx.init(params)

    for step in range(5):
        loss = ((wp - t(tgt_w)) ** 2).sum() + ((bp - t(tgt_b)) ** 2).sum()
        opt.zero_grad()
        loss.backward()
        opt.step()

        grads = {"w": 2 * (params["w"] - jnp.asarray(tgt_w)),
                 "b": 2 * (params["b"] - jnp.asarray(tgt_b))}
        raw, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, raw)

        np.testing.assert_allclose(np.asarray(params["w"]), n(wp),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(params["b"]), n(bp),
                                   rtol=1e-5, atol=1e-6)


def test_lr_schedule_parity(ref):
    """lr_at_epoch vs util.lr_sched.adjust_learning_rate over a dense sweep
    of fractional epochs."""
    import argparse
    from ep_tpu.train.schedule import lr_at_epoch

    args = argparse.Namespace(lr=0.8, min_lr=1e-4, warmup_epochs=7.0,
                              epochs=90.0)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    for frac in np.linspace(0.0, 90.0, 481):
        theirs = ref.lr_sched.adjust_learning_rate(opt, float(frac), args)
        ours = float(lr_at_epoch(frac, args.lr, args.min_lr,
                                 args.warmup_epochs, args.epochs))
        assert abs(ours - theirs) < 1e-6, (frac, ours, theirs)


def test_probe_head_bn_lp_parity(ref, x_np):
    """Plain LP: BatchNorm1d(affine=False, eps 1e-6) + Linear
    (main_linprobe.py:551) vs ProbeHead with no pooling, eval mode."""
    from ep_tpu.configs import TrainConfig
    from ep_tpu.poolings.registry import ProbeHead

    feats = x_np[:, 0]  # (B, D) pooled features
    torch_head = torch.nn.Sequential(
        torch.nn.BatchNorm1d(D, affine=False, eps=1e-6),
        torch.nn.Linear(D, 5)).eval()
    with torch.no_grad():
        torch_head[0].running_mean.normal_(0, 0.1)
        torch_head[0].running_var.uniform_(0.5, 1.5)
    sd = torch_head.state_dict()

    cfg = TrainConfig(cls_features="cls", nb_classes=5)
    head = ProbeHead(cfg, D, N, dtype=jnp.float32)
    params = {"fc": lin(sd, "1")}
    stats = {"bn": {"mean": n(sd["0.running_mean"]),
                    "var": n(sd["0.running_var"])}}
    ours = head.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(feats), train=False)
    with torch.no_grad():
        check(np.asarray(ours), torch_head(t(feats)))


def test_head_training_trajectory_parity(ref):
    """5 full training steps of the grafted EP head — pool + BatchNorm (train
    mode, running-stat updates) + Linear + CE + LARS + per-step LR — against
    the reference composition (main_linprobe.py:487-499 graft + util/lars.py
    + engine loss). Catches integration bugs the per-module tests cannot
    (e.g. BN momentum conventions: torch 0.1 == flax 0.9)."""
    import jax
    from ep_tpu.configs import TrainConfig
    from ep_tpu.parallel.mesh import make_mesh
    from ep_tpu.poolings.registry import ProbeHead
    from ep_tpu.train.feature_cache import make_head_steps
    from ep_tpu.train.lars import build_optimizer
    from ep_tpu.train.state import create_train_state

    Bb, C = 16, 5
    g = np.random.default_rng(0)
    feats = g.normal(size=(Bb, N, D)).astype("f")
    labels = g.integers(0, C, size=(Bb,)).astype("i")
    lrs = [0.05, 0.1, 0.2, 0.15, 0.1]

    # --- reference: Sequential(EP, BN1d(affine=False), Linear) + LARS ------
    ep = ref.ep.EfficientProbing(dim=D, num_queries=4, d_out=1)
    torch_head = torch.nn.Sequential(
        ep, torch.nn.BatchNorm1d(D, affine=False, eps=1e-6),
        torch.nn.Linear(D, C)).train()
    opt = ref.lars.LARS(torch_head.parameters(), lr=0.0, weight_decay=0.0)
    crit = torch.nn.CrossEntropyLoss()

    sd = torch_head.state_dict()
    head_params = {
        "pool": {"cls_token": n(sd["0.cls_token"]),
                 "v": {"kernel": n(sd["0.v.weight"]).T}},
        "fc": {"kernel": n(sd["2.weight"]).T, "bias": n(sd["2.bias"])},
    }
    bn_stats = {"bn": {"mean": n(sd["1.running_mean"]),
                       "var": n(sd["1.running_var"])}}

    # --- ours: ProbeHead + make_head_steps (the --cache_features path) -----
    cfg = TrainConfig(cls_features="ep", ep_queries=4, d_out=1, nb_classes=C,
                      pallas_pool=False, epochs=1, warmup_epochs=0)
    head = ProbeHead(cfg, D, N, dtype=jnp.float32)
    tx = build_optimizer("lars", 0.0)
    state = create_train_state(
        {"params": {"head": head_params}, "batch_stats": {"head": bn_stats}},
        tx, finetuning=False)
    mesh = make_mesh()
    lr_fn = lambda step: jnp.asarray(lrs, jnp.float32)[step]
    train_step, _ = make_head_steps(head, mesh, tx, lr_fn)

    jf = jnp.asarray(feats)
    jl = jnp.asarray(labels)
    tf_, tl = t(feats), torch.tensor(labels, dtype=torch.long)
    for step in range(5):
        state, metrics = train_step(state, jf, jl)
        ours_loss = float(metrics["loss"])

        for pg in opt.param_groups:
            pg["lr"] = lrs[step]
        opt.zero_grad()
        loss = crit(torch_head(tf_), tl)
        loss.backward()
        opt.step()
        assert abs(ours_loss - float(loss)) < 2e-4, (step, ours_loss,
                                                     float(loss))

    # final parameters and BN running stats agree after 5 momentum updates
    sd = torch_head.state_dict()
    np.testing.assert_allclose(
        np.asarray(state.trainable["head"]["fc"]["kernel"]),
        n(sd["2.weight"]).T, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.trainable["head"]["pool"]["cls_token"]),
        n(sd["0.cls_token"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["head"]["bn"]["mean"]),
        n(sd["1.running_mean"]), rtol=1e-4, atol=1e-5)
    # running VAR: torch-exact since poolings/batchnorm.py (the Bessel-
    # corrected n/(n-1) batch variance goes into the running stat, exactly
    # like torch.nn.BatchNorm1d; flax's nn.BatchNorm blends the biased one,
    # which drifted eval predictions in short runs — test_engine_parity).
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["head"]["bn"]["var"]),
        n(sd["1.running_var"]), rtol=1e-4, atol=1e-6)
