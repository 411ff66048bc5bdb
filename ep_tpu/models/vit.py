"""One configurable flax Vision Transformer covering the reference's backbone zoo.

Instead of five near-duplicate torch model files (models_vit.py,
models_simmim.py, models_mae.py encoder, DINOv2/CLIP towers), a single
parameterized implementation:

  * absolute learned pos-embed (MAE/timm) or none + relative-position-bias
    attention (SimMIM/BEiT, models_simmim.py:30-115),
  * optional [CLS] token (vit_huge I-JEPA style runs without one,
    models_vit.py:161-196) and optional register tokens (DINOv2),
  * optional LayerScale (SimMIM init_values, DINOv2),
  * q/v-only attention bias (BEiT-style k-bias-free, models_simmim.py:42-48),
  * fused attention by default; opt-in capture of the 5-kind attention-stat
    stack (the reference pays this tax on every step, models_vit.py:243-269 —
    we only pay it in the attention-stats CLI).

The ``return_features`` protocol mirrors models_vit.py:198-423: the pooled
head consumes "pos" (patch tokens) or "both" ([CLS]+patches); "cls"/"gap"/
"raw"/"cp*"/"ca*"/"attn-*" are the LP/diagnostic modes.

Note: the reference applies NO final LayerNorm before the head in its probing
path (forward_features returns raw block output; models_vit.py:275-398), so
``final_norm="none"`` is the parity default; DINOv2/CLIP-style towers set it.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np

from ep_tpu.ops.attention import attn_stats_from_probs, mha

# Pooled-feature names that consume patch tokens only / [CLS]+patch tokens
# (models_vit.py:404-417).
ATTENTIVE_POOLINGS = [
    "abmilp", "simpool", "esimpool", "clip", "siglip", "aim", "ep", "cbam",
    "coca", "cait", "dinovit", "jepa", "dolg", "cae",
]
ATTENTIVE_POOLINGS_ALL = [f"{n}_all" for n in ATTENTIVE_POOLINGS]


def remap_features(return_features: str) -> str:
    """CLI name → token-level mode (models_vit.py:412-417)."""
    if return_features == "pos":
        return "gap"
    if return_features in ATTENTIVE_POOLINGS:
        return "pos"
    if return_features in ATTENTIVE_POOLINGS_ALL:
        return "both"
    return return_features


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qkv_bias_mode: str = "full"  # full | qv_only (BEiT/SimMIM)
    class_token: bool = True
    reg_tokens: int = 0
    cls_from_registers: bool = False  # CAPI: global_repr = register-token
    # mean (models_capi.py:21 returns (global_repr, registers, feature_map);
    # there is no [CLS] — the image-level representation is pooled from the
    # 16 registers)
    use_abs_pos_emb: bool = True
    rel_pos_bias: str = "none"  # none | shared | per_block
    init_values: Optional[float] = None  # LayerScale
    final_norm: str = "none"  # none | ln
    norm_eps: float = 1e-6
    mlp_type: str = "gelu"  # gelu | swiglu | quick_gelu (OpenAI CLIP)
    pre_norm: bool = False  # OpenCLIP towers: LayerNorm after pos-embed add,
    # before the transformer (open_clip VisionTransformer.ln_pre)
    proj_dim: Optional[int] = None  # OpenCLIP visual projection: the pooled
    # cls token maps D -> proj_dim (models_more.py:55-60 — cls-path embed
    # dim differs from the patch-token width)
    attn_impl: str = "xla"  # xla | pallas (fused flash-attention kernel)
    int8_mlp: bool = False  # OPT-IN: fused int8 MLP kernel (2x MXU rate,
    # ~17% off the MLP half at ViT-B bench shapes; ~1.2% mean feature
    # error vs bf16 — see ops/mlp_int8_pallas.py). Takes effect on the
    # Pallas supercell path with mlp_type="gelu".
    remat_blocks: bool = False  # rematerialize each block in the backward
    # pass (--finetuning memory): residuals per block shrink to the (B,T,D)
    # carry, so ViT-H full-finetune fits HBM at useful batch sizes. Only
    # meaningful when gradients flow through the backbone; requires
    # scan_blocks (the unrolled path's static capture kwargs don't compose
    # with nn.remat).
    remat_policy: str = "none"  # selective rematerialization under
    # remat_blocks: which per-block tensors the backward may keep instead
    # of recomputing. "none" = recompute everything (minimum memory);
    # "attn_out" saves the attention half's output (skips re-running the
    # Pallas attention/supercell forward in the recompute — its custom-VJP
    # residuals are its own inputs, so saving the output DCEs the kernel
    # out of the backward); "attn_fc1" additionally saves the MLP's fc1
    # output (skips the fc1 matmul recompute; +4·B·T·D bf16 per block);
    # "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    # (saves every weight-matmul output; largest footprint).
    scan_blocks: bool = False  # lax.scan over layers: one traced block body
    # (depth× smaller HLO, much faster compiles for deep ViTs); params live
    # stacked under 'blocks/block' instead of per-layer 'blocks_i'. The
    # capture/return_block diagnostics paths require scan_blocks=False.
    dtype: Any = jnp.bfloat16  # compute dtype; params stay fp32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.reg_tokens

    def replace(self, **kw) -> "ViTConfig":
        return dataclasses.replace(self, **kw)


def _rel_pos_index(grid: Tuple[int, int]) -> np.ndarray:
    """BEiT relative-position index over a (H, W) grid + [CLS]
    (models_simmim.py:56-75); returned shape (T, T) with T = H*W+1."""
    wh, ww = grid
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, Wh*Ww)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, T-1, T-1)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    idx = np.zeros((wh * ww + 1, wh * ww + 1), dtype=np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class RelPosBias(nn.Module):
    """Shared relative-position bias table (models_simmim.py:180-215)."""

    grid: Tuple[int, int]
    num_heads: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        wh, ww = self.grid
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros, (num_rel, self.num_heads), jnp.float32,
        )
        idx = _rel_pos_index(self.grid)
        bias = table[idx.reshape(-1)].reshape(idx.shape[0], idx.shape[1], -1)
        return bias.transpose(2, 0, 1)[None]  # (1, H, T, T)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.bfloat16
    act: str = "gelu"  # gelu | quick_gelu (x*sigmoid(1.702x), OpenAI CLIP)

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        # tag for remat_policy="attn_fc1" (no-op otherwise)
        x = checkpoint_name(x, "mlp_fc1")
        if self.act == "quick_gelu":
            x = x * nn.sigmoid(1.702 * x)
        else:
            # exact (erf) GELU only when computing in >=f32: on TPU the erf
            # path costs ~3 ms/block at bench shapes while tanh-GELU fuses
            # into the matmul epilogue for free (measured r2; prof4). The
            # tanh approximation's max error (~3e-4) is far below bf16's
            # rounding step (~8e-3), so in bf16 the two are numerically
            # indistinguishable; f32 runs (parity tests) keep exact erf.
            x = nn.gelu(x, approximate=self.dtype == jnp.bfloat16)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class SwiGLUMlp(nn.Module):
    """SwiGLU FFN (DINOv2-giant style)."""

    hidden: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x12 = nn.Dense(2 * self.hidden, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        x = nn.silu(x1) * x2
        return nn.Dense(self.out, dtype=self.dtype, name="w3")(x)


def _remat_policy(name: str):
    """Resolve ViTConfig.remat_policy to a jax.checkpoint policy (None =
    recompute everything). Names refer to checkpoint_name tags placed in
    Block/Mlp below."""
    if name in ("none", ""):
        return None
    cp = jax.checkpoint_policies
    if name == "dots":
        return cp.dots_with_no_batch_dims_saveable
    if name == "attn_out":
        return cp.save_only_these_names("attn_out")
    if name == "attn_fc1":
        return cp.save_only_these_names("attn_out", "mlp_fc1")
    raise ValueError(f"unknown remat_policy {name!r} "
                     "(none | attn_out | attn_fc1 | dots)")


def _pallas_attn_enabled(c) -> bool:
    """'pallas' forces the fused kernels; 'auto' uses them whenever they
    have a safe SPMD story: single device, or a data-parallel-only mesh
    (the kernels then run per-shard under jax.shard_map — see
    parallel/mesh.py::data_parallel_call). With an active tensor-parallel
    axis the qkv tensor is head-sharded and the per-image kernels don't
    apply — XLA attention handles that layout."""
    if c.attn_impl == "pallas":
        return True
    if c.attn_impl != "auto":
        return False
    if jax.device_count() == 1:
        return True
    from ep_tpu.parallel.mesh import MODEL_AXIS, current_mesh
    mesh = current_mesh()
    return mesh is not None and mesh.shape[MODEL_AXIS] == 1


def int8_mlp_inactive_reason(c) -> Optional[str]:
    """Why a requested --int8_mlp would silently stay bf16, else None.

    Mirrors the static half of Block.__call__'s supercell gate (the int8
    MLP kernel only runs on the Pallas block path). Runtime-only conditions
    (attention capture, is_initializing) are not config properties and are
    excluded — they never hold during normal training. CLIs call this so
    users don't benchmark bf16 believing int8 is engaged.
    """
    if not c.int8_mlp:
        return None
    from ep_tpu.ops import kernel_mode
    if c.mlp_type != "gelu":
        return f"mlp_type={c.mlp_type!r} (SwiGLU/QuickGELU MLPs stay bf16)"
    if c.rel_pos_bias != "none":
        return "rel-pos-bias backbones take the XLA attention path"
    if c.init_values is not None:
        return "LayerScale backbones take the XLA attention path"
    if not (c.qkv_bias and c.qkv_bias_mode == "full"):
        return "qkv_bias mode is not 'full' (supercell needs fused qkv bias)"
    if not kernel_mode()[0]:
        return "no TPU backend (and EP_TPU_PALLAS_INTERPRET unset)"
    if not _pallas_attn_enabled(c):
        return ("attn_impl resolves to XLA (attn_impl='xla', or 'auto' on a "
                "tensor-parallel mesh)")
    return None


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, *, temperature: float = 1.0,
                 rel_bias: Optional[jnp.ndarray] = None,
                 return_probs: bool = False):
        c = self.cfg
        B, T, D = x.shape
        H = c.num_heads
        head_dim = D // H
        scale = head_dim ** -0.5

        if c.qkv_bias and c.qkv_bias_mode == "qv_only":
            qkv = nn.Dense(3 * D, use_bias=False, dtype=c.dtype, name="qkv")(x)
            q_bias = self.param("q_bias", nn.initializers.zeros, (D,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (D,), jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(qkv.dtype)
        else:
            qkv = nn.Dense(3 * D, use_bias=c.qkv_bias, dtype=c.dtype, name="qkv")(x)

        from ep_tpu.ops import kernel_mode
        k_ok, k_interp = kernel_mode()
        probs = None
        if (_pallas_attn_enabled(c) and not return_probs and rel_bias is None
                and not self.is_initializing() and k_ok):
            # natural-layout fused kernel: consumes the qkv Dense output
            # directly and emits (B,T,D) — no (B,H,T,Dh) transpose tensors,
            # no (B,H,T,T) probabilities in HBM. ~2.2x the XLA attention
            # path at ViT-B bench shapes (r2: 3.86 vs 8.47 ms/block).
            # Multi-device: runs per-data-shard under shard_map.
            from ep_tpu.ops.attn_fused_pallas import attention_qkv_fused
            from ep_tpu.parallel.mesh import data_parallel_call
            out = data_parallel_call(
                lambda t: attention_qkv_fused(t, H, scale, temperature,
                                              k_interp),
                (qkv,), (True,))
        else:
            qkv = qkv.reshape(B, T, 3, H, head_dim).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            out = mha(q, k, v, scale, temperature=temperature, bias=rel_bias,
                      return_probs=return_probs)
            if return_probs:
                out, probs = out
            out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = nn.Dense(D, dtype=c.dtype, name="proj")(out)
        if return_probs:
            return out, probs
        return out


class LayerScale(nn.Module):
    dim: int
    init_values: float
    suffix: str = ""

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            f"gamma{self.suffix}",
            nn.initializers.constant(self.init_values), (self.dim,), jnp.float32,
        )
        return x * gamma.astype(x.dtype)


class _LNParams(nn.Module):
    """Declare LayerNorm's param tree without running it (the fused
    supercell computes the normalization in-kernel)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Declare nn.Dense's param tree (same names/inits) without running it."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _AttnParams(nn.Module):
    """The Attention submodule's param tree, for the fused block path."""

    dim: int

    @nn.compact
    def __call__(self):
        qkv = _DenseParams(3 * self.dim, self.dim, name="qkv")()
        proj = _DenseParams(self.dim, self.dim, name="proj")()
        return qkv, proj


class _MlpParams(nn.Module):
    """The Mlp submodule's param tree, for the fused int8 MLP path."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.hidden, self.dim, name="fc1")()
        fc2 = _DenseParams(self.dim, self.hidden, name="fc2")()
        return fc1, fc2


class Block(nn.Module):
    cfg: ViTConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, *, temperature: float = 1.0,
                 rel_bias: Optional[jnp.ndarray] = None,
                 capture: bool = False):
        c = self.cfg
        D = c.embed_dim

        from ep_tpu.ops import kernel_mode
        k_ok, k_interp = kernel_mode()
        if (_pallas_attn_enabled(c) and not capture and rel_bias is None
                and c.init_values is None and c.qkv_bias
                and c.qkv_bias_mode == "full"
                and not self.is_initializing() and k_ok):
            # attention supercell: LN1 + qkv + attention + proj + residual
            # in one kernel (ops/attn_block_pallas.py). Param tree is
            # declared through holders so names/shapes/inits are identical
            # to the standard path (checkpoints interchange freely).
            # Multi-device: runs per-data-shard under shard_map.
            from ep_tpu.ops.attn_block_pallas import attn_supercell
            from ep_tpu.parallel.mesh import data_parallel_call
            g1, b1 = _LNParams(D, name="norm1")()
            (qkv_k, qkv_b), (proj_k, proj_b) = _AttnParams(D, name="attn")()
            H = c.num_heads
            scale = (D // H) ** -0.5
            x = data_parallel_call(
                lambda x_, wq, bq, g_, b_, wp, bp: attn_supercell(
                    x_, wq, bq, g_, b_, wp, bp, H, scale, temperature,
                    c.norm_eps, k_interp),
                (x.astype(c.dtype), qkv_k, qkv_b, g1, b1, proj_k, proj_b),
                (True, False, False, False, False, False, False))
            # remat_policy="attn_out": saving the supercell output lets the
            # recompute pass skip re-running the Pallas forward — the
            # custom VJP's residuals are the kernel's own inputs.
            x = checkpoint_name(x, "attn_out")
            if c.int8_mlp and c.mlp_type == "gelu":
                # fused int8 MLP half (opt-in): LN2 + per-token quant +
                # int8 fc1 + tanh-gelu + requant + int8 fc2 + residual.
                # Same param tree as the standard path via holders.
                from ep_tpu.ops.mlp_int8_pallas import mlp_int8_fused
                g2, b2 = _LNParams(D, name="norm2")()
                (fc1_k, fc1_b), (fc2_k, fc2_b) = _MlpParams(
                    D, int(D * c.mlp_ratio), name="mlp")()
                x = data_parallel_call(
                    lambda x_, w1, b1_, w2, b2_, g_, be_: mlp_int8_fused(
                        x_, w1, b1_, w2, b2_, g_, be_, c.norm_eps,
                        k_interp),
                    (x, fc1_k, fc1_b, fc2_k, fc2_b, g2, b2),
                    (True, False, False, False, False, False, False))
                return x, None
            h = nn.LayerNorm(epsilon=c.norm_eps, dtype=c.dtype,
                             name="norm2")(x)
            if c.mlp_type == "swiglu":
                m = SwiGLUMlp(int(D * c.mlp_ratio), D, dtype=c.dtype,
                              name="mlp")(h)
            else:
                m = Mlp(int(D * c.mlp_ratio), D, dtype=c.dtype,
                        act=c.mlp_type, name="mlp")(h)
            return x + m, None

        h = nn.LayerNorm(epsilon=c.norm_eps, dtype=c.dtype, name="norm1")(x)
        y = Attention(c, name="attn")(
            h, temperature=temperature, rel_bias=rel_bias, return_probs=capture
        )
        probs = None
        if capture:
            y, probs = y

        stats = None
        if capture:
            # residual magnitudes: ||x||, ||attn-branch|| (models_vit.py:147-150)
            x_norm = jnp.linalg.norm(x.astype(jnp.float32), axis=2)
            y_norm = jnp.linalg.norm(y.astype(jnp.float32), axis=2)
            magnitudes = jnp.stack([x_norm, y_norm])[:, :, None]  # (2,B,1,T)
            stats = (attn_stats_from_probs(probs), magnitudes, probs)

        if c.init_values is not None:
            y = LayerScale(D, c.init_values, "_1", name="ls1")(y)
        x = x + y
        x = checkpoint_name(x, "attn_out")
        h = nn.LayerNorm(epsilon=c.norm_eps, dtype=c.dtype, name="norm2")(x)
        if c.mlp_type == "swiglu":
            m = SwiGLUMlp(int(D * c.mlp_ratio), D, dtype=c.dtype, name="mlp")(h)
        else:
            m = Mlp(int(D * c.mlp_ratio), D, dtype=c.dtype, act=c.mlp_type,
                    name="mlp")(h)
        if c.init_values is not None:
            m = LayerScale(D, c.init_values, "_2", name="ls2")(m)
        x = x + m
        return x, stats


class _BlockWrap(nn.Module):
    """scan body: (carry=x, broadcast rel_bias/temperature) → (x', None)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, rel_bias, temperature):
        y, _ = Block(self.cfg, name="block")(
            x, temperature=temperature, rel_bias=rel_bias, capture=False)
        return y, None


class VisionTransformer(nn.Module):
    """The backbone. ``__call__`` implements the reference's
    forward_features token protocol (models_vit.py:198-398)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, 3) NHWC
        return_features: str = "cls",
        return_block: Optional[int] = None,
        *,
        shuffle_subsets: int = 1,
        shuffle_rng: Optional[jax.Array] = None,
        attn_temperature: float = 1.0,
        capture_stats: bool = False,
        return_final_attn: bool = False,
    ):
        c = self.cfg
        B = x.shape[0]
        D = c.embed_dim

        # --- patch embedding -------------------------------------------------
        x = nn.Conv(
            D, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
            padding="VALID", dtype=c.dtype, name="patch_embed",
        )(x.astype(c.dtype))
        x = x.reshape(B, -1, D)  # (B, N, D)
        N = x.shape[1]

        prefix = []
        if c.class_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D), jnp.float32)
            prefix.append(jnp.broadcast_to(cls.astype(c.dtype), (B, 1, D)))
        if c.reg_tokens:
            reg = self.param(
                "reg_tokens", nn.initializers.zeros, (1, c.reg_tokens, D), jnp.float32
            )
            prefix.append(jnp.broadcast_to(reg.astype(c.dtype), (B, c.reg_tokens, D)))
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1)

        if c.use_abs_pos_emb:
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, c.num_prefix_tokens + c.num_patches, D), jnp.float32,
            )
            if pos.shape[1] != x.shape[1]:
                from ep_tpu.utils.pos_embed import interpolate_pos_embed
                pos = interpolate_pos_embed(pos, N, c.num_prefix_tokens)
            x = x + pos.astype(c.dtype)

        if c.pre_norm:  # OpenCLIP ln_pre
            x = nn.LayerNorm(epsilon=c.norm_eps, dtype=c.dtype,
                             name="norm_pre")(x)

        # --- token shuffling into subsets (models_vit.py:224-239) ------------
        # partition the N patch tokens into `shuffle_subsets` random groups
        # processed as extra batch; with subsets=1 (the reference's only used
        # value, models_vit.py:419) this is the identity and costs nothing.
        ss = shuffle_subsets
        if ss > 1:
            assert N % ss == 0, f"{N=} not divisible by {ss=}"
            assert return_features in ("cls", "pos", "gap")
            assert c.rel_pos_bias == "none", "subsets break the rel-pos grid"
            n_pre = c.num_prefix_tokens
            x_pre, x_pos = x[:, :n_pre], x[:, n_pre:]
            if shuffle_rng is None:
                shuffle_rng = self.make_rng("shuffle")
            noise = jax.random.uniform(shuffle_rng, (B, N))
            ids = jnp.argsort(noise, axis=1)
            x_pos = jnp.take_along_axis(x_pos, ids[:, :, None], axis=1)
            x_pos = x_pos.reshape(B, ss, N // ss, D)
            x_pre = jnp.broadcast_to(x_pre[:, None], (B, ss, n_pre, D))
            x = jnp.concatenate([x_pre, x_pos], axis=2)
            x = x.reshape(B * ss, n_pre + N // ss, D)

        rel_bias = None
        if c.rel_pos_bias == "shared":
            rel_bias = RelPosBias(
                (c.grid_size, c.grid_size), c.num_heads, name="rel_pos_bias"
            )()

        # needs the final block's probabilities even in fast mode
        needs_final_attn = return_final_attn or return_features.startswith(("ca", "attn"))

        use_scan = (c.scan_blocks and not capture_stats
                    and not needs_final_attn
                    and (return_block is None or return_block == c.depth - 1)
                    and c.rel_pos_bias != "per_block")
        if c.remat_blocks and not c.scan_blocks:
            raise ValueError("remat_blocks=True requires scan_blocks=True")
        if use_scan:
            # static_argnums=(3,): temperature reaches kernel dispatch as a
            # python float; rel_bias stays dynamic (None = empty pytree).
            body = (nn.remat(_BlockWrap, static_argnums=(3,),
                             prevent_cse=False,
                             policy=_remat_policy(c.remat_policy))
                    if c.remat_blocks else _BlockWrap)
            ScanBlocks = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=c.depth,
            )
            x, _ = ScanBlocks(c, name="blocks")(x, rel_bias, attn_temperature)
            return self._finish(x, B, N, ss, return_features, None, c,
                                return_final_attn=False, all_stats=[],
                                all_magn=[])

        if c.scan_blocks:
            raise ValueError(
                "scan_blocks=True supports only the fast path: attention "
                "capture, ca*/attn-* modes, early return_block and per-block "
                "rel-pos bias need scan_blocks=False (per-layer params)")

        last_block = (return_block if return_block is not None else c.depth - 1)
        all_stats, all_magn = [], []
        final_probs = None
        for i in range(c.depth):
            if i > last_block:
                break
            capture = capture_stats or (needs_final_attn and i == last_block)
            per_block_bias = rel_bias
            if c.rel_pos_bias == "per_block":
                per_block_bias = RelPosBias(
                    (c.grid_size, c.grid_size), c.num_heads, name=f"rel_pos_bias_{i}"
                )()
            x, stats = Block(c, layer_idx=i, name=f"blocks_{i}")(
                x, temperature=attn_temperature, rel_bias=per_block_bias,
                capture=capture,
            )
            if stats is not None:
                s, m, probs = stats
                final_probs = probs
                if capture_stats:
                    all_stats.append(s)
                    all_magn.append(m)

        return self._finish(x, B, N, ss, return_features, final_probs, c,
                            return_final_attn=return_final_attn,
                            all_stats=all_stats, all_magn=all_magn)

    def _finish(self, x, B, N, ss, return_features, final_probs, c, *,
                return_final_attn, all_stats, all_magn):
        D = c.embed_dim
        if c.final_norm == "ln":
            x = nn.LayerNorm(epsilon=c.norm_eps, dtype=c.dtype, name="norm")(x)

        if ss > 1:
            # un-fold subsets; shapes follow the reference's squeeze semantics
            # (models_vit.py:275-302): cls (B,ss,D); pos (B,ss,N/ss,D);
            # gap = mean over the SUBSET axis → (B, N/ss, D)
            n_pre = c.num_prefix_tokens
            xs = x.reshape(B, ss, n_pre + N // ss, D)
            x_cls = (xs[:, :, 0] if c.class_token
                     else jnp.zeros((B, ss, D), c.dtype))
            x_pos = xs[:, :, n_pre:]
            if return_features == "cls":
                return x_cls, None, None
            if return_features == "pos":
                return x_pos, None, None
            return x_pos.mean(axis=1), None, None  # "gap"

        n_prefix = c.num_prefix_tokens
        if c.class_token:
            x_cls = x[:, 0]
            x_pos = x[:, n_prefix:]
        elif c.cls_from_registers and c.reg_tokens:
            x_cls = x[:, :c.reg_tokens].mean(axis=1)  # CAPI global_repr
            x_pos = x[:, n_prefix:]
        else:
            x_cls = jnp.zeros((B, D), c.dtype)  # reference pads with zeros
            x_pos = x[:, n_prefix:]

        if c.proj_dim and return_features == "cls":
            # OpenCLIP: pooled = ln_post(cls) @ visual.proj — the projection
            # applies to the cls path only; patch tokens stay at width D
            # (models_more.py:55-60)
            proj = self.param("proj", nn.initializers.normal(D ** -0.5),
                              (D, c.proj_dim), jnp.float32)
            x_cls = x_cls @ proj.astype(x_cls.dtype)

        ret = self._select_features(
            return_features, x, x_cls, x_pos, final_probs, c
        )

        attentions = jnp.concatenate(all_stats, axis=2) if all_stats else None
        magnitudes = jnp.concatenate(all_magn, axis=2) if all_magn else None

        if return_final_attn:
            return ret, attentions, magnitudes, (final_probs, x)
        return ret, attentions, magnitudes

    @staticmethod
    def _select_features(mode, x, x_cls, x_pos, final_probs, c):
        """Token-level feature selection (models_vit.py:296-390)."""
        import math

        if mode == "cls":
            return x_cls
        if mode == "pos":
            return x_pos
        if mode == "gap":
            return x_pos.mean(axis=1)
        if mode == "raw":
            return x
        if mode == "both":
            return jnp.concatenate([x_cls[:, None], x_pos], axis=1)
        if mode.startswith("cp"):
            cp = int(mode[2:])
            B, T, D = x_pos.shape
            hw = int(math.isqrt(T))
            assert hw * hw == T
            ctr = hw // 2
            s, e = ctr - math.ceil(cp / 2), ctr + math.floor(cp / 2)
            fm = x_pos.reshape(B, hw, hw, D)[:, s:e, s:e]
            return fm.mean(axis=(1, 2))
        if mode.startswith("ca"):
            ca = int(mode[2:])
            B, T, D = x_pos.shape
            hw = int(math.isqrt(T))
            ctr = hw // 2
            s, e = ctr - math.ceil(ca / 2), ctr + math.floor(ca / 2)
            attn = final_probs.mean(axis=1)[:, 1:, 1:].reshape(B, hw, hw, hw * hw)
            attn_ss = attn[:, s:e, s:e].mean(axis=(1, 2))
            attn_ss = attn_ss / (attn_ss.sum(axis=1, keepdims=True) + 1e-6)
            return (x_pos * attn_ss[:, :, None].astype(x_pos.dtype)).mean(axis=1)
        if mode.startswith("attn"):
            kind = mode.split("attn-")[1]
            attn = final_probs  # (B,H,T,T)
            cls_pos = attn[:, :, 0, 1:]  # (B,H,N)
            if kind == "mn":
                m = cls_pos.mean(axis=1)[:, :, None]
                m = m / m.sum(axis=1, keepdims=True)
                return (m.astype(x_pos.dtype) * x_pos).sum(axis=1)
            if kind == "lcte":  # lowest class-token entropy head
                wo = cls_pos / (cls_pos.sum(axis=2, keepdims=True) + 1e-6)
                ent = -(wo * jnp.log(wo + 1e-6)).sum(axis=2)  # (B,H)
                idx = ent.argmin(axis=1)
                sel = jnp.take_along_axis(
                    cls_pos, idx[:, None, None], axis=1
                )[:, 0, :, None]
                sel = sel / sel.sum(axis=1, keepdims=True)
                return (sel.astype(x_pos.dtype) * x_pos).sum(axis=1)
            raise NotImplementedError(mode)
        raise NotImplementedError(mode)


def stack_block_params(params: dict, depth: int) -> dict:
    """Convert loop-layout backbone params (blocks_0..blocks_{d-1}) to the
    scan layout (params['blocks']['block'] with a leading depth axis)."""
    import numpy as np

    out = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    blocks = [params[f"blocks_{i}"] for i in range(depth)]
    out["blocks"] = {"block": jax.tree_util.tree_map(
        lambda *leaves: np.stack([np.asarray(l) for l in leaves]), *blocks)}
    return out


def unstack_block_params(params: dict, depth: int) -> dict:
    """Inverse of stack_block_params."""
    import numpy as np

    out = {k: v for k, v in params.items() if k != "blocks"}
    stacked = params["blocks"]["block"]
    for i in range(depth):
        out[f"blocks_{i}"] = jax.tree_util.tree_map(
            lambda leaf: np.asarray(leaf)[i], stacked)
    return out


# --- size constructors (models_vit.py:429-459) -------------------------------

def _mk(embed_dim, depth, num_heads, patch_size=16, **kw) -> ViTConfig:
    return ViTConfig(
        embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        patch_size=patch_size, **kw,
    )


def vit_tiny_patch16(**kw) -> ViTConfig:
    return _mk(192, 12, 3, **kw)


def vit_small_patch16(**kw) -> ViTConfig:
    return _mk(384, 12, 6, **kw)


def vit_base_patch16(**kw) -> ViTConfig:
    return _mk(768, 12, 12, **kw)


def vit_large_patch16(**kw) -> ViTConfig:
    return _mk(1024, 24, 16, **kw)


def vit_huge_patch14(class_token: bool = True, **kw) -> ViTConfig:
    return _mk(1280, 32, 16, patch_size=14, class_token=class_token, **kw)


def simmim_vit_base_patch16(**kw) -> ViTConfig:
    """SimMIM pretrained ViT-B: no abs pos-embed, shared rel-pos bias,
    LayerScale 0.1 (models_simmim.py:430-468)."""
    return _mk(
        768, 12, 12, qkv_bias_mode="qv_only", use_abs_pos_emb=False,
        rel_pos_bias="shared", init_values=0.1, **kw,
    )


VIT_CONFIGS = {
    "vit_tiny_patch16": vit_tiny_patch16,
    "vit_small_patch16": vit_small_patch16,
    "vit_base_patch16": vit_base_patch16,
    "vit_large_patch16": vit_large_patch16,
    "vit_huge_patch14": vit_huge_patch14,
}
