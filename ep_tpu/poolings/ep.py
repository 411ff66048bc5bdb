"""EP — Efficient Probing (the paper's method).

Exact semantics of reference poolings/ep.py:7-46 (parity traps included):
  * learned query bank (1, Q, D), init randn*0.02;
  * keys are the RAW tokens — no key projection;
  * a single value projection D -> D/d_out (no bias);
  * single-head attention (Q, N) with scale D^-0.5;
  * the value tensor is reshaped so query i attends over the i-th
    D/(d_out·Q)-sized slice of the projected values — the output is the
    CONCATENATION of per-query slices, size D/d_out (NOT a mean; the
    reference code wins over its README description);
  * no output projection.

The compute is expressed as two einsums that XLA maps straight onto the MXU;
a fused Pallas kernel for the (QKᵀ → softmax → slice-matmul) pipeline lives
in ep_tpu/ops/pool_attn_pallas.py and is used when shapes allow.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import dense, normal, torch_linear_init

_fused_fallthrough_warned = False


def _warn_fused_fallthrough(reason: str) -> None:
    """EP_TPU_EP_FUSED is opt-in; if it is set but the gate can't take the
    fused path, say so once instead of silently running the XLA
    composition (ADVICE r3)."""
    global _fused_fallthrough_warned
    if not _fused_fallthrough_warned:
        _fused_fallthrough_warned = True
        print(f"[ep_tpu] EP_TPU_EP_FUSED is set but the fused EP kernel is "
              f"not taken ({reason}); running the XLA path.")


class _VKernel(nn.Module):
    """Declare the v projection's param tree (same name/init as the
    nn.Dense it stands in for) without running the matmul — the fused
    Pallas path computes x@W in-kernel (ops/pool_attn_pallas.py)."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_linear_init,
                          (self.in_dim, self.features), jnp.float32)


class EfficientProbing(nn.Module):
    dim: int
    num_heads: int = 1
    qkv_bias: bool = False
    num_queries: int = 32
    d_out: int = 1
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        B, N, C = x.shape
        Q = self.num_queries
        c_prime = C // self.d_out
        cq = C // (self.d_out * Q)
        assert cq * self.d_out * Q == C, (
            f"dim={C} must be divisible by d_out*num_queries={self.d_out * Q}"
        )
        scale = (C // self.num_heads) ** -0.5

        queries = self.param(
            "cls_token", normal(0.02), (1, Q, C), jnp.float32
        ).astype(self.dtype)

        from ep_tpu.ops import kernel_mode
        k_ok, k_interp = kernel_mode()
        use_kernel = (self.use_pallas and not return_attn
                      and not self.is_initializing() and k_ok)
        import os
        fused_requested = bool(os.environ.get("EP_TPU_EP_FUSED"))
        if fused_requested and not self.is_initializing() \
                and not (use_kernel and not self.qkv_bias):
            _warn_fused_fallthrough(
                "return_attn requested" if return_attn
                else "qkv_bias=True" if self.qkv_bias
                else "use_pallas=False" if not self.use_pallas
                else "kernel mode disabled on this backend")
        if use_kernel and not self.qkv_bias and fused_requested:
            # OPT-IN fused path (EP_TPU_EP_FUSED=1): the v projection runs
            # IN-kernel, neither v nor the probs ever hit HBM. MEASURED
            # SLOWER than the XLA composition at probe shapes (6.44 vs
            # 5.14 ms cached head step, bs512/ViT-B — the custom-VJP
            # backward recomputes the 119 GF projection that XLA's
            # residual-saving path reuses; PERFORMANCE.md). Kept for
            # long-N descriptors where the (B,Q,N) probs round-trip
            # dominates. _VKernel declares the identical "v"/"kernel"
            # param the dense branch below creates at init; tokens are
            # cast to the compute dtype (f32 tokens would double the
            # kernel's VMEM and run the MXU at the f32 rate).
            from ep_tpu.ops.pool_attn_pallas import ep_pool_proj_attend
            from ep_tpu.parallel.mesh import data_parallel_call
            w = _VKernel(c_prime, C, name="v")()
            out = data_parallel_call(
                lambda q_, x_, w_: ep_pool_proj_attend(q_, x_, w_, k_interp),
                (queries[0] * scale, x.astype(self.dtype), w),
                (False, True, False))
            return out.reshape(B, c_prime)

        v = dense(c_prime, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x)
        if use_kernel:
            from ep_tpu.ops.pool_attn_pallas import ep_pool_attend
            from ep_tpu.parallel.mesh import data_parallel_call
            out = data_parallel_call(
                lambda q_, x_, v_: ep_pool_attend(q_, x_, v_, k_interp),
                (queries[0] * scale, x.astype(self.dtype),
                 v.reshape(B, N, Q, cq)),
                (False, True, True))
            return out.reshape(B, c_prime)

        # attn[b,q,n] = softmax_n(scale * queries[q] · x[b,n])
        logits = jnp.einsum(
            "qc,bnc->bqn", queries[0] * scale, x,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(logits, axis=-1)
        # query q contracts against its own value slice of v — expressed
        # as one MXU-shaped (B,Q,N)@(B,N,C') matmul + block-diagonal
        # mask-reduce; the direct per-slice einsum lowers to B*Q
        # single-row matvecs (2.3 ms/step of forward waste at bs512 —
        # ops/pool_attn_pallas.py::ep_pool_attend_xla). Identical values:
        # each output element is one element of the full product.
        from ep_tpu.ops.pool_attn_pallas import block_mask
        full = jnp.einsum(
            "bqn,bnm->bqm", attn.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = ((full * block_mask(Q, cq)).sum(axis=1)
               .reshape(B, c_prime).astype(self.dtype))
        if return_attn:
            return out, attn
        return out
