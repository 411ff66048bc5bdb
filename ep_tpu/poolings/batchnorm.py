"""BatchNorm with torch-exact running-statistics semantics.

flax's ``nn.BatchNorm`` folds the BIASED batch variance into the running
average; ``torch.nn.BatchNorm1d/2d`` (the reference's BN everywhere —
``main_linprobe.py:426`` descriptor BN, aim's in-pool BN, cbam/dolg) uses
the Bessel-corrected (unbiased, x n/(n-1)) batch variance for the running
update while still NORMALIZING with the biased one during training. The
difference is a systematic (n/(n-1)) factor on eval-time running_var —
6.7% of var at batch 16, enough to flip near-tied predictions in the
whole-loop parity suite (tests/test_engine_parity.py) and in any short
fine-tune where running stats haven't converged.

This module mirrors the flax API subset we use (feature axis -1, f32
stats, optional affine) but updates running stats exactly like torch.
``batch_stats`` keys stay ``mean``/``var`` so checkpoints and converters
are unaffected. Stats are computed with plain jnp reductions in f32 —
under GSPMD with a batch-sharded input these lower to global-batch
(SyncBN-style) statistics, in which case n is the GLOBAL element count,
matching torch SyncBN's convention.
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchBatchNorm(nn.Module):
    """Feature-axis(-1) BatchNorm; running update matches torch exactly."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat_shape = (x.shape[-1],)
        reduce_axes = tuple(range(x.ndim - 1))
        n = 1
        for ax in reduce_axes:
            n *= x.shape[ax]

        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                feat_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               feat_shape)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            # normalization uses the biased variance (torch does too).
            # Two-pass form: E[x^2]-E[x]^2 cancels catastrophically for
            # large-mean/small-var features and can go negative -> NaN.
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            if not self.is_initializing():
                m = self.momentum
                # torch folds the UNBIASED batch var into the running stat
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (bessel * var)

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, feat_shape,
                               jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, feat_shape,
                               jnp.float32)
        return y.astype(self.dtype or x.dtype)
