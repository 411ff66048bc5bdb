"""Shape/finiteness tests for the CNN-era extras (poolings/extras.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ep_tpu.poolings.extras import (GeMPool, GeneralizedMaxPool, LSEPool,
                                    SlotPooling)

B, N, D = 3, 16, 32


@pytest.mark.parametrize("cls,kw", [
    (LSEPool, {}),
    (GeMPool, {}),
    (GeneralizedMaxPool, {}),
    (SlotPooling, dict(dim=D, num_slots=2, dtype=jnp.float32)),
])
def test_extras_shapes(rng, cls, kw):
    mod = cls(**kw)
    x = jnp.abs(jax.random.normal(rng, (B, N, D))) + 0.1
    vs = mod.init(rng, x)
    out = mod.apply(vs, x)
    assert out.shape == (B, D)
    assert bool(jnp.isfinite(out).all())


def test_gem_reduces_to_mean_at_p1(rng):
    x = jnp.abs(jax.random.normal(rng, (B, N, D))) + 0.1
    mod = GeMPool(p_init=1.0)
    vs = mod.init(rng, x)
    out = mod.apply(vs, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x.mean(axis=1)),
                               rtol=1e-5)


def test_lse_between_mean_and_max(rng):
    x = jax.random.normal(rng, (B, N, D))
    mod = LSEPool(r_init=10.0)
    vs = mod.init(rng, x)
    out = np.asarray(mod.apply(vs, x))
    lo = np.asarray(x.mean(axis=1))
    hi = np.asarray(x.max(axis=1))
    assert (out >= lo - 1e-4).all() and (out <= hi + 1e-4).all()
