"""Test env: 8 virtual CPU devices so mesh/sharding paths are exercised
without a TPU (the standard JAX trick; SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

# the axon sitecustomize pins jax_platforms to the TPU plugin; tests run on
# a virtual 8-device CPU mesh regardless
jax.config.update("jax_platforms", "cpu")

# XLA's default matmul precision emulates bf16 even for f32 inputs; numeric
# parity tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def mesh8():
    from ep_tpu.parallel.mesh import make_mesh
    return make_mesh()


@pytest.fixture(scope="session")
def rng():
    return jax.random.key(0)
