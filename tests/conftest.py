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


@pytest.fixture(autouse=True)
def _mesh_registry_isolation():
    """Snapshot/restore the current-mesh kernel-dispatch registry.

    The CLIs call set_current_mesh() as process-scoped drivers and never
    reset; tests that drive them in-process (test_cli_aux,
    test_ep_advantage) would otherwise leak an 8-device mesh into every
    later test's trace (caught by data_parallel_call's divisibility
    guard in test_int8_depth_growth, batch 2 vs data=8)."""
    from ep_tpu.parallel.mesh import current_mesh, set_current_mesh
    prev = current_mesh()
    yield
    set_current_mesh(prev)


@pytest.fixture(scope="session")
def mesh8():
    from ep_tpu.parallel.mesh import make_mesh
    return make_mesh()


@pytest.fixture(scope="session")
def rng():
    return jax.random.key(0)
