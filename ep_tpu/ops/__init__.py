"""Pallas TPU kernels for the hot ops (attention, EP pooling).

`kernel_mode()` is the single gate the model code consults before taking a
kernel path: real Mosaic kernels on TPU backends; interpret-mode kernels
anywhere when EP_TPU_PALLAS_INTERPRET=1 (CI and virtual-mesh validation of
the multi-device shard_map plumbing); otherwise the XLA compositions.
"""
from __future__ import annotations

import os

import jax


def kernel_mode() -> tuple[bool, bool]:
    """(kernels_enabled, interpret) for the current backend.

    EP_TPU_PALLAS_INTERPRET=1 forces interpret-mode kernels on every
    backend — including TPU, where it is the only way to debug a kernel
    without a Mosaic compile. Note the env var is consulted at TRACE time:
    flipping it after a step is jitted has no effect until a retrace.
    """
    if os.environ.get("EP_TPU_PALLAS_INTERPRET"):
        return True, True
    if jax.default_backend() == "tpu":
        return True, False
    return False, False
