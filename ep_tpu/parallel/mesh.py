"""Device mesh setup and sharding helpers.

Replaces the reference's NCCL/torch.distributed runtime
(/root/reference/util/misc.py:214-257): instead of explicit process groups,
we build a ``jax.sharding.Mesh`` over all addressable devices and let XLA
insert ICI/DCN collectives from sharding annotations.

Axes:
  * ``data``  — batch (data-parallel) axis. The only parallelism the
    reference has (DDP, main_linprobe.py:618-620) maps here.
  * ``model`` — optional tensor-parallel axis for very large backbones;
    size 1 by default.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(cfg=None) -> None:
    """Multi-host init. A no-op on a single host.

    Counterpart of the reference's torchrun/OMPI/SLURM env-var dispatch +
    NCCL rendezvous (util/misc.py:214-257): jax.distributed.initialize reads
    the same style of launcher env vars (SLURM, GKE/JobSet, Cloud TPU
    metadata) and brings up the cross-host runtime. Triggered when a known
    launcher is detected or EP_TPU_MULTIHOST=1 forces it.
    """
    # Explicit opt-out / opt-in first. Only EP_TPU_MULTIHOST gets the
    # "0/empty means disabled" reading — rank env vars are legitimately "0"
    # on process 0 (SLURM_PROCID=0, OMPI_COMM_WORLD_RANK=0) and must still
    # trigger init, or rank 0 skips the rendezvous while ranks >=1 block on
    # the coordinator.
    force = os.environ.get("EP_TPU_MULTIHOST")
    if force is not None and force in ("0", ""):
        return
    if force is None:
        launcher_envs = ("COORDINATOR_ADDRESS", "SLURM_PROCID",
                         "OMPI_COMM_WORLD_RANK", "JOBSET_NAME")
        trigger = next((v for v in launcher_envs if v in os.environ), None)
        if trigger is None:
            return
        # A launcher var alone isn't enough: single-task SLURM allocations
        # also export SLURM_PROCID. Require world size > 1 when it's known.
        world_envs = ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "WORLD_SIZE")
        world = next((os.environ[v] for v in world_envs if os.environ.get(v)),
                     None)
        if world is not None:
            try:
                if int(world) <= 1:
                    return
            except ValueError:
                pass
    else:
        trigger = "EP_TPU_MULTIHOST"
    print(f"| distributed init (trigger {trigger})")
    try:
        jax.distributed.initialize()
    except RuntimeError as err:  # already initialized (test harness)
        print(f"| distributed init skipped: {err}")
        return
    print(f"| distributed ready: process {jax.process_index()} / "
          f"{jax.process_count()}")


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Pure constructor — it does NOT touch the current-mesh registry that
    gates kernel dispatch. A driver that wants attn_impl=auto / the
    shard_map kernel bridge to see its mesh must opt in explicitly with
    ``set_current_mesh(mesh)`` (or the ``use_mesh`` context manager), so a
    mesh built for an unrelated purpose can never silently change how a
    later-traced model dispatches.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


# --- current-mesh registry + shard_map bridge for opaque kernels ---------
#
# pallas_call lowers to an opaque custom call: the GSPMD partitioner has no
# partitioning rule for it, so inside a jit whose batch is sharded over the
# ``data`` axis it would all-gather the operands onto every device and run
# the full-size kernel redundantly on each. Every kernel in ep_tpu/ops is
# embarrassingly parallel over the batch (grid dim 0 indexes images), so
# the multi-device story is jax.shard_map over ``data``: each device runs
# the kernel on its local shard, weights stay replicated, no collectives
# are inserted (validated on an 8-device virtual mesh in
# tests/test_pallas_gspmd.py). Counterpart guarantee in the reference: DDP
# replicas each run their CUDA kernels on the local batch
# (main_linprobe.py:618-620).

_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


class use_mesh:
    """Context manager pinning the current mesh (tests)."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        self.prev = current_mesh()
        set_current_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_current_mesh(self.prev)


def data_parallel_call(fn, args, batched, mesh: Optional[Mesh] = None):
    """Run ``fn(*args)`` sharded over the mesh's data axis.

    ``batched`` is one bool per positional arg: True = arg carries the
    batch on dim 0 and is split over ``data``; False = replicated. With no
    mesh, a 1-sized data axis, or an active tensor-parallel axis (weights
    would not be replicated) the call runs unwrapped and GSPMD handles it.
    """
    mesh = mesh if mesh is not None else _CURRENT_MESH
    if (mesh is None or mesh.shape[DATA_AXIS] <= 1
            or mesh.shape[MODEL_AXIS] > 1):
        return fn(*args)
    n_data = mesh.shape[DATA_AXIS]
    for a, b in zip(args, batched):
        if b and hasattr(a, "shape") and a.shape and a.shape[0] % n_data:
            raise ValueError(
                f"data_parallel_call: batch dim {a.shape[0]} is not "
                f"divisible by the registered mesh's data axis ({n_data}). "
                f"The current-mesh registry ({mesh}) likely holds a stale "
                f"mesh — set_current_mesh(...) the mesh this computation "
                f"actually runs on (or None).")
    in_specs = tuple(P(DATA_AXIS) if b else P() for b in batched)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P(DATA_AXIS), check_vma=False)(*args)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()


def shard_batch(batch, mesh: Mesh):
    """Place a host-local batch onto the mesh, sharded over the data axis.

    With one process this is a straight device_put; with multiple processes
    each host contributes its local shard (jax.make_array_from_process_local_data).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
