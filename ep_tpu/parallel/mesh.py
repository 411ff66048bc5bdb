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
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


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
