"""Cross-replica metric reduction.

The reference synchronizes host-side meters with explicit
barrier+all_reduce calls (util/misc.py:40-51, engine_finetune.py:150-156).
Under GSPMD that machinery disappears: the batch is sharded over the ``data``
mesh axis inside one jit, so a plain jnp.mean/sum over the batch IS the
global metric — XLA inserts the ICI all-reduce. The helpers here cover the
two remaining cases:

  * psum/pmean for code running under shard_map/pmap with named axes;
  * host-side aggregation of per-process values in multi-host loops that
    compute anything OUTSIDE jit (rare; kNN feature gathering).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def psum(x, axis_name: str = "data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)


def all_reduce_mean_host(x: float) -> float:
    """Mean of a host scalar across processes (util/misc.py:363-371).
    Routed through a tiny jitted psum over one device per process."""
    if jax.process_count() == 1:
        return float(x)
    arr = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(
            jax.sharding.Mesh(np.asarray(jax.devices()), ("d",)),
            jax.sharding.PartitionSpec("d")),
        np.full((jax.local_device_count(),), x, np.float32))
    total = jax.jit(lambda a: a.mean())(arr)
    return float(total)


def weighted_merge(stats_list: Dict[str, float]) -> Dict[str, float]:
    """Merge {metric: (sum, count)} dicts into global averages."""
    out = {}
    for k, (s, c) in stats_list.items():
        out[k] = s / max(c, 1)
    return out
