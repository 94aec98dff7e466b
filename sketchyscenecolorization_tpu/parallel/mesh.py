"""Device mesh and sharding helpers.

The reference scales with in-graph multi-tower replication and host-side
gradient averaging (``obj_lib/graph_single.py:33-68,107-218``; inputs split
per GPU at ``obj_lib/input_pipeline.py:184-196``).  The TPU-native design
replaces all of that with a ``jax.sharding.Mesh`` over ICI:

- axis ``data``: batch-parallel.  Batches carry ``P('data', ...)`` shardings,
  parameters are replicated, and XLA inserts the grad ``psum`` automatically
  when a jitted train step consumes sharded batches and produces replicated
  parameter updates — no hand-written all-reduce.
- axis ``model``: reserved for sharding the mLSTM pixel-batch dimension and
  the widest DeepLab convs (none of the three models *need* it for parity —
  see SURVEY.md §2.5 — but the axis is plumbed through so it can be turned on
  by config).

All collectives ride ICI; a future multi-slice DCN axis would be prepended
here without touching the train steps.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: Optional[int] = None, model: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh.  ``data=None`` uses all devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over 'data'; remaining dims replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree with its batch dim over 'data'."""
    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, max(x.ndim, 1)))
    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a parameter pytree onto every mesh device."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape["data"]
    if global_batch % n_data != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n_data}")
    return global_batch // n_data
