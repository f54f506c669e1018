"""Device mesh + sharding helpers — the framework's scale-out layer.

The reference has NO distributed support of any kind (single device picked at
src/train.py:480-484; SURVEY.md §2.9): this capability is additive. Design per
SURVEY.md §5.8 / §7 step 8:

  * a 1-D ``data`` mesh over all local devices (ICI on a real slice);
  * batches sharded on axis 0 with ``NamedSharding(mesh, P('data', ...))``;
  * parameters and optimizer state replicated;
  * the SAME jitted train step works: XLA inserts the gradient all-reduce
    over ICI automatically from the sharding annotations (pjit semantics).

Multi-host (DCN) extension point: per-process shards via
``jax.make_array_from_process_local_data`` — the helpers accept
pre-split host arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_fn(mesh: Mesh, axis_name: str = "data"):
    """Returns f(tuple_of_host_arrays) -> tuple of device arrays sharded on
    axis 0. Batch size must be divisible by the mesh size."""
    sharding = batch_sharding(mesh, axis_name)

    def shard(batch: Sequence[np.ndarray]) -> Tuple[jax.Array, ...]:
        out = []
        for arr in batch:
            if arr.shape[0] % mesh.size != 0:
                raise ValueError(
                    f"batch dim {arr.shape[0]} not divisible by mesh size {mesh.size}"
                )
            out.append(jax.device_put(arr, sharding))
        return tuple(out)

    return shard


def replicate_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), params)
