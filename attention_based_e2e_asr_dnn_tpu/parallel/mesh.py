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


def make_mesh_2d(
    data: Optional[int] = None,
    model: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """2-D ``(data, model)`` mesh: batch sharding on 'data', tensor (model)
    parallelism of the LSTM gate matrices on 'model'.

    ``data=None`` uses all devices divided by ``model``. Lay the model axis
    innermost so its collectives ride the fastest ICI links.
    """
    devices = jax.devices()
    if model < 1:
        raise ValueError(f"model parallelism must be >= 1, got {model}")
    if data is None:
        if len(devices) % model != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by model={model}"
            )
        data = len(devices) // model
    need = data * model
    if need > len(devices):
        raise ValueError(
            f"requested data={data} x model={model} = {need} devices but only "
            f"{len(devices)} present"
        )
    grid = np.array(devices[:need]).reshape(data, model)
    return Mesh(grid, axis_names)


def make_mesh_3d(
    data: Optional[int] = None,
    seq: int = 1,
    model: int = 1,
    axis_names: Tuple[str, str, str] = ("data", "seq", "model"),
) -> Mesh:
    """3-D ``(data, seq, model)`` mesh: batch sharding on 'data',
    sequence-parallel attention on 'seq', tensor parallelism on 'model'.

    ``data=None`` uses all devices divided by ``seq*model``. The model axis
    is laid innermost (fastest ICI links for its per-step collectives),
    seq next, data outermost.
    """
    devices = jax.devices()
    if seq < 1 or model < 1:
        raise ValueError(f"seq/model degrees must be >= 1, got {seq}/{model}")
    inner = seq * model
    if data is None:
        if len(devices) % inner != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by seq*model={inner}")
        data = len(devices) // inner
    need = data * inner
    if need > len(devices):
        raise ValueError(
            f"requested data={data} x seq={seq} x model={model} = {need} "
            f"devices but only {len(devices)} present")
    grid = np.array(devices[:need]).reshape(data, seq, model)
    return Mesh(grid, axis_names)


def model_parallel_placement(mesh: Mesh, model_axis: str = "model"):
    """Returns place(path, leaf) for tensor parallelism over ``model_axis``:

      * LSTM gate matrices (w_ih / w_hh) column-parallel (output dim = 4*hid
        split across the axis);
      * attention projections (key_map / value_map / query_map weights)
        column-parallel on the projection dim;
      * the 3-way-shared character embedding column-parallel on the
        embedding dim (it is also the tied classifier weight, so the cls
        matmul contracts over the sharded dim — XLA inserts the psum);

    everything else (biases, learned initial states) replicated. XLA derives
    every collective from these annotations inside the jitted step. Works on
    params AND optimizer-state pytrees (adam moments mirror the param tree's
    key names)."""
    model_par = mesh.shape[model_axis]
    replicated = NamedSharding(mesh, P())
    col_sharded = NamedSharding(mesh, P(None, model_axis))
    _ATT_MAPS = ("'key_map'", "'value_map'", "'query_map'")

    def place(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        keys = jax.tree_util.keystr(path)
        if leaf.ndim == 2 and leaf.shape[1] % model_par == 0:
            if "'w_ih'" in keys or "'w_hh'" in keys:
                return jax.device_put(leaf, col_sharded)
            if any(m in keys for m in _ATT_MAPS) and "'w'" in keys:
                return jax.device_put(leaf, col_sharded)
            if "'char_emb'" in keys:
                return jax.device_put(leaf, col_sharded)
        return jax.device_put(leaf, replicated)

    return place


def shard_train_state(state, mesh: Mesh, model_axis: str = "model"):
    """Place a TrainState on a 2-D mesh: gate matrices (and their optimizer
    moments) column-parallel on ``model_axis``, the rest replicated."""
    place = model_parallel_placement(mesh, model_axis)
    return jax.tree_util.tree_map_with_path(place, state)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_fn(mesh: Mesh, axis_name: str = "data"):
    """Returns f(tuple_of_host_arrays) -> tuple of device arrays sharded on
    axis 0. Batch size must be divisible by the mesh size."""
    sharding = batch_sharding(mesh, axis_name)
    data_par = mesh.shape[axis_name]

    def shard(batch: Sequence[np.ndarray]) -> Tuple[jax.Array, ...]:
        out = []
        for arr in batch:
            if arr.shape[0] % data_par != 0:
                raise ValueError(
                    f"batch dim {arr.shape[0]} not divisible by data-parallel "
                    f"degree {data_par}"
                )
            out.append(jax.device_put(arr, sharding))
        return tuple(out)

    return shard


def replicate_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), params)
