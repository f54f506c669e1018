"""Multi-host (DCN) data loading helpers.

On a multi-host slice each process sees only its local devices; batches are
assembled per-process and stitched into one global array with
``jax.make_array_from_process_local_data`` (SURVEY.md §5.8). Single-process
setups degrade to a plain device_put, so the same trainer code runs anywhere.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_slice(n_examples: int) -> slice:
    """The half-open [start, stop) range of the global batch this process
    owns (contiguous block partitioning by process index)."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = n_examples // n_proc
    if n_examples % n_proc:
        raise ValueError(
            f"global batch {n_examples} not divisible by process count {n_proc}"
        )
    return slice(idx * per, (idx + 1) * per)


def global_batch_from_local(mesh: Mesh, local: np.ndarray,
                            axis_name: str = "data") -> jax.Array:
    """Assemble a globally-sharded array from this process's local shard.

    ``local`` is the slice of the global batch this process loaded (see
    ``process_slice``). With one process this is just a sharded device_put.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def shard_batch_multihost(mesh: Mesh, batch: Sequence[np.ndarray],
                          axis_name: str = "data"):
    """Tuple-of-arrays variant of global_batch_from_local."""
    return tuple(global_batch_from_local(mesh, a, axis_name) for a in batch)
