"""Dropout variants used by the recurrent stacks.

``locked_dropout`` — variational dropout: one Bernoulli mask per (batch, 1,
feature) broadcast across time (reference: src/modules.py:51-64). ``dropout``
— standard elementwise dropout, matching the decoder cells' ``nn.Dropout``
(reference: src/modules.py:337).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def locked_dropout(rng: jax.Array, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Variational dropout over (B, T, D): mask shared across the time axis."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, shape=(x.shape[0], 1, x.shape[-1]))
    return x * mask.astype(x.dtype) / keep


def dropout(rng: jax.Array, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Standard elementwise dropout."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, shape=x.shape)
    return x * mask.astype(x.dtype) / keep
