"""Length-mask utilities.

XLA requires static shapes, so everywhere the reference used cuDNN packed
sequences (reference: src/modules.py:78-82,187-191) this framework carries
per-example lengths and masks instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.bool_) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) mask, True where t < length."""
    t = jnp.arange(max_len, dtype=jnp.int32)
    return (t[None, :] < lengths[:, None]).astype(dtype)


def pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) mask, True where PADDED (t >= length).

    Parity with the reference attention pad mask (reference: src/models.py:106-115).
    """
    t = jnp.arange(max_len, dtype=jnp.int32)
    return t[None, :] >= lengths[:, None]
