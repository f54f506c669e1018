"""Seeded RNG threading helpers for the functional train/eval steps."""

from __future__ import annotations

import jax


def make_rng(seed: int) -> jax.Array:
    return jax.random.key(seed)


def split(rng: jax.Array, n: int = 2):
    return jax.random.split(rng, n)
