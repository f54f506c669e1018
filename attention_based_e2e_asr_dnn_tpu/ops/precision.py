"""Matmul precision policy.

JAX's default matmul precision performs reduced-precision (bf16-grade)
accumulation for float32 inputs on TPU-class backends (measured ~1e-1 abs
error on a 64x64 normal matmul on this stack). The framework's policy:

  * float32 activations -> ``Precision.HIGHEST`` (exact fp32 accumulate):
    used by tests, CPU runs, and any fp32 fine-tuning;
  * bfloat16 activations -> default precision: bf16 is already the MXU-native
    fast path, so no override is needed. The production train step casts
    activations to bf16 (``compute_dtype`` in the train config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul_precision(dtype) -> jax.lax.Precision | None:
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return None
