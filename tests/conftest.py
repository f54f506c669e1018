"""Test harness config: force CPU with 8 virtual devices BEFORE jax import.

Multi-device (data-parallel) logic is testable without TPUs via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4 implication).

NOTE: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) via a
sitecustomize, so the override must be FORCED (not setdefault) and backed by
jax.config for robustness.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
