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

# Best-effort native-tier build so the stock suite runs with zero skips: the
# 3 native tests guard on libasrtpu.so which takes ~2s to compile. Failures
# (no g++, read-only tree) are swallowed — the pure-Python fallbacks keep the
# suite green either way.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "attention_based_e2e_asr_dnn_tpu", "_native",
                   "libasrtpu.so")
if not os.path.exists(_SO):
    import subprocess

    try:
        subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                       timeout=120, capture_output=True, check=False)
    except Exception:
        pass
