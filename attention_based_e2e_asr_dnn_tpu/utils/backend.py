"""Bounded device-backend availability probe.

The axon TPU tunnel, when down, makes ``jax.devices()`` hang for many
minutes before erroring (observed 2026-08-17: backend init UNAVAILABLE for
hours) — and the hang is uninterruptible C code, so an in-process timeout
cannot break it. Probing in a SUBPROCESS can be killed; measurement tools
call this first so they fail fast with a diagnostic instead of blowing
through their caller's time budget.
"""

from __future__ import annotations

import subprocess
import sys


def probe_backend(timeout_s: int = 240) -> bool:
    """True when ``jax.devices()`` succeeds within ``timeout_s`` in a
    fresh subprocess (same interpreter, same sitecustomize pinning)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
