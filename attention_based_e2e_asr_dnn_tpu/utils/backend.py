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


def probe_backend(timeout_s: float = 240, code: str | None = None) -> bool:
    """True when ``code`` (default: init the default backend) succeeds
    within ``timeout_s`` in a fresh subprocess.

    The subprocess inherits the sitecustomize platform pin — and that pin
    ignores ``JAX_PLATFORMS`` env overrides, so the default probe always
    targets the REAL configured backend; forcing another platform requires
    ``jax.config.update`` inside ``code``.

    Default-probe short-circuit: when THIS process has already forced the
    CPU platform (tests / CPU fallback drives do
    ``jax.config.update("jax_platforms", "cpu")``), the in-process backend
    cannot be the dead tunnel — return True without paying the subprocess
    (which would still hit the pin). An explicit ``code`` always runs.
    """
    if code is None:
        import jax

        if str(getattr(jax.config, "jax_platforms", "") or "") == "cpu":
            return True
        code = "import jax; jax.devices()"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
