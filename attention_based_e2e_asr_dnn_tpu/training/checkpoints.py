"""Checkpointing: save / load / average train-state pytrees.

Policy parity with the reference (src/train.py:321-391):
  * best-of-{dev loss, dev LD, dev ppl} composite tags
    (``min-loss-ld-ppl-epoch[N].ckpt``), rolling eviction beyond
    ``max_savings``;
  * milestone saves every 10 epochs (Rewriter training data generation);
  * payload: epoch/batch counters, metrics, params, optimizer state, full
    metric histories; resume restores all of it with optional LR reinit;
  * inference-time uniform weight averaging over all checkpoints
    (src/infer.py:158-172) via ``average_checkpoints``.

Format: host numpy pytrees pickled to a single file (the analogue of the
reference's torch.save payload dict).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), tree)


def save_checkpoint(path: str, payload: dict) -> str:
    """Save a checkpoint payload (params/opt_state pytrees + metadata)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = dict(payload)
    for key in ("params", "opt_state"):
        if key in host and host[key] is not None:
            host[key] = _to_host(host[key])
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(host, fh, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as fh:
        return pickle.load(fh)


def average_checkpoints(paths: List[str]) -> dict:
    """Uniform parameter average over checkpoints (src/infer.py:158-172)."""
    if not paths:
        raise ValueError("no checkpoints to average")
    acc = None
    for p in paths:
        params = load_checkpoint(p)["params"]
        if acc is None:
            acc = jax.tree.map(lambda a: np.asarray(a, np.float64) / len(paths), params)
        else:
            acc = jax.tree.map(
                lambda a, b: a + np.asarray(b, np.float64) / len(paths), acc, params
            )
    return {"params": jax.tree.map(lambda a: np.asarray(a, np.float32), acc)}


class CheckpointManager:
    """Best/milestone checkpoint policy (reference: src/train.py:321-368)."""

    def __init__(self, ckpt_dir: str, milestone_dir: Optional[str] = None,
                 max_savings: int = 3):
        self.ckpt_dir = ckpt_dir
        self.milestone_dir = milestone_dir
        self.max_savings = max_savings
        self.saved_files: List[str] = []  # exact basenames, eviction order
        self.min_loss = float("inf")
        self.min_ld = float("inf")
        self.min_ppl = float("inf")
        os.makedirs(ckpt_dir, exist_ok=True)
        if milestone_dir:
            os.makedirs(milestone_dir, exist_ok=True)

    def reset_best(self) -> None:
        self.min_loss = self.min_ld = self.min_ppl = float("inf")
        self.saved_files = []

    def maybe_save(self, epoch: int, dev_loss: float, dev_ld: float,
                   dev_ppl: float, payload: dict) -> Optional[str]:
        """Save on any new best (composite tag) and on 10-epoch milestones."""
        tag = "min"
        if dev_loss <= self.min_loss:
            self.min_loss = dev_loss
            tag += "-loss"
        if dev_ld < self.min_ld:
            self.min_ld = dev_ld
            tag += "-ld"
        if dev_ppl <= self.min_ppl:
            self.min_ppl = dev_ppl
            tag += "-ppl"
        is_best = len(tag) > 3
        is_milestone = epoch > 0 and (epoch + 1) % 10 == 0

        saved = None
        if is_best:
            if len(self.saved_files) >= self.max_savings:
                # exact-basename eviction: an endswith match would also hit
                # emergency-epoch[N].ckpt crash saves
                evict = self.saved_files.pop(0)
                evict_path = os.path.join(self.ckpt_dir, evict)
                if os.path.exists(evict_path):
                    os.remove(evict_path)
            name = f"{tag}-epoch[{epoch}].ckpt"
            saved = os.path.join(self.ckpt_dir, name)
            save_checkpoint(saved, payload)
            self.saved_files.append(name)
        if is_milestone and self.milestone_dir:
            save_checkpoint(
                os.path.join(self.milestone_dir, f"epoch[{epoch}].ckpt"), payload
            )
        return saved

    def list_checkpoints(self) -> List[str]:
        return sorted(
            os.path.join(self.ckpt_dir, f)
            for f in os.listdir(self.ckpt_dir)
            if f.endswith(".ckpt")
        )
