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

Format: DATA-ONLY — one ``.ckpt`` file that is an npz archive of the flat
array leaves plus a JSON metadata/structure record. Unlike the reference's
``torch.save`` (and a bare pickle), loading a checkpoint can never execute
code from the file. Legacy pickle checkpoints from earlier builds still load
behind a loud trust warning.

The optimizer state's pytree STRUCTURE (optax NamedTuple nesting) is not
serialized — only its leaves are; ``Trainer.load`` rebuilds it against the
live optimizer's ``tree_structure``, which also makes the format stable
across optax versions.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import List, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), tree)


def _encode_tree(tree, leaves: list):
    """Plain-container pytree -> JSON skeleton with '@i' leaf placeholders."""
    if isinstance(tree, dict):
        return {k: _encode_tree(v, leaves) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_encode_tree(v, leaves) for v in tree]
    leaves.append(np.asarray(jax.device_get(tree)))
    return f"@{len(leaves) - 1}"


def _decode_tree(skel, leaves: dict):
    if isinstance(skel, dict):
        return {k: _decode_tree(v, leaves) for k, v in skel.items()}
    if isinstance(skel, list):
        return [_decode_tree(v, leaves) for v in skel]
    return leaves[skel]


def save_checkpoint(path: str, payload: dict) -> str:
    """Save a checkpoint payload (params/opt_state pytrees + metadata)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    meta = {}
    params_skel = None
    n_opt = 0
    for key, value in payload.items():
        if key == "params" and value is not None:
            p_leaves: list = []
            params_skel = _encode_tree(value, p_leaves)
            for i, leaf in enumerate(p_leaves):
                arrays[f"p{i}"] = leaf
        elif key == "opt_state" and value is not None:
            o_leaves = [np.asarray(jax.device_get(l))
                        for l in jax.tree_util.tree_leaves(value)]
            n_opt = len(o_leaves)
            for i, leaf in enumerate(o_leaves):
                arrays[f"o{i}"] = leaf
        else:
            meta[key] = value
    record = {"meta": meta, "params_tree": params_skel, "n_opt_leaves": n_opt}
    arrays["__record__"] = np.frombuffer(
        json.dumps(record, default=float).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)
    return path


def decode_params_npz(z, params_tree):
    """Rebuild a params pytree from an open npz's ``p{i}`` leaf arrays.

    Shared by ``load_checkpoint`` and ``export.ExportedDecoder`` so the
    leaf-key scheme is decoded in exactly one place."""
    leaves = {f"@{i}": z[f"p{i}"]
              for i in range(sum(1 for k in z.files if k.startswith("p")))}
    return _decode_tree(params_tree, leaves)


def _load_torch_checkpoint(path: str) -> dict:
    """Reference ``.pt`` -> params-only payload via the compat converters.

    ``torch.load(weights_only=True)`` (inside ``load_torch_state_dict``)
    forbids arbitrary unpickling; the model family is auto-detected from the
    state_dict's key prefixes. The reference's torch optimizer/scheduler
    state has no meaning to optax, so resume/finetune starts those fresh.
    """
    from attention_based_e2e_asr_dnn_tpu import compat

    sd, meta = compat.load_torch_state_dict(path, return_meta=True)
    params, family = compat.params_from_state_dict(sd)
    warnings.warn(
        f"{path}: reference PyTorch checkpoint ({family}) — imported params "
        f"only; optimizer/scheduler state starts fresh",
        stacklevel=3,
    )
    out = {"params": params, "opt_state": None, "torch_import": family}
    out.update(meta)  # epoch/batch counters when the payload carried them
    return out


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint. ``opt_state`` comes back as a FLAT leaf list —
    rebuild it with ``tree_unflatten`` against the live optimizer structure
    (Trainer.load does). Data-only: no code execution from the file.

    Reference PyTorch ``.pt`` checkpoints (zip or legacy-pickle torch
    serialization) load transparently through ``compat`` — so ``finetune``,
    ``infer`` epoch selection, and ``run_avg`` averaging all accept the
    reference's files directly.
    """
    with open(path, "rb") as fh:
        head = fh.read(3)
    if head[:2] != b"PK":  # not a zip: our legacy pickle OR torch legacy
        # torch's legacy (pre-1.6) serialization is a STREAM of pickles led
        # by torch.serialization.MAGIC_NUMBER as a protocol-2 LONG1 — detect
        # it from the raw header so the untrusted file is never unpickled
        # (it goes through torch.load(weights_only=True) instead)
        if head == b"\x80\x02\x8a":
            return _load_torch_checkpoint(path)
        import pickle

        warnings.warn(
            f"{path}: legacy pickle checkpoint — pickle executes arbitrary "
            f"code; only load files you created yourself",
            stacklevel=2,
        )
        with open(path, "rb") as fh:
            loaded = pickle.load(fh)
        if isinstance(loaded, int):
            # torch legacy stream whose header pickle used another protocol
            return _load_torch_checkpoint(path)
        if isinstance(loaded, dict) and "params" not in loaded and (
                "model_state_dict" in loaded or any(
                    hasattr(v, "detach") for v in loaded.values())):
            return _load_torch_checkpoint(path)
        return loaded
    import zipfile

    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    if "__record__.npy" not in names:
        if any(n.rsplit("/", 1)[-1] == "data.pkl" for n in names):
            return _load_torch_checkpoint(path)  # torch>=1.6 zip format
        raise ValueError(
            f"{path}: zip archive is neither our npz checkpoint (no "
            f"__record__) nor a torch zip checkpoint (no data.pkl)"
        )
    with np.load(path, allow_pickle=False) as z:
        record = json.loads(bytes(z["__record__"]).decode("utf-8"))
        out = dict(record["meta"])
        if record["params_tree"] is not None:
            out["params"] = decode_params_npz(z, record["params_tree"])
        if record["n_opt_leaves"]:
            out["opt_state"] = [z[f"o{i}"]
                                for i in range(record["n_opt_leaves"])]
        else:
            out.setdefault("opt_state", None)
        return out


def list_best_checkpoints(ckpt_dir: str) -> List[str]:
    """Best-tag checkpoint filenames in a ckpts/ folder, name-sorted.

    Accepts our ``min-*.ckpt`` and the reference's ``min-*.pt``
    (src/train.py:362) so an untouched reference experiment folder is
    directly consumable by infer/serving/export. Crash saves
    (``emergency-*``) and a previous run's ``avg-all.*`` are excluded.
    A ``.pt`` whose same-stem ``.ckpt`` twin exists (the explicit
    ``import_reference_ckpt.py`` workflow leaves both) is skipped — run_avg
    must not average the same epoch twice — and ``.pt`` files are only
    listed when torch is importable (they need it to load).
    """
    names = [f for f in os.listdir(ckpt_dir)
             if f.startswith("min") and f.endswith((".ckpt", ".pt"))]
    if any(f.endswith(".pt") for f in names):
        import importlib.util

        if importlib.util.find_spec("torch") is None:
            names = [f for f in names if not f.endswith(".pt")]
    ckpt_stems = {os.path.splitext(f)[0] for f in names
                  if f.endswith(".ckpt")}
    return sorted(f for f in names if f.endswith(".ckpt")
                  or os.path.splitext(f)[0] not in ckpt_stems)


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
