"""Deployment export: serialize decode graphs to StableHLO artifacts.

The reference has no deployment story beyond "clone the repo and run
infer.py" (src/infer.py:36-195). Here the whole serving computation —
listener + early-stop greedy (or beam) decode for one bucket shape — is
exported with ``jax.export`` into a single self-contained ``.tlas`` file:

  * the StableHLO program (versioned, multi-platform: tpu + cpu), and
  * the parameter leaves (same data-only npz encoding as our checkpoints),
  * a JSON meta record (bucket shape, vocab, special ids, dtype).

``ExportedDecoder`` runs the artifact with NO model code — jax + numpy plus
the pure-numpy ``decoding/select.py`` helper (beam artifacts serialize the
device-side scan; the final backpointer walk + length-normalized selection
is host-side numpy shared with ``beam_search`` itself, so the two can never
drift). A serving fleet deploys artifacts without tracking framework model
code, and a newer jax can still execute older artifacts (StableHLO forward
compatibility).

Like our checkpoints (training/checkpoints.py), the artifact is data-only:
an npz of arrays + JSON; loading executes no pickled code. The StableHLO
payload is executed by XLA, same trust level as running any jitted fn.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
    _encode_tree,
    decode_params_npz,
)

_FORMAT = "tpu-las-export-v1"


def export_las_decoder(
    params,
    las_cfg,
    batch: int,
    t_pad: int,
    *,
    vocab: Sequence[str],
    sos_idx: int,
    eos_idx: int,
    pad_idx: int,
    compute_dtype="float32",
    beam_size: int = 0,
    length_alpha: float = 0.0,
    max_len_factor: float = 3.0,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> dict:
    """Build the artifact dict for one (batch, t_pad) decode bucket.

    ``beam_size > 1`` exports the beam path; else early-stop greedy. The
    exported callable signature is the serving step's ``(params, x, lx)``.
    """
    import jax.numpy as jnp
    from jax import export as jexport

    if beam_size > 1:
        # The beam path is scan (device) + backpointer walk (host numpy):
        # export the jitted scan; ExportedDecoder finishes with the SAME
        # select_best_sequences the in-process beam_search uses.
        from attention_based_e2e_asr_dnn_tpu.decoding.beam import (
            _beam_decode_scan,
        )
        from attention_based_e2e_asr_dnn_tpu.models.las import listener_apply

        steps = las_cfg.speller.CHR_MAX_STEPS
        cdt = jnp.dtype(compute_dtype)

        @jax.jit
        def step(params, x, lx):
            enc_h, enc_l = listener_apply(
                params["listener"], las_cfg.listener, None,
                x.astype(cdt), lx, train=False)
            tokens, parents, _fin, final_scores, _ = _beam_decode_scan(
                params["speller"], las_cfg.speller, enc_h, enc_l,
                beam_size, steps, exact_prune=(length_alpha == 0.0),
                max_len_factor=max_len_factor)
            return tokens, parents, final_scores
    else:
        from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
            make_las_greedy_step,
        )

        step = make_las_greedy_step(
            las_cfg, compute_dtype=jnp.dtype(compute_dtype),
            max_len_factor=max_len_factor,
        )

    params = jax.tree.map(np.asarray, params)
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    x_spec = jax.ShapeDtypeStruct(
        (batch, t_pad, las_cfg.listener.input_dim), np.float32)
    lx_spec = jax.ShapeDtypeStruct((batch,), np.int32)
    exported = jexport.export(step, platforms=list(platforms))(
        p_spec, x_spec, lx_spec)

    meta = {
        "format": _FORMAT,
        "batch": batch,
        "t_pad": t_pad,
        "input_dim": las_cfg.listener.input_dim,
        "vocab": list(vocab),
        "sos_idx": int(sos_idx),
        "eos_idx": int(eos_idx),
        "pad_idx": int(pad_idx),
        "compute_dtype": str(jnp.dtype(compute_dtype)),
        "beam_size": int(beam_size),
        "length_alpha": float(length_alpha),
        "max_steps": int(las_cfg.speller.CHR_MAX_STEPS),
        "platforms": list(platforms),
    }
    return {"meta": meta, "params": params, "mlir": exported.serialize()}


def save_artifact(path: str, artifact: dict) -> str:
    """Write the artifact as one npz: mlir bytes + param leaves + meta."""
    leaves: list = []
    skel = _encode_tree(artifact["params"], leaves)
    arrays = {f"p{i}": leaf for i, leaf in enumerate(leaves)}
    record = {"meta": artifact["meta"], "params_tree": skel}
    arrays["__record__"] = np.frombuffer(
        json.dumps(record).encode("utf-8"), dtype=np.uint8)
    arrays["__mlir__"] = np.frombuffer(artifact["mlir"], dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)
    return path


class ExportedDecoder:
    """Run a ``.tlas`` artifact: features in, transcripts out.

    Depends on jax + numpy only (deserialize + call) — none of this
    package's model code. One instance serves its one exported bucket
    shape; shorter inputs are padded up, longer ones are rejected.
    """

    def __init__(self, path: str):
        from jax import export as jexport

        with np.load(path, allow_pickle=False) as z:
            record = json.loads(bytes(z["__record__"]).decode("utf-8"))
            if record["meta"].get("format") != _FORMAT:
                raise ValueError(
                    f"{path}: not a {_FORMAT} artifact "
                    f"(format={record['meta'].get('format')!r})")
            self.meta = record["meta"]
            self.params = decode_params_npz(z, record["params_tree"])
            mlir = bytes(z["__mlir__"])
        self._exported = jexport.deserialize(mlir)

    def decode_ids(self, x: np.ndarray, lx: np.ndarray) -> np.ndarray:
        """(batch, t_pad, input_dim) float32, (batch,) int32 -> int32 ids."""
        out = self._exported.call(self.params, x, lx)
        if self.meta.get("beam_size", 0) > 1:
            from attention_based_e2e_asr_dnn_tpu.decoding.select import (
                select_best_sequences,
            )

            tokens, parents, final_scores = out
            return select_best_sequences(
                tokens, parents, final_scores, self.meta["pad_idx"],
                self.meta.get("length_alpha", 0.0),
                self.meta.get("max_steps", 0))
        return np.asarray(out)

    def transcribe(self, features: Sequence[np.ndarray]) -> List[str]:
        """Pad a list of (T_i, input_dim) MFCC arrays into the exported
        bucket and decode. len(features) <= batch; T_i <= t_pad."""
        m = self.meta
        if len(features) > m["batch"]:
            raise ValueError(
                f"{len(features)} utterances > exported batch {m['batch']}")
        x = np.zeros((m["batch"], m["t_pad"], m["input_dim"]), np.float32)
        lx = np.ones((m["batch"],), np.int32)  # dummy rows: length 1
        for i, f in enumerate(features):
            f = np.asarray(f, np.float32)
            if f.shape[0] > m["t_pad"]:
                raise ValueError(
                    f"utterance {i}: {f.shape[0]} frames > exported "
                    f"t_pad {m['t_pad']}")
            if f.shape[1] != m["input_dim"]:
                raise ValueError(
                    f"utterance {i}: feature dim {f.shape[1]} != "
                    f"{m['input_dim']}")
            x[i, : f.shape[0]] = f
            lx[i] = f.shape[0]
        ids = self.decode_ids(x, lx)
        out = []
        for i in range(len(features)):
            chars = []
            for t in ids[i]:
                t = int(t)
                if t == m["eos_idx"] or t == m["pad_idx"]:
                    break
                if t == m["sos_idx"]:
                    continue
                chars.append(m["vocab"][t])
            out.append("".join(chars))
        return out


def export_from_experiment(
    exp_folder: str,
    out_path: str,
    batch: int = 8,
    t_pad: int = 512,
    checkpoint: Optional[str] = None,
    average: bool = False,
    beam_size: int = 0,
    length_alpha: float = 0.0,
    max_len_factor: float = 3.0,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> str:
    """config.json + best/averaged checkpoint -> one ``.tlas`` artifact.

    Mirrors serving.Transcriber's loading (config snapshot re-read,
    best-checkpoint selection, optional run_avg averaging).
    """
    from attention_based_e2e_asr_dnn_tpu.models.las import (
        las_config_from_dicts,
    )
    from attention_based_e2e_asr_dnn_tpu.serving import load_experiment

    snap, payload = load_experiment(exp_folder, checkpoint, average)
    las_cfg = las_config_from_dicts(
        snap.model.configs["listener_configs"],
        snap.model.configs["speller_configs"],
    )
    artifact = export_las_decoder(
        payload["params"], las_cfg, batch, t_pad,
        vocab=snap.VOCAB, sos_idx=snap.SOS_IDX, eos_idx=snap.EOS_IDX,
        pad_idx=getattr(snap, "PAD_IDX", snap.EOS_IDX),
        compute_dtype=getattr(snap, "compute_dtype", "float32"),
        beam_size=beam_size, length_alpha=length_alpha,
        max_len_factor=max_len_factor, platforms=platforms,
    )
    return save_artifact(out_path, artifact)
