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


def _dp_shardings(n: int):
    """(replicated, batch-sharded) NamedShardings over an n-device 'dp'
    mesh built from the first n local devices."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(
            f"data_parallel={n} but only {len(devs)} devices visible")
    mesh = Mesh(np.array(devs[:n]), ("dp",))
    return (NamedSharding(mesh, PartitionSpec()),
            NamedSharding(mesh, PartitionSpec("dp")))


def _portable_las_cfg(las_cfg, platforms):
    """Force the portable XLA compute paths when the artifact targets any
    non-TPU platform.

    The Pallas kernel tiers (``lstm_impl``/``decoder_impl: pallas``) are a
    runtime performance choice, not model semantics (kernel/scan equivalence
    is pinned by tests/test_lstm_pallas.py and tests/test_speller_pallas.py) —
    but Mosaic kernels only lower for TPU, so a multi-platform ``jax.export``
    of a pallas-configured model dies with "Only interpret mode is supported
    on CPU backend". A user who trained with the fast kernels (the
    recommended config) must still get a portable artifact by default."""
    import dataclasses

    if set(platforms) == {"tpu"}:
        return las_cfg
    lst, spl = las_cfg.listener, las_cfg.speller
    if lst.lstm_impl == "pallas":
        lst = dataclasses.replace(lst, lstm_impl="scan")
    if spl.decoder_impl == "pallas":
        spl = dataclasses.replace(spl, decoder_impl="scan")
    if lst is not las_cfg.listener or spl is not las_cfg.speller:
        return dataclasses.replace(las_cfg, listener=lst, speller=spl)
    return las_cfg


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
    data_parallel: int = 1,
    quantize: Optional[str] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> dict:
    """Build the artifact dict for one (batch, t_pad) decode bucket.

    ``beam_size > 1`` exports the beam path; else early-stop greedy. The
    exported callable signature is the serving step's ``(params, x, lx)``.

    ``data_parallel > 1`` exports the program SHARDED over an N-device
    'dp' mesh (params replicated, batch split — serving.Transcriber's
    data_parallel layout): the artifact then requires N devices at run
    time and decodes its bucket N-way in one dispatch.

    ``quantize="int8"`` stores the large weight matrices int8 + per-channel
    scales and bakes the dequantize into the program prologue (see
    quantize.py — artifact/upload size win, NOT a compute-speed claim).
    """
    import jax.numpy as jnp
    from jax import export as jexport

    las_cfg = _portable_las_cfg(las_cfg, platforms)
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
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(
                f"quantize={quantize!r}: only 'int8' is supported")
        from attention_based_e2e_asr_dnn_tpu.quantize import (
            dequantize_tree,
            quantize_tree,
        )

        params = quantize_tree(params)
        inner_step = step

        @jax.jit
        def step(qp, x, lx):
            return inner_step(dequantize_tree(qp), x, lx)

    if data_parallel > 1:
        if batch % data_parallel:
            raise ValueError(f"batch {batch} not divisible by "
                             f"data_parallel {data_parallel}")
        rep, shard = _dp_shardings(data_parallel)
        if beam_size > 1:
            # beam outputs are time-leading: tokens/parents (steps, B, K)
            # shard on the BATCH axis (1); final_scores (B, K) on axis 0
            from jax.sharding import NamedSharding, PartitionSpec

            t_shard = NamedSharding(shard.mesh, PartitionSpec(None, "dp"))
            out_sh = (t_shard, t_shard, shard)
        else:
            out_sh = shard
        step = jax.jit(
            step,
            in_shardings=(jax.tree.map(lambda _: rep, params), shard,
                          shard),
            out_shardings=out_sh)
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep),
            params)
        x_spec = jax.ShapeDtypeStruct(
            (batch, t_pad, las_cfg.listener.input_dim), np.float32,
            sharding=shard)
        lx_spec = jax.ShapeDtypeStruct((batch,), np.int32, sharding=shard)
    else:
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
        x_spec = jax.ShapeDtypeStruct(
            (batch, t_pad, las_cfg.listener.input_dim), np.float32)
        lx_spec = jax.ShapeDtypeStruct((batch,), np.int32)
    exported = jexport.export(step, platforms=list(platforms))(
        p_spec, x_spec, lx_spec)

    meta = {
        "format": _FORMAT,
        "kind": "las",
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
        "data_parallel": int(data_parallel),
        "quantize": quantize or "none",
        "platforms": list(platforms),
    }
    return {"meta": meta, "params": params, "mlir": exported.serialize()}


def export_rewriter_corrector(
    params,
    lm_cfg,
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
    gate: bool = True,
    span_rewrite: bool = False,
    span_conf_tau: float = 0.5,
    span_fracs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    quantize: Optional[str] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> dict:
    """Artifact for the Rewriter correction chain: text ids in, rewrite ids
    (+ forced-decode scores for the never-worse gate) out.

    ``t_pad`` is the static input/candidate width (ids incl. SOS/EOS).
    ``gate=True`` additionally serializes the forced-decode scorer
    (decoding/rescore.py) so ``ExportedCorrector`` can apply the
    confidence gate on deployment hosts — margin stays a RUNTIME knob.

    ``span_rewrite=True`` (requires ``gate``) additionally serializes the
    per-token confidence scorer and the prefix-anchored decode step, so the
    fitted span-rewrite policy (RESULTS.md "Round-4 capstone") deploys
    model-code-free: ``ExportedCorrector.correct(texts, margin=...,
    span_family=...)`` runs the same ``span_candidate_families`` machinery
    as lminfer's calibration and serving.Corrector. The family and margin
    stay RUNTIME knobs (fit them offline with lminfer's
    ``confidence_margin: "auto"``).
    """
    import dataclasses

    import jax.numpy as jnp
    from jax import export as jexport

    if set(platforms) != {"tpu"} and ("pallas" in (lm_cfg.lstm_impl,
                                                   lm_cfg.decoder_impl)):
        # same rule as _portable_las_cfg: Mosaic kernels only lower for TPU
        lm_cfg = dataclasses.replace(
            lm_cfg, lstm_impl="scan", decoder_impl="scan")
    if t_pad % 32:
        raise ValueError(
            f"t_pad {t_pad} must be a multiple of 32 (the gate's candidate "
            f"pad granularity, decoding/rescore.py::gate_corrections)")
    cdt = jnp.dtype(compute_dtype)
    params = jax.tree.map(np.asarray, params)
    _dq = None
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(
                f"quantize={quantize!r}: only 'int8' is supported")
        from attention_based_e2e_asr_dnn_tpu.quantize import (
            dequantize_tree as _dq,
            quantize_tree,
        )

        params = quantize_tree(params)
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    x_spec = jax.ShapeDtypeStruct((batch, t_pad), np.int32)
    lx_spec = jax.ShapeDtypeStruct((batch,), np.int32)

    if beam_size > 1:
        from attention_based_e2e_asr_dnn_tpu.decoding.beam import (
            _beam_decode_scan,
        )
        from attention_based_e2e_asr_dnn_tpu.ops.lstm import (
            locked_lstm_stack_apply,
        )

        sp_cfg = lm_cfg.speller_config()
        steps = lm_cfg.CHR_MAX_STEPS

        @jax.jit
        def step(p, x, lx):
            emb = p["decoder"]["char_emb"].astype(cdt)
            enc_h, enc_l = locked_lstm_stack_apply(
                p["encoder"], None, emb[x], lx,
                init_dropout=0.0, mid_dropout=0.0, bidirectional=True,
                train=False)
            tokens, parents, _fin, final_scores, _ = _beam_decode_scan(
                p["decoder"], sp_cfg, enc_h, enc_l, beam_size, steps,
                exact_prune=(length_alpha == 0.0),
                max_len_factor=max_len_factor)
            return tokens, parents, final_scores
    else:
        from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
            make_rewriter_greedy_step,
        )

        step = make_rewriter_greedy_step(
            lm_cfg, compute_dtype=cdt, max_len_factor=max_len_factor)

    if _dq is not None:
        inner_step = step

        @jax.jit
        def step(qp, x, lx):
            return inner_step(_dq(qp), x, lx)

    exported = jexport.export(step, platforms=list(platforms))(
        p_spec, x_spec, lx_spec)

    artifact = {
        "meta": {
            "format": _FORMAT,
            "kind": "rewriter",
            "batch": batch,
            "t_pad": t_pad,
            "vocab": list(vocab),
            "sos_idx": int(sos_idx),
            "eos_idx": int(eos_idx),
            "pad_idx": int(pad_idx),
            "compute_dtype": str(cdt),
            "beam_size": int(beam_size),
            "length_alpha": float(length_alpha),
            "max_steps": int(lm_cfg.CHR_MAX_STEPS),
            "gate": bool(gate),
            "quantize": quantize or "none",
            "platforms": list(platforms),
        },
        "params": params,
        "mlir": exported.serialize(),
    }
    if gate:
        from attention_based_e2e_asr_dnn_tpu.decoding.rescore import (
            make_rewriter_scorer,
        )

        # The gate must score the FULL rewrite (up to CHR_MAX_STEPS tokens
        # + SOS/EOS), not a clipped prefix — otherwise the never-worse
        # guarantee would be asserted for a different string than the one
        # returned. So the scorer's static width covers the longest
        # possible candidate, independent of the input width t_pad.
        score_width = -(-max(t_pad, lm_cfg.CHR_MAX_STEPS + 2) // 32) * 32
        artifact["meta"]["score_width"] = score_width
        # gate_corrections scores the correction AND the re-generated input
        # in ONE stacked dispatch -> the scorer's static batch is 2B
        scorer = make_rewriter_scorer(lm_cfg, compute_dtype=cdt)
        if _dq is not None:
            inner_scorer = scorer

            @jax.jit
            def scorer(qp, c, cl, s, sl):
                return inner_scorer(_dq(qp), c, cl, s, sl)

        s2 = jax.ShapeDtypeStruct((2 * batch, score_width), np.int32)
        l2 = jax.ShapeDtypeStruct((2 * batch,), np.int32)
        artifact["mlir_scorer"] = jexport.export(
            scorer, platforms=list(platforms))(
                p_spec, s2, l2, s2, l2).serialize()

    if span_rewrite:
        if not gate:
            raise ValueError("span_rewrite requires gate=True (candidate "
                             "selection uses the gate's scorer)")
        from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
            make_rewriter_anchored_step,
        )
        from attention_based_e2e_asr_dnn_tpu.decoding.rescore import (
            make_rewriter_token_scorer,
        )

        tok = make_rewriter_token_scorer(lm_cfg, compute_dtype=cdt)
        anch = make_rewriter_anchored_step(
            lm_cfg, compute_dtype=cdt, max_len_factor=max_len_factor)
        if _dq is not None:
            inner_tok, inner_anch = tok, anch

            @jax.jit
            def tok(qp, x, lx, cand):
                return inner_tok(_dq(qp), x, lx, cand)

            @jax.jit
            def anch(qp, x, lx, aid, alen):
                return inner_anch(_dq(qp), x, lx, aid, alen)

        xw = jax.ShapeDtypeStruct((batch, t_pad), np.int32)
        lw = jax.ShapeDtypeStruct((batch,), np.int32)
        aw = jax.ShapeDtypeStruct((batch, t_pad - 1), np.int32)
        artifact["mlir_token_scorer"] = jexport.export(
            tok, platforms=list(platforms))(p_spec, xw, lw, xw).serialize()
        artifact["mlir_anchored"] = jexport.export(
            anch, platforms=list(platforms))(
                p_spec, xw, lw, aw, lw).serialize()
        artifact["meta"]["span_conf_tau"] = float(span_conf_tau)
        artifact["meta"]["span_fracs"] = [float(f) for f in span_fracs]
    return artifact


def save_artifact(path: str, artifact: dict) -> str:
    """Write the artifact as one npz: mlir bytes + param leaves + meta."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves: list = []
    skel = _encode_tree(artifact["params"], leaves)
    arrays = {f"p{i}": leaf for i, leaf in enumerate(leaves)}
    record = {"meta": artifact["meta"], "params_tree": skel}
    arrays["__record__"] = np.frombuffer(
        json.dumps(record).encode("utf-8"), dtype=np.uint8)
    arrays["__mlir__"] = np.frombuffer(artifact["mlir"], dtype=np.uint8)
    for aux in ("mlir_scorer", "mlir_token_scorer", "mlir_anchored"):
        if aux in artifact:
            arrays[f"__{aux}__"] = np.frombuffer(artifact[aux],
                                                 dtype=np.uint8)
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

    _KIND = "las"

    def __init__(self, path: str):
        from jax import export as jexport

        with np.load(path, allow_pickle=False) as z:
            record = json.loads(bytes(z["__record__"]).decode("utf-8"))
            if record["meta"].get("format") != _FORMAT:
                raise ValueError(
                    f"{path}: not a {_FORMAT} artifact "
                    f"(format={record['meta'].get('format')!r})")
            kind = record["meta"].get("kind", "las")
            if kind != self._KIND:
                loaders = {"las": "ExportedDecoder",
                           "rewriter": "ExportedCorrector"}
                raise ValueError(
                    f"{path}: artifact kind {kind!r} — use "
                    f"{loaders.get(kind, 'a matching loader')} for it, "
                    f"not {type(self).__name__}")
            self.meta = record["meta"]
            self.params = decode_params_npz(z, record["params_tree"])
            mlir = bytes(z["__mlir__"])
            self._scorer_mlir = (bytes(z["__mlir_scorer__"])
                                 if "__mlir_scorer__" in z.files else None)
            self._aux_mlir = {
                aux: bytes(z[f"__{aux}__"])
                for aux in ("mlir_token_scorer", "mlir_anchored")
                if f"__{aux}__" in z.files
            }
        self._exported = jexport.deserialize(mlir)
        self._dp_shard = None  # lazily built for data_parallel artifacts
        import threading

        self._dp_lock = threading.Lock()

    def decode_ids(self, x: np.ndarray, lx: np.ndarray) -> np.ndarray:
        """(batch, t_pad, input_dim) float32, (batch,) int32 -> int32 ids."""
        if self.meta.get("data_parallel", 1) > 1:
            # guarded: warmup thread and streaming worker may race here;
            # _dp_shard is assigned only AFTER params are placed so a
            # concurrent reader never calls with unsharded params
            with self._dp_lock:
                if self._dp_shard is None:
                    rep, shard = _dp_shardings(self.meta["data_parallel"])
                    self.params = jax.device_put(self.params, rep)
                    self._dp_shard = shard
            x = jax.device_put(np.asarray(x), self._dp_shard)
            lx = jax.device_put(np.asarray(lx), self._dp_shard)
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
        return [self._detok(ids[i]) for i in range(len(features))]

    def _detok(self, row) -> str:
        # decode output pads with EOS after the first EOS, so stopping at
        # EOS (ids_to_str) also covers padding; one detokenizer serves the
        # whole framework
        from attention_based_e2e_asr_dnn_tpu.utils.levenshtein import (
            ids_to_str,
        )

        m = self.meta
        return ids_to_str(row, m["vocab"], m["sos_idx"], m["eos_idx"])


class ExportedCorrector(ExportedDecoder):
    """Run a Rewriter ``.tlas`` artifact: texts in, gated corrections out.

    Mirrors ``serving.Corrector``: rewrite each input text, and (when the
    artifact carries the scorer program) only keep a rewrite the model
    scores ``margin`` avg-log-prob/char above regenerating the input —
    never-worse under the model's own likelihood, with ``margin`` a runtime
    knob. The gate's candidate layout + comparison is the SAME host-side
    ``gate_corrections`` the serving path uses.
    """

    _KIND = "rewriter"

    def __init__(self, path: str):
        from jax import export as jexport

        super().__init__(path)
        self._scorer = (jexport.deserialize(self._scorer_mlir)
                        if self._scorer_mlir is not None else None)
        self._token_scorer = self._anchored = None
        if "mlir_token_scorer" in self._aux_mlir:
            self._token_scorer = jexport.deserialize(
                self._aux_mlir["mlir_token_scorer"])
            self._anchored = jexport.deserialize(
                self._aux_mlir["mlir_anchored"])

    def transcribe(self, features):  # features are audio-side; not here
        raise TypeError(
            "rewriter artifacts correct TEXT — use .correct(texts); "
            ".transcribe() is the LAS ExportedDecoder API")

    def correct(self, texts: Sequence[str], margin: float = 0.0,
                on_overflow: str = "raise",
                span_family: Optional[str] = None) -> List[str]:
        """``on_overflow``: what to do with a text longer than the exported
        width — "raise" (direct-API default) or "passthrough" (keep the
        input uncorrected; what the serving chain wants, since skipping a
        correction is always never-worse).

        ``span_family``: deploy the fitted span-rewrite policy — the gate
        thresholds this candidate family ("free", "conf", "best", or an
        "fNN" fraction anchor; lminfer's auto calibration prints the fitted
        (family, margin) pair). Requires an artifact exported with
        ``span_rewrite=True``."""
        if on_overflow not in ("raise", "passthrough"):
            raise ValueError(f"on_overflow={on_overflow!r}")
        if margin != 0.0 and self._scorer is None:
            raise ValueError(
                "margin set but this artifact was exported with "
                "gate=False (no scorer program) — every rewrite would be "
                "applied unconditionally; re-export without --no-gate")
        if span_family is not None and self._anchored is None:
            raise ValueError(
                "span_family set but this artifact carries no span "
                "programs — re-export with span_rewrite=True")
        m = self.meta
        vm = {c: i for i, c in enumerate(m["vocab"])}
        sos, eos = m["sos_idx"], m["eos_idx"]
        B, W = m["batch"], m["t_pad"]
        ids = []
        passthrough: set = set()
        for i, t in enumerate(texts):
            row = [sos] + [vm[c] for c in t if c in vm] + [eos]
            if len(row) > W:
                if on_overflow == "raise":
                    raise ValueError(
                        f"text {i}: {len(row)} ids > exported t_pad {W}")
                passthrough.add(i)
                row = [sos, eos]  # dummy; result discarded
            ids.append(row)
        out: List[str] = [""] * len(texts)
        for start in range(0, len(texts), B):
            rows = ids[start:start + B]
            x = np.full((B, W), eos, np.int32)
            lx = np.ones((B,), np.int32)  # dummy rows: length 1
            for r, row in enumerate(rows):
                x[r, : len(row)] = row
                lx[r] = len(row)
            dec = self.decode_ids(x, lx)
            use = None
            if span_family is not None:
                from attention_based_e2e_asr_dnn_tpu.decoding.rescore import (
                    span_candidate_families,
                )

                fams = span_candidate_families(
                    dec, self._chunked_scorer(), self._token_fn(),
                    self._anchored_fn(), self.params, x, lx,
                    self.meta["span_conf_tau"], self.meta["span_fracs"],
                    eos, sos)
                if span_family not in fams:
                    raise ValueError(
                        f"span_family {span_family!r} not one of "
                        f"{sorted(fams)}")
                dec, margins = fams[span_family]
                use = margins > margin
            elif self._scorer is not None:
                from attention_based_e2e_asr_dnn_tpu.decoding.rescore import (
                    gate_corrections,
                )

                # widen the input rows to the scorer's static width (which
                # covers the longest possible [SOS..EOS] candidate) so
                # gate_corrections' computed layout lands exactly on it and
                # the FULL rewrite is scored — same strings as the
                # in-process Corrector gates on
                ws = self.meta["score_width"]
                x_gate = np.full((B, ws), eos, np.int32)
                x_gate[:, :W] = x
                use, _, _ = gate_corrections(
                    lambda p, gx, glx, cand, lc:
                        self._scorer.call(p, gx, glx, cand, lc),
                    self.params, x_gate, lx, dec, eos, sos,
                    margin=margin)
            for r in range(len(rows)):
                if start + r in passthrough:
                    out[start + r] = texts[start + r]
                    continue
                rewrite = self._detok(dec[r])
                keep = bool(use[r]) if use is not None else True
                out[start + r] = rewrite if keep else texts[start + r]
        return out

    # --- span-program adapters: present the static exported programs as
    # the callables decoding.rescore.span_candidate_families expects ---

    def _token_fn(self):
        def tok(_p, x, lx, cand):
            return self._token_scorer.call(self.params, x, lx, cand)
        return tok

    def _anchored_fn(self):
        def anch(_p, x, lx, anchor_ids, anchor_len):
            return self._anchored.call(self.params, x, lx, anchor_ids,
                                       np.asarray(anchor_len, np.int32))
        return anch

    def _chunked_scorer(self):
        """The exported scorer is static at (2B, score_width); the span
        machinery stacks (n_families+1)*B rows of a narrower width. Chunk
        and pad — each row's forced score is row-local, so the chunking is
        exact."""
        B = self.meta["batch"]
        ws = self.meta["score_width"]
        eos = self.meta["eos_idx"]

        def score(_p, x, lx, cand, lc):
            n = x.shape[0]
            out = np.zeros((n,), np.float32)
            for s in range(0, n, 2 * B):
                e = min(s + 2 * B, n)
                bx = np.full((2 * B, ws), eos, np.int32)
                bx[: e - s, : x.shape[1]] = x[s:e]
                blx = np.ones((2 * B,), np.int32)
                blx[: e - s] = lx[s:e]
                bc = np.full((2 * B, ws), eos, np.int32)
                bc[: e - s, : cand.shape[1]] = cand[s:e]
                blc = np.ones((2 * B,), np.int32)
                blc[: e - s] = lc[s:e]
                out[s:e] = np.asarray(self._scorer.call(
                    self.params, bx, blx, bc, blc))[: e - s]
            return out
        return score


class ArtifactTranscriber:
    """serving.Transcriber-compatible front end over ``.tlas`` artifacts.

    Takes one artifact per decode bucket (same checkpoint, different
    (batch, t_pad)) and routes each utterance to the smallest bucket that
    fits — the exported twin of the in-process warm-bucket ladder. Exposes
    the attribute surface ``server.AsrHttpServer`` / ``StreamingTranscriber``
    consume (``transcribe``/``batch_size``/``wait_ready``/...), so the HTTP
    endpoint can serve from artifacts with no model code on the host:

        python tools/serve_http.py --artifact las-b8-t512.tlas --port 8080
    """

    def __init__(self, artifact_paths: Sequence[str],
                 corrector: Optional["ExportedCorrector"] = None,
                 margin: float = 0.0,
                 span_family: Optional[str] = None):
        if isinstance(artifact_paths, (str, os.PathLike)):
            artifact_paths = [artifact_paths]
        self.buckets = sorted((ExportedDecoder(p) for p in artifact_paths),
                              key=lambda d: d.meta["t_pad"])
        if not self.buckets:
            raise ValueError("no artifacts given")
        dims = {d.meta["input_dim"] for d in self.buckets}
        if len(dims) != 1:
            raise ValueError(f"artifacts disagree on input_dim: {dims}")
        # mixing buckets exported from DIFFERENT models would transcribe
        # utterances with whichever checkpoint their length routes to —
        # require a consistent vocabulary contract up front
        contracts = {(tuple(d.meta["vocab"]), d.meta["sos_idx"],
                      d.meta["eos_idx"], d.meta["pad_idx"])
                     for d in self.buckets}
        if len(contracts) != 1:
            raise ValueError(
                "artifacts disagree on vocab/special ids — they were "
                "exported from different models")
        if corrector is not None:
            cm = corrector.meta
            if (tuple(cm["vocab"]), cm["sos_idx"], cm["eos_idx"],
                    cm["pad_idx"]) not in contracts:
                raise ValueError(
                    "corrector artifact's vocab/special ids do not match "
                    "the decode artifacts — it was exported from a "
                    "different vocabulary")
            if margin != 0.0 and not cm.get("gate", False):
                raise ValueError(
                    "corrector-margin set but the corrector artifact was "
                    "exported with gate=False (no scorer) — the margin "
                    "would be silently ignored")
            if span_family is not None and corrector._anchored is None:
                raise ValueError(
                    "span_family set but the corrector artifact carries "
                    "no span programs — re-export with span_rewrite=True")
        elif span_family is not None:
            raise ValueError("span_family needs a corrector artifact")
        self.corrector = corrector
        self.margin = margin
        self.span_family = span_family
        self.n_feats = self.buckets[0].meta["input_dim"]
        self.vocab = self.buckets[0].meta["vocab"]
        self.batch_size = max(d.meta["batch"] for d in self.buckets)
        self.bucket_t_pads = [d.meta["t_pad"] for d in self.buckets]
        # hard capacity: unlike the in-process Transcriber (which pads any
        # length), exported buckets cap the input — surfaced so the HTTP
        # layer can 400 over-long requests instead of 500ing a whole batch
        self.max_frames = self.bucket_t_pads[-1]
        self.pad_time_multiple = None  # no rounding granularity here —
        # clients should read bucket_t_pads / max_frames instead
        import threading

        self._warmup_lock = threading.Lock()
        self._warmup_requested = False
        self._warmup_bg: Optional[threading.Thread] = None
        self._ready_evt = threading.Event()
        self._warmup_error: Optional[BaseException] = None

    def wait_ready(self, timeout: Optional[float] = None) -> bool:
        """True once warmup (if started) has compiled every bucket; True
        immediately when no warmup was requested — same contract as
        serving.Transcriber.wait_ready."""
        if not self._warmup_requested:
            return True
        got = self._ready_evt.wait(timeout)
        if self._warmup_error is not None:
            raise RuntimeError(
                "artifact warmup failed") from self._warmup_error
        return got

    def warmup(self, background: bool = False):
        """Run one dummy batch through every decode bucket AND the attached
        corrector's programs, so first requests do not pay the
        deserialize/compile cost. ``background=True`` returns immediately;
        gate traffic with ``wait_ready`` (/readyz).

        Re-invocation retries a failed warmup: state is reset so a
        transient failure does not poison readiness forever. A background
        warmup already in flight is returned/joined, not duplicated."""
        import threading

        def _run():
            try:
                for d in self.buckets:
                    m = d.meta
                    d.decode_ids(
                        np.zeros((m["batch"], m["t_pad"], m["input_dim"]),
                                 np.float32),
                        np.ones((m["batch"],), np.int32))
                if self.corrector is not None:
                    # one dummy correction compiles the rewrite decode AND
                    # the gate scorer (and, with a span family, the
                    # anchored decode + token scorer) — otherwise /readyz
                    # goes 200 while the first gated request still stalls
                    # on the compiles
                    self.corrector.correct(["A"], margin=self.margin,
                                           span_family=self.span_family)
            except BaseException as exc:  # surfaced via wait_ready
                self._warmup_error = exc
            finally:
                self._ready_evt.set()

        with self._warmup_lock:
            if self._warmup_bg is not None and self._warmup_bg.is_alive():
                thread = self._warmup_bg  # in flight — don't duplicate
                fresh = False
            else:
                self._ready_evt.clear()
                self._warmup_error = None
                self._warmup_requested = True
                fresh = True
                if background:
                    self._warmup_bg = thread = threading.Thread(
                        target=_run, daemon=True)
                    thread.start()
                else:
                    thread = None  # run inline below
        if background:
            return thread
        if fresh:
            _run()
        else:  # a background warmup is already running — wait for it
            self._ready_evt.wait()
        if self._warmup_error is not None:
            raise RuntimeError(
                "artifact warmup failed") from self._warmup_error

    def _route(self, n_frames: int) -> "ExportedDecoder":
        for d in self.buckets:
            if n_frames <= d.meta["t_pad"]:
                return d
        raise ValueError(
            f"utterance of {n_frames} frames exceeds the largest exported "
            f"bucket t_pad {self.buckets[-1].meta['t_pad']}")

    def transcribe(self, features: Sequence[np.ndarray]) -> List[str]:
        out: List[Optional[str]] = [None] * len(features)
        groups: dict = {}
        for i, f in enumerate(features):
            f = np.asarray(f, np.float32)
            groups.setdefault(self._route(f.shape[0]), []).append((i, f))
        for dec, items in groups.items():
            bsz = dec.meta["batch"]
            for start in range(0, len(items), bsz):
                chunk = items[start:start + bsz]
                texts = dec.transcribe([f for _, f in chunk])
                for (i, _), text in zip(chunk, texts):
                    out[i] = text
        assert all(t is not None for t in out)
        if self.corrector is not None:
            # a transcript too long for the corrector's exported width
            # keeps its uncorrected text (never-worse), rather than
            # failing the whole batch like a raise would
            out = self.corrector.correct(out, margin=self.margin,
                                         on_overflow="passthrough",
                                         span_family=self.span_family)
        return out  # type: ignore[return-value]


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
    data_parallel: int = 1,
    quantize: Optional[str] = None,
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
        max_len_factor=max_len_factor, data_parallel=data_parallel,
        quantize=quantize, platforms=platforms,
    )
    return save_artifact(out_path, artifact)


def export_corrector_from_experiment(
    exp_folder: str,
    out_path: str,
    batch: int = 8,
    t_pad: int = 512,
    checkpoint: Optional[str] = None,
    average: bool = False,
    beam_size: int = 0,
    length_alpha: float = 0.0,
    max_len_factor: float = 3.0,
    gate: bool = True,
    span_rewrite: bool = False,
    span_conf_tau: float = 0.5,
    span_fracs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    quantize: Optional[str] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> str:
    """Rewriter (LM) experiment -> one correction ``.tlas`` artifact.

    Vocabulary comes from the shared constants table, exactly as
    ``serving.Corrector`` resolves it. ``span_conf_tau``/``span_fracs``
    must match the knobs lminfer calibrated with — they name the candidate
    families the fitted ``span_family`` points into, so exporting with
    different values would silently deploy a different policy than the one
    that was fitted.
    """
    from attention_based_e2e_asr_dnn_tpu import constants
    from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
        RewriterConfig,
    )
    from attention_based_e2e_asr_dnn_tpu.serving import load_experiment

    snap, payload = load_experiment(exp_folder, checkpoint, average)
    lm_cfg = RewriterConfig(**snap.model.configs)
    artifact = export_rewriter_corrector(
        payload["params"], lm_cfg, batch, t_pad,
        vocab=constants.VOCAB, sos_idx=constants.SOS_IDX,
        eos_idx=constants.EOS_IDX, pad_idx=constants.PAD_IDX,
        compute_dtype=getattr(snap, "compute_dtype", "float32"),
        beam_size=beam_size, length_alpha=length_alpha,
        max_len_factor=max_len_factor, gate=gate, span_rewrite=span_rewrite,
        span_conf_tau=span_conf_tau, span_fracs=span_fracs,
        quantize=quantize, platforms=platforms,
    )
    return save_artifact(out_path, artifact)
