"""Serving API: load a trained experiment, transcribe feature batches.

The reference's only inference surface is the CSV-oriented infer script
(reference: src/infer.py:86-195). For production serving this module wraps
the same machinery as a persistent, warm object:

  * the experiment's ``config.json`` snapshot rebuilds the exact model and
    the checkpoint loads from the data-only format (no code execution);
  * inputs pad to static bucket shapes (``pad_time_multiple``) so each
    (batch, time) bucket compiles ONCE and is reused — ``warmup()``
    precompiles the buckets ahead of traffic;
  * decoding is the early-stop greedy scan (or real beam search), fully
    jitted: one dispatch per batch.

    >>> t = Transcriber("experiments/260816-123456")
    >>> t.warmup([512, 1024])
    >>> t.transcribe([mfcc1, mfcc2, ...])   # list of (T_i, 15) arrays
    ['A DOG RAN', ...]
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu import constants
from attention_based_e2e_asr_dnn_tpu.config import load_config
from attention_based_e2e_asr_dnn_tpu.data.batching import pad_to_multiple
from attention_based_e2e_asr_dnn_tpu.models.las import las_config_from_dicts
from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
    average_checkpoints,
    list_best_checkpoints,
    load_checkpoint,
)
from attention_based_e2e_asr_dnn_tpu.utils.levenshtein import ids_to_str


def _epoch_of(filename: str) -> int:
    """epoch number from a 'min-...-epoch[N].ckpt' tag (-1 if untagged)."""
    import re

    m = re.search(r"epoch\[(\d+)\]", filename)
    return int(m.group(1)) if m else -1


def _best_checkpoint(ckpt_dir: str) -> str:
    """Highest-epoch best-tag checkpoint (min-*.ckpt / reference min-*.pt).
    Epochs compare NUMERICALLY — a lexicographic sort would rank epoch[9]
    over epoch[10]."""
    cands = sorted(list_best_checkpoints(ckpt_dir), key=_epoch_of)
    if not cands:
        raise FileNotFoundError(f"no min-* checkpoints in {ckpt_dir}")
    return os.path.join(ckpt_dir, cands[-1])


def load_experiment(exp_folder: str, checkpoint: Optional[str] = None,
                    average: bool = False):
    """(config snapshot, checkpoint payload) for a trained experiment.

    The one place that implements best-checkpoint selection vs named
    checkpoint vs run-avg averaging — shared by Transcriber, Corrector and
    export.export_from_experiment. Accepts an untouched REFERENCE experiment
    folder too: its config.json (src/train.py:527) carries no vocab
    injection, so the fixed constants table (identical by construction) is
    filled in, and its min-*.pt checkpoints import through compat."""
    snap = load_config(os.path.join(exp_folder, "config.json"))
    if not hasattr(snap, "VOCAB"):
        snap.VOCAB = list(constants.VOCAB)
        snap.SOS_IDX = constants.SOS_IDX
        snap.EOS_IDX = constants.EOS_IDX
    ckpt_dir = os.path.join(exp_folder, "ckpts")
    if average:
        paths = [os.path.join(ckpt_dir, f)
                 for f in list_best_checkpoints(ckpt_dir)]
        payload = average_checkpoints(paths)
    else:
        payload = load_checkpoint(checkpoint or _best_checkpoint(ckpt_dir))
    return snap, payload


class Corrector:
    """Gated Rewriter corrector over a trained LM experiment — the serving
    twin of the lminfer CLI (the reference's auto-correct claim,
    README.md:51-53, whose own lminfer never ran).

    ``correct(texts)`` rewrites each transcription and keeps a rewrite only
    when the model scores it ``confidence_margin`` avg-log-prob/char above
    regenerating the input (decoding/rescore.py) — never-worse under the
    model's own likelihood. Fit the margin offline with
    ``decoding.rescore.fit_margin`` on labeled pairs (lminfer's
    ``confidence_margin: "auto"``) and pass the number here.

    ``span_rewrite=True`` deploys the prefix-anchored candidate policy that
    makes the chain NET-POSITIVE in the mid-error regime (measured +24.9 LD
    held-out where the free rewrite regresses −37; RESULTS.md "Round-4
    capstone"): the forced scorer marks the input's confident prefix, the
    decode is forced along it and free-runs only the suspect tail, and ONE
    stacked dispatch scores every candidate family. Fit ``(family, margin)``
    offline with lminfer (``span_rewrite: true`` +
    ``confidence_margin: "auto"`` prints both) and pass them as
    ``span_family``/``confidence_margin`` here — the same
    ``decoding.rescore.span_candidate_families`` machinery runs in both, so
    offline calibration and online serving cannot drift.

    Args:
        exp_folder: Rewriter experiment dir (config.json + ckpts/).
        checkpoint: explicit checkpoint; default = latest best tag.
        average: uniform-average all best checkpoints instead.
        beam_size: >1 = beam-search rewrites; 0/1 = early-stop greedy.
        confidence_margin: gate threshold; ``gate=False`` disables gating
            (every rewrite is kept — not recommended in production).
        span_rewrite: widen candidates with prefix-anchored rewrites
            (requires ``gate=True``).
        span_family: which candidate family the gate thresholds —
            ``"free"``, ``"conf"``, ``"best"``, or an ``"fNN"`` fraction
            anchor from ``span_fracs`` (lminfer's calibration names).
    """

    def __init__(
        self,
        exp_folder: str,
        checkpoint: Optional[str] = None,
        average: bool = False,
        beam_size: int = 8,
        length_alpha: float = 0.0,
        max_len_factor: float = 3.0,
        batch_size: int = 32,
        confidence_margin: float = 0.0,
        gate: bool = True,
        span_rewrite: bool = False,
        span_family: str = "best",
        span_conf_tau: float = 0.5,
        span_fracs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    ):
        from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
            RewriterConfig,
        )
        from attention_based_e2e_asr_dnn_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache()
        snap, payload = load_experiment(exp_folder, checkpoint, average)
        self.lm_cfg = RewriterConfig(**snap.model.configs)
        # honor the training snapshot's bf16 policy like Transcriber does —
        # export_corrector_from_experiment reads the same field, so the
        # deployed artifact and this in-process chain stay bit-identical
        self.compute_dtype = jnp.dtype(
            getattr(snap, "compute_dtype", "float32"))
        self.batch_size = batch_size
        self.margin = float(confidence_margin)
        self.params = jax.tree.map(jnp.asarray, payload["params"])

        if beam_size > 1:
            from attention_based_e2e_asr_dnn_tpu.decoding.beam import (
                make_rewriter_beam_step,
            )

            self._step = make_rewriter_beam_step(
                self.lm_cfg, beam_size=beam_size, length_alpha=length_alpha,
                compute_dtype=self.compute_dtype,
                max_len_factor=max_len_factor)
        else:
            from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
                make_rewriter_greedy_step,
            )

            self._step = make_rewriter_greedy_step(
                self.lm_cfg, compute_dtype=self.compute_dtype,
                max_len_factor=max_len_factor)

        self._scorer = None
        if gate:
            from attention_based_e2e_asr_dnn_tpu.decoding.rescore import (
                make_rewriter_scorer,
            )

            self._scorer = make_rewriter_scorer(
                self.lm_cfg, compute_dtype=self.compute_dtype)

        self._span = None
        if span_rewrite:
            if not gate:
                raise ValueError("span_rewrite requires gate=True "
                                 "(candidate selection uses the gate's "
                                 "scorer)")
            names = {"free", "best", "conf"} | {
                f"f{int(round(float(f) * 100)):02d}" for f in span_fracs}
            if span_family not in names:
                raise ValueError(
                    f"span_family {span_family!r} not one of {sorted(names)}"
                    " (fit it with lminfer confidence_margin: auto)")
            from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
                make_rewriter_anchored_step,
            )
            from attention_based_e2e_asr_dnn_tpu.decoding.rescore import (
                make_rewriter_token_scorer,
            )

            self._span = {
                "anchored_step": make_rewriter_anchored_step(
                    self.lm_cfg, compute_dtype=self.compute_dtype,
                    max_len_factor=max_len_factor),
                "token_scorer": make_rewriter_token_scorer(
                    self.lm_cfg, compute_dtype=self.compute_dtype),
                "family": span_family,
                "conf_tau": float(span_conf_tau),
                "fracs": [float(f) for f in span_fracs],
                # fixed candidate width for the stacked scorer: the widest
                # layout any rewrite can need ([SOS]+CHR_MAX_STEPS+[EOS],
                # round-32, the exported artifact's score_width) — otherwise
                # the scorer retraces on the longest rewrite per batch
                "score_width": -(-(int(self.lm_cfg.CHR_MAX_STEPS) + 2)
                                 // 32) * 32,
            }

    def correct(self, texts: Sequence[str]) -> List[str]:
        """Rewrite transcriptions; gated rewrites fall back to the input.
        Characters outside the vocabulary are dropped before encoding (LAS
        output is always in-vocab; foreign input is handled defensively)."""
        from attention_based_e2e_asr_dnn_tpu import constants
        from attention_based_e2e_asr_dnn_tpu.data.batching import (
            BucketBatcher,
        )
        from attention_based_e2e_asr_dnn_tpu.decoding.rescore import (
            gate_corrections,
            span_candidate_families,
        )

        vm, sos, eos = constants.VOCAB_MAP, constants.SOS_IDX, constants.EOS_IDX

        class _Ids:
            def __init__(self, items):
                self._items = items

            def __len__(self):
                return len(self._items)

            def __getitem__(self, i):
                return self._items[i]

        ids = [np.array([sos] + [vm[c] for c in t if c in vm] + [eos],
                        np.int32) for t in texts]
        batcher = BucketBatcher(_Ids(ids), self.batch_size,
                                pad_time_multiple=32, has_labels=False,
                                label_pad_id=eos)
        out: List[Optional[str]] = [None] * len(texts)
        for bt in batcher.epoch(0):
            lx = bt.lx.astype(np.int32)
            dec = np.asarray(self._step(self.params, bt.x, lx))
            margins = None
            if self._span is not None:
                fams = span_candidate_families(
                    dec, self._scorer, self._span["token_scorer"],
                    self._span["anchored_step"], self.params, bt.x, lx,
                    self._span["conf_tau"], self._span["fracs"], eos, sos,
                    score_width=self._span["score_width"])
                dec, margins = fams[self._span["family"]]
            elif self._scorer is not None:
                _, s_corr, s_in = gate_corrections(
                    self._scorer, self.params, bt.x, lx, dec, eos, sos,
                    margin=0.0)
                margins = s_corr - s_in
            for row, orig in enumerate(bt.indices):
                if orig < 0:
                    continue
                rewrite = ids_to_str(dec[row], constants.VOCAB, sos, eos)
                if margins is not None:
                    keep = float(margins[row]) > self.margin
                    out[orig] = rewrite if keep else texts[orig]
                else:
                    out[orig] = rewrite
        assert all(s is not None for s in out)
        return out  # type: ignore[return-value]


class Transcriber:
    """Persistent speech-to-text server over a trained LAS experiment.

    Args:
        exp_folder: experiment directory (holds config.json + ckpts/).
        checkpoint: explicit checkpoint path; default = latest best tag.
        average: uniform-average ALL best checkpoints instead (the
            reference's run_avg mode, src/infer.py:158-172).
        beam_size: >1 enables beam search; 0/1 = early-stop greedy.
        batch_size: static decode batch (requests are chunked/padded to it).
        pad_time_multiple: time bucket granularity (bounds compile count).
        data_parallel: shard each decode batch across this many devices
            (params replicated, batch dim split — the decode is
            embarrassingly parallel per utterance, so GSPMD partitions it
            with zero collectives). batch_size must divide evenly.
        corrector: optional ``Corrector`` — every transcribe() result is
            passed through the gated Rewriter chain before returning (and
            therefore through ``StreamingTranscriber`` too).
    """

    def __init__(
        self,
        exp_folder: str,
        checkpoint: Optional[str] = None,
        average: bool = False,
        beam_size: int = 0,
        length_alpha: float = 0.0,
        max_len_factor: float = 3.0,
        batch_size: int = 32,
        pad_time_multiple: int = 128,
        auto_warmup: Optional[Sequence[int]] = None,
        data_parallel: int = 1,
        corrector: Optional["Corrector"] = None,
    ):
        self.corrector = corrector
        from attention_based_e2e_asr_dnn_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache()
        snap, payload = load_experiment(exp_folder, checkpoint, average)
        self.cfg = las_config_from_dicts(
            snap.model.configs["listener_configs"],
            snap.model.configs["speller_configs"],
        )
        self.vocab = snap.VOCAB
        self.sos_idx = snap.SOS_IDX
        self.eos_idx = snap.EOS_IDX
        self.compute_dtype = jnp.dtype(
            getattr(snap, "compute_dtype", "float32"))
        self.batch_size = batch_size
        self.pad_time_multiple = pad_time_multiple
        self.n_feats = self.cfg.listener.input_dim
        self.params = jax.tree.map(jnp.asarray, payload["params"])

        # data-parallel decode: replicate params, shard the batch dim.
        # Per-utterance decode has no cross-row dependence, so GSPMD
        # partitions the whole program with zero collectives (ICI idle).
        self._x_sharding = None
        if data_parallel > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            if batch_size % data_parallel:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"data_parallel {data_parallel}")
            devs = jax.devices()
            if len(devs) < data_parallel:
                raise ValueError(
                    f"data_parallel={data_parallel} but only "
                    f"{len(devs)} devices visible")
            mesh = Mesh(np.array(devs[:data_parallel]), ("dp",))
            self._x_sharding = NamedSharding(mesh, PartitionSpec("dp"))
            self.params = jax.device_put(
                self.params, NamedSharding(mesh, PartitionSpec()))

        if beam_size > 1:
            from attention_based_e2e_asr_dnn_tpu.decoding.beam import (
                make_las_beam_step,
            )

            self._step = make_las_beam_step(
                self.cfg, beam_size=beam_size, length_alpha=length_alpha,
                compute_dtype=self.compute_dtype,
                max_len_factor=max_len_factor,
            )
        else:
            from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
                make_las_greedy_step,
            )

            self._step = make_las_greedy_step(
                self.cfg, compute_dtype=self.compute_dtype,
                max_len_factor=max_len_factor,
            )

        # warm-bucket registry: buckets whose decode program is compiled.
        # A cold mixed-length stream used to stall on EVERY new (B, T_pad)
        # shape; with route-up, requests run on the smallest ALREADY-WARM
        # bucket instead (pad waste but no compile stall) while the
        # background warmup thread fills the configured ladder in.
        import threading

        self._warm: set = set()
        self._warm_lock = threading.Lock()
        self._ready_evt = threading.Event()
        # ready = a bucket at least as large as the ladder's LARGEST is
        # warm (only then can every request route up without a compile);
        # a small early request warming a tight bucket must NOT flip it
        self._ready_bucket = (max(pad_to_multiple(t, pad_time_multiple)
                                  for t in auto_warmup)
                              if auto_warmup else 0)
        # foreground-priority accounting: the background warmup yields while
        # requests are in flight (compiles/cache-loads and execution share
        # one dispatch channel — warming mid-burst stalls live traffic).
        self._fg_cv = threading.Condition()
        self._fg_count = 0
        self._warmup_thread: Optional[threading.Thread] = None
        self._warmup_error: Optional[BaseException] = None
        if auto_warmup:
            self._warmup_thread = threading.Thread(
                target=self._warmup_bg, args=(tuple(auto_warmup),),
                daemon=True,
            )
            self._warmup_thread.start()

    def _warmup_bg(self, time_buckets) -> None:
        """Background-warmup wrapper: a compile failure must not vanish
        into a dead daemon thread — record it and release wait_ready()
        so the caller sees the error instead of blocking forever."""
        try:
            self.warmup(time_buckets, largest_first=True,
                        yield_to_foreground=True)
        except BaseException as exc:  # noqa: BLE001 - resurfaced in wait_ready
            self._warmup_error = exc
            self._ready_evt.set()

    # ------------------------------------------------------------------
    def _put(self, x: np.ndarray, lx: np.ndarray):
        """Host batch -> device arrays (batch-sharded when data_parallel)."""
        if self._x_sharding is None:
            return jnp.asarray(x), jnp.asarray(lx)
        return (jax.device_put(x, self._x_sharding),
                jax.device_put(lx, self._x_sharding))

    def warmup(self, time_buckets: Sequence[int] = (512,),
               largest_first: bool = False,
               yield_to_foreground: bool = False) -> None:
        """Precompile the decode program for the given time buckets.

        ``largest_first`` compiles the LARGEST bucket first: once it is
        warm, every request can route up to it, so a cold stream stalls on
        at most one compile; tighter buckets then trim pad waste as they
        come warm.

        ``yield_to_foreground`` (the background auto-warmup mode) pauses
        between buckets while live requests are in flight: warm-up
        compiles and traffic share one dispatch channel, so warming
        mid-burst would stall the very requests the ladder exists to serve.
        """
        buckets = sorted({pad_to_multiple(t, self.pad_time_multiple)
                          for t in time_buckets}, reverse=largest_first)
        for t_pad in buckets:
            if yield_to_foreground and self._ready_evt.is_set():
                with self._fg_cv:
                    while self._fg_count > 0:
                        self._fg_cv.wait(timeout=5.0)
            with self._warm_lock:
                if t_pad in self._warm:
                    continue
            x = np.zeros((self.batch_size, t_pad, self.n_feats), np.float32)
            lx = np.full((self.batch_size,), t_pad, np.int32)
            np.asarray(self._step(self.params, *self._put(x, lx)))
            self._mark_warm(t_pad)

    def _mark_warm(self, t_pad: int) -> None:
        with self._warm_lock:
            self._warm.add(t_pad)
        if t_pad >= self._ready_bucket:
            self._ready_evt.set()

    def wait_ready(self, timeout: Optional[float] = None) -> bool:
        """Block until the server can absorb a cold mixed-length stream
        without a compile stall — i.e. until the FIRST (largest) bucket of
        the auto-warmup ladder is warm and every request can route up to it.

        Readiness is a *startup* cost (a deployment gates traffic on it,
        like a k8s readiness probe), not a per-request one. Returns True
        when ready. With no auto-warmup configured this returns
        immediately — the first request then pays its own compile.
        """
        if self._warmup_thread is None:
            return True
        got = self._ready_evt.wait(timeout)
        if self._warmup_error is not None:
            raise RuntimeError(
                "background auto-warmup failed") from self._warmup_error
        return got

    def wait_warm(self, timeout: Optional[float] = None) -> None:
        """Block until the background auto-warmup ladder finishes."""
        if self._warmup_thread is not None:
            self._warmup_thread.join(timeout)

    def _route_bucket(self, t_need: int) -> int:
        """Pick the execution bucket for a batch needing ``t_need`` frames:
        the tight bucket if warm (or nothing warm yet — first-compile),
        else the smallest warm bucket that fits (no compile stall)."""
        t_tight = pad_to_multiple(t_need, self.pad_time_multiple)
        with self._warm_lock:
            if t_tight in self._warm or not self._warm:
                return t_tight
            bigger = [t for t in self._warm if t >= t_tight]
            return min(bigger) if bigger else t_tight

    def transcribe(self, features: Sequence[np.ndarray]) -> List[str]:
        """Transcribe variable-length (T_i, n_feats) float feature arrays.

        Inputs are length-sorted into static-shape padded batches (tight
        buckets, original order restored) — the same policy as training.
        Batches route to already-warm buckets when the tight one would
        trigger a compile (see ``_route_bucket``).
        """
        n = len(features)
        order = sorted(range(n), key=lambda i: len(features[i]), reverse=True)
        out: List[Optional[str]] = [None] * n
        with self._fg_cv:
            self._fg_count += 1
        try:
            for start in range(0, n, self.batch_size):
                chunk = order[start : start + self.batch_size]
                rows = list(chunk)
                while len(rows) < self.batch_size:  # repeat-pad last batch
                    rows.append(rows[-1])
                t_pad = self._route_bucket(
                    max(len(features[i]) for i in chunk))
                x = np.zeros((self.batch_size, t_pad, self.n_feats),
                             np.float32)
                lx = np.zeros((self.batch_size,), np.int32)
                for r, i in enumerate(rows):
                    f = np.asarray(features[i], np.float32)[:, : self.n_feats]
                    x[r, : len(f)] = f
                    lx[r] = len(f)
                ids = np.asarray(self._step(self.params, *self._put(x, lx)))
                self._mark_warm(t_pad)
                for r, i in enumerate(chunk):
                    out[i] = ids_to_str(ids[r], self.vocab, self.sos_idx,
                                        self.eos_idx)
        finally:
            with self._fg_cv:
                self._fg_count -= 1
                self._fg_cv.notify_all()
        assert all(s is not None for s in out)
        if self.corrector is not None:
            out = self.corrector.correct(out)  # type: ignore[arg-type]
        return out  # type: ignore[return-value]


class StreamingTranscriber:
    """Request-queue front end over a Transcriber: callers ``submit()``
    single utterances from any thread and get a Future; a dispatcher thread
    groups pending requests into batches (up to ``batch_size``, waiting at
    most ``max_wait_ms`` for stragglers) and runs them through the shared
    Transcriber. This is the serving shape a production deployment needs —
    the reference has no serving story at all.
    """

    def __init__(self, transcriber: Transcriber, max_wait_ms: float = 10.0):
        import queue
        import threading

        self.t = transcriber
        self.max_wait_ms = max_wait_ms
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        # serializes submit()'s closed-check+enqueue against close()'s
        # set-closed+sentinel: an accepted request always lands BEFORE the
        # sentinel, so the worker never exits with live requests queued
        self._close_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, features: np.ndarray):
        """Enqueue one (T, n_feats) array; returns a concurrent Future.
        Raises RuntimeError after close() — the worker is gone, so the
        Future would never resolve."""
        from concurrent.futures import Future

        fut: Future = Future()
        with self._close_lock:
            if self._closed:
                raise RuntimeError("StreamingTranscriber is closed")
            self._q.put((features, fut))
        return fut

    def close(self) -> None:
        with self._close_lock:
            self._closed = True
            self._q.put(None)
        self._worker.join()

    def _run(self) -> None:
        import queue
        import time as _time

        while True:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            deadline = _time.monotonic() + self.max_wait_ms / 1e3
            while len(batch) < self.t.batch_size:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._q.put(None)  # re-signal close after this batch
                    break
                batch.append(nxt)
            # claim each future: a client that already cancel()ed (e.g.
            # after a result timeout) is dropped here, and a RUNNING future
            # can no longer be cancelled — set_result below cannot race a
            # client-side state change and kill the worker
            batch = [(f, fut) for f, fut in batch
                     if fut.set_running_or_notify_cancel()]
            if not batch:
                continue
            feats = [b[0] for b in batch]
            try:
                texts = self.t.transcribe(feats)
                for (_, fut), text in zip(batch, texts):
                    fut.set_result(text)
            except Exception as exc:
                for _, fut in batch:
                    try:
                        fut.set_exception(exc)
                    except Exception:  # pragma: no cover - already resolved
                        pass
