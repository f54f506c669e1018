"""Forced-decode sequence scoring + confidence-gated correction.

The Rewriter chain's missing piece at long-form scale (RESULTS.md round 2):
the corrector regressed LD because it *always* replaced its input with a
free-running rewrite. The gate here makes the chain a strictly-no-worse
estimator **under the model's own likelihood**: a correction only replaces
the input prediction when the model scores the correction at least
``margin`` avg-log-prob-per-char higher than re-generating the input
verbatim. (Capability target: the reference *claims* auto-correction,
reference: README.md:51-53, src/lmtrain.py:98-253 — its lminfer never ran.)

``speller_forced_logprob`` is a dedicated teacher-forced decode: the
speller's training scan draws per-step coins and never forces when
``rng=None`` (models/las.py:326-332), so scoring a *candidate* sequence
requires this always-forced variant (no coins, no dropout, deterministic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.ops.attention import (
    cross_attention_precompute,
    cross_attention_step,
)
from attention_based_e2e_asr_dnn_tpu.ops.lstm import lstm_cell_step
from attention_based_e2e_asr_dnn_tpu.ops.precision import matmul_precision


def speller_forced_token_logprobs(params: dict, cfg, enc_h, enc_l, cand):
    """Per-position log p(cand[t] | cand[<t], enc) under an always-forced
    decode — the (B, L) token-level view behind
    :func:`speller_forced_logprob`. Position 0 conditions on SOS (training
    layout); no length masking (callers mask with their own ``lc``)."""
    batch, steps = cand.shape
    dtype = enc_h.dtype
    emb = params["char_emb"].astype(dtype)

    cache = cross_attention_precompute(params["attention"], enc_h, enc_l,
                                       cfg.att_heads)
    # forced inputs: SOS at t=0, then cand[t-1] (training's gold_prev shift)
    prev = jnp.concatenate(
        [jnp.full((batch, 1), cfg.CHR_SOS_IDX, cand.dtype), cand[:, :-1]],
        axis=1,
    )

    h1 = jnp.broadcast_to(params["init_h1"].astype(dtype),
                          (batch, cfg.dec_lstm_hid_dim))
    c1 = jnp.broadcast_to(params["init_c1"].astype(dtype),
                          (batch, cfg.dec_lstm_hid_dim))
    h2 = jnp.broadcast_to(params["init_h2"].astype(dtype),
                          (batch, cfg.dec_lstm_out_dim))
    c2 = jnp.broadcast_to(params["init_c2"].astype(dtype),
                          (batch, cfg.dec_lstm_out_dim))
    init_query = jnp.broadcast_to(params["init_query"].astype(dtype),
                                  (batch, cfg.dec_lstm_out_dim))
    context0, _, _ = cross_attention_step(
        params["attention"], cache, init_query, cfg.att_heads,
        cfg.legacy_scale,
    )

    def step(carry, prev_t):
        h1, c1, h2, c2, context = carry
        cell_in = jnp.concatenate([emb[prev_t], context], axis=-1)
        h1, c1 = lstm_cell_step(params["cell1"], cell_in, h1, c1)
        h2, c2 = lstm_cell_step(params["cell2"], h1, h2, c2)
        context, _, q_proj = cross_attention_step(
            params["attention"], cache, h2, cfg.att_heads, cfg.legacy_scale
        )
        dec_out = jnp.concatenate([q_proj, context], axis=-1)
        logits = jnp.dot(
            dec_out, emb.T, precision=matmul_precision(dtype),
            preferred_element_type=dtype,
        ) + params["cls_b"].astype(dtype)
        return (h1, c1, h2, c2, context), logits

    _, logits_t = jax.lax.scan(
        step, (h1, c1, h2, c2, context0), jnp.swapaxes(prev, 0, 1)
    )
    logits = jnp.swapaxes(logits_t, 0, 1)                      # (B, L, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, cand[..., None], axis=-1)[..., 0]


def speller_forced_logprob(params: dict, cfg, enc_h, enc_l, cand, lc):
    """Avg log p(cand | enc) per char under an always-teacher-forced decode.

    ``cand`` (B, L) int32 in the training label layout ([SOS, chars..., EOS,
    pad...]); ``lc`` (B,) counts the real positions (incl. SOS and EOS).
    Returns (B,) float32: mean over the first ``lc`` positions of the
    log-prob the model assigns to each candidate token given the *candidate*
    prefix (position 0 conditions on the SOS start token, like training).
    """
    steps = cand.shape[1]
    tok_lp = speller_forced_token_logprobs(params, cfg, enc_h, enc_l, cand)
    mask = (jnp.arange(steps)[None, :] < lc[:, None]).astype(jnp.float32)
    return (tok_lp * mask).sum(axis=1) / jnp.maximum(lc, 1).astype(jnp.float32)


def make_rewriter_scorer(lm_cfg, compute_dtype=jnp.float32):
    """Jitted ``(params, x, lx, cand, lc) -> (B,) avg log-prob/char``.

    Encoder pass over the INPUT ids (shared with decoding), forced decode
    over the CANDIDATE — so score(input-as-candidate) vs score(correction)
    are directly comparable likelihoods of the two outputs given the same
    input.
    """
    from attention_based_e2e_asr_dnn_tpu.ops.lstm import (
        locked_lstm_stack_apply,
    )

    sp_cfg = lm_cfg.speller_config()

    @jax.jit
    def score(params, x, lx, cand, lc):
        emb = params["decoder"]["char_emb"].astype(compute_dtype)
        enc_h, enc_l = locked_lstm_stack_apply(
            params["encoder"], None, emb[x], lx,
            init_dropout=0.0, mid_dropout=0.0, bidirectional=True,
            train=False, impl=lm_cfg.lstm_impl,
        )
        return speller_forced_logprob(params["decoder"], sp_cfg, enc_h,
                                      enc_l, cand, lc)

    return score


def make_rewriter_token_scorer(lm_cfg, compute_dtype=jnp.float32):
    """Jitted ``(params, x, lx, cand) -> (B, L) per-token log-probs``.

    Scoring the INPUT as its own candidate (``cand = x``) yields the
    corrector's per-character confidence in the input prediction — the
    signal that picks the anchored-rewrite split point (VERDICT r3 #7:
    "restrict rewrites to low-confidence spans scored by the forced
    decoder")."""
    from attention_based_e2e_asr_dnn_tpu.ops.lstm import (
        locked_lstm_stack_apply,
    )

    sp_cfg = lm_cfg.speller_config()

    @jax.jit
    def score_tokens(params, x, lx, cand):
        emb = params["decoder"]["char_emb"].astype(compute_dtype)
        enc_h, enc_l = locked_lstm_stack_apply(
            params["encoder"], None, emb[x], lx,
            init_dropout=0.0, mid_dropout=0.0, bidirectional=True,
            train=False, impl=lm_cfg.lstm_impl,
        )
        return speller_forced_token_logprobs(params["decoder"], sp_cfg,
                                             enc_h, enc_l, cand)

    return score_tokens


def span_anchor_lengths(token_scorer, params, x, lx, conf_tau, fracs):
    """Anchor-length policies for the span-rewrite candidate set.

    Confidence policy ("conf"): score the INPUT as its own forced candidate
    and anchor before the first low-confidence REGION — the per-token
    log-probs smoothed with a W=8 forward moving mean (single bad characters
    are everywhere in a mid-regime input; an isolated dip is not a span
    boundary), first smoothed position under ``log(conf_tau)``, backed off 2
    chars. Fraction policies ("f25"…): fixed fractions of each row's char
    count — measured at the mid-regime operating point, errors concentrate
    in the tail (LAS attention degrades with decode depth), so large
    anchors are strong candidates. Returns [(name, (B,) int32 anchor char
    counts)]; 0 = full rewrite."""
    import numpy as np

    tok_lp = np.asarray(token_scorer(params, x, lx, x))      # (B, W)
    batch, _width = tok_lp.shape
    lx = np.asarray(lx)
    n_chars = np.maximum(lx - 2, 0)                          # minus SOS/EOS
    # candidate position j >= 1 scores char j-1
    char_lp = tok_lp[:, 1:]
    win = 8
    n_cols = char_lp.shape[1]
    char_pos = np.arange(n_cols)[None, :]
    # forward window: smooth[:, i] = mean(char_lp[:, i : i+win]) — a dip
    # must be a REGION starting at i, not a single character. The window is
    # clamped PER ROW to n_chars: positions past the last real char score
    # p(EOS | EOS...) continuations the loss mask never trained, and letting
    # that garbage into the tail windows cut confident endings short.
    csum = np.concatenate(
        [np.zeros((batch, 1)),
         np.cumsum(np.where(char_pos < n_chars[:, None], char_lp, 0.0),
                   axis=1)], axis=1)
    lo = np.arange(n_cols)
    hi = np.minimum(lo[None, :] + win, n_chars[:, None])     # (B, n_cols)
    hi = np.maximum(hi, lo[None, :])                 # empty window past end
    smooth = ((np.take_along_axis(csum, hi, axis=1) - csum[:, lo])
              / np.maximum(hi - lo[None, :], 1))
    low = smooth < np.log(conf_tau)
    low &= char_pos < n_chars[:, None]
    first_bad = np.where(low.any(1), np.maximum(low.argmax(1) - 2, 0),
                         n_chars)
    policies = [("conf", np.minimum(first_bad, n_chars).astype(np.int32))]
    for f in fracs:
        policies.append((f"f{int(round(float(f) * 100)):02d}",
                         (n_chars * float(f)).astype(np.int32)))
    return policies


def span_candidate_families(step_ids, scorer, token_scorer, anchored_step,
                            params, x, lx, conf_tau, fracs, eos_idx: int,
                            sos_idx: int, pad_multiple: int = 32,
                            score_width: int = 0):
    """Every rewrite-candidate family for one batch, scored in ONE stacked
    dispatch: ``"free"`` (the full rewrite passed in as ``step_ids``), the
    prefix-anchored families from :func:`span_anchor_lengths` (``"conf"``,
    ``"fNN"``…), and ``"best"`` (the per-utterance likelihood argmax over
    all of them).

    Returns ``{name: (ids (B, W) int32 training layout, margins (B,))}``
    where ``margins = score(candidate) - score(input)`` under the forced
    scorer — the same quantity the never-worse gate thresholds. Shared by
    lminfer (which FITS the deployed (family, margin) on labeled pairs) and
    serving.Corrector (which applies the fitted policy online).

    ``score_width`` (optional): pad every candidate layout to at least this
    many columns. The stacked scorer's candidate operand otherwise takes its
    width from the longest rewrite in the batch — a data-dependent shape
    that retraces/recompiles the jitted scorer across request batches; a
    fixed width (e.g. round-to-32 of CHR_MAX_STEPS+2, matching the exported
    artifact's score_width) compiles it once (ADVICE r4)."""
    import numpy as np

    x = np.asarray(x)
    lx = np.asarray(lx)
    batch = x.shape[0]
    anchor_ids = x[:, 1:].astype(np.int32)
    cand = [("free", np.asarray(step_ids))]
    for name, alen in span_anchor_lengths(token_scorer, params, x, lx,
                                          conf_tau, fracs):
        cand.append((name, np.asarray(
            anchored_step(params, x, lx, anchor_ids, alen))))

    min_width = max(x.shape[1], int(score_width))
    layouts = [candidates_to_layout(c, eos_idx, sos_idx, min_width,
                                    pad_multiple) for _, c in cand]
    layouts, c_scores, in_scores = _score_stacked(scorer, params, x, lx,
                                                  layouts, eos_idx)

    fams = {name: (layouts[i][0], c_scores[i] - in_scores)
            for i, (name, _) in enumerate(cand)}
    best = np.argmax(c_scores, axis=0)
    rows = np.arange(batch)
    fams["best"] = (np.stack([layouts[best[b]][0][b] for b in rows]),
                    c_scores[best, rows] - in_scores)
    return fams


def _score_stacked(scorer, params, x, lx, layouts, eos_idx: int):
    """Score N candidate layouts + the input itself in ONE stacked scorer
    dispatch (the relay is dispatch-floor-bound, so every gated batch pays
    for per-candidate dispatches directly).

    ``layouts``: list of (cand (B, W_i), lc (B,)) training-layout pairs.
    Returns ``(layouts_wide, c_scores (N, B), in_scores (B,))`` where every
    returned layout is padded to the common width so per-row gathers
    ("best") and per-family returns stack cleanly. The single shared
    implementation behind :func:`span_candidate_families` and
    :func:`select_among_candidates` — the gate's candidate layout cannot
    drift between them."""
    import numpy as np

    x = np.asarray(x)
    lx = np.asarray(lx)
    batch = x.shape[0]
    n_c = len(layouts)
    width = max(c.shape[1] for c, _ in layouts)
    layouts = [
        (np.pad(c, ((0, 0), (0, width - c.shape[1])),
                constant_values=eos_idx) if c.shape[1] < width else c, lc)
        for c, lc in layouts
    ]
    stacked = np.full(((n_c + 1) * batch, width), eos_idx, np.int32)
    lens = np.zeros(((n_c + 1) * batch,), np.int32)
    for i, (c, lc) in enumerate(layouts):
        stacked[i * batch:(i + 1) * batch] = c
        lens[i * batch:(i + 1) * batch] = lc
    stacked[n_c * batch:, : x.shape[1]] = x          # the input as candidate
    lens[n_c * batch:] = lx
    scores = np.asarray(scorer(
        params, np.concatenate([x] * (n_c + 1), 0),
        np.concatenate([lx] * (n_c + 1), 0), stacked, lens))
    return (layouts, scores[: n_c * batch].reshape(n_c, batch),
            scores[n_c * batch:])


def candidates_to_layout(cand_ids, eos_idx: int, sos_idx: int,
                         min_width: int, pad_multiple: int = 32):
    """Raw decoder output rows (chars then EOS/PAD tail) -> training label
    layout ([SOS, chars..., EOS, EOS-pad...]). Returns (cand (B, W) int32,
    lc (B,) int32); W covers ``min_width`` rounded up to ``pad_multiple``."""
    import numpy as np

    cand_ids = np.asarray(cand_ids)
    batch = cand_ids.shape[0]
    rows, lc = [], np.zeros((batch,), np.int32)
    for b in range(batch):
        row = cand_ids[b]
        stop = np.argmax(row == eos_idx) if (row == eos_idx).any() else len(row)
        trimmed = [t for t in row[:stop].tolist() if t != sos_idx]
        rows.append([sos_idx] + trimmed + [eos_idx])
        lc[b] = len(rows[-1])
    width = max(int(lc.max()), int(min_width))
    width = -(-width // pad_multiple) * pad_multiple
    cand = np.full((batch, width), eos_idx, np.int32)
    for b, row in enumerate(rows):
        cand[b, : len(row)] = row
    return cand, lc


def select_among_candidates(scorer, params, x, lx, cand_ids_list,
                            eos_idx: int, sos_idx: int,
                            pad_multiple: int = 32):
    """Score N rewrite candidates + the input in ONE stacked dispatch and
    pick, per utterance, the candidate the model likes best.

    ``cand_ids_list``: list of (B, steps_i) raw decoder outputs (e.g. the
    full rewrite plus prefix-anchored rewrites at several split policies).
    Returns (best_ids (B, W) int32 in training layout, best_lc (B,),
    margins (B,) = score(best) - score(input)). The never-worse gate then
    applies its (possibly fitted) threshold to ``margins`` exactly as it
    does for the single-candidate chain — candidate sets only widen the
    search, the safety story is unchanged.
    """
    import numpy as np

    x = np.asarray(x)
    lx = np.asarray(lx)
    batch = x.shape[0]

    layouts = [candidates_to_layout(c, eos_idx, sos_idx, x.shape[1],
                                    pad_multiple) for c in cand_ids_list]
    layouts, cand_scores, input_scores = _score_stacked(
        scorer, params, x, lx, layouts, eos_idx)

    best = np.argmax(cand_scores, axis=0)                      # (B,)
    rows = np.arange(batch)
    margins = cand_scores[best, rows] - input_scores
    best_ids = np.stack([layouts[best[b]][0][b] for b in rows])
    best_lc = np.array([layouts[best[b]][1][b] for b in rows], np.int32)
    return best_ids, best_lc, margins


def fit_margin(margins, ld_inputs, ld_corrected):
    """Choose the gate threshold that maximizes total LD improvement on a
    LABELED calibration set: keep a correction iff its score margin exceeds
    the fitted threshold.

    ``margins[i]`` = score(correction_i) - score(input_i);
    ``ld_*[i]`` = Levenshtein distance of each candidate vs gold. Returns
    the threshold (float; ``inf`` when no threshold helps — gate everything
    off). The fitted chain is never-worse ON THE CALIBRATION SET by
    construction; a weak corrector whose likelihood overrates its own
    rewrites (seen at garbage-milestone operating points) gets margined out
    instead of regressing the output.
    """
    import numpy as np

    margins = np.asarray(margins, np.float64)
    if margins.size == 0:       # no calibration pairs -> gate everything off
        return float("inf")     # (never-worse holds trivially)
    gains = np.asarray(ld_inputs, np.float64) - np.asarray(ld_corrected,
                                                           np.float64)
    order = np.argsort(-margins)            # descending margin
    sorted_gains = gains[order]
    kept_margins = margins[order]
    cum = np.cumsum(sorted_gains)           # total gain keeping top-k
    # a strict `m > threshold` gate can only cut between DISTINCT margin
    # values — restrict the argmax to cut points that a threshold can
    # actually realize (tied margins are kept or dropped together)
    achievable = np.ones(margins.size, bool)
    achievable[:-1] = kept_margins[:-1] > kept_margins[1:]
    cand = np.flatnonzero(achievable)
    best_k = int(cand[np.argmax(cum[cand])])
    if cum[best_k] <= 0:
        return float("inf")
    # threshold strictly below the k-th kept margin (and above the next)
    lo = kept_margins[best_k + 1] if best_k + 1 < len(kept_margins) else (
        kept_margins[best_k] - 1.0)
    return float((kept_margins[best_k] + lo) / 2.0)


def gate_corrections(scorer, params, x, lx, corrected_ids, eos_idx: int,
                     sos_idx: int, margin: float = 0.0,
                     pad_multiple: int = 32):
    """Keep a correction only when the model scores it ``margin`` avg
    log-prob/char above regenerating the input — never-worse under the
    model's own likelihood.

    ``x``/``lx``: the batched input prediction ids ([SOS..EOS] layout, padded
    with EOS). ``corrected_ids`` (B, steps): raw decoder argmax/beam output
    (chars then EOS, no leading SOS). Returns (use_correction (B,) bool,
    score_corr, score_input).
    """
    import numpy as np

    x = np.asarray(x)
    lx = np.asarray(lx)
    batch = x.shape[0]

    # corrected candidate in the training label layout: SOS + trimmed + EOS
    cand, lc = candidates_to_layout(corrected_ids, eos_idx, sos_idx,
                                    x.shape[1], pad_multiple)
    width = cand.shape[1]
    x_wide = np.full((batch, width), eos_idx, np.int32)
    x_wide[:, : x.shape[1]] = x

    # ONE stacked dispatch scores both candidates (rows 0..B-1 = the
    # correction, rows B..2B-1 = regenerating the input) — the encoder
    # work is the same either way, but the relay is dispatch-floor-bound,
    # so halving per-batch dispatches matters on every gated batch
    scores = np.asarray(scorer(
        params,
        np.concatenate([x, x], 0), np.concatenate([lx, lx], 0),
        np.concatenate([cand, x_wide], 0), np.concatenate([lc, lx], 0)))
    score_corr, score_input = scores[:batch], scores[batch:]
    use = score_corr > score_input + margin
    return use, score_corr, score_input
