"""Early-exit greedy decoding.

The reference free-runs a fixed CHR_MAX_STEPS=600 loop for every eval/infer
batch (src/models.py:315,352). Typical utterances finish in ~150 characters,
so a ``lax.while_loop`` that stops once EVERY row has emitted <eos> cuts
decode time ~3-4x on real data while producing identical strings (ids after
the first <eos> are ignored by ids_to_str either way; this decoder writes
PAD there explicitly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.models.las import SpellerConfig
from attention_based_e2e_asr_dnn_tpu.ops.attention import (
    cross_attention_precompute,
    cross_attention_step,
)
from attention_based_e2e_asr_dnn_tpu.ops.lstm import lstm_cell_step
from attention_based_e2e_asr_dnn_tpu.ops.precision import matmul_precision


def greedy_decode_early_stop(
    params: dict,
    cfg: SpellerConfig,
    enc_h: jnp.ndarray,
    enc_l: jnp.ndarray,
    max_steps: int = 0,
    max_len_factor: float = 3.0,
) -> jnp.ndarray:
    """Free-running greedy decode with all-finished early exit.

    Returns (B, max_steps) int32, PAD-filled after each row's first <eos>.
    ``max_len_factor`` force-finishes a row beyond that many characters per
    encoder frame — a degenerate repeat loop otherwise burns the full
    CHR_MAX_STEPS (0 disables).
    """
    max_steps = max_steps or cfg.CHR_MAX_STEPS
    batch, enc_max_len, _ = enc_h.shape
    dtype = enc_h.dtype
    emb = params["char_emb"].astype(dtype)

    cache = cross_attention_precompute(params["attention"], enc_h, enc_l,
                                       cfg.att_heads)
    char0 = jnp.full((batch,), cfg.CHR_SOS_IDX, jnp.int32)
    h1 = jnp.broadcast_to(params["init_h1"].astype(dtype), (batch, cfg.dec_lstm_hid_dim))
    c1 = jnp.broadcast_to(params["init_c1"].astype(dtype), (batch, cfg.dec_lstm_hid_dim))
    h2 = jnp.broadcast_to(params["init_h2"].astype(dtype), (batch, cfg.dec_lstm_out_dim))
    c2 = jnp.broadcast_to(params["init_c2"].astype(dtype), (batch, cfg.dec_lstm_out_dim))
    init_query = jnp.broadcast_to(params["init_query"].astype(dtype),
                                  (batch, cfg.dec_lstm_out_dim))
    context0, _, _ = cross_attention_step(params["attention"], cache, init_query,
                                          cfg.att_heads, cfg.legacy_scale)
    out0 = jnp.full((batch, max_steps), cfg.CHR_PAD_IDX, jnp.int32)
    done0 = jnp.zeros((batch,), bool)

    def cond(state):
        t, _, _, _, _, _, _, done, _ = state
        return jnp.logical_and(t < max_steps, ~jnp.all(done))

    def body(state):
        t, char, h1, c1, h2, c2, context, done, out = state
        char_e = emb[char]
        cell_in = jnp.concatenate([char_e, context], axis=-1)
        h1n, c1n = lstm_cell_step(params["cell1"], cell_in, h1, c1)
        h2n, c2n = lstm_cell_step(params["cell2"], h1n, h2, c2)
        ctx, _, q_proj = cross_attention_step(
            params["attention"], cache, h2n, cfg.att_heads, cfg.legacy_scale
        )
        dec_out = jnp.concatenate([q_proj, ctx], axis=-1)
        logits = jnp.dot(
            dec_out, emb.T, precision=matmul_precision(dtype),
            preferred_element_type=dtype,
        ) + params["cls_b"].astype(dtype)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, jnp.int32(cfg.CHR_PAD_IDX), nxt)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, t))
        done = done | (nxt == cfg.CHR_PAD_IDX)
        if max_len_factor > 0:
            done = done | (jnp.float32(t + 1)
                           >= max_len_factor * enc_l.astype(jnp.float32))
        return (t + 1, nxt, h1n, c1n, h2n, c2n, ctx, done, out)

    state = (jnp.int32(0), char0, h1, c1, h2, c2, context0, done0, out0)
    final = jax.lax.while_loop(cond, body, state)
    return final[-1]


def greedy_decode_anchored(
    params: dict,
    cfg: SpellerConfig,
    enc_h: jnp.ndarray,
    enc_l: jnp.ndarray,
    anchor_ids: jnp.ndarray,
    anchor_len: jnp.ndarray,
    max_steps: int = 0,
    max_len_factor: float = 3.0,
) -> jnp.ndarray:
    """Prefix-anchored greedy decode: steps t < anchor_len[b] emit (and feed
    back) ``anchor_ids[b, t]`` verbatim; free-running argmax afterwards.

    The mid-regime Rewriter fix (VERDICT r3 #7): a seq2seq corrector
    free-running 130-190 characters drifts — its own early mistakes poison
    the rest of the rewrite. Anchoring the decode on the prefix of the INPUT
    prediction that the forced scorer marks confident keeps the attention
    aligned deep into the string and lets the corrector spend its freedom
    only where the input is suspect. ``anchor_len == 0`` reproduces the
    plain free-running decode exactly.

    ``anchor_ids`` (B, A) int32 raw char ids (no SOS); ``anchor_len`` (B,)
    int32 with ``anchor_len <= A``. Returns (B, max_steps) int32, PAD-filled
    after each row's first <eos>, same contract as
    :func:`greedy_decode_early_stop`.
    """
    max_steps = max_steps or cfg.CHR_MAX_STEPS
    batch, enc_max_len, _ = enc_h.shape
    dtype = enc_h.dtype
    emb = params["char_emb"].astype(dtype)

    # pad the anchor to max_steps so the loop can dynamic-slice column t
    a_wide = jnp.full((batch, max_steps), cfg.CHR_PAD_IDX, jnp.int32)
    a_wide = jax.lax.dynamic_update_slice(
        a_wide, anchor_ids[:, :max_steps].astype(jnp.int32), (0, 0))
    anchor_len = jnp.minimum(anchor_len.astype(jnp.int32), max_steps)

    cache = cross_attention_precompute(params["attention"], enc_h, enc_l,
                                       cfg.att_heads)
    char0 = jnp.full((batch,), cfg.CHR_SOS_IDX, jnp.int32)
    h1 = jnp.broadcast_to(params["init_h1"].astype(dtype), (batch, cfg.dec_lstm_hid_dim))
    c1 = jnp.broadcast_to(params["init_c1"].astype(dtype), (batch, cfg.dec_lstm_hid_dim))
    h2 = jnp.broadcast_to(params["init_h2"].astype(dtype), (batch, cfg.dec_lstm_out_dim))
    c2 = jnp.broadcast_to(params["init_c2"].astype(dtype), (batch, cfg.dec_lstm_out_dim))
    init_query = jnp.broadcast_to(params["init_query"].astype(dtype),
                                  (batch, cfg.dec_lstm_out_dim))
    context0, _, _ = cross_attention_step(params["attention"], cache, init_query,
                                          cfg.att_heads, cfg.legacy_scale)
    out0 = jnp.full((batch, max_steps), cfg.CHR_PAD_IDX, jnp.int32)
    done0 = jnp.zeros((batch,), bool)

    def cond(state):
        t, _, _, _, _, _, _, done, _ = state
        return jnp.logical_and(t < max_steps, ~jnp.all(done))

    def body(state):
        t, char, h1, c1, h2, c2, context, done, out = state
        char_e = emb[char]
        cell_in = jnp.concatenate([char_e, context], axis=-1)
        h1n, c1n = lstm_cell_step(params["cell1"], cell_in, h1, c1)
        h2n, c2n = lstm_cell_step(params["cell2"], h1n, h2, c2)
        ctx, _, q_proj = cross_attention_step(
            params["attention"], cache, h2n, cfg.att_heads, cfg.legacy_scale
        )
        dec_out = jnp.concatenate([q_proj, ctx], axis=-1)
        logits = jnp.dot(
            dec_out, emb.T, precision=matmul_precision(dtype),
            preferred_element_type=dtype,
        ) + params["cls_b"].astype(dtype)
        free = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        forced = jax.lax.dynamic_slice(a_wide, (0, t), (batch, 1))[:, 0]
        nxt = jnp.where(t < anchor_len, forced, free)
        nxt = jnp.where(done, jnp.int32(cfg.CHR_PAD_IDX), nxt)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, t))
        done = done | (nxt == cfg.CHR_PAD_IDX)
        if max_len_factor > 0:
            # the length cap is suppressed while the decode is still FORCED
            # along the anchor: truncating mid-anchor would silently break
            # the "forced along the confident prefix" contract for rows
            # whose encoder length is pathologically short (ADVICE r4)
            done = done | ((jnp.float32(t + 1)
                            >= max_len_factor * enc_l.astype(jnp.float32))
                           & (t >= anchor_len))
        return (t + 1, nxt, h1n, c1n, h2n, c2n, ctx, done, out)

    state = (jnp.int32(0), char0, h1, c1, h2, c2, context0, done0, out0)
    final = jax.lax.while_loop(cond, body, state)
    return final[-1]


def make_rewriter_anchored_step(lm_cfg, compute_dtype=jnp.float32,
                                max_steps: int = 0,
                                max_len_factor: float = 3.0):
    """Anchored rewrite step: (params, x, lx, anchor_ids, anchor_len) -> ids.

    ONE jitted function serves every anchor policy (full rewrite at
    anchor_len=0, confidence-driven splits, fixed fractions) — the anchor is
    data, not a shape, so candidate sweeps reuse the compile."""
    from attention_based_e2e_asr_dnn_tpu.ops.lstm import locked_lstm_stack_apply

    sp_cfg = lm_cfg.speller_config()

    @jax.jit
    def step(params, x, lx, anchor_ids, anchor_len):
        emb = params["decoder"]["char_emb"].astype(compute_dtype)
        enc_h, enc_l = locked_lstm_stack_apply(
            params["encoder"], None, emb[x], lx,
            init_dropout=0.0, mid_dropout=0.0, bidirectional=True, train=False,
            impl=lm_cfg.lstm_impl,
        )
        return greedy_decode_anchored(params["decoder"], sp_cfg, enc_h, enc_l,
                                      anchor_ids, anchor_len, max_steps,
                                      max_len_factor)

    return step


def make_rewriter_greedy_step(lm_cfg, compute_dtype=jnp.float32,
                              max_steps: int = 0,
                              max_len_factor: float = 3.0):
    """Early-stop greedy decode for the Rewriter: (params, x_ids, lx) -> ids.

    The Rewriter's decoder IS the speller machinery (models/rewriter.py), so
    the same early-exit scan runs over its BiLSTM-encoded prediction strings
    (vs. the fixed CHR_MAX_STEPS free-run the plain infer step uses)."""
    from attention_based_e2e_asr_dnn_tpu.ops.lstm import locked_lstm_stack_apply

    sp_cfg = lm_cfg.speller_config()

    @jax.jit
    def step(params, x, lx):
        emb = params["decoder"]["char_emb"].astype(compute_dtype)
        enc_h, enc_l = locked_lstm_stack_apply(
            params["encoder"], None, emb[x], lx,
            init_dropout=0.0, mid_dropout=0.0, bidirectional=True, train=False,
            impl=lm_cfg.lstm_impl,
        )
        return greedy_decode_early_stop(params["decoder"], sp_cfg,
                                        enc_h, enc_l, max_steps,
                                        max_len_factor)

    return step


def make_las_greedy_step(las_cfg, compute_dtype=jnp.float32, max_steps: int = 0,
                         max_len_factor: float = 3.0):
    """Early-stop greedy decode with the (params, x, lx) -> ids interface."""
    from attention_based_e2e_asr_dnn_tpu.models.las import listener_apply

    @jax.jit
    def step(params, x, lx):
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(compute_dtype)
        enc_h, enc_l = listener_apply(params["listener"], las_cfg.listener,
                                      None, x, lx, train=False)
        return greedy_decode_early_stop(params["speller"], las_cfg.speller,
                                        enc_h, enc_l, max_steps,
                                        max_len_factor)

    return step
