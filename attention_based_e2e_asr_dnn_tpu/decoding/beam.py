"""Static-shape beam search over the scan-based attend-spell decoder.

The reference left beam search as an empty ``pass`` branch
(src/models.py:486-490); this is the real implementation required by
BASELINE.json config #4, built TPU-first:

  * static beam width K, one ``lax.scan`` over decode steps;
  * hypotheses flattened to a (B*K) super-batch so the SAME attention cache /
    LSTM cell code paths as greedy decode run unmodified (the encoder cache is
    repeated K times once, up front);
  * finished hypotheses are masked: they can only extend with <eos> at zero
    cost, so scores freeze at the first <eos>;
  * backpointers + emitted tokens are scan outputs; the winning sequence is
    reconstructed by a host-side backtrace (once per utterance batch, cold
    path);
  * optional length normalization (score / len**alpha) at selection time.

Works for any model whose decoder is ``speller_apply``-shaped: the step
function is built from the speller params/config directly.
"""

from __future__ import annotations




import jax
import jax.numpy as jnp
import numpy as np

from attention_based_e2e_asr_dnn_tpu.decoding.select import (  # noqa: F401
    backtrace,
    backtrace_all,
    select_best_sequences,
)

from attention_based_e2e_asr_dnn_tpu.models.las import SpellerConfig
from attention_based_e2e_asr_dnn_tpu.ops.attention import (
    cross_attention_precompute,
    cross_attention_step,
)
from attention_based_e2e_asr_dnn_tpu.ops.lstm import lstm_cell_step
from attention_based_e2e_asr_dnn_tpu.ops.precision import matmul_precision

NEG_INF = -1e30


import functools


@functools.partial(jax.jit,
                   static_argnames=("cfg", "beam_size", "max_steps",
                                    "exact_prune", "max_len_factor"))
def _beam_decode_scan(
    params: dict,
    cfg: SpellerConfig,
    enc_h: jnp.ndarray,
    enc_l: jnp.ndarray,
    beam_size: int,
    max_steps: int,
    exact_prune: bool = False,
    max_len_factor: float = 3.0,
):
    """Run the beam scan. Returns (tokens, parents, scores, finished):
    tokens/parents (steps, B, K) int32, scores (B, K) float32."""
    batch, _, _ = enc_h.shape
    K = beam_size
    dtype = enc_h.dtype
    vocab = cfg.dec_vocab_size
    emb = params["char_emb"].astype(dtype)

    # Project K/V ONCE per utterance, then repeat the cache K times to form
    # the (B*K) super-batch (projecting the repeated encodings would do K x
    # the key/value matmul FLOPs for identical results).
    cache1 = cross_attention_precompute(params["attention"], enc_h, enc_l,
                                        cfg.att_heads)
    cache = type(cache1)(
        keys=jnp.repeat(cache1.keys, K, axis=0),
        values=jnp.repeat(cache1.values, K, axis=0),
        mask=jnp.repeat(cache1.mask, K, axis=0),
    )

    BK = batch * K
    char = jnp.full((BK,), cfg.CHR_SOS_IDX, jnp.int32)
    h1 = jnp.broadcast_to(params["init_h1"].astype(dtype), (BK, cfg.dec_lstm_hid_dim))
    c1 = jnp.broadcast_to(params["init_c1"].astype(dtype), (BK, cfg.dec_lstm_hid_dim))
    h2 = jnp.broadcast_to(params["init_h2"].astype(dtype), (BK, cfg.dec_lstm_out_dim))
    c2 = jnp.broadcast_to(params["init_c2"].astype(dtype), (BK, cfg.dec_lstm_out_dim))
    init_query = jnp.broadcast_to(params["init_query"].astype(dtype),
                                  (BK, cfg.dec_lstm_out_dim))
    context, _, _ = cross_attention_step(params["attention"], cache, init_query,
                                         cfg.att_heads, cfg.legacy_scale)

    # beam 0 live, others dead (so step 0 doesn't pick K copies of one token)
    scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32), (batch,))
    scores = scores.reshape(batch, K)
    finished = jnp.zeros((batch, K), bool)

    def gather_beams(x, parent):
        """x: (B*K, ...) -> select parent beams; parent: (B, K) in [0, K)."""
        xk = x.reshape(batch, K, *x.shape[1:])
        return jnp.take_along_axis(
            xk, parent.reshape(batch, K, *([1] * (x.ndim - 1))), axis=1
        ).reshape(BK, *x.shape[1:])

    # per-row length-aware cap: a transcript cannot plausibly exceed
    # ~max_len_factor characters per encoder frame (degenerate repeat loops
    # otherwise burn the full CHR_MAX_STEPS with near-zero score decay)
    row_cap = (jnp.asarray(max_len_factor * enc_l, jnp.float32)
               if max_len_factor > 0 else
               jnp.full((batch,), float(max_steps), jnp.float32))

    def step(t, carry):
        char, h1, c1, h2, c2, context, scores, finished = carry

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
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # (BK, V)
        logp = logp.reshape(batch, K, vocab)

        # finished hyps: only <eos> continuation, zero cost
        eos_only = jnp.full((vocab,), NEG_INF).at[cfg.CHR_PAD_IDX].set(0.0)
        logp = jnp.where(finished[:, :, None], eos_only[None, None, :], logp)

        total = scores[:, :, None] + logp                   # (B, K, V)
        flat = total.reshape(batch, K * vocab)
        new_scores, idx = jax.lax.top_k(flat, K)            # (B, K)
        parent = (idx // vocab).astype(jnp.int32)
        token = (idx % vocab).astype(jnp.int32)

        h1n = gather_beams(h1n, parent)
        c1n = gather_beams(c1n, parent)
        h2n = gather_beams(h2n, parent)
        c2n = gather_beams(c2n, parent)
        ctx = gather_beams(ctx, parent)
        fin_parent = jnp.take_along_axis(finished, parent, axis=1)
        finished_new = fin_parent | (token == cfg.CHR_PAD_IDX)
        finished_new = finished_new | (jnp.float32(t + 1) >= row_cap[:, None])
        if exact_prune:
            # EXACT dominance pruning (only valid without length norm):
            # log-prob scores are monotonically non-increasing, so a live
            # hypothesis strictly below a finished one can never win — freeze
            # it so the all-finished early exit fires as soon as the outcome
            # is decided. Does not change the returned argmax.
            best_fin = jnp.max(
                jnp.where(finished_new, new_scores, NEG_INF), axis=1,
                keepdims=True,
            )
            finished_new = finished_new | (new_scores < best_fin)

        carry = (token.reshape(BK), h1n, c1n, h2n, c2n, ctx, new_scores,
                 finished_new)
        return carry, (token, parent, finished_new)

    # all-finished early exit (same pattern as decoding/greedy.py): typical
    # utterances finish in ~150 chars, so a while_loop beats the fixed
    # CHR_MAX_STEPS scan 3-4x. Unwritten steps keep PAD tokens and IDENTITY
    # parents, so the backtrace walks through them unchanged — identical
    # strings and scores to the full-length scan.
    tokens0 = jnp.full((max_steps, batch, K), cfg.CHR_PAD_IDX, jnp.int32)
    parents0 = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32), (max_steps, batch, K)
    )
    fin0 = jnp.ones((max_steps, batch, K), bool)

    def cond(state):
        t, carry, _, _, _ = state
        finished = carry[-1]
        return jnp.logical_and(t < max_steps, ~jnp.all(finished))

    def body(state):
        t, carry, tokens, parents, fin = state
        carry, (token, parent, finished_new) = step(t, carry)
        tokens = jax.lax.dynamic_update_slice(tokens, token[None], (t, 0, 0))
        parents = jax.lax.dynamic_update_slice(parents, parent[None], (t, 0, 0))
        fin = jax.lax.dynamic_update_slice(fin, finished_new[None], (t, 0, 0))
        return (t + 1, carry, tokens, parents, fin)

    carry0 = (char, h1, c1, h2, c2, context, scores, finished)
    _, final_carry, tokens, parents, fin = jax.lax.while_loop(
        cond, body, (jnp.int32(0), carry0, tokens0, parents0, fin0)
    )
    final_scores, final_finished = final_carry[-2], final_carry[-1]
    return tokens, parents, fin, final_scores, final_finished


# backtrace/backtrace_all live in decoding/select.py (numpy-only, shared
# with export.ExportedDecoder); re-exported here for existing callers.


def beam_search(
    params: dict,
    cfg: SpellerConfig,
    enc_h: jnp.ndarray,
    enc_l: jnp.ndarray,
    beam_size: int = 8,
    max_steps: int = 0,
    length_alpha: float = 0.0,
    max_len_factor: float = 3.0,
) -> np.ndarray:
    """Full beam search over precomputed encodings.

    Returns (B, max_steps) int32 best sequences (EOS-padded after the first
    <eos>). Selection: highest score, length-normalized by
    ``(len_until_eos)**length_alpha`` when alpha > 0. ``max_len_factor``
    force-finishes hypotheses beyond that many characters per encoder frame
    (0 disables).
    """
    max_steps = max_steps or cfg.CHR_MAX_STEPS
    tokens, parents, fin, final_scores, _ = _beam_decode_scan(
        params, cfg, enc_h, enc_l, beam_size, max_steps,
        exact_prune=(length_alpha == 0.0), max_len_factor=max_len_factor,
    )
    return select_best_sequences(tokens, parents, final_scores,
                                 cfg.CHR_PAD_IDX, length_alpha, max_steps)


def make_las_beam_step(las_cfg, beam_size: int, length_alpha: float = 0.0,
                       compute_dtype=jnp.float32, max_steps: int = 0,
                       max_len_factor: float = 3.0):
    """Beam decode with the greedy-step interface: (params, x, lx) -> ids.

    Runs the Listener once (jitted) then the beam scan (jitted) over its
    encodings. ``las_cfg`` is an LASConfig.
    """
    from attention_based_e2e_asr_dnn_tpu.models.las import listener_apply

    steps = max_steps or las_cfg.speller.CHR_MAX_STEPS

    @jax.jit
    def encode(params, x, lx):
        return listener_apply(params["listener"], las_cfg.listener, None,
                              x.astype(compute_dtype), lx, train=False)

    def step(params, x, lx):
        enc_h, enc_l = encode(params, x, lx)
        return beam_search(params["speller"], las_cfg.speller, enc_h, enc_l,
                           beam_size=beam_size, max_steps=steps,
                           length_alpha=length_alpha,
                           max_len_factor=max_len_factor)

    return step


def make_las_eval_beam_step(las_cfg, beam_size: int, length_alpha: float = 0.0,
                            compute_dtype=jnp.float32, max_steps: int = 0,
                            max_len_factor: float = 3.0, mesh=None):
    """Single-encoder-pass dev eval for beam runs: ``step(params, x, lx, y,
    ly, want_ids) -> (metrics, beam_ids | None)``.

    The Listener runs ONCE per dev batch; its encodings feed both the
    free-running loss decode and the beam search (previously each ran its own
    listener pass — eval cost roughly doubled when ``eval_beam_size`` was
    set). The loss free-run is additionally truncated to the label horizon:
    greedy logits at step t depend only on the decoded prefix, so the first
    ``y.shape[1]`` steps — the only ones the masked CE reads — are identical
    to the full CHR_MAX_STEPS free-run's (reference loss semantics preserved,
    src/train.py:199-258).

    ``mesh``: optional 1-D 'data' mesh — under shard_map data parallelism
    (parallel/dp.py) the listener and the free-running loss decode may route
    to Pallas kernels, which GSPMD cannot partition over batch-sharded
    operands; with a mesh given, both run per B/n shard under
    ``jax.shard_map`` (the beam scan itself is plain XLA — GSPMD handles
    its batch sharding).
    """
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from attention_based_e2e_asr_dnn_tpu.models.las import (
        listener_apply,
        speller_apply,
    )
    from attention_based_e2e_asr_dnn_tpu.training.loss import masked_ce_loss

    steps = max_steps or las_cfg.speller.CHR_MAX_STEPS

    def encode_fn(params, x, lx):
        return listener_apply(params["listener"], las_cfg.listener, None,
                              x.astype(compute_dtype), lx, train=False)

    def loss_decode_fn(params, enc_h, enc_l, y, ly, n_steps):
        sp_cfg = dataclasses.replace(las_cfg.speller, CHR_MAX_STEPS=n_steps)
        out = speller_apply(params["speller"], sp_cfg, None, enc_h, enc_l,
                            dec_y=None, tf_rate=0.0, train=False)
        n = min(n_steps, y.shape[1])
        loss, n_tokens = masked_ce_loss(
            out.logits[:, :n, :], y[:, :n], jnp.minimum(ly, n))
        return loss, n_tokens

    if mesh is None:
        encode = jax.jit(encode_fn)

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def loss_decode(params, enc_h, enc_l, y, ly, n_steps):
            loss, n_tokens = loss_decode_fn(params, enc_h, enc_l, y, ly,
                                            n_steps)
            return {"loss": loss, "ppl": jnp.exp(loss), "n_tokens": n_tokens}
    else:
        rep, bat = P(), P("data")
        encode = jax.jit(jax.shard_map(
            encode_fn, mesh=mesh, in_specs=(rep, bat, bat),
            out_specs=(bat, bat), check_vma=False))

        def shard_loss_body(params, enc_h, enc_l, y, ly, *, n_steps):
            from attention_based_e2e_asr_dnn_tpu.ops.masking import (
                length_mask,
            )

            shard_mean, shard_n = loss_decode_fn(params, enc_h, enc_l, y, ly,
                                                 n_steps)
            # RAW token count (an all-padded shard's max(sum,1)=1 clamp must
            # not inflate the global denominator)
            n = min(n_steps, y.shape[1])
            n_raw = length_mask(jnp.minimum(ly, n), n,
                                dtype=jnp.float32).sum()
            n_tokens = jnp.maximum(jax.lax.psum(n_raw, "data"), 1.0)
            loss = jax.lax.psum(shard_mean * shard_n * (n_raw > 0), "data"
                                ) / n_tokens
            return {"loss": loss, "ppl": jnp.exp(loss), "n_tokens": n_tokens}

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def loss_decode(params, enc_h, enc_l, y, ly, n_steps):
            return jax.shard_map(
                functools.partial(shard_loss_body, n_steps=n_steps),
                mesh=mesh, in_specs=(rep, bat, bat, bat, bat),
                out_specs=rep, check_vma=False,
            )(params, enc_h, enc_l, y, ly)

    def step(params, x, lx, y, ly, want_ids: bool = True):
        enc_h, enc_l = encode(params, x, lx)
        metrics = loss_decode(params, enc_h, enc_l, y, ly,
                              min(steps, int(y.shape[1])))
        ids = None
        if want_ids:
            ids = beam_search(params["speller"], las_cfg.speller, enc_h,
                              enc_l, beam_size=beam_size, max_steps=steps,
                              length_alpha=length_alpha,
                              max_len_factor=max_len_factor)
        return metrics, ids

    return step


def make_rewriter_beam_step(lm_cfg, beam_size: int, length_alpha: float = 0.0,
                            compute_dtype=jnp.float32, max_steps: int = 0,
                            max_len_factor: float = 3.0):
    """Beam decode for the Rewriter: (params, x_ids, lx) -> ids."""
    from attention_based_e2e_asr_dnn_tpu.ops.lstm import locked_lstm_stack_apply

    steps = max_steps or lm_cfg.CHR_MAX_STEPS
    sp_cfg = lm_cfg.speller_config()

    @jax.jit
    def encode(params, x, lx):
        emb = params["decoder"]["char_emb"].astype(compute_dtype)
        return locked_lstm_stack_apply(
            params["encoder"], None, emb[x], lx,
            init_dropout=0.0, mid_dropout=0.0, bidirectional=True, train=False,
        )

    def step(params, x, lx):
        enc_h, enc_l = encode(params, x, lx)
        return beam_search(params["decoder"], sp_cfg, enc_h, enc_l,
                           beam_size=beam_size, max_steps=steps,
                           length_alpha=length_alpha,
                           max_len_factor=max_len_factor)

    return step
