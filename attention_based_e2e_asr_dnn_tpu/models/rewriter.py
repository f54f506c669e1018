"""Rewriter — the seq2seq correction LM that "auto-corrects" LAS predictions.

Capability parity with the reference Rewriter (src/lmtrain.py:98-253): a
character embedding feeds a BiLSTM encoder; the decoder reuses the exact
Speller attend-decode machinery (same 2-cell LSTM + cross-attention + tied
classifier), so here it literally IS ``speller_apply`` over the text
encodings.

Conscious fix (documented, SURVEY.md §7 step 7): the reference's teacher
forcing assigns to a typo'd variable ``char_meb`` (src/lmtrain.py:231) so TF
silently never applies; this implementation forces correctly.

The embedding is shared three ways exactly like the reference: encoder input
embedding, decoder input embedding, and (transposed) classifier weight
(src/lmtrain.py:143-147, 175-177).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.models.las import (
    SpellerConfig,
    SpellerOutput,
    speller_apply,
    speller_init,
)
from attention_based_e2e_asr_dnn_tpu.ops.lstm import (
    locked_lstm_stack_apply,
    locked_lstm_stack_init,
)


@dataclass(frozen=True)
class RewriterConfig:
    vocab_size: int = 30
    emb_dim: int = 256
    enc_lstm_layers: int = 3
    enc_lstm_hid_dim: int = 256
    enc_dropouts: Sequence[float] = (0.3, 0.3)
    att_proj_dim: int = 128
    att_heads: int = 4
    att_dropout: float = 0.2
    dec_lstm_layers: int = 2  # accepted for parity; decoder is the 2-cell stack
    dec_lstm_hid_dim: int = 256
    dec_lstm_out_dim: int = 128
    dec_lstm_dropout: float = 0.3
    CHR_PAD_IDX: int = 29
    CHR_MAX_STEPS: int = 600
    CHR_SOS_IDX: int = 0
    legacy_scale: bool = False
    decoder_impl: str = "scan"  # "pallas": fused decode kernel when blockable
    lstm_impl: str = "scan"     # "pallas": encoder BiLSTM layers run the
    # fused Pallas LSTM tier (ops/lstm_pallas.py), same kernels the LAS
    # listener uses — previously the LM pipeline was scan-only

    @property
    def enc_out_dim(self) -> int:
        return 2 * self.enc_lstm_hid_dim  # bidirectional encoder

    def speller_config(self) -> SpellerConfig:
        """The decoder expressed as a SpellerConfig (shared machinery)."""
        return SpellerConfig(
            enc_out_dim=self.enc_out_dim,
            att_proj_dim=self.att_proj_dim,
            att_heads=self.att_heads,
            att_dropout=self.att_dropout,
            dec_vocab_size=self.vocab_size,
            dec_emb_dim=self.emb_dim,
            dec_emb_dropout=0.0,
            dec_lstm_hid_dim=self.dec_lstm_hid_dim,
            dec_lstm_out_dim=self.dec_lstm_out_dim,
            dec_lstm_dropout=self.dec_lstm_dropout,
            CHR_MAX_STEPS=self.CHR_MAX_STEPS,
            CHR_PAD_IDX=self.CHR_PAD_IDX,
            CHR_SOS_IDX=self.CHR_SOS_IDX,
            legacy_scale=self.legacy_scale,
            decoder_impl=self.decoder_impl,
        )


def rewriter_init(rng: jax.Array, cfg: RewriterConfig, dtype=jnp.float32) -> dict:
    k_enc, k_dec = jax.random.split(rng)
    return {
        "encoder": locked_lstm_stack_init(
            k_enc, cfg.emb_dim, cfg.enc_lstm_hid_dim, cfg.enc_lstm_layers,
            bidirectional=True, dtype=dtype,
        ),
        # char_emb inside is shared: encoder input + decoder input + classifier.
        "decoder": speller_init(k_dec, cfg.speller_config(), dtype),
    }


def rewriter_apply(
    params: dict,
    cfg: RewriterConfig,
    rng: Optional[jax.Array],
    x: jnp.ndarray,
    lx: jnp.ndarray,
    dec_y: Optional[jnp.ndarray] = None,
    tf_rate=1.0,
    init_force: bool = False,  # accepted for Trainer-surface parity; unused
    train: bool = False,
    unroll: int = 8,
    compute_dtype=None,
) -> SpellerOutput:
    """(B, T) char ids -> corrected logits (reference: src/lmtrain.py:190-253).

    ``compute_dtype`` applies the bf16 policy here: the inputs are int ids,
    so (unlike the LAS path) the activation dtype must be set at the
    embedding lookup.
    """
    del init_force
    if train and rng is not None:
        rng_enc, rng_dec = jax.random.split(rng)
    else:
        # rng=None with train=True = deterministic forced decode (the
        # confidence-gated corrector scores candidate sequences this way);
        # dropout is disabled everywhere, matching the speller's rng=None
        # convention (models/las.py)
        rng_enc = rng_dec = None
    emb = params["decoder"]["char_emb"]
    if compute_dtype is not None:
        emb = emb.astype(compute_dtype)
    h = emb[x]  # (B, T, emb_dim)
    enc_h, enc_l = locked_lstm_stack_apply(
        params["encoder"], rng_enc, h, lx,
        init_dropout=float(cfg.enc_dropouts[0]),
        mid_dropout=float(cfg.enc_dropouts[-1]),
        bidirectional=True, train=train and rng is not None, unroll=unroll,
        impl=cfg.lstm_impl,
    )
    return speller_apply(
        params["decoder"], cfg.speller_config(), rng_dec, enc_h, enc_l,
        dec_y, tf_rate, init_force=False, train=train,
    )
