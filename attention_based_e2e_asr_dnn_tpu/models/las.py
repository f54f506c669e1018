"""Listen-Attend-Spell, TPU-first.

Capability parity with the reference models (src/models.py:16-527) with the
sequential Python decode loop replaced by a single ``lax.scan`` over decode
steps (no per-step host syncs — the reference moves attention maps to CPU
every timestep, src/models.py:377).

Conscious deviations (SURVEY.md §7 hard part (f); all documented):
  * attention uses correct 1/sqrt(d_head) scaling unless ``legacy_scale`` —
    the reference multiplies by sqrt(d_head) (src/models.py:93,170);
  * the learned initial query / hidden states are REGISTERED parameters that
    actually train and checkpoint — the reference kept them in a plain Python
    list so they silently never trained (src/models.py:275-281);
  * teacher forcing keeps the reference's one-Bernoulli-draw-per-timestep
    batch-shared coin (src/models.py:356-358), precomputed outside the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.ops.attention import (
    block_diagonal_prior,
    cross_attention_init,
    cross_attention_precompute,
    cross_attention_step,
)
from attention_based_e2e_asr_dnn_tpu.ops.precision import matmul_precision
from attention_based_e2e_asr_dnn_tpu.ops.lstm import (
    locked_lstm_stack_apply,
    locked_lstm_stack_init,
    lstm_cell_init,
    lstm_cell_step,
    pyramidal_lstm_stack_apply,
    pyramidal_lstm_stack_init,
)


# ---------------------------------------------------------------------------
# Configs (static; mirror the reference YAML keys, src/config/sample-attention.yml)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ListenerConfig:
    input_dim: int = 15
    uniform_hid_dim: int = 256
    lstm_layers: int = 1
    plstm_layers: int = 3
    bidirectional: bool = True
    init_dropout: float = 0.2
    mid_dropout: float = 0.3
    final_dropout: float = 0.4
    # TPU execution knobs (not part of the reference surface)
    lstm_impl: str = "scan"  # "scan" (lax.scan) | "pallas" (fused kernel)
    remat: bool = False      # jax.checkpoint each LSTM layer (HBM saver)

    @property
    def enc_out_dim(self) -> int:
        return self.uniform_hid_dim * (2 if self.bidirectional else 1)

    @property
    def time_reduction(self) -> int:
        """Total time downsampling: 2x per pyramidal layer."""
        return 2 ** self.plstm_layers


@dataclass(frozen=True)
class SpellerConfig:
    enc_out_dim: int = 512
    att_proj_dim: int = 128
    att_heads: int = 4
    att_dropout: float = 0.2  # accepted for parity; dead in the reference too
    dec_vocab_size: int = 30
    dec_emb_dim: int = 256
    dec_emb_dropout: float = 0.5  # accepted for parity; unused in default path
    dec_lstm_hid_dim: int = 512
    dec_lstm_out_dim: int = 128
    dec_lstm_dropout: float = 0.2
    CHR_MAX_STEPS: int = 600
    CHR_PAD_IDX: int = 29
    CHR_SOS_IDX: int = 0
    USE_GREEDY: bool = True
    legacy_scale: bool = False
    # TPU execution knob (not part of the reference surface): "pallas" runs
    # the training decode as the fused ops/speller_pallas.py kernel (K/V and
    # weights VMEM-resident across all steps); falls back to the scan for
    # eval, init_force, and unblockable shapes.
    decoder_impl: str = "scan"

    def __post_init__(self):
        # Weight tying imposes dec_emb_dim == 2 * att_proj_dim: the classifier
        # input is cat(projected_queries, context) (reference src/models.py:285-287).
        if self.dec_emb_dim != 2 * self.att_proj_dim:
            raise ValueError(
                f"weight tying requires dec_emb_dim == 2*att_proj_dim, got "
                f"{self.dec_emb_dim} != 2*{self.att_proj_dim}"
            )


@dataclass(frozen=True)
class LASConfig:
    listener: ListenerConfig = field(default_factory=ListenerConfig)
    speller: SpellerConfig = field(default_factory=SpellerConfig)


def las_config_from_dicts(listener_configs: dict, speller_configs: dict) -> LASConfig:
    """Build an LASConfig from reference-style YAML config dicts.

    Derives ``enc_out_dim = 2 * uniform_hid_dim`` exactly like the reference
    composition root (src/models.py:512).
    """
    listener = ListenerConfig(**listener_configs)
    speller_kwargs = dict(speller_configs)
    speller_kwargs["enc_out_dim"] = listener.enc_out_dim
    return LASConfig(listener=listener, speller=SpellerConfig(**speller_kwargs))


# ---------------------------------------------------------------------------
# Listener (reference: src/models.py:16-66)
# ---------------------------------------------------------------------------

def listener_init(rng: jax.Array, cfg: ListenerConfig, dtype=jnp.float32) -> dict:
    k_base, k_pyramid = jax.random.split(rng)
    return {
        "base": locked_lstm_stack_init(
            k_base, cfg.input_dim, cfg.uniform_hid_dim, cfg.lstm_layers,
            cfg.bidirectional, dtype,
        ),
        "pyramid": pyramidal_lstm_stack_init(
            k_pyramid, cfg.enc_out_dim, cfg.uniform_hid_dim, cfg.plstm_layers,
            cfg.bidirectional, dtype,
        ),
    }


def listener_apply(
    params: dict,
    cfg: ListenerConfig,
    rng: Optional[jax.Array],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    train: bool = False,
    unroll: int = 8,
):
    """(B, T, input_dim) -> (B, T / 2**plstm_layers, enc_out_dim)."""
    if train:
        rng_base, rng_pyr = jax.random.split(rng)
    else:
        rng_base = rng_pyr = None
    h, lengths = locked_lstm_stack_apply(
        params["base"], rng_base, x, lengths,
        cfg.init_dropout, cfg.mid_dropout, cfg.bidirectional, train, unroll,
        impl=cfg.lstm_impl, remat=cfg.remat,
    )
    h, lengths = pyramidal_lstm_stack_apply(
        params["pyramid"], rng_pyr, h, lengths,
        cfg.mid_dropout, cfg.final_dropout, cfg.bidirectional, train, unroll,
        impl=cfg.lstm_impl, remat=cfg.remat,
    )
    return h, lengths


# ---------------------------------------------------------------------------
# Speller (reference: src/models.py:197-496)
# ---------------------------------------------------------------------------

def speller_init(rng: jax.Array, cfg: SpellerConfig, dtype=jnp.float32) -> dict:
    k_att, k_emb, k_c1, k_c2, k_q, k_cls = jax.random.split(rng, 6)
    emb = jax.random.normal(k_emb, (cfg.dec_vocab_size, cfg.dec_emb_dim), dtype)
    # torch nn.Embedding zeroes the padding_idx row at init; with weight tying
    # the row still learns through the classifier path.
    emb = emb.at[cfg.CHR_PAD_IDX].set(0.0)
    return {
        "attention": cross_attention_init(
            k_att, cfg.enc_out_dim, cfg.dec_lstm_out_dim, cfg.att_proj_dim,
            cfg.att_heads, dtype=dtype,
        ),
        "char_emb": emb,  # tied with the classifier weight (src/models.py:287)
        "cell1": lstm_cell_init(
            k_c1, cfg.dec_emb_dim + cfg.att_proj_dim, cfg.dec_lstm_hid_dim, dtype
        ),
        "cell2": lstm_cell_init(k_c2, cfg.dec_lstm_hid_dim, cfg.dec_lstm_out_dim, dtype),
        # Registered learned initial states (deviation: trained, unlike the
        # reference's unregistered list at src/models.py:275-281).
        "init_query": jax.random.uniform(k_q, (1, cfg.dec_lstm_out_dim), dtype),
        "init_h1": jnp.zeros((1, cfg.dec_lstm_hid_dim), dtype),
        "init_c1": jnp.zeros((1, cfg.dec_lstm_hid_dim), dtype),
        "init_h2": jnp.zeros((1, cfg.dec_lstm_out_dim), dtype),
        "init_c2": jnp.zeros((1, cfg.dec_lstm_out_dim), dtype),
        "cls_b": jnp.zeros((cfg.dec_vocab_size,), dtype),
    }


class SpellerOutput(NamedTuple):
    logits: jnp.ndarray   # (B, steps, vocab)
    att_map: jnp.ndarray  # (heads, enc_len, steps + 1) — sample 0, plot layout


# -- decode-route bookkeeping (VERDICT r2 weak #8): a user who sets
# ``decoder_impl: pallas`` must see which path actually engaged. Runs at
# TRACE time (once per compiled shape), so plain Python state works.
_DECODE_ROUTES: dict = {}
_WARNED_FALLBACKS: set = set()


def _decoder_key(cfg) -> str:
    """Identify the decoder a route belongs to — two models sharing a
    process (e.g. LAS speller + Rewriter decoder) can trace the SAME
    (batch, enc_len) shape through different configs; keying on shape
    alone would let one overwrite the other's entry."""
    return (f"p{cfg.att_proj_dim}h{cfg.att_heads}"
            f"e{cfg.dec_emb_dim}d{cfg.dec_lstm_hid_dim}"
            f"o{cfg.dec_lstm_out_dim}")


def _record_decode_route(impl: str, cfg, batch: int, enc_len: int) -> None:
    _DECODE_ROUTES[(_decoder_key(cfg), batch, enc_len)] = impl


def _warn_fused_fallback(batch: int, enc_len: int, reason: str) -> None:
    key = (batch, enc_len, reason)
    if key in _WARNED_FALLBACKS:
        return
    _WARNED_FALLBACKS.add(key)
    import sys

    print(f"WARNING: decoder_impl=pallas requested but shape "
          f"(B={batch}, Te={enc_len}) fell back to the scan decoder: "
          f"{reason}", file=sys.stderr)


def decode_route_report() -> dict:
    """Which decoder implementation served each traced (decoder, batch,
    enc_len) shape — surfaced in the shape/FLOP summary (utils/summary.py).
    The decoder key disambiguates models sharing one process."""
    many = len({k for (k, _, _) in _DECODE_ROUTES}) > 1
    return {(f"[{k}]B={b},Te={t}" if many else f"B={b},Te={t}"): impl
            for (k, b, t), impl in sorted(_DECODE_ROUTES.items())}


def speller_apply(
    params: dict,
    cfg: SpellerConfig,
    rng: Optional[jax.Array],
    enc_h: jnp.ndarray,
    enc_l: jnp.ndarray,
    dec_y: Optional[jnp.ndarray] = None,
    tf_rate=1.0,
    init_force: bool = False,
    train: bool = False,
) -> SpellerOutput:
    """Autoregressive decode as one ``lax.scan`` over steps.

    Training (dec_y given): steps = dec_y.shape[1]; per-step batch-shared
    teacher-forcing coin. Eval (dec_y None): free-running greedy for
    CHR_MAX_STEPS steps (reference: src/models.py:300-386).
    """
    batch, enc_max_len, _ = enc_h.shape
    if cfg.decoder_impl == "pallas":
        # train: teacher-forced decode over dec_y; eval: free-running greedy
        # over CHR_MAX_STEPS — both run in the fused kernel when blockable
        from attention_based_e2e_asr_dnn_tpu.ops.speller_pallas import (
            fused_decode_unavailable_reason,
            speller_apply_fused,
        )

        if init_force:
            _warn_fused_fallback(batch, enc_max_len,
                                 "init_force epoch (prior-biased attention "
                                 "is scan-only)")
        elif not (dec_y is not None if train else dec_y is None):
            pass  # mixed train/dec_y combination — scan handles it
        else:
            reason = fused_decode_unavailable_reason(cfg, batch, enc_max_len)
            if reason is None:
                _record_decode_route("pallas", cfg, batch, enc_max_len)
                return speller_apply_fused(
                    params, cfg, rng, enc_h, enc_l, dec_y, tf_rate, train
                )
            _warn_fused_fallback(batch, enc_max_len, reason)
    _record_decode_route("scan", cfg, batch, enc_max_len)
    dtype = enc_h.dtype
    emb = params["char_emb"].astype(dtype)

    if train:
        if dec_y is None:
            raise ValueError("training decode requires dec_y")
        steps = dec_y.shape[1]
        gold_emb = emb[dec_y]  # (B, steps, E)
        # gold_prev[t] == gold embedding of step t-1; step 0 is never forced.
        gold_prev = jnp.concatenate(
            [jnp.zeros((batch, 1, cfg.dec_emb_dim), dtype), gold_emb[:, :-1]], axis=1
        )
    else:
        steps = cfg.CHR_MAX_STEPS
        gold_prev = jnp.zeros((batch, steps, cfg.dec_emb_dim), dtype)

    cache = cross_attention_precompute(params["attention"], enc_h, enc_l, cfg.att_heads)

    # Per-step batch-shared teacher-forcing coins (reference src/models.py:356-358).
    if train and rng is not None:
        rng, coin_rng, drop_rng = jax.random.split(rng, 3)
        coins = jax.random.uniform(coin_rng, (steps,))
        coins = coins.at[0].set(2.0)  # t=0 never teacher-forced
        step_rngs = jax.random.split(drop_rng, steps)
    else:
        coins = jnp.full((steps,), 2.0)
        step_rngs = jnp.zeros((steps, 2), dtype=jnp.uint32)

    if init_force:
        prior = block_diagonal_prior(enc_max_len, steps)  # (enc_len, steps)
        prior_rows = prior.T  # (steps, enc_len)
    else:
        prior_rows = jnp.zeros((steps, 0), jnp.float32)

    # t = -1 priors (reference src/models.py:332-349).
    char0 = jnp.full((batch,), cfg.CHR_SOS_IDX, jnp.int32)
    h1 = jnp.broadcast_to(params["init_h1"].astype(dtype), (batch, cfg.dec_lstm_hid_dim))
    c1 = jnp.broadcast_to(params["init_c1"].astype(dtype), (batch, cfg.dec_lstm_hid_dim))
    h2 = jnp.broadcast_to(params["init_h2"].astype(dtype), (batch, cfg.dec_lstm_out_dim))
    c2 = jnp.broadcast_to(params["init_c2"].astype(dtype), (batch, cfg.dec_lstm_out_dim))
    init_query = jnp.broadcast_to(
        params["init_query"].astype(dtype), (batch, cfg.dec_lstm_out_dim)
    )
    context0, wgts0, _ = cross_attention_step(
        params["attention"], cache, init_query, cfg.att_heads, cfg.legacy_scale
    )

    # rng=None disables dropout (matching the fused-kernel route, which has no
    # step rng stream to draw masks from) — the routing gate must never change
    # semantics for the same inputs.
    drop_rate = cfg.dec_lstm_dropout if (train and rng is not None) else 0.0

    def step(carry, xs):
        char, h1, c1, h2, c2, context = carry
        gold_prev_t, coin, prior_row, step_rng = xs

        char_e = emb[char]  # (B, E)
        use_gold = coin <= tf_rate
        char_e = jnp.where(use_gold, gold_prev_t, char_e)

        cell_in = jnp.concatenate([char_e, context], axis=-1)
        h1_new, c1 = lstm_cell_step(params["cell1"], cell_in, h1, c1)
        if drop_rate > 0.0:
            r1, r2 = jax.random.split(step_rng)
            keep = 1.0 - drop_rate
            m1 = jax.random.bernoulli(r1, keep, h1_new.shape).astype(dtype) / keep
            h1_new = h1_new * m1
        h2_new, c2 = lstm_cell_step(params["cell2"], h1_new, h2, c2)
        if drop_rate > 0.0:
            m2 = jax.random.bernoulli(r2, keep, h2_new.shape).astype(dtype) / keep
            h2_new = h2_new * m2
        # NOTE: parity — the reference stores the DROPPED hidden in the
        # recurrent carry (src/modules.py:354-361), so we do too.

        row = prior_row if init_force else None
        context, wgts, q_proj = cross_attention_step(
            params["attention"], cache, h2_new, cfg.att_heads, cfg.legacy_scale, row
        )

        dec_out = jnp.concatenate([q_proj, context], axis=-1)  # (B, 2P == E)
        logits = jnp.dot(
            dec_out, emb.T, precision=matmul_precision(dtype),
            preferred_element_type=dtype,
        ) + params["cls_b"].astype(dtype)
        next_char = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (next_char, h1_new, c1, h2_new, c2, context), (logits, wgts[0])

    xs = (
        jnp.swapaxes(gold_prev, 0, 1),  # (steps, B, E)
        coins,
        prior_rows,
        step_rngs,
    )
    _, (logits_t, wgts_t) = jax.lax.scan(
        step, (char0, h1, c1, h2, c2, context0), xs
    )
    logits = jnp.swapaxes(logits_t, 0, 1)  # (B, steps, V)

    # Attention map of sample 0 incl. the t=-1 init query, in the reference's
    # plot layout (heads, enc_len, steps+1) (src/models.py:385).
    att_map = jnp.concatenate([wgts0[0][:, None, :], wgts_t.swapaxes(0, 1)], axis=1)
    att_map = jnp.swapaxes(att_map, -2, -1)
    return SpellerOutput(logits=logits, att_map=att_map)


# ---------------------------------------------------------------------------
# Full model (reference: src/models.py:500-527)
# ---------------------------------------------------------------------------

def las_init(rng: jax.Array, cfg: LASConfig, dtype=jnp.float32) -> dict:
    k_listen, k_spell = jax.random.split(rng)
    return {
        "listener": listener_init(k_listen, cfg.listener, dtype),
        "speller": speller_init(k_spell, cfg.speller, dtype),
    }


def las_apply(
    params: dict,
    cfg: LASConfig,
    rng: Optional[jax.Array],
    x: jnp.ndarray,
    lx: jnp.ndarray,
    dec_y: Optional[jnp.ndarray] = None,
    tf_rate=1.0,
    init_force: bool = False,
    train: bool = False,
    unroll: int = 8,
    enc_hook=None,
) -> SpellerOutput:
    """listen -> spell (reference: src/models.py:518-527).

    ``enc_hook``: optional fn applied to the encoder output before the
    speller — the sequence-parallel wiring installs a
    ``lax.with_sharding_constraint`` here so GSPMD shards the attention
    K/V time axis over the mesh's 'seq' axis (parallel/sequence.py has the
    explicit-collectives shard_map twin of the partitioning XLA derives).
    """
    if train:
        rng_listen, rng_spell = jax.random.split(rng)
    else:
        rng_listen = rng_spell = None
    enc_h, enc_l = listener_apply(
        params["listener"], cfg.listener, rng_listen, x, lx, train, unroll
    )
    if enc_hook is not None:
        enc_h = enc_hook(enc_h)
    return speller_apply(
        params["speller"], cfg.speller, rng_spell, enc_h, enc_l, dec_y,
        tf_rate, init_force, train,
    )


if __name__ == "__main__":
    # Seeded smoke run (reference: src/models.py:532-676): random batch ->
    # Listener -> Speller -> summary + attention-map PNG.
    import os

    import numpy as np

    from attention_based_e2e_asr_dnn_tpu.utils.plotting import pay_attention_multihead
    from attention_based_e2e_asr_dnn_tpu.utils.summary import model_summary

    SEED = 416
    cfg = las_config_from_dicts(
        dict(input_dim=15, uniform_hid_dim=512, lstm_layers=1, plstm_layers=3,
             init_dropout=0.2, mid_dropout=0.3, final_dropout=0.3),
        dict(att_proj_dim=256, att_heads=1, att_dropout=0.2, dec_emb_dim=512,
             dec_emb_dropout=0.0, dec_lstm_hid_dim=512, dec_lstm_out_dim=256,
             dec_lstm_dropout=0.2, CHR_MAX_STEPS=20),
    )
    params = las_init(jax.random.key(SEED), cfg)
    print(model_summary(params, "ListenAttendSpell"))

    rng = np.random.default_rng(SEED)
    batch = 4
    lx = rng.integers(800, 1200, size=(batch,))
    t_pad = int(((lx.max() + 7) // 8) * 8)
    x = np.zeros((batch, t_pad, 15), np.float32)
    for b in range(batch):
        x[b, : lx[b]] = rng.random((lx[b], 15), dtype=np.float32)
    ly = rng.integers(1, 60, size=(batch,))
    y = np.full((batch, int(ly.max())), cfg.speller.CHR_PAD_IDX, np.int32)
    for b in range(batch):
        y[b, : ly[b]] = rng.integers(0, 30, size=(ly[b],))

    out = las_apply(params, cfg, jax.random.key(SEED + 1), jnp.asarray(x),
                    jnp.asarray(lx.astype(np.int32)), jnp.asarray(y),
                    tf_rate=0.9, train=True)
    print(f"logits: {out.logits.shape}, att_map: {out.att_map.shape}")

    img_dir = "./imgs/example"
    os.makedirs(img_dir, exist_ok=True)
    print("saved:", pay_attention_multihead(np.asarray(out.att_map,
                                                       dtype=np.float32),
                                            epoch=-1, root_dir=img_dir))
