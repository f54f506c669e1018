"""Masked LSTM scans — the TPU-native replacement for cuDNN packed LSTMs.

The reference runs every recurrent layer as pack -> cuDNN LSTM -> pad
(reference: src/modules.py:74-85, 165-194). On TPU we instead:

  * precompute the input projection ``x @ W_ih + b`` for ALL timesteps in one
    large MXU matmul (the time axis is free batch dimension),
  * run a ``lax.scan`` over time that only does the recurrent matmul
    ``h @ W_hh`` plus fused gate elementwise math,
  * freeze the (h, c) carry where ``t >= length`` and zero padded outputs —
    exact pad_packed_sequence semantics under static shapes,
  * run the backward direction of a BiLSTM as a scan over the time-flipped
    sequence whose carry stays at the initial zeros until the first valid
    frame, which reproduces "start from the true last frame" for every
    example regardless of padding.

Gate order convention: [i, f, g, o] (input, forget, cell, output).

A Pallas fused kernel for the recurrent scan lives in
``ops/lstm_pallas.py``; this module is the always-correct reference path and
the CPU/test fallback.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.ops.masking import length_mask
from attention_based_e2e_asr_dnn_tpu.ops.precision import matmul_precision


# ---------------------------------------------------------------------------
# Single-direction LSTM layer
# ---------------------------------------------------------------------------

def lstm_init(rng: jax.Array, in_dim: int, hidden_dim: int, dtype=jnp.float32) -> dict:
    """Initialize one LSTM direction.

    Uniform(-1/sqrt(H), 1/sqrt(H)) initialization — the torch nn.LSTM default
    convention the reference trains under.
    """
    k = 1.0 / math.sqrt(hidden_dim)
    k_ih, k_hh, k_b = jax.random.split(rng, 3)
    return {
        "w_ih": jax.random.uniform(k_ih, (in_dim, 4 * hidden_dim), dtype, -k, k),
        "w_hh": jax.random.uniform(k_hh, (hidden_dim, 4 * hidden_dim), dtype, -k, k),
        "b": jax.random.uniform(k_b, (4 * hidden_dim,), dtype, -k, k),
    }


def _gates(pre: jnp.ndarray, c: jnp.ndarray, hidden_dim: int):
    """Fused LSTM gate math. pre: (..., 4H) pre-activation; c: (..., H)."""
    i = jax.nn.sigmoid(pre[..., 0 * hidden_dim : 1 * hidden_dim])
    f = jax.nn.sigmoid(pre[..., 1 * hidden_dim : 2 * hidden_dim])
    g = jnp.tanh(pre[..., 2 * hidden_dim : 3 * hidden_dim])
    o = jax.nn.sigmoid(pre[..., 3 * hidden_dim : 4 * hidden_dim])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_apply(
    params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    reverse: bool = False,
    unroll: int = 8,
) -> jnp.ndarray:
    """Run one LSTM direction over a padded batch.

    Args:
        params: {"w_ih", "w_hh", "b"}.
        x: (B, T, D) padded inputs.
        lengths: (B,) valid lengths.
        reverse: scan right-to-left (the backward half of a BiLSTM).
        unroll: scan unroll factor (amortizes per-step overhead on TPU).

    Returns:
        (B, T, H) outputs, zero at padded positions.
    """
    batch, seq_len, _ = x.shape
    hidden_dim = params["w_hh"].shape[0]
    dtype = x.dtype

    prec = matmul_precision(dtype)
    # One big MXU matmul over all timesteps.
    x_proj = jnp.einsum(
        "btd,dh->bth", x, params["w_ih"].astype(dtype), precision=prec
    ) + params["b"].astype(dtype)

    valid = length_mask(lengths, seq_len)  # (B, T) bool
    if reverse:
        x_proj = jnp.flip(x_proj, axis=1)
        valid_scan = jnp.flip(valid, axis=1)
    else:
        valid_scan = valid

    x_proj_t = jnp.swapaxes(x_proj, 0, 1)      # (T, B, 4H) time-major
    valid_t = jnp.swapaxes(valid_scan, 0, 1)   # (T, B)

    w_hh = params["w_hh"].astype(dtype)
    h0 = jnp.zeros((batch, hidden_dim), dtype)
    c0 = jnp.zeros((batch, hidden_dim), dtype)

    def step(carry, inp):
        h, c = carry
        xp_t, m_t = inp
        pre = xp_t + jnp.dot(h, w_hh, precision=prec, preferred_element_type=dtype)
        h_new, c_new = _gates(pre, c, hidden_dim)
        m = m_t[:, None]
        h = jnp.where(m, h_new, h)  # freeze carry past the true length
        c = jnp.where(m, c_new, c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), (x_proj_t, valid_t), unroll=unroll)
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    if reverse:
        hs = jnp.flip(hs, axis=1)
    # pad_packed_sequence parity: padded positions are zero.
    return hs * valid[:, :, None].astype(dtype)


def bilstm_apply(
    params: dict, x: jnp.ndarray, lengths: jnp.ndarray, unroll: int = 8
) -> jnp.ndarray:
    """Bidirectional LSTM as ONE fused scan, concatenated (B, T, 2H).

    Both directions run inside a single ``lax.scan``: the time-flipped
    sequence is stacked on a leading direction axis and the recurrent matmul
    becomes a (2, B, H) x (2, H, 4H) batched MXU op. This HALVES the
    sequential step count vs. scanning each direction separately — on TPU the
    recurrence is latency-bound, so this is ~2x on the encoder.
    """
    batch, seq_len, _ = x.shape
    hidden_dim = params["fwd"]["w_hh"].shape[0]
    dtype = x.dtype
    prec = matmul_precision(dtype)

    xp_f = jnp.einsum("btd,dh->bth", x, params["fwd"]["w_ih"].astype(dtype),
                      precision=prec) + params["fwd"]["b"].astype(dtype)
    xp_b = jnp.einsum("btd,dh->bth", x, params["bwd"]["w_ih"].astype(dtype),
                      precision=prec) + params["bwd"]["b"].astype(dtype)

    valid = length_mask(lengths, seq_len)                    # (B, T)
    xp = jnp.stack([xp_f, jnp.flip(xp_b, axis=1)], axis=0)   # (2, B, T, 4H)
    vstack = jnp.stack([valid, jnp.flip(valid, axis=1)], 0)  # (2, B, T)

    xp_t = jnp.moveaxis(xp, 2, 0)       # (T, 2, B, 4H)
    valid_t = jnp.moveaxis(vstack, 2, 0)  # (T, 2, B)

    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]], 0).astype(dtype)
    h0 = jnp.zeros((2, batch, hidden_dim), dtype)
    c0 = jnp.zeros((2, batch, hidden_dim), dtype)

    def step(carry, inp):
        h, c = carry
        xp_s, m_s = inp
        pre = xp_s + jnp.einsum("dbh,dhk->dbk", h, w_hh, precision=prec)
        h_new, c_new = _gates(pre, c, hidden_dim)
        m = m_s[:, :, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), (xp_t, valid_t), unroll=unroll)
    # hs: (T, 2, B, H) -> fwd as-is, bwd flipped back
    h_fwd = jnp.moveaxis(hs[:, 0], 0, 1)                 # (B, T, H)
    h_bwd = jnp.flip(jnp.moveaxis(hs[:, 1], 0, 1), axis=1)
    out = jnp.concatenate([h_fwd, h_bwd], axis=-1)
    return out * valid[:, :, None].astype(dtype)


def bilstm_init(rng: jax.Array, in_dim: int, hidden_dim: int, dtype=jnp.float32) -> dict:
    k_f, k_b = jax.random.split(rng)
    return {
        "fwd": lstm_init(k_f, in_dim, hidden_dim, dtype),
        "bwd": lstm_init(k_b, in_dim, hidden_dim, dtype),
    }


# ---------------------------------------------------------------------------
# LockedLSTM stack (reference: src/modules.py:11-85)
# ---------------------------------------------------------------------------

def locked_lstm_stack_init(
    rng: jax.Array,
    input_dim: int,
    hidden_dim: int,
    num_layers: int,
    bidirectional: bool = True,
    dtype=jnp.float32,
) -> list:
    """Stack of single-layer (Bi)LSTMs with locked dropout between them."""
    keys = jax.random.split(rng, num_layers)
    out_mult = 2 if bidirectional else 1
    layers = []
    for i in range(num_layers):
        in_d = input_dim if i == 0 else hidden_dim * out_mult
        if bidirectional:
            layers.append(bilstm_init(keys[i], in_d, hidden_dim, dtype))
        else:
            layers.append(lstm_init(keys[i], in_d, hidden_dim, dtype))
    return layers


def _layer_apply(layer, x, lengths, bidirectional, unroll, impl, remat):
    """Dispatch one (Bi)LSTM layer: lax.scan ('scan') or Pallas ('pallas'),
    optionally rematerialized (recompute activations in backward to trade
    FLOPs for HBM, jax.checkpoint)."""
    if impl == "pallas":
        from attention_based_e2e_asr_dnn_tpu.ops.lstm_pallas import (
            bilstm_apply_pallas,
            lstm_apply_pallas,
        )

        fn = (lambda lyr, xx, ll: bilstm_apply_pallas(lyr, xx, ll)) if bidirectional \
            else (lambda lyr, xx, ll: lstm_apply_pallas(lyr, xx, ll))
    else:
        fn = (lambda lyr, xx, ll: bilstm_apply(lyr, xx, ll, unroll=unroll)) if bidirectional \
            else (lambda lyr, xx, ll: lstm_apply(lyr, xx, ll, unroll=unroll))
    if remat:
        fn = jax.checkpoint(fn)
    return fn(layer, x, lengths)


def locked_lstm_stack_apply(
    params: list,
    rng: Optional[jax.Array],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    init_dropout: float,
    mid_dropout: float,
    bidirectional: bool = True,
    train: bool = False,
    unroll: int = 8,
    impl: str = "scan",
    remat: bool = False,
):
    """LockedLSTM.forward parity (reference: src/modules.py:67-85).

    Per layer: LSTM, then locked (variational) dropout with rate
    ``init_dropout`` after layer 0 and ``mid_dropout`` after the rest.
    Lengths are unchanged. Returns (y, lengths).
    """
    from attention_based_e2e_asr_dnn_tpu.ops.dropout import locked_dropout

    for i, layer in enumerate(params):
        rate = mid_dropout if i else init_dropout
        x = _layer_apply(layer, x, lengths, bidirectional, unroll, impl, remat)
        if train and rate > 0.0:
            rng, sub = jax.random.split(rng)
            x = locked_dropout(sub, x, rate, train)
    return x, lengths


# ---------------------------------------------------------------------------
# Pyramidal LSTM stack (reference: src/modules.py:89-194)
# ---------------------------------------------------------------------------

def pyramidal_lstm_stack_init(
    rng: jax.Array,
    input_dim: int,
    hidden_dim: int,
    num_layers: int,
    bidirectional: bool = True,
    dtype=jnp.float32,
) -> list:
    """Pyramidal (Bi)LSTM stack: layer i input is 2x the previous output dim.

    Dim ladder parity with reference src/modules.py:124-126: layer 0 input is
    ``2 * input_dim``; later layers take ``2 * (hidden * directions)``.
    """
    keys = jax.random.split(rng, num_layers)
    out_mult = 2 if bidirectional else 1
    layers = []
    for i in range(num_layers):
        in_d = 2 * input_dim if i == 0 else 2 * hidden_dim * out_mult
        if bidirectional:
            layers.append(bilstm_init(keys[i], in_d, hidden_dim, dtype))
        else:
            layers.append(lstm_init(keys[i], in_d, hidden_dim, dtype))
    return layers


def pyramidal_lstm_stack_apply(
    params: list,
    rng: Optional[jax.Array],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    mid_dropout: float,
    final_dropout: float,
    bidirectional: bool = True,
    train: bool = False,
    unroll: int = 8,
    impl: str = "scan",
    remat: bool = False,
):
    """pyramLockedLSTM.forward parity (reference: src/modules.py:158-194).

    Per layer: halve the time axis by concatenating adjacent frames
    (reshape (B, T/2, 2D)), halve lengths with floor division (the
    reference's drop-odd-frame "Choice 2", src/modules.py:171-185), run the
    LSTM, apply locked dropout (``mid_dropout`` for inner layers,
    ``final_dropout`` after the last).

    The batcher pads T to a multiple of 2**num_layers so the reshape is
    always exact under static shapes; an example with odd valid length loses
    its final half-pair exactly as in the reference (lx // 2).
    """
    from attention_based_e2e_asr_dnn_tpu.ops.dropout import locked_dropout

    num_layers = len(params)
    for i, layer in enumerate(params):
        batch, seq_len, dim = x.shape
        if seq_len % 2 != 0:
            raise ValueError(
                f"pyramidal layer {i}: time axis {seq_len} must be even; pad "
                f"batches to a multiple of 2**{num_layers} frames"
            )
        rate = mid_dropout if i < num_layers - 1 else final_dropout
        lengths = lengths // 2
        x = x.reshape(batch, seq_len // 2, 2 * dim)
        x = _layer_apply(layer, x, lengths, bidirectional, unroll, impl, remat)
        if train and rate > 0.0:
            rng, sub = jax.random.split(rng)
            x = locked_dropout(sub, x, rate, train)
    return x, lengths


# ---------------------------------------------------------------------------
# LSTM cell (decoder, reference: src/modules.py:302-365)
# ---------------------------------------------------------------------------

def lstm_cell_init(rng: jax.Array, in_dim: int, hidden_dim: int, dtype=jnp.float32) -> dict:
    """Single LSTM cell parameters (same layout as a 1-step lstm_init)."""
    return lstm_init(rng, in_dim, hidden_dim, dtype)


def lstm_cell_step(params: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One decoder cell step: x (B, D), h/c (B, H) -> (h', c')."""
    hidden_dim = params["w_hh"].shape[0]
    dtype = x.dtype
    prec = matmul_precision(dtype)
    pre = (
        jnp.dot(x, params["w_ih"].astype(dtype), precision=prec,
                preferred_element_type=dtype)
        + jnp.dot(h, params["w_hh"].astype(dtype), precision=prec,
                  preferred_element_type=dtype)
        + params["b"].astype(dtype)
    )
    return _gates(pre, c, hidden_dim)
