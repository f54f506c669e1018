"""Analytic FLOPs model for the LAS/Rewriter compute graphs.

Counts matmul FLOPs (2 * MACs) of the dominant ops — LSTM gate matmuls,
attention projections/scores/contexts, classifier — the standard convention
for MFU accounting. Elementwise gate math, embeddings, and the optimizer are
omitted (<1% at these shapes).

The reference never reported utilization (no FLOPs accounting anywhere in
/root/reference); this feeds both bench.py's MFU line and the real-batch
model summary (reference summary surface: src/train.py:600-607).
"""

from __future__ import annotations


def lstm_layer_flops(batch: int, time: int, in_dim: int, hid: int,
                     bidirectional: bool = True) -> int:
    """Gate-matmul FLOPs of one (Bi)LSTM layer over a padded batch."""
    per_step = 2 * batch * (in_dim + hid) * 4 * hid
    return per_step * time * (2 if bidirectional else 1)


def listener_flops(cfg, batch: int, time: int) -> int:
    """Forward FLOPs of the Listener (base locked stack + pyramid)."""
    lc = cfg.listener
    hid = lc.uniform_hid_dim
    enc_out = lc.enc_out_dim
    total = 0
    in_dim = lc.input_dim
    for _ in range(lc.lstm_layers):
        total += lstm_layer_flops(batch, time, in_dim, hid, lc.bidirectional)
        in_dim = enc_out
    t = time
    for _ in range(lc.plstm_layers):
        t //= 2
        total += lstm_layer_flops(batch, t, 2 * enc_out, hid, lc.bidirectional)
    return total


def speller_flops(cfg, batch: int, dec_steps: int, enc_time: int) -> int:
    """Forward FLOPs of the Speller: K/V precompute + per-step decode."""
    sc = cfg.speller
    proj = sc.att_proj_dim  # total projection width; heads split it
    enc_out = sc.enc_out_dim
    # K/V precompute, once per batch (reference wrapup_encodings pattern)
    total = 2 * (2 * batch * enc_time * enc_out * proj)
    # per decode step
    q = 2 * batch * sc.dec_lstm_out_dim * proj
    scores = 2 * batch * enc_time * proj
    context = 2 * batch * enc_time * proj
    cell1_in = sc.dec_emb_dim + sc.att_proj_dim
    cell1 = 2 * batch * (cell1_in + sc.dec_lstm_hid_dim) * 4 * sc.dec_lstm_hid_dim
    cell2 = 2 * batch * (sc.dec_lstm_hid_dim + sc.dec_lstm_out_dim) * 4 * sc.dec_lstm_out_dim
    cls = 2 * batch * sc.dec_emb_dim * sc.dec_vocab_size
    return total + dec_steps * (q + scores + context + cell1 + cell2 + cls)


def las_forward_flops(cfg, batch: int, time: int, dec_steps: int) -> int:
    enc_time = time // cfg.listener.time_reduction
    return (listener_flops(cfg, batch, time)
            + speller_flops(cfg, batch, dec_steps, enc_time))


def las_train_step_flops(cfg, batch: int, time: int, label_len: int) -> int:
    """fwd + bwd ≈ 3x forward (standard dense-training approximation)."""
    return 3 * las_forward_flops(cfg, batch, time, dec_steps=label_len)


# peak dense bf16 FLOP/s per chip by jax device_kind (public spec sheets)
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,       # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v6e": 918e12,
}


def peak_flops_per_chip(device=None) -> float | None:
    """Peak dense bf16 FLOP/s of the given (default: first) jax device, or
    None when unknown (e.g. the CPU test backend)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name):
            return peak
    return None


def mfu(flops_per_step: int, step_seconds: float, device=None) -> float | None:
    peak = peak_flops_per_chip(device)
    if peak is None or step_seconds <= 0:
        return None
    return flops_per_step / step_seconds / peak
