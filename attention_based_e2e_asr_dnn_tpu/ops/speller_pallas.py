"""Pallas fused autoregressive-decoder kernel (training path).

Why: the Speller's decode ``lax.scan`` (models/las.py::speller_apply,
reference loop src/models.py:352-381) re-reads the attention K/V cache and
every decoder weight from HBM at EVERY step — at flagship shapes
(B=128, T_dec=192, T_enc=192, P=256) that is ~25 MB x 192 steps ~ 4.8 GB of
HBM traffic per direction for ~0.1 TFLOP of math, pinning the decoder at
~0.10 MFU (tools/profile_step.py).

This kernel runs the WHOLE decode for a batch chunk inside one
``pallas_call`` with grid=(T_dec,):

  * K/V cache, all decoder weights, and the recurrent carries
    (h1, c1, h2, c2, context, previous argmax one-hot) are VMEM-resident for
    the entire decode — fetched from HBM exactly once per chunk;
  * per grid step: teacher-forcing select -> cell1 -> locked dropout ->
    cell2 -> dropout -> query projection -> masked-softmax cross-attention ->
    tied classifier -> argmax feedback (greedy, reference semantics);
  * the char embedding lives pre-projected through cell1's input rows
    (``embw1 = emb @ W_ih[:E] + b``), so the in-kernel "gather" is a one-hot
    (Bb, V) x (V, 4H) MXU matmul;
  * the backward is a second Pallas kernel walking time DESCENDING (reversed
    block index maps): the full LSTM-cells + attention + softmax adjoint with
    the same VMEM residency; all weight gradients are big MXU matmuls OUTSIDE
    the kernels over the streamed per-step adjoints (the same split-of-labor
    as ops/lstm_pallas.py).

Batch is chunked into separate kernel launches (CHUNK examples each) so the
K/V block has a truly constant index map — one VMEM copy, no double
buffering of the multi-MB cache.

The kernel also serves the EVAL free-running decode (``dec_y=None``:
CHR_MAX_STEPS greedy steps, no forcing/dropout). Not supported in-kernel
(callers fall back to the scan path): ``init_force`` (early-epoch alignment
prior, reference src/models.py:177-181) and head layouts whose per-head
width is not a multiple of 32 lanes. Inference/serving keep the early-exit while-loop
decoders in decoding/ — all-finished early exit beats a fixed-length kernel
on real traffic.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from attention_based_e2e_asr_dnn_tpu.ops.lstm_pallas import _scoped_vmem_cap


NEG = -1e9  # additive pad bias; exp(NEG - max) underflows to exactly 0


def _raised_params(h1dim: int):
    """CompilerParams raising Mosaic's scoped-VMEM check for big-h1 decoder
    chunks (Mosaic's ~16 MB default is a compiler check, not the chip's
    VMEM); None keeps the default-limit compilation for the calibrated
    base-arch rules."""
    cap = _scoped_vmem_cap()
    if h1dim > 512 and cap > 16 * 1024 * 1024 and pltpu is not None:
        return pltpu.CompilerParams(vmem_limit_bytes=cap)
    return None


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gates_f32(pre, c, hid):
    i = jax.nn.sigmoid(pre[:, 0 * hid: 1 * hid])
    f = jax.nn.sigmoid(pre[:, 1 * hid: 2 * hid])
    g = jnp.tanh(pre[:, 2 * hid: 3 * hid])
    o = jax.nn.sigmoid(pre[:, 3 * hid: 4 * hid])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return i, f, g, o, c_new, h_new


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _decode_fwd_kernel(
    # constant blocks (fetched once)
    k_ref, v_ref, bias_ref, ctx0_ref, h10_ref, c10_ref, h20_ref, c20_ref,
    embw1_ref, wc1_ref, whh1_ref, wih2_ref, whh2_ref, b2_ref, wq_ref, bq_ref,
    wcls_ref, clsb_ref,
    # streamed per step
    gold_ref, m1_ref, m2_ref,
    # outputs: logits, then (training only) the backward residuals, then the
    # per-head attention weights, then scratch
    logits_ref, *rest,
    heads: int, d_head: int, scale: float, h1dim: int, h2dim: int,
    sos_idx: int, use_dropout: bool, te_chunk: int,
    save_residuals: bool = True,
):
    if save_residuals:
        (sel_ref, gates1_ref, c1_ref, h1d_ref, gates2_ref, c2_ref, h2d_ref,
         ctx_ref) = rest[:8]
        rest = rest[8:]
    wgts_refs = rest[:heads]
    h1_s, c1_s, h2_s, c2_s, ctx_s, prev_s = rest[heads:]
    t = pl.program_id(0)
    wdt = k_ref.dtype
    te = k_ref.shape[1]

    @pl.when(t == 0)
    def _init():
        h1_s[:] = h10_ref[:].astype(jnp.float32)
        c1_s[:] = c10_ref[:].astype(jnp.float32)
        h2_s[:] = h20_ref[:].astype(jnp.float32)
        c2_s[:] = c20_ref[:].astype(jnp.float32)
        ctx_s[:] = ctx0_ref[:].astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, prev_s.shape, 1)
        prev_s[:] = (iota == sos_idx).astype(jnp.float32)

    # ---- teacher-forcing select (gold id >= 0 means forced this step) ----
    gold = gold_ref[0]                                   # (Bb, 1) f32
    iota_f = jax.lax.broadcasted_iota(
        jnp.int32, prev_s.shape, 1).astype(jnp.float32)  # (int iota only)
    gold_oh = (iota_f == gold).astype(jnp.float32)       # (Bb, V)
    sel = jnp.where(gold >= 0.0, gold_oh, prev_s[:])     # (Bb, V)
    if save_residuals:
        sel_ref[0] = sel.astype(sel_ref.dtype)

    # ---- cell 1 (gate math fp32; same kernel convention as lstm_pallas) --
    pre1 = (
        jnp.dot(sel.astype(wdt), embw1_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(ctx_s[:].astype(wdt), wc1_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h1_s[:].astype(wdt), whh1_ref[:], preferred_element_type=jnp.float32)
    )
    i1, f1, g1, o1, c1n, h1n = _gates_f32(pre1, c1_s[:], h1dim)
    h1d = h1n * m1_ref[0].astype(jnp.float32) if use_dropout else h1n
    if save_residuals:
        gd = gates1_ref.dtype
        gates1_ref[0, :, 0 * h1dim: 1 * h1dim] = i1.astype(gd)
        gates1_ref[0, :, 1 * h1dim: 2 * h1dim] = f1.astype(gd)
        gates1_ref[0, :, 2 * h1dim: 3 * h1dim] = g1.astype(gd)
        gates1_ref[0, :, 3 * h1dim: 4 * h1dim] = o1.astype(gd)
        c1_ref[0] = c1n.astype(c1_ref.dtype)
        h1d_ref[0] = h1d.astype(h1d_ref.dtype)

    # ---- cell 2 ----------------------------------------------------------
    pre2 = (
        jnp.dot(h1d.astype(wdt), wih2_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h2_s[:].astype(wdt), whh2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0].astype(jnp.float32)
    )
    i2, f2, g2, o2, c2n, h2n = _gates_f32(pre2, c2_s[:], h2dim)
    h2d = h2n * m2_ref[0].astype(jnp.float32) if use_dropout else h2n
    if save_residuals:
        gates2_ref[0, :, 0 * h2dim: 1 * h2dim] = i2.astype(gd)
        gates2_ref[0, :, 1 * h2dim: 2 * h2dim] = f2.astype(gd)
        gates2_ref[0, :, 2 * h2dim: 3 * h2dim] = g2.astype(gd)
        gates2_ref[0, :, 3 * h2dim: 4 * h2dim] = o2.astype(gd)
        c2_ref[0] = c2n.astype(c2_ref.dtype)
        h2d_ref[0] = h2d.astype(h2d_ref.dtype)

    # ---- attention (masked softmax over VMEM-resident K/V) ---------------
    q = jnp.dot(h2d.astype(wdt), wq_ref[:],
                preferred_element_type=jnp.float32) + bq_ref[0].astype(jnp.float32)
    ctx_parts = []
    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh = jnp.expand_dims(q[:, sl], 1).astype(wdt)    # (Bb, 1, d)
        # scores/context as chunked VPU mul-reduces: bf16 products with f32
        # accumulation — the same precision class as the scan path's einsum
        sc_parts = []
        for c0 in range(0, te, te_chunk):
            kc = k_ref[:, c0:c0 + te_chunk, sl]          # (Bb, tc, d)
            sc_parts.append(jnp.sum(qh * kc, axis=2, dtype=jnp.float32))
        sc = jnp.concatenate(sc_parts, axis=1) * scale   # (Bb, Te) f32
        sc = sc + bias_ref[:].astype(jnp.float32)
        mx = jnp.max(sc, axis=1, keepdims=True)
        e = jnp.exp(sc - mx)
        w = e / jnp.sum(e, axis=1, keepdims=True)        # 0 at pads (underflow)
        wgts_refs[h][0] = w.astype(wgts_refs[h].dtype)
        cparts = []
        for c0 in range(0, te, te_chunk):
            vc = v_ref[:, c0:c0 + te_chunk, sl]
            # NB: slice-then-expand_dims IN F32 — a combined [:, slice, None]
            # index lowers to an unsupported gather, and 16-bit minor-dim
            # insertion is unsupported in Mosaic
            wc = jnp.expand_dims(w[:, c0:c0 + te_chunk], 2).astype(wdt)
            cparts.append(jnp.sum(wc * vc, axis=1, dtype=jnp.float32))
        ctx_parts.append(sum(cparts))
    ctx_new = jnp.concatenate(ctx_parts, axis=1) if heads > 1 else ctx_parts[0]
    if save_residuals:
        ctx_ref[0] = ctx_new.astype(ctx_ref.dtype)

    # ---- tied classifier + greedy feedback -------------------------------
    dec_out = jnp.concatenate([q, ctx_new], axis=1).astype(wdt)   # (Bb, 2P)
    logits = jnp.dot(dec_out, wcls_ref[:],
                     preferred_element_type=jnp.float32) + clsb_ref[0].astype(jnp.float32)
    logits_ref[0] = logits.astype(logits_ref.dtype)
    best = jnp.max(logits, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 1).astype(jnp.float32)
    # first-max one-hot (ties resolved to the lowest index, argmax parity)
    is_max = (logits == best)
    first = jnp.min(jnp.where(is_max, iota, jnp.float32(logits.shape[1])),
                    axis=1, keepdims=True)
    prev_s[:] = (iota == first).astype(jnp.float32)

    h1_s[:] = h1d
    c1_s[:] = c1n
    h2_s[:] = h2d
    c2_s[:] = c2n
    ctx_s[:] = ctx_new


# ---------------------------------------------------------------------------
# backward kernel (time-descending adjoint)
# ---------------------------------------------------------------------------

def _decode_bwd_kernel(
    # constant blocks
    k_ref, v_ref, whh1t_ref, wc1t_ref, wih2t_ref, whh2t_ref, wqt_ref,
    # streamed per step (reversed index maps): saves + shifted saves
    gates1_ref, c1_ref, c1p_ref, gates2_ref, c2_ref, c2p_ref, m1_ref, m2_ref,
    # streamed upstream cotangents
    dqup_ref, dctxup_ref,
    # then variadic: per-head wgts saves + per-head upstream wgts cotangents
    # (inputs), followed by the outputs and scratch:
    #   dpre1, dpre2, dq, dctxtot, per-head dsc,
    #   dh10, dc10, dh20, dc20, dctx0 (final carries),
    #   scratch: dh1, dc1, dh2, dc2, dctx
    *rest,
    heads: int, d_head: int, scale: float, h1dim: int, h2dim: int,
    use_dropout: bool, te_chunk: int, n_steps: int,
):
    wgts_refs = rest[:heads]
    dwup_refs = rest[heads: 2 * heads]
    (dpre1_ref, dpre2_ref, dq_ref, dctxtot_ref) = rest[2 * heads: 2 * heads + 4]
    dsc_refs = rest[2 * heads + 4: 3 * heads + 4]
    (dh10_ref, dc10_ref, dh20_ref, dc20_ref, dctx0_ref) = (
        rest[3 * heads + 4: 3 * heads + 9])
    dh1_s, dc1_s, dh2_s, dc2_s, dctx_s = rest[3 * heads + 9:]
    t_rev = pl.program_id(0)           # 0 .. n_steps-1, walking DESCENDING time
    wdt = k_ref.dtype
    te = k_ref.shape[1]

    @pl.when(t_rev == 0)
    def _init():
        dh1_s[:] = jnp.zeros_like(dh1_s)
        dc1_s[:] = jnp.zeros_like(dc1_s)
        dh2_s[:] = jnp.zeros_like(dh2_s)
        dc2_s[:] = jnp.zeros_like(dc2_s)
        dctx_s[:] = jnp.zeros_like(dctx_s)

    # ---- context total: upstream (dec_out path) + next step's cell1 ------
    d_ctx = dctx_s[:] + dctxup_ref[0].astype(jnp.float32)         # (Bb, P)
    dctxtot_ref[0] = d_ctx.astype(dctxtot_ref.dtype)

    # ---- attention adjoint ------------------------------------------------
    dq_att_parts = []
    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        dch = jnp.expand_dims(d_ctx[:, sl], 1).astype(wdt)        # (Bb, 1, d)
        w = wgts_refs[h][0].astype(jnp.float32)                   # (Bb, Te)
        dw_parts = []
        for c0 in range(0, te, te_chunk):
            vc = v_ref[:, c0:c0 + te_chunk, sl]
            dw_parts.append(jnp.sum(dch * vc, axis=2, dtype=jnp.float32))
        dw = jnp.concatenate(dw_parts, axis=1)                    # (Bb, Te)
        dw = dw + dwup_refs[h][0].astype(jnp.float32)
        # softmax adjoint; w == 0 at pads keeps them at exactly 0
        dsc = w * (dw - jnp.sum(dw * w, axis=1, keepdims=True))
        dsc_refs[h][0] = dsc.astype(dsc_refs[h].dtype)
        dscs = dsc * scale  # f32; expand before the bf16 cast (Mosaic limits)
        dq_parts = []
        for c0 in range(0, te, te_chunk):
            kc = k_ref[:, c0:c0 + te_chunk, sl]
            dc = jnp.expand_dims(dscs[:, c0:c0 + te_chunk], 2).astype(wdt)
            dq_parts.append(jnp.sum(dc * kc, axis=1, dtype=jnp.float32))
        dq_att_parts.append(sum(dq_parts))                        # (Bb, d)
    dq_att = (jnp.concatenate(dq_att_parts, axis=1) if heads > 1
              else dq_att_parts[0])
    d_q = dq_att + dqup_ref[0].astype(jnp.float32)                # (Bb, P)
    dq_ref[0] = d_q.astype(dq_ref.dtype)

    # ---- cell 2 adjoint ----------------------------------------------------
    d_h2d = dh2_s[:] + jnp.dot(d_q.astype(wdt), wqt_ref[:],
                               preferred_element_type=jnp.float32)
    d_h2n = d_h2d * m2_ref[0].astype(jnp.float32) if use_dropout else d_h2d
    i2 = gates2_ref[0, :, 0 * h2dim: 1 * h2dim].astype(jnp.float32)
    f2 = gates2_ref[0, :, 1 * h2dim: 2 * h2dim].astype(jnp.float32)
    g2 = gates2_ref[0, :, 2 * h2dim: 3 * h2dim].astype(jnp.float32)
    o2 = gates2_ref[0, :, 3 * h2dim: 4 * h2dim].astype(jnp.float32)
    c2 = c2_ref[0].astype(jnp.float32)
    c2p = c2p_ref[0].astype(jnp.float32)
    tanh_c2 = jnp.tanh(c2)
    dc2_tot = dc2_s[:] + d_h2n * o2 * (1.0 - tanh_c2 * tanh_c2)
    dpre2_i = dc2_tot * g2 * i2 * (1.0 - i2)
    dpre2_f = dc2_tot * c2p * f2 * (1.0 - f2)
    dpre2_g = dc2_tot * i2 * (1.0 - g2 * g2)
    dpre2_o = d_h2n * tanh_c2 * o2 * (1.0 - o2)
    gd = dpre2_ref.dtype
    dpre2_ref[0, :, 0 * h2dim: 1 * h2dim] = dpre2_i.astype(gd)
    dpre2_ref[0, :, 1 * h2dim: 2 * h2dim] = dpre2_f.astype(gd)
    dpre2_ref[0, :, 2 * h2dim: 3 * h2dim] = dpre2_g.astype(gd)
    dpre2_ref[0, :, 3 * h2dim: 4 * h2dim] = dpre2_o.astype(gd)
    # dpre2 @ W^T via 4 partial dots (no in-kernel concatenate)
    wih2t = wih2t_ref[:]
    d_h1d_from2 = (
        jnp.dot(dpre2_i.astype(wdt), wih2t[0 * h2dim: 1 * h2dim],
                preferred_element_type=jnp.float32)
        + jnp.dot(dpre2_f.astype(wdt), wih2t[1 * h2dim: 2 * h2dim],
                  preferred_element_type=jnp.float32)
        + jnp.dot(dpre2_g.astype(wdt), wih2t[2 * h2dim: 3 * h2dim],
                  preferred_element_type=jnp.float32)
        + jnp.dot(dpre2_o.astype(wdt), wih2t[3 * h2dim: 4 * h2dim],
                  preferred_element_type=jnp.float32)
    )
    whh2t = whh2t_ref[:]
    dh2_prev = (
        jnp.dot(dpre2_i.astype(wdt), whh2t[0 * h2dim: 1 * h2dim],
                preferred_element_type=jnp.float32)
        + jnp.dot(dpre2_f.astype(wdt), whh2t[1 * h2dim: 2 * h2dim],
                  preferred_element_type=jnp.float32)
        + jnp.dot(dpre2_g.astype(wdt), whh2t[2 * h2dim: 3 * h2dim],
                  preferred_element_type=jnp.float32)
        + jnp.dot(dpre2_o.astype(wdt), whh2t[3 * h2dim: 4 * h2dim],
                  preferred_element_type=jnp.float32)
    )
    dc2_prev = dc2_tot * f2

    # ---- cell 1 adjoint ----------------------------------------------------
    d_h1d = dh1_s[:] + d_h1d_from2
    d_h1n = d_h1d * m1_ref[0].astype(jnp.float32) if use_dropout else d_h1d
    i1 = gates1_ref[0, :, 0 * h1dim: 1 * h1dim].astype(jnp.float32)
    f1 = gates1_ref[0, :, 1 * h1dim: 2 * h1dim].astype(jnp.float32)
    g1 = gates1_ref[0, :, 2 * h1dim: 3 * h1dim].astype(jnp.float32)
    o1 = gates1_ref[0, :, 3 * h1dim: 4 * h1dim].astype(jnp.float32)
    c1 = c1_ref[0].astype(jnp.float32)
    c1p = c1p_ref[0].astype(jnp.float32)
    tanh_c1 = jnp.tanh(c1)
    dc1_tot = dc1_s[:] + d_h1n * o1 * (1.0 - tanh_c1 * tanh_c1)
    dpre1_i = dc1_tot * g1 * i1 * (1.0 - i1)
    dpre1_f = dc1_tot * c1p * f1 * (1.0 - f1)
    dpre1_g = dc1_tot * i1 * (1.0 - g1 * g1)
    dpre1_o = d_h1n * tanh_c1 * o1 * (1.0 - o1)
    dpre1_ref[0, :, 0 * h1dim: 1 * h1dim] = dpre1_i.astype(gd)
    dpre1_ref[0, :, 1 * h1dim: 2 * h1dim] = dpre1_f.astype(gd)
    dpre1_ref[0, :, 2 * h1dim: 3 * h1dim] = dpre1_g.astype(gd)
    dpre1_ref[0, :, 3 * h1dim: 4 * h1dim] = dpre1_o.astype(gd)
    whh1t = whh1t_ref[:]
    dh1_prev = (
        jnp.dot(dpre1_i.astype(wdt), whh1t[0 * h1dim: 1 * h1dim],
                preferred_element_type=jnp.float32)
        + jnp.dot(dpre1_f.astype(wdt), whh1t[1 * h1dim: 2 * h1dim],
                  preferred_element_type=jnp.float32)
        + jnp.dot(dpre1_g.astype(wdt), whh1t[2 * h1dim: 3 * h1dim],
                  preferred_element_type=jnp.float32)
        + jnp.dot(dpre1_o.astype(wdt), whh1t[3 * h1dim: 4 * h1dim],
                  preferred_element_type=jnp.float32)
    )
    wc1t = wc1t_ref[:]
    dctx_prev = (
        jnp.dot(dpre1_i.astype(wdt), wc1t[0 * h1dim: 1 * h1dim],
                preferred_element_type=jnp.float32)
        + jnp.dot(dpre1_f.astype(wdt), wc1t[1 * h1dim: 2 * h1dim],
                  preferred_element_type=jnp.float32)
        + jnp.dot(dpre1_g.astype(wdt), wc1t[2 * h1dim: 3 * h1dim],
                  preferred_element_type=jnp.float32)
        + jnp.dot(dpre1_o.astype(wdt), wc1t[3 * h1dim: 4 * h1dim],
                  preferred_element_type=jnp.float32)
    )
    dc1_prev = dc1_tot * f1

    dh1_s[:] = dh1_prev
    dc1_s[:] = dc1_prev
    dh2_s[:] = dh2_prev
    dc2_s[:] = dc2_prev
    dctx_s[:] = dctx_prev

    # final carries (constant-index output blocks — the write at the last
    # grid step, t_rev == n_steps - 1 i.e. original t == 0, is what lands)
    dh10_ref[:] = dh1_prev.astype(dh10_ref.dtype)
    dc10_ref[:] = dc1_prev.astype(dc10_ref.dtype)
    dh20_ref[:] = dh2_prev.astype(dh20_ref.dtype)
    dc20_ref[:] = dc2_prev.astype(dc20_ref.dtype)
    dctx0_ref[:] = dctx_prev.astype(dctx0_ref.dtype)


# ---------------------------------------------------------------------------
# host-side launchers (one pallas_call per batch chunk: the K/V block's index
# map is truly constant, so Mosaic keeps ONE VMEM copy, no double buffering)
# ---------------------------------------------------------------------------

def pick_chunk(batch: int, te: int, proj: int, interpret: bool, *,
               h1dim: int, h2dim: int, vp: int, heads: int) -> int:
    """Largest batch chunk whose scoped-VMEM footprint fits the 16 MB stack.

    The decision is EMPIRICAL, not purely modeled. Measured on-chip
    (2026-08-18) at proj=256: the base-class decoder (h1<=512) compiles and
    runs at bb=32 across the whole flagship bucket ladder (months of runs),
    while the scaled arch (h1=1024, heads=4) overflowed the 16 MB scoped
    stack at bb=32 (fwd: 16.07 MB @ Te=192, 18.47 MB @ Te=128) AND at
    bb=16 on the backward kernel (16.70 MB @ Te=192/L=224 — even though the
    same shapes at L=192 fit, i.e. Mosaic's scoped allocation is not a
    simple function of the block shapes; an analytic model measured ±65%
    error against it). So: hard-cap the chunk at 8 for h1 > 512 — worst
    observed footprint scaled to bb=8 leaves >3x margin. The residual
    analytic row model below only rejects outlandish shapes (huge Te/proj)
    where even bb=8 cannot fit, routing them to the scan path.
    """
    if interpret:
        return batch
    cap = 32 if h1dim <= 512 else 8             # empirical scoped-VMEM rule
    budget = int(15.5 * 1024 * 1024)
    kv_cap = 7 * 1024 * 1024
    if h1dim > 512 and _scoped_vmem_cap() > 16 * 1024 * 1024:
        # raised Mosaic scoped-VMEM limit (the kernels carry
        # vmem_limit_bytes, see _raised_params): the measured bb=16 backward
        # footprint (16.70 MB @ Te=192/L=224) fits the raised cap with >2x
        # margin, and the round-5 on-chip A/B (tools/speller_control.py,
        # results/speller_control_scaled.json: scaled flagship shape
        # B=128/Te=192/L=192) measured bb=32 FASTER than bb=16 — fwd
        # 19.8 vs 23.2 ms, fwd+bwd 38.4 vs 44.9 ms (−14%): fewer serial
        # batch-chunk launches amortize the per-step weight-block residency
        # over more rows, the same mechanism that made the H=1024 adjoint
        # unchunking a −21% win. Default is therefore 32 under the raised
        # cap; TPU_LAS_BIGH_BB restores 16 (or 8) for A/Bs. The base-arch
        # (h1<=512) rule is untouched — its kernels run under the DEFAULT
        # limit and the 32/15.5MB/7MB calibration stands.
        cap = int(os.environ.get("TPU_LAS_BIGH_BB", "32"))
        budget = min(int(1.5 * budget),
                     _scoped_vmem_cap() - 8 * 1024 * 1024)
        kv_cap = 14 * 1024 * 1024
    kv = 2 * te * proj * 2                      # K+V, one VMEM copy, bf16
    out_x = (2 * vp + 6 * h1dim + 6 * h2dim + proj
             + heads * te)                      # residual streams, lane dims
    in_x = 1 + h1dim + h2dim                    # gold + dropout masks
    scratch = (2 * h1dim + 2 * h2dim + proj + vp) * 4
    slabs = 16 * (4 * h1dim + 4 * h2dim + heads * te
                  + 2 * proj + 2 * vp) * 4      # fp32 temporaries (fitted)
    row = kv + (out_x + in_x) * 2 * 2 + scratch + slabs
    for cb in (32, 16, 8):
        # the pre-round-3 conservative K/V-residency cap (7 MB) is kept as
        # an AND-constraint: every chunk the row model admits beyond it
        # (long-Te shapes, e.g. Te=448 at h1=512) is unmeasured on-chip,
        # and the row model's fitted error bars (±65%) don't cover it
        if (cb <= cap and batch % cb == 0 and cb * row <= budget
                and 2 * cb * te * proj * 2 <= kv_cap):
            return cb
    return 0  # no valid chunking -> caller falls back to the scan path


def _const3(_t):
    return (0, 0, 0)


def _const2(_t):
    return (0, 0)


def _fwd_chunk(k, v, bias, ctx0, h10, c10, h20, c20, embw1, wc1, whh1, wih2,
               whh2, b2, wq, bq, wcls, clsb, gold, m1, m2, *, heads, scale,
               sos_idx, use_dropout, te_chunk, interpret,
               save_residuals=True):
    """One forward launch over a (T, Bb, ·) chunk. Returns the streamed
    outputs; all layouts time-major. ``save_residuals=False`` (the eval
    free-run) skips every backward-residual stream — only logits and the
    per-head attention weights come back."""
    n_steps, bb, _ = gold.shape
    te, proj = k.shape[1], k.shape[2]
    h1dim = whh1.shape[0]
    h2dim = whh2.shape[0]
    vp = embw1.shape[0]
    dt = k.dtype
    d_head = proj // heads

    def stream(x):  # (T, Bb, X) one block per step
        return pl.BlockSpec((1, bb, x), lambda t: (t, 0, 0))

    m_spec = (stream(h1dim), stream(h2dim)) if use_dropout else (
        pl.BlockSpec((1, bb, h1dim), _const3),
        pl.BlockSpec((1, bb, h2dim), _const3),
    )
    kernel = functools.partial(
        _decode_fwd_kernel, heads=heads, d_head=d_head, scale=scale,
        h1dim=h1dim, h2dim=h2dim, sos_idx=sos_idx, use_dropout=use_dropout,
        te_chunk=te_chunk, save_residuals=save_residuals,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        compiler_params=_raised_params(h1dim),
        in_specs=[
            pl.BlockSpec((bb, te, proj), _const3),     # k
            pl.BlockSpec((bb, te, proj), _const3),     # v
            pl.BlockSpec((bb, te), _const2),           # bias
            pl.BlockSpec((bb, proj), _const2),         # ctx0
            pl.BlockSpec((bb, h1dim), _const2),        # h10
            pl.BlockSpec((bb, h1dim), _const2),        # c10
            pl.BlockSpec((bb, h2dim), _const2),        # h20
            pl.BlockSpec((bb, h2dim), _const2),        # c20
            pl.BlockSpec((vp, 4 * h1dim), _const2),    # embw1
            pl.BlockSpec((proj, 4 * h1dim), _const2),  # wc1
            pl.BlockSpec((h1dim, 4 * h1dim), _const2),  # whh1
            pl.BlockSpec((h1dim, 4 * h2dim), _const2),  # wih2
            pl.BlockSpec((h2dim, 4 * h2dim), _const2),  # whh2
            pl.BlockSpec((1, 4 * h2dim), _const2),     # b2
            pl.BlockSpec((h2dim, proj), _const2),      # wq
            pl.BlockSpec((1, proj), _const2),          # bq
            pl.BlockSpec((2 * proj, vp), _const2),     # wcls
            pl.BlockSpec((1, vp), _const2),            # clsb
            stream(1),                                 # gold
            m_spec[0], m_spec[1],                      # m1, m2
        ],
        out_specs=(
            [stream(vp)]
            + ([stream(vp), stream(4 * h1dim), stream(h1dim),
                stream(h1dim), stream(4 * h2dim), stream(h2dim),
                stream(h2dim), stream(proj)] if save_residuals else [])
            + [stream(te) for _ in range(heads)]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((n_steps, bb, vp), dt)]        # logits
            + ([jax.ShapeDtypeStruct((n_steps, bb, vp), dt),     # sel one-hot
                jax.ShapeDtypeStruct((n_steps, bb, 4 * h1dim), dt),  # gates1
                jax.ShapeDtypeStruct((n_steps, bb, h1dim), dt),  # c1
                jax.ShapeDtypeStruct((n_steps, bb, h1dim), dt),  # h1d
                jax.ShapeDtypeStruct((n_steps, bb, 4 * h2dim), dt),  # gates2
                jax.ShapeDtypeStruct((n_steps, bb, h2dim), dt),  # c2
                jax.ShapeDtypeStruct((n_steps, bb, h2dim), dt),  # h2d
                jax.ShapeDtypeStruct((n_steps, bb, proj), dt)]   # ctx
               if save_residuals else [])
            + [jax.ShapeDtypeStruct((n_steps, bb, te), dt)
               for _ in range(heads)]                            # wgts/head
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, h1dim), jnp.float32),
            pltpu.VMEM((bb, h1dim), jnp.float32),
            pltpu.VMEM((bb, h2dim), jnp.float32),
            pltpu.VMEM((bb, h2dim), jnp.float32),
            pltpu.VMEM((bb, proj), jnp.float32),
            pltpu.VMEM((bb, vp), jnp.float32),
        ] if pltpu is not None else None,
        interpret=interpret,
    )(k, v, bias, ctx0, h10, c10, h20, c20, embw1, wc1, whh1, wih2, whh2,
      b2, wq, bq, wcls, clsb, gold, m1, m2)
    return out


def _bwd_chunk(k, v, whh1t, wc1t, wih2t, whh2t, wqt, gates1, c1, c1p, gates2,
               c2, c2p, m1, m2, dqup, dctxup, wgts_list, dwup_list, *, heads,
               scale, use_dropout, te_chunk, interpret):
    """One backward launch over a chunk; walks original time DESCENDING via
    reversed block index maps (zero-copy, same trick as ops/lstm_pallas.py)."""
    n_steps, bb, _ = gates1.shape
    te, proj = k.shape[1], k.shape[2]
    h1dim = c1.shape[2]
    h2dim = c2.shape[2]
    dt = k.dtype
    d_head = proj // heads

    def rstream(x):  # reversed per-step blocks
        return pl.BlockSpec((1, bb, x), lambda t: (n_steps - 1 - t, 0, 0))

    m_spec = (rstream(h1dim), rstream(h2dim)) if use_dropout else (
        pl.BlockSpec((1, bb, h1dim), _const3),
        pl.BlockSpec((1, bb, h2dim), _const3),
    )
    kernel = functools.partial(
        _decode_bwd_kernel, heads=heads, d_head=d_head, scale=scale,
        h1dim=h1dim, h2dim=h2dim, use_dropout=use_dropout,
        te_chunk=te_chunk, n_steps=n_steps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        compiler_params=_raised_params(h1dim),
        in_specs=(
            [pl.BlockSpec((bb, te, proj), _const3),      # k
             pl.BlockSpec((bb, te, proj), _const3),      # v
             pl.BlockSpec((4 * h1dim, h1dim), _const2),  # whh1^T
             pl.BlockSpec((4 * h1dim, proj), _const2),   # wc1^T
             pl.BlockSpec((4 * h2dim, h1dim), _const2),  # wih2^T
             pl.BlockSpec((4 * h2dim, h2dim), _const2),  # whh2^T
             pl.BlockSpec((proj, h2dim), _const2),       # wq^T
             rstream(4 * h1dim), rstream(h1dim), rstream(h1dim),  # g1,c1,c1p
             rstream(4 * h2dim), rstream(h2dim), rstream(h2dim),  # g2,c2,c2p
             m_spec[0], m_spec[1],                       # m1, m2
             rstream(proj), rstream(proj)]               # dqup, dctxup
            + [rstream(te) for _ in range(2 * heads)]    # wgts, dwup / head
        ),
        out_specs=(
            [rstream(4 * h1dim), rstream(4 * h2dim), rstream(proj),
             rstream(proj)]
            + [rstream(te) for _ in range(heads)]        # dsc / head
            + [pl.BlockSpec((bb, h1dim), _const2),
               pl.BlockSpec((bb, h1dim), _const2),
               pl.BlockSpec((bb, h2dim), _const2),
               pl.BlockSpec((bb, h2dim), _const2),
               pl.BlockSpec((bb, proj), _const2)]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((n_steps, bb, 4 * h1dim), dt),  # dpre1
             jax.ShapeDtypeStruct((n_steps, bb, 4 * h2dim), dt),  # dpre2
             jax.ShapeDtypeStruct((n_steps, bb, proj), dt),       # dq
             jax.ShapeDtypeStruct((n_steps, bb, proj), dt)]       # dctxtot
            + [jax.ShapeDtypeStruct((n_steps, bb, te), dt)
               for _ in range(heads)]                             # dsc / head
            + [jax.ShapeDtypeStruct((bb, h1dim), jnp.float32),    # dh10
               jax.ShapeDtypeStruct((bb, h1dim), jnp.float32),    # dc10
               jax.ShapeDtypeStruct((bb, h2dim), jnp.float32),    # dh20
               jax.ShapeDtypeStruct((bb, h2dim), jnp.float32),    # dc20
               jax.ShapeDtypeStruct((bb, proj), jnp.float32)]     # dctx0
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, h1dim), jnp.float32),
            pltpu.VMEM((bb, h1dim), jnp.float32),
            pltpu.VMEM((bb, h2dim), jnp.float32),
            pltpu.VMEM((bb, h2dim), jnp.float32),
            pltpu.VMEM((bb, proj), jnp.float32),
        ] if pltpu is not None else None,
        interpret=interpret,
    )(k, v, whh1t, wc1t, wih2t, whh2t, wqt, gates1, c1, c1p, gates2, c2,
      c2p, m1, m2, dqup, dctxup, *wgts_list, *dwup_list)
    return out


# ---------------------------------------------------------------------------
# differentiable fused decode over the full batch
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_decode(static, k, v, bias, ctx0, h10, c10, h20, c20, embw1, wc1,
                 whh1, wih2, whh2, b2, wq, bq, wcls, clsb, gold, m1, m2):
    """Differentiable fused training decode.

    ``static``: (heads, scale, sos_idx, use_dropout, chunk, te_chunk,
    interpret). Tensor layouts are time-major: gold/m1/m2 (T, B, ·);
    k/v (B, Te, P) with head h in lanes [h*d : (h+1)*d]; bias (B, Te)
    additive (0 valid / NEG pad).

    Returns (logits (T, B, Vp) — slice [..., :vocab] outside —,
    wgts (T, B, heads, Te)).
    """
    outs = _fused_forward(static, k, v, bias, ctx0, h10, c10, h20, c20,
                          embw1, wc1, whh1, wih2, whh2, b2, wq, bq, wcls,
                          clsb, gold, m1, m2, save_residuals=False)
    heads = static[0]
    logits = outs[0]
    wgts = jnp.stack(outs[1:1 + heads], axis=2)  # (T, B, heads, Te)
    return logits, wgts


def _fused_forward(static, k, v, bias, ctx0, h10, c10, h20, c20, embw1, wc1,
                   whh1, wih2, whh2, b2, wq, bq, wcls, clsb, gold, m1, m2,
                   save_residuals=True):
    heads, scale, sos_idx, use_dropout, chunk, te_chunk, interpret = static
    batch = k.shape[0]
    parts = []
    for b0 in range(0, batch, chunk):
        sl = slice(b0, b0 + chunk)
        parts.append(_fwd_chunk(
            k[sl], v[sl], bias[sl], ctx0[sl], h10[sl], c10[sl], h20[sl],
            c20[sl], embw1, wc1, whh1, wih2, whh2, b2, wq, bq, wcls, clsb,
            gold[:, sl], m1[:, sl], m2[:, sl],
            heads=heads, scale=scale, sos_idx=sos_idx,
            use_dropout=use_dropout, te_chunk=te_chunk, interpret=interpret,
            save_residuals=save_residuals,
        ))
    # concatenate chunks along batch (axis 1 of the time-major streams)
    return [jnp.concatenate([p[i] for p in parts], axis=1)
            for i in range(len(parts[0]))]


def _fused_fwd(static, k, v, bias, ctx0, h10, c10, h20, c20, embw1, wc1,
               whh1, wih2, whh2, b2, wq, bq, wcls, clsb, gold, m1, m2):
    outs = _fused_forward(static, k, v, bias, ctx0, h10, c10, h20, c20,
                          embw1, wc1, whh1, wih2, whh2, b2, wq, bq, wcls,
                          clsb, gold, m1, m2)
    heads = static[0]
    (logits, sel, gates1, c1, h1d, gates2, c2, h2d, ctx) = outs[:9]
    wgts_list = outs[9:9 + heads]
    wgts = jnp.stack(wgts_list, axis=2)
    res = (k, v, ctx0, h10, c10, h20, c20, wc1, whh1, wih2, whh2, wq, wcls,
           sel, gates1, c1, h1d, gates2, c2, h2d, ctx, wgts_list, m1, m2,
           bias, embw1, b2, bq, clsb, gold)
    return (logits, wgts), res


def _fused_bwd(static, res, cotangents):
    heads, scale, sos_idx, use_dropout, chunk, te_chunk, interpret = static
    d_logits, d_wgts = cotangents
    (k, v, ctx0, h10, c10, h20, c20, wc1, whh1, wih2, whh2, wq, wcls,
     sel, gates1, c1, h1d, gates2, c2, h2d, ctx, wgts_list, m1, m2,
     bias, embw1, b2, bq, clsb, gold) = res
    batch = k.shape[0]
    proj = k.shape[2]
    dt = k.dtype
    f32 = jnp.float32

    # upstream through the tied classifier: d_dec_out = d_logits @ wcls^T
    d_dec = jnp.einsum("tbv,ev->tbe", d_logits, wcls,
                       preferred_element_type=f32).astype(dt)
    dqup = d_dec[..., :proj]
    dctxup = d_dec[..., proj:]

    # shifted saves (the adjoint consumes step t-1's carries)
    c1p = jnp.concatenate([c10[None].astype(dt), c1[:-1]], axis=0)
    c2p = jnp.concatenate([c20[None].astype(dt), c2[:-1]], axis=0)

    dpre1_p, dpre2_p, dq_p, dctxtot_p, dsc_p = [], [], [], [], []
    dh10_p, dc10_p, dh20_p, dc20_p, dctx0_p = [], [], [], [], []
    for b0 in range(0, batch, chunk):
        sl = slice(b0, b0 + chunk)
        outs = _bwd_chunk(
            k[sl], v[sl],
            jnp.swapaxes(whh1, 0, 1), jnp.swapaxes(wc1, 0, 1),
            jnp.swapaxes(wih2, 0, 1), jnp.swapaxes(whh2, 0, 1),
            jnp.swapaxes(wq, 0, 1),
            gates1[:, sl], c1[:, sl], c1p[:, sl],
            gates2[:, sl], c2[:, sl], c2p[:, sl],
            m1[:, sl], m2[:, sl], dqup[:, sl], dctxup[:, sl],
            [w[:, sl] for w in wgts_list],
            [d_wgts[:, sl, h].astype(dt) for h in range(heads)],
            heads=heads, scale=scale, use_dropout=use_dropout,
            te_chunk=te_chunk, interpret=interpret,
        )
        dpre1_p.append(outs[0])
        dpre2_p.append(outs[1])
        dq_p.append(outs[2])
        dctxtot_p.append(outs[3])
        dsc_p.append(outs[4:4 + heads])
        dh10_p.append(outs[4 + heads])
        dc10_p.append(outs[5 + heads])
        dh20_p.append(outs[6 + heads])
        dc20_p.append(outs[7 + heads])
        dctx0_p.append(outs[8 + heads])

    dpre1 = jnp.concatenate(dpre1_p, axis=1)
    dpre2 = jnp.concatenate(dpre2_p, axis=1)
    dq = jnp.concatenate(dq_p, axis=1)
    dctxtot = jnp.concatenate(dctxtot_p, axis=1)
    dsc = [jnp.concatenate([p[h] for p in dsc_p], axis=1)
           for h in range(heads)]
    d_h10 = jnp.concatenate(dh10_p, axis=0).astype(h10.dtype)
    d_c10 = jnp.concatenate(dc10_p, axis=0).astype(c10.dtype)
    d_h20 = jnp.concatenate(dh20_p, axis=0).astype(h20.dtype)
    d_c20 = jnp.concatenate(dc20_p, axis=0).astype(c20.dtype)
    d_ctx0 = jnp.concatenate(dctx0_p, axis=0).astype(ctx0.dtype)

    # ---- weight gradients: big MXU matmuls over all (T*B) rows ----------
    ctx_prev = jnp.concatenate([ctx0[None].astype(dt), ctx[:-1]], axis=0)
    h1d_prev = jnp.concatenate([h10[None].astype(dt), h1d[:-1]], axis=0)
    h2d_prev = jnp.concatenate([h20[None].astype(dt), h2d[:-1]], axis=0)

    d_embw1 = jnp.einsum("tbv,tbk->vk", sel, dpre1,
                         preferred_element_type=f32).astype(embw1.dtype)
    d_wc1 = jnp.einsum("tbp,tbk->pk", ctx_prev, dpre1,
                       preferred_element_type=f32).astype(wc1.dtype)
    d_whh1 = jnp.einsum("tbh,tbk->hk", h1d_prev, dpre1,
                        preferred_element_type=f32).astype(whh1.dtype)
    d_wih2 = jnp.einsum("tbh,tbk->hk", h1d, dpre2,
                        preferred_element_type=f32).astype(wih2.dtype)
    d_whh2 = jnp.einsum("tbh,tbk->hk", h2d_prev, dpre2,
                        preferred_element_type=f32).astype(whh2.dtype)
    d_b2 = jnp.sum(dpre2, axis=(0, 1), dtype=f32)[None].astype(b2.dtype)
    d_wq = jnp.einsum("tbh,tbp->hp", h2d, dq,
                      preferred_element_type=f32).astype(wq.dtype)
    d_bq = jnp.sum(dq, axis=(0, 1), dtype=f32)[None].astype(bq.dtype)

    # classifier (recompute q once as a single big matmul)
    q_all = jnp.einsum("tbh,hp->tbp", h2d, wq.astype(dt)) + bq.astype(dt)
    dec_out = jnp.concatenate([q_all, ctx], axis=-1)
    d_wcls = jnp.einsum("tbe,tbv->ev", dec_out, d_logits,
                        preferred_element_type=f32).astype(wcls.dtype)
    d_clsb = jnp.sum(d_logits, axis=(0, 1), dtype=f32)[None].astype(clsb.dtype)

    # attention cache gradients per head
    d_head = proj // heads
    dk_parts, dv_parts = [], []
    for h in range(heads):
        hs = slice(h * d_head, (h + 1) * d_head)
        dk_parts.append(scale * jnp.einsum(
            "tbe,tbd->bed", dsc[h], q_all[..., hs].astype(dt),
            preferred_element_type=f32))
        dv_parts.append(jnp.einsum(
            "tbe,tbd->bed", wgts_list[h], dctxtot[..., hs],
            preferred_element_type=f32))
    d_k = jnp.concatenate(dk_parts, axis=2).astype(k.dtype)
    d_v = jnp.concatenate(dv_parts, axis=2).astype(v.dtype)

    zeros = lambda x: jnp.zeros_like(x)
    return (d_k, d_v, zeros(bias), d_ctx0, d_h10, d_c10, d_h20, d_c20,
            d_embw1, d_wc1, d_whh1, d_wih2, d_whh2, d_b2, d_wq, d_bq,
            d_wcls, d_clsb, zeros(gold), zeros(m1), zeros(m2))


fused_decode.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# speller integration (called from models/las.py::speller_apply)
# ---------------------------------------------------------------------------

def _pick_te_chunk(te: int) -> int:
    for c in (64, 32, 16, 8):
        if te % c == 0:
            return c
    return te


def fused_decode_unavailable_reason(cfg, batch: int, enc_len: int,
                                    interpret: bool | None = None):
    """Why the fused decoder can't serve this shape, or None if it can.

    The constraints are TPU blocked-layout requirements: 32/64-wide head
    slices verified to lower on Mosaic (sub-lane-width vector slicing).
    d_head=16 PROBED on-chip (2026-08-17): isolated 16-wide slice+dot
    kernels lower fine, but the full decode kernel crashes the Mosaic
    compiler at 16 — the >=32 gate is a measured boundary, not caution.
    """
    if interpret is None:
        interpret = _auto_interpret()
    if interpret:
        return None
    d_head = cfg.att_proj_dim // cfg.att_heads
    if batch % 8 != 0:
        return f"batch {batch} not a multiple of 8"
    if enc_len % 16 != 0:
        return f"encoder length {enc_len} not a multiple of 16"
    if cfg.att_proj_dim % 128 != 0:
        return f"att_proj_dim {cfg.att_proj_dim} not a multiple of 128"
    if d_head % 32 != 0:
        return (f"d_head {d_head} (= att_proj_dim/att_heads) not a multiple "
                "of 32")
    if cfg.dec_lstm_hid_dim % 128 != 0:
        return f"dec_lstm_hid_dim {cfg.dec_lstm_hid_dim} not a multiple of 128"
    if cfg.dec_lstm_out_dim % 128 != 0:
        return f"dec_lstm_out_dim {cfg.dec_lstm_out_dim} not a multiple of 128"
    vp = max(32, ((cfg.dec_vocab_size + 7) // 8) * 8)
    te_k = enc_len + (-enc_len) % 64   # the launcher pads Te to 64-multiples
    if pick_chunk(batch, te_k, cfg.att_proj_dim, False,
                  h1dim=cfg.dec_lstm_hid_dim, h2dim=cfg.dec_lstm_out_dim,
                  vp=vp, heads=cfg.att_heads) <= 0:
        return (f"no VMEM-fitting batch chunk for (B={batch}, Te={enc_len}, "
                f"proj={cfg.att_proj_dim}, h1={cfg.dec_lstm_hid_dim}, "
                f"h2={cfg.dec_lstm_out_dim}, heads={cfg.att_heads})")
    return None


def fused_decode_available(cfg, batch: int, enc_len: int,
                           interpret: bool | None = None) -> bool:
    """Shape/tiling gate for the fused decoder (TPU blocked layouts)."""
    return fused_decode_unavailable_reason(cfg, batch, enc_len,
                                           interpret) is None


def speller_apply_fused(params: dict, cfg, rng, enc_h, enc_l, dec_y,
                        tf_rate=1.0, train: bool = True,
                        interpret: bool | None = None):
    """Fused-kernel twin of models/las.py::speller_apply — the training
    decode AND the eval free-run (``dec_y=None``: CHR_MAX_STEPS greedy
    steps, no forcing/dropout, residual streams skipped); no init_force.
    Identical semantics: the same per-step batch-shared
    teacher-forcing coins and per-step dropout masks are drawn from the same
    RNG stream, so (up to kernel fp32 gate math vs the scan's compute-dtype
    math) outputs match the scan path.

    Returns the same SpellerOutput(logits (B, steps, V), att_map).
    """
    import math

    from attention_based_e2e_asr_dnn_tpu.models.las import SpellerOutput
    from attention_based_e2e_asr_dnn_tpu.ops.attention import (
        cross_attention_precompute,
        cross_attention_step,
    )

    if interpret is None:
        interpret = _auto_interpret()
    batch, enc_max_len, _ = enc_h.shape
    dtype = enc_h.dtype
    # dec_y None = free-running eval decode: CHR_MAX_STEPS greedy steps, no
    # teacher forcing, no dropout (reference src/models.py:300-386 semantics)
    steps = dec_y.shape[1] if dec_y is not None else cfg.CHR_MAX_STEPS
    heads = cfg.att_heads
    proj = cfg.att_proj_dim
    h1dim = cfg.dec_lstm_hid_dim
    h2dim = cfg.dec_lstm_out_dim
    emb_dim = cfg.dec_emb_dim
    vocab = cfg.dec_vocab_size
    vp = max(32, ((vocab + 7) // 8) * 8)
    emb = params["char_emb"].astype(dtype)

    # --- teacher-forcing coins + dropout masks: same stream as the scan ---
    if train and rng is not None:
        rng, coin_rng, drop_rng = jax.random.split(rng, 3)
        coins = jax.random.uniform(coin_rng, (steps,))
        coins = coins.at[0].set(2.0)
        step_rngs = jax.random.split(drop_rng, steps)
    else:
        coins = jnp.full((steps,), 2.0)
        step_rngs = None
    if dec_y is not None:
        use_gold = coins <= tf_rate                          # (steps,)
        gold_ids = jnp.concatenate(
            [jnp.zeros((batch, 1), dec_y.dtype), dec_y[:, :-1]], axis=1
        ).T.astype(jnp.float32)                              # (T, B)
        gold = jnp.where(use_gold[:, None], gold_ids, -1.0)[..., None]
    else:
        gold = jnp.full((steps, batch, 1), -1.0, jnp.float32)  # never forced

    drop_rate = cfg.dec_lstm_dropout if train else 0.0
    use_dropout = bool(drop_rate > 0.0) and step_rngs is not None
    if use_dropout:
        keep = 1.0 - drop_rate

        def _masks(k_):
            r1, r2 = jax.random.split(k_)
            m1_ = jax.random.bernoulli(r1, keep, (batch, h1dim)).astype(dtype) / keep
            m2_ = jax.random.bernoulli(r2, keep, (batch, h2dim)).astype(dtype) / keep
            return m1_, m2_

        m1, m2 = jax.vmap(_masks)(step_rngs)                 # (T, B, H)
    else:
        m1 = jnp.ones((1, batch, h1dim), dtype)
        m2 = jnp.ones((1, batch, h2dim), dtype)

    # --- attention cache in lane-concatenated head layout ------------------
    cache = cross_attention_precompute(params["attention"], enc_h, enc_l, heads)
    k = jnp.swapaxes(cache.keys, 1, 2).reshape(batch, enc_max_len, proj)
    v = jnp.swapaxes(cache.values, 1, 2).reshape(batch, enc_max_len, proj)
    bias = jnp.where(cache.mask, jnp.asarray(NEG, dtype),
                     jnp.zeros((), dtype))                   # (B, Te)

    # Pad Te up to a multiple of 64 (semantically free: padded K/V columns
    # carry a NEG bias, so the in-kernel softmax zeroes them; jnp.pad's VJP
    # slices the zero cotangents back off). This normalizes every bucket
    # onto te_chunk=64 kernel shapes — the Te%64!=0 variants (te_chunk=32)
    # measured a ~1 MB LARGER scoped-VMEM footprint on the backward kernel
    # (Te=160: 16.17 MB at bb=16 vs Te=192 fitting, 2026-08-18).
    te_pad = (-enc_max_len) % 64 if not interpret else 0
    te_k = enc_max_len + te_pad
    if te_pad:
        k = jnp.pad(k, ((0, 0), (0, te_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, te_pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, te_pad)), constant_values=NEG)

    # --- t = -1 init attention step (outside, ordinary autodiff) -----------
    init_query = jnp.broadcast_to(
        params["init_query"].astype(dtype), (batch, h2dim))
    context0, wgts0, _ = cross_attention_step(
        params["attention"], cache, init_query, heads, cfg.legacy_scale)
    h10 = jnp.broadcast_to(params["init_h1"].astype(dtype), (batch, h1dim))
    c10 = jnp.broadcast_to(params["init_c1"].astype(dtype), (batch, h1dim))
    h20 = jnp.broadcast_to(params["init_h2"].astype(dtype), (batch, h2dim))
    c20 = jnp.broadcast_to(params["init_c2"].astype(dtype), (batch, h2dim))

    # --- pre-projected char embedding + padded tied classifier -------------
    w_ih1 = params["cell1"]["w_ih"].astype(dtype)            # (E + P, 4H1)
    b1 = params["cell1"]["b"].astype(dtype)
    emb_pad = jnp.pad(emb, ((0, vp - vocab), (0, 0)))
    embw1 = jnp.dot(emb_pad, w_ih1[:emb_dim]) + b1           # (Vp, 4H1)
    wc1 = w_ih1[emb_dim:]
    whh1 = params["cell1"]["w_hh"].astype(dtype)
    wih2 = params["cell2"]["w_ih"].astype(dtype)
    whh2 = params["cell2"]["w_hh"].astype(dtype)
    b2 = params["cell2"]["b"].astype(dtype)[None]
    wq = params["attention"]["query_map"]["w"].astype(dtype)
    bq = params["attention"]["query_map"]["b"].astype(dtype)[None]
    wcls = jnp.pad(emb.T, ((0, 0), (0, vp - vocab)))         # (E, Vp)
    clsb = jnp.pad(params["cls_b"].astype(dtype), (0, vp - vocab),
                   constant_values=NEG)[None]                # pads can't argmax

    d_head = proj // heads
    scale = math.sqrt(d_head) if cfg.legacy_scale else 1.0 / math.sqrt(d_head)
    chunk = pick_chunk(batch, te_k, proj, interpret,
                       h1dim=h1dim, h2dim=h2dim, vp=vp, heads=heads)
    static = (heads, float(scale), int(cfg.CHR_SOS_IDX), use_dropout,
              int(chunk), _pick_te_chunk(te_k), bool(interpret))

    logits_t, wgts_t = fused_decode(
        static, k, v, bias, context0, h10, c10, h20, c20, embw1, wc1, whh1,
        wih2, whh2, b2, wq, bq, wcls, clsb, gold, m1, m2)

    logits = jnp.swapaxes(logits_t, 0, 1)[:, :, :vocab]      # (B, steps, V)
    # att map of sample 0 incl. the t=-1 init step, plot layout
    w_sample0 = jnp.swapaxes(wgts_t[:, 0], 0, 1)[:, :, :enc_max_len]
    att_map = jnp.concatenate([wgts0[0][:, None, :], w_sample0], axis=1)
    att_map = jnp.swapaxes(att_map, -2, -1)
    return SpellerOutput(logits=logits, att_map=att_map)

