"""Pallas fused LSTM recurrent-scan kernel — the TPU "native kernel" tier
replacing cuDNN LSTMs (SURVEY.md §2.9).

Split of labor (same as ops/lstm.py): the input projection
``x @ W_ih + b`` for ALL timesteps runs as one big XLA MXU matmul OUTSIDE the
kernel; this kernel implements only the sequential recurrence

    pre_t = x_proj[t] + h_{t-1} @ W_hh ;  (i,f,g,o) gates ;  masked carry

as ONE pallas_call with grid=(T,):

  * TPU grid steps execute sequentially, so the (h, c) carry lives in VMEM
    scratch across the whole sequence — zero HBM round-trips for the carry
    (a lax.scan keeps loop carries in HBM);
  * W_hh's BlockSpec index map is constant, so Mosaic fetches it into VMEM
    once and reuses it every step;
  * x_proj streams in / h streams out one (B, 4H)/(B, H) tile per step with
    the pipeline's normal double buffering;
  * the length mask freezes the carry past each utterance's true length
    (pad_packed_sequence parity, identical to ops/lstm.py).

Differentiation: ``pallas_lstm_scan`` carries a custom VJP. The training
forward streams out the activated gates, so the backward is the Pallas
adjoint kernel (``_lstm_bwd_kernel``) with ONE matmul per step
(``dpre @ W_hh^T``); the weight gradient is a single big MXU matmul outside
(the same split-of-labor as the forward's input projection).

Fallback: non-TPU backends or tiny shapes route to the pure lax.scan path.
"""

from __future__ import annotations

import functools
import os
import re


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from attention_based_e2e_asr_dnn_tpu.ops.precision import matmul_precision


def _auto_interpret() -> bool:
    """Pallas TPU kernels only compile on TPU; interpret elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


def _masked_cell_update(pre, h, c, m, hidden_dim, h_out_ref, c_out_ref, k,
                        g_out_ref=None):
    """Shared fp32 LSTM cell body: gates from ``pre``, length-masked carry,
    in-kernel pad zeroing of the h stream, optional activated-gates stream.
    ONE definition so the inference/training/fused-input kernels cannot
    drift apart."""
    i = jax.nn.sigmoid(pre[:, 0 * hidden_dim : 1 * hidden_dim])
    f = jax.nn.sigmoid(pre[:, 1 * hidden_dim : 2 * hidden_dim])
    g = jnp.tanh(pre[:, 2 * hidden_dim : 3 * hidden_dim])
    o = jax.nn.sigmoid(pre[:, 3 * hidden_dim : 4 * hidden_dim])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    h_next = m * h_new + (1.0 - m) * h
    c_next = m * c_new + (1.0 - m) * c
    # h outputs are ZEROED at padded positions in-kernel (m * h_next ==
    # m * h_new) — saves the caller's full-array mask multiply + its
    # adjoint; cs keeps carry semantics (the adjoint reads true c_t).
    # c_out_ref=None (inference) skips the cs HBM stream entirely — only
    # the training adjoint ever reads it.
    h_out_ref[k] = (m * h_new).astype(h_out_ref.dtype)
    if c_out_ref is not None:
        c_out_ref[k] = c_next.astype(c_out_ref.dtype)
    if g_out_ref is not None:
        gd = g_out_ref.dtype
        g_out_ref[k, :, 0 * hidden_dim : 1 * hidden_dim] = i.astype(gd)
        g_out_ref[k, :, 1 * hidden_dim : 2 * hidden_dim] = f.astype(gd)
        g_out_ref[k, :, 2 * hidden_dim : 3 * hidden_dim] = g.astype(gd)
        g_out_ref[k, :, 3 * hidden_dim : 4 * hidden_dim] = o.astype(gd)
    return h_next, c_next


def _lstm_scan_nocs_kernel(xp_ref, mask_ref, w_ref, h_out_ref,
                           h_scratch, c_scratch, *, hidden_dim: int,
                           k_block: int, scan_desc: bool = False):
    """Inference-only twin of _lstm_scan_kernel: the cell state lives purely
    in VMEM scratch — no (T, B, H) cs stream to HBM (only the training
    adjoint reads cs)."""
    _lstm_scan_kernel(xp_ref, mask_ref, w_ref, h_out_ref, None,
                      h_scratch, c_scratch, hidden_dim=hidden_dim,
                      k_block=k_block, scan_desc=scan_desc)


def _lstm_scan_kernel(xp_ref, mask_ref, w_ref, h_out_ref, c_out_ref,
                      h_scratch, c_scratch, *, hidden_dim: int, k_block: int,
                      scan_desc: bool = False, g_out_ref=None):
    """One grid step: consume x_proj[t*K:(t+1)*K], update carry K times.

    Processing K timesteps per grid step amortizes the pipeline's per-step
    overhead; the sequential dependency only exists on the recurrent matmul,
    which runs K times inside. ``scan_desc`` walks the block last-to-first —
    combined with reversed BLOCK index maps this runs the whole scan in
    descending time with ZERO host-side flips (the BiLSTM backward
    direction). With ``g_out_ref`` (the training forward) the activated
    gates stream out too, feeding the Pallas adjoint kernel.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    def one_step(j, carry):
        k = k_block - 1 - j if scan_desc else j
        # Gate math in fp32: fp32 carries for stability over long sequences,
        # and Mosaic transcendentals want a uniform element type (bf16
        # sigmoid hits a mixed-dtype broadcast bug).
        h, c = carry
        pre = xp_ref[k].astype(jnp.float32) + jnp.dot(
            h.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
        )
        m = mask_ref[k].astype(jnp.float32)  # (B, 1) 1.0 where valid
        return _masked_cell_update(pre, h, c, m, hidden_dim, h_out_ref,
                                   c_out_ref, k, g_out_ref)

    h, c = h_scratch[:], c_scratch[:]
    if k_block == 1:
        h, c = one_step(0, (h, c))
    else:
        # Mosaic supports only full unroll inside kernels (unroll == steps)
        h, c = jax.lax.fori_loop(0, k_block, one_step, (h, c),
                                 unroll=k_block)
    h_scratch[:] = h
    c_scratch[:] = c


def _scan_specs(grid: int, scan_desc: bool):
    """Index maps for a time-blocked scan: identity for ascending time,
    reversed block order for descending (zero-copy reverse — no host flips)."""
    if scan_desc:
        return lambda t: (grid - 1 - t, 0, 0)
    return lambda t: (t, 0, 0)


def _forward_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray, mask: jnp.ndarray,
                    interpret: bool = False, k_block: int | None = None,
                    reverse: bool = False, with_cs: bool = True):
    """x_proj (T, B, 4H), w_hh (H, 4H), mask (T, B) float -> hs, cs (T, B, H).

    ``with_cs=False`` (inference) keeps the cell state purely in VMEM
    scratch — skips a (T, B, H) HBM write per direction-layer; returns
    (hs, None).

    ``reverse=True`` runs the scan in DESCENDING time via reversed block
    index maps + descending in-block iteration; inputs and outputs stay in
    original time order (no jnp.flip copies anywhere).

    TPU tiling: B must be a multiple of 8 and 4H a multiple of 128 (callers
    guard and fall back to the lax.scan path otherwise). The mask rides as
    (T, B, 1) so its block's last-two dims satisfy the (8, 128)-or-equal
    rule. ``k_block`` timesteps are processed per grid step (the batcher pads
    T to large multiples, so divisibility holds; otherwise k_block drops
    to 1).
    """
    seq_len, batch, four_h = x_proj.shape
    hidden_dim = four_h // 4
    dtype = x_proj.dtype
    if k_block is None:
        # VMEM-fit the block like the training forward does — a fixed k=8 at
        # (B=128, T=1536) flagship inference shapes overflowed the 16 MB
        # scoped-VMEM stack by 164 KB (measured 2026-08-17); k_block drops
        # until streams + fixed buffers fit
        es = jnp.dtype(dtype).itemsize
        k_block = _pick_k_block(
            seq_len, four_h + 2 * hidden_dim + 1, batch, es,
            fixed_bytes=hidden_dim * four_h * es + 2 * batch * hidden_dim * 4,
            budget=11 * 1024 * 1024,
        )
    if seq_len % k_block != 0:
        k_block = 1
    grid = seq_len // k_block
    idx = _scan_specs(grid, reverse)

    in_specs = [
        pl.BlockSpec((k_block, batch, four_h), idx),
        pl.BlockSpec((k_block, batch, 1), idx),
        pl.BlockSpec((hidden_dim, four_h), lambda t: (0, 0)),
    ]
    scratch = [
        pltpu.VMEM((batch, hidden_dim), jnp.float32),
        pltpu.VMEM((batch, hidden_dim), jnp.float32),
    ] if pltpu is not None else None
    args = (x_proj, mask.astype(dtype)[:, :, None], w_hh.astype(dtype))
    if not with_cs:
        kernel = functools.partial(_lstm_scan_nocs_kernel,
                                   hidden_dim=hidden_dim,
                                   k_block=k_block, scan_desc=reverse)
        hs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((k_block, batch, hidden_dim), idx),
            out_shape=jax.ShapeDtypeStruct((seq_len, batch, hidden_dim),
                                           dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        return hs, None
    kernel = functools.partial(_lstm_scan_kernel, hidden_dim=hidden_dim,
                               k_block=k_block, scan_desc=reverse)
    hs, cs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, batch, hidden_dim), dtype),
            jax.ShapeDtypeStruct((seq_len, batch, hidden_dim), dtype),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return hs, cs


# ---------------------------------------------------------------------------
# Training forward: the same kernel with the gates output bound (feeds the
# Pallas backward — no recompute matmul there)
# ---------------------------------------------------------------------------

def _lstm_scan_train_kernel(xp_ref, mask_ref, w_ref, h_out_ref, c_out_ref,
                            g_out_ref, h_scratch, c_scratch, *,
                            hidden_dim: int, k_block: int,
                            scan_desc: bool = False):
    """_lstm_scan_kernel with the activated-gates stream bound (the output
    ref arrives positionally between c_out and scratch)."""
    _lstm_scan_kernel(
        xp_ref, mask_ref, w_ref, h_out_ref, c_out_ref, h_scratch, c_scratch,
        hidden_dim=hidden_dim, k_block=k_block, scan_desc=scan_desc,
        g_out_ref=g_out_ref,
    )


def _pick_k_block(seq_len: int, stream_cols: int, batch: int, itemsize: int,
                  fixed_bytes: int, budget: int = 13 * 1024 * 1024) -> int:
    """Largest K in {8,4,2,1} fitting VMEM: streamed (double-buffered) blocks
    of ``stream_cols`` columns x batch rows per timestep plus fixed buffers."""
    for k in (8, 4, 2, 1):
        if seq_len % k:
            continue
        if fixed_bytes + 2 * k * batch * stream_cols * itemsize <= budget:
            return k
    return 1


def _forward_pallas_train(x_proj, w_hh, mask, interpret: bool = False,
                          reverse: bool = False):
    """Training forward: returns (hs, cs, gates) — gates (T, B, 4H)."""
    seq_len, batch, four_h = x_proj.shape
    hidden_dim = four_h // 4
    dtype = x_proj.dtype
    es = jnp.dtype(dtype).itemsize
    # streams: xp (4H in) + hs/cs (2H out) + gates (4H out) + mask (1)
    k_block = _pick_k_block(
        seq_len, 2 * four_h + 2 * hidden_dim + 1, batch, es,
        fixed_bytes=hidden_dim * four_h * es + 2 * batch * hidden_dim * 4,
    )
    grid = seq_len // k_block
    idx = _scan_specs(grid, reverse)
    kernel = functools.partial(_lstm_scan_train_kernel, hidden_dim=hidden_dim,
                               k_block=k_block, scan_desc=reverse)
    hs, cs, gates = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k_block, batch, four_h), idx),
            pl.BlockSpec((k_block, batch, 1), idx),
            pl.BlockSpec((hidden_dim, four_h), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, four_h), idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, batch, hidden_dim), dtype),
            jax.ShapeDtypeStruct((seq_len, batch, hidden_dim), dtype),
            jax.ShapeDtypeStruct((seq_len, batch, four_h), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, hidden_dim), jnp.float32),
            pltpu.VMEM((batch, hidden_dim), jnp.float32),
        ] if pltpu is not None else None,
        interpret=interpret,
    )(x_proj, mask.astype(dtype)[:, :, None], w_hh.astype(dtype))
    return hs, cs, gates


# ---------------------------------------------------------------------------
# Pallas backward kernel: the LSTM adjoint recurrence
# ---------------------------------------------------------------------------

def _lstm_bwd_kernel(g_ref, cs_ref, cp_ref, dy_ref, mask_ref, wt_ref,
                     dpre_ref, dh_scratch, dc_scratch, *, hidden_dim: int,
                     k_block: int, scan_desc: bool = True):
    """Adjoint recurrence: ONE matmul per step (dpre @ W_hh^T).

    Saved activated gates make the recompute matmul unnecessary; the weight
    gradient is a single big MXU matmul OUTSIDE the kernel (same
    split-of-labor as the forward's input projection). The adjoint walks
    time OPPOSITE to the forward scan: descending blocks for a forward-time
    LSTM, ascending for the BiLSTM's reversed direction."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dc_scratch[:] = jnp.zeros_like(dc_scratch)

    def one_step(j, carry):
        k = k_block - 1 - j if scan_desc else j
        dh, dc = carry
        i = g_ref[k, :, 0 * hidden_dim : 1 * hidden_dim].astype(jnp.float32)
        f = g_ref[k, :, 1 * hidden_dim : 2 * hidden_dim].astype(jnp.float32)
        g = g_ref[k, :, 2 * hidden_dim : 3 * hidden_dim].astype(jnp.float32)
        o = g_ref[k, :, 3 * hidden_dim : 4 * hidden_dim].astype(jnp.float32)
        c_t = cs_ref[k].astype(jnp.float32)
        cp = cp_ref[k].astype(jnp.float32)
        m = mask_ref[k].astype(jnp.float32)  # (B, 1)
        tanh_ct = jnp.tanh(c_t)

        # upstream grads at padded positions are w.r.t. in-kernel-zeroed
        # outputs -> masked out here (the wrapper no longer multiplies)
        dh_total = dy_ref[k].astype(jnp.float32) * m + dh
        dc_total = dc + dh_total * o * (1.0 - tanh_ct * tanh_ct)
        dpre_i = dc_total * g * i * (1.0 - i) * m
        dpre_f = dc_total * cp * f * (1.0 - f) * m
        dpre_g = dc_total * i * (1.0 - g * g) * m
        dpre_o = dh_total * tanh_ct * o * (1.0 - o) * m
        gd = dpre_ref.dtype
        dpre_ref[k, :, 0 * hidden_dim : 1 * hidden_dim] = dpre_i.astype(gd)
        dpre_ref[k, :, 1 * hidden_dim : 2 * hidden_dim] = dpre_f.astype(gd)
        dpre_ref[k, :, 2 * hidden_dim : 3 * hidden_dim] = dpre_g.astype(gd)
        dpre_ref[k, :, 3 * hidden_dim : 4 * hidden_dim] = dpre_o.astype(gd)

        # dh_prev via 4 partial dots against W^T's row blocks (equivalent to
        # concat(dpre) @ W^T without an in-kernel concatenate)
        wt = wt_ref[:]
        dh_prev_valid = (
            jnp.dot(dpre_i.astype(wt.dtype), wt[0 * hidden_dim : 1 * hidden_dim],
                    preferred_element_type=jnp.float32)
            + jnp.dot(dpre_f.astype(wt.dtype), wt[1 * hidden_dim : 2 * hidden_dim],
                      preferred_element_type=jnp.float32)
            + jnp.dot(dpre_g.astype(wt.dtype), wt[2 * hidden_dim : 3 * hidden_dim],
                      preferred_element_type=jnp.float32)
            + jnp.dot(dpre_o.astype(wt.dtype), wt[3 * hidden_dim : 4 * hidden_dim],
                      preferred_element_type=jnp.float32)
        )
        dc_prev_valid = dc_total * f
        dh = m * dh_prev_valid + (1.0 - m) * dh_total
        dc = m * dc_prev_valid + (1.0 - m) * dc
        return dh, dc

    dh, dc = dh_scratch[:], dc_scratch[:]
    if k_block == 1:
        dh, dc = one_step(0, (dh, dc))
    else:
        dh, dc = jax.lax.fori_loop(0, k_block, one_step, (dh, dc),
                                   unroll=k_block)
    dh_scratch[:] = dh
    dc_scratch[:] = dc


def _lstm_bwd_dw_kernel(g_ref, cs_ref, cp_ref, dy_ref, hs_ref, mask_ref,
                        wt_ref, dpre_ref, dw_ref, dh_scratch, dc_scratch,
                        dw_scratch, pend_scratch, *, hidden_dim: int,
                        k_block: int, grid: int, scan_desc: bool):
    """Adjoint recurrence WITH in-kernel dW_hh accumulation.

    dW = sum_t h_scanprev(t)^T dpre_t accumulates into a (H, 4H) fp32 VMEM
    scratch — killing the outside einsum's re-read of dpre (T,B,4H) + hs
    (T,B,H) from HBM. Measured +7.0% on the flagship adjoint (2026-08-17,
    B=128 T=1536 H=512) with dpre bit-identical and dW within bf16-input
    rounding of the outside einsum (same bf16-operand fp32-accum semantics).

    The scan-previous h of the block-boundary step lives in the block the
    grid processes NEXT, so its dpre parks in ``pend_scratch`` and is folded
    at the next grid iteration; the globally-final deferred term pairs with
    h == 0 and is correctly dropped. Per-gate-slab dots (a (B,4H) fp32
    concat would blow the VMEM stack).

    ``dw_scratch=None`` (the raised-vmem big-H variant) accumulates directly
    into ``dw_ref`` instead: the constant-index-map output block stays
    VMEM-resident across the whole grid, so a separate accumulator only
    doubles the (H,4H) fp32 footprint — decisive at H=1024 where that pair
    alone is 32 MB.
    """
    t = pl.program_id(0)
    acc = dw_ref if dw_scratch is None else dw_scratch

    @pl.when(t == 0)
    def _init():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dc_scratch[:] = jnp.zeros_like(dc_scratch)
        acc[:] = jnp.zeros_like(acc)
        pend_scratch[:] = jnp.zeros_like(pend_scratch)

    # fold the previous block's boundary term with this block's adjacent row
    h_adj = hs_ref[k_block - 1] if scan_desc else hs_ref[0]
    acc[:] += jax.lax.dot_general(
        h_adj, pend_scratch[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    boundary_k = 0 if scan_desc else k_block - 1

    def one_step(j, carry):
        k = k_block - 1 - j if scan_desc else j
        dh, dc = carry
        i = g_ref[k, :, 0 * hidden_dim : 1 * hidden_dim].astype(jnp.float32)
        f = g_ref[k, :, 1 * hidden_dim : 2 * hidden_dim].astype(jnp.float32)
        g = g_ref[k, :, 2 * hidden_dim : 3 * hidden_dim].astype(jnp.float32)
        o = g_ref[k, :, 3 * hidden_dim : 4 * hidden_dim].astype(jnp.float32)
        c_t = cs_ref[k].astype(jnp.float32)
        cp = cp_ref[k].astype(jnp.float32)
        m = mask_ref[k].astype(jnp.float32)
        tanh_ct = jnp.tanh(c_t)

        dh_total = dy_ref[k].astype(jnp.float32) * m + dh
        dc_total = dc + dh_total * o * (1.0 - tanh_ct * tanh_ct)
        dpre_i = dc_total * g * i * (1.0 - i) * m
        dpre_f = dc_total * cp * f * (1.0 - f) * m
        dpre_g = dc_total * i * (1.0 - g * g) * m
        dpre_o = dh_total * tanh_ct * o * (1.0 - o) * m
        gd = dpre_ref.dtype
        dpre_ref[k, :, 0 * hidden_dim : 1 * hidden_dim] = dpre_i.astype(gd)
        dpre_ref[k, :, 1 * hidden_dim : 2 * hidden_dim] = dpre_f.astype(gd)
        dpre_ref[k, :, 2 * hidden_dim : 3 * hidden_dim] = dpre_g.astype(gd)
        dpre_ref[k, :, 3 * hidden_dim : 4 * hidden_dim] = dpre_o.astype(gd)

        # k is a python int under full unroll, so this is trace-time routing
        if k != boundary_k:
            hp = hs_ref[k - 1] if scan_desc else hs_ref[k + 1]
            for s_i, dp in enumerate((dpre_i, dpre_f, dpre_g, dpre_o)):
                acc[:, s_i * hidden_dim : (s_i + 1) * hidden_dim] += (
                    jax.lax.dot_general(hp, dp.astype(hp.dtype),
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))
        else:
            for s_i, dp in enumerate((dpre_i, dpre_f, dpre_g, dpre_o)):
                pend_scratch[:, s_i * hidden_dim : (s_i + 1) * hidden_dim] = (
                    dp.astype(pend_scratch.dtype))

        wt = wt_ref[:]
        dh_prev_valid = (
            jnp.dot(dpre_i.astype(wt.dtype), wt[0 * hidden_dim : 1 * hidden_dim],
                    preferred_element_type=jnp.float32)
            + jnp.dot(dpre_f.astype(wt.dtype), wt[1 * hidden_dim : 2 * hidden_dim],
                      preferred_element_type=jnp.float32)
            + jnp.dot(dpre_g.astype(wt.dtype), wt[2 * hidden_dim : 3 * hidden_dim],
                      preferred_element_type=jnp.float32)
            + jnp.dot(dpre_o.astype(wt.dtype), wt[3 * hidden_dim : 4 * hidden_dim],
                      preferred_element_type=jnp.float32)
        )
        dc_prev_valid = dc_total * f
        dh = m * dh_prev_valid + (1.0 - m) * dh_total
        dc = m * dc_prev_valid + (1.0 - m) * dc
        return dh, dc

    dh, dc = dh_scratch[:], dc_scratch[:]
    # python loop = full unroll with CONCRETE j (the boundary-k routing is
    # trace-time; fori_loop keeps j traced even at unroll == trip count)
    for j in range(k_block):
        dh, dc = one_step(j, (dh, dc))
    dh_scratch[:] = dh
    dc_scratch[:] = dc

    if dw_scratch is not None:
        @pl.when(t == grid - 1)
        def _flush():
            dw_ref[:, :] = dw_scratch[:]


def _lstm_bwd_dw_accout_kernel(g_ref, cs_ref, cp_ref, dy_ref, hs_ref,
                               mask_ref, wt_ref, dpre_ref, dw_ref, dh_scratch,
                               dc_scratch, pend_scratch, *, hidden_dim: int,
                               k_block: int, grid: int, scan_desc: bool):
    """_lstm_bwd_dw_kernel accumulating directly into the dW output block
    (no separate (H,4H) fp32 scratch — the big-H raised-vmem variant)."""
    _lstm_bwd_dw_kernel(g_ref, cs_ref, cp_ref, dy_ref, hs_ref, mask_ref,
                        wt_ref, dpre_ref, dw_ref, dh_scratch, dc_scratch,
                        None, pend_scratch, hidden_dim=hidden_dim,
                        k_block=k_block, grid=grid, scan_desc=scan_desc)


@functools.lru_cache(maxsize=1)
def _raised_vmem_default_mb() -> int:
    """Unset-env default for the raised scoped-VMEM budget, per device
    generation. 64 MB is MEASURED safe on v5e (96 MB fp32 scratch kernels
    compiled and ran, 2026-08-19) and assumed for later generations; older
    real chips (v2/v3/v4) keep the conservative round-3 routing
    (batch-chunk + outside einsum) that is known to compile everywhere —
    a 64 MB Mosaic request there could fail at compile time where the
    chunked route worked. Non-TPU backends (interpret-mode CPU tests)
    mirror the v5e routing so equivalence tests exercise the raised paths."""
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return 64
    return _raised_mb_for_kind(kind)


def _raised_mb_for_kind(kind: str) -> int:
    """Pure kind -> default-MB mapping behind _raised_vmem_default_mb.

    Only EXPLICITLY-KNOWN v5+ generations get the raised 64 MB default; a
    TPU kind whose generation cannot be parsed (unknown/future naming
    scheme) falls back to 0 — the conservative round-3 chunked routing that
    compiles everywhere — rather than risking a Mosaic compile failure on
    an unrecognized chip. Non-TPU backends (interpret tests) mirror v5e."""
    kind = kind.lower()
    if "tpu" not in kind:
        return 64
    m = re.search(r"v(\d+)", kind)
    return 64 if (m is not None and int(m.group(1)) >= 5) else 0


def _scoped_vmem_cap() -> int:
    """Raised Mosaic scoped-VMEM limit (bytes) for the big-H adjoint kernels.

    Mosaic's DEFAULT scoped budget is ~16 MB — a compiler check, not the
    chip: v5e physically carries far more VMEM, and
    ``pltpu.CompilerParams(vmem_limit_bytes=...)`` raises the check.
    ``TPU_LAS_SCOPED_VMEM_MB`` overrides in either direction (0 disables the
    raised paths and restores the round-3 batch-chunk + outside-einsum
    routing); unset, the default depends on the device generation
    (:func:`_raised_vmem_default_mb`)."""
    env = os.environ.get("TPU_LAS_SCOPED_VMEM_MB")
    mb = int(env) if env is not None else _raised_vmem_default_mb()
    return mb * 1024 * 1024


def _dw_kernel_fits(batch: int, hidden_dim: int, itemsize: int) -> bool:
    """Whether the in-kernel-dW adjoint's fixed VMEM footprint fits the
    16 MB scoped stack. The decisive term is the (H, 4H) fp32 dW
    accumulator + its output block: at H=1024 that pair alone is 32 MB
    (measured compile OOM at 18 MB scoped, 2026-08-18), while H=512 fits
    with room for the streams. Above the budget the caller must take
    _backward_pallas + the outside hs/dpre einsum instead."""
    four_h = 4 * hidden_dim
    need = (2 * hidden_dim * four_h * 4          # fp32 dW scratch + out block
            + four_h * hidden_dim * itemsize     # transposed weight block
            + 2 * batch * hidden_dim * 4         # dh/dc carry scratch
            + 2 * batch * four_h * itemsize)     # pending dpre + k=1 stream
    return need <= 14 * 1024 * 1024


def _dw_kernel_fits_raised(batch: int, hidden_dim: int, itemsize: int) -> bool:
    """Whether the accumulate-into-output dW adjoint fits the RAISED scoped
    budget (``_scoped_vmem_cap``). No separate dW scratch — the output block
    itself accumulates — so the decisive fp32 (H,4H) term appears once.
    6 MB margin covers the per-step dot stack temporaries Mosaic adds on
    top of the modeled buffers (measured overflows at tight budgets)."""
    cap = _scoped_vmem_cap()
    if cap <= 16 * 1024 * 1024:
        return False
    four_h = 4 * hidden_dim
    need = (hidden_dim * four_h * 4               # dW out block (fp32)
            + four_h * hidden_dim * itemsize      # transposed weight block
            + 2 * batch * hidden_dim * 4          # dh/dc carry scratch
            + batch * four_h * itemsize           # pending dpre
            + 2 * batch * (12 * hidden_dim + 1) * itemsize)  # k=1 streams
    return need <= cap - 6 * 1024 * 1024


def _dw_outside_einsum(hs, dpre, reverse: bool, prec):
    """Sliced-form dW_hh einsum (h_{-1} = 0 contributes nothing) — the
    pre-fusion weight gradient as ONE MXU matmul over all (T*B) rows."""
    if reverse:
        return jnp.einsum("tbh,tbk->hk", hs[1:], dpre[:-1], precision=prec,
                          preferred_element_type=jnp.float32)
    return jnp.einsum("tbh,tbk->hk", hs[:-1], dpre[1:], precision=prec,
                      preferred_element_type=jnp.float32)


def _backward_pallas_dw(w_hh, mask, gates, cs, c_prev, hs, d_hs,
                        interpret: bool = False, reverse: bool = False,
                        raised: bool = False):
    """Adjoint + in-kernel dW_hh. Returns (dpre (T,B,4H), d_whh (H,4H) fp32).

    ``reverse`` is the FORWARD scan's direction; the adjoint walks the
    opposite way. Replaces _backward_pallas + the outside hs/dpre einsum.

    ``raised=True`` is the big-H (e.g. 1024) route: the kernel accumulates
    dW directly into the VMEM-resident output block (no separate (H,4H)
    fp32 scratch) and the pallas_call carries
    ``vmem_limit_bytes=_scoped_vmem_cap()`` — Mosaic's default ~16 MB
    scoped budget is a compiler check, not the chip's VMEM.
    """
    seq_len, batch, four_h = gates.shape
    hidden_dim = four_h // 4
    dtype = gates.dtype
    es = jnp.dtype(dtype).itemsize
    # streams: gates 4H + cs/cp/dy/hs H each + mask 1 in, dpre 4H out;
    # fixed: wt + dh/dc scratch + fp32 dW accumulator + bf16 pending dpre.
    # Budget dropped to 9 MB: the dW dots' fp32 stack temporaries at bigger
    # K overflowed the 16 MB scoped-VMEM stack (measured).
    fixed = (four_h * hidden_dim * es
             + 2 * batch * hidden_dim * 4
             + (0 if raised else hidden_dim * four_h * 4)
             + batch * four_h * es)
    budget = (_scoped_vmem_cap() - hidden_dim * four_h * 4
              - 7 * 1024 * 1024) if raised else 9 * 1024 * 1024
    k_block = _pick_k_block(seq_len, 2 * four_h + 4 * hidden_dim + 1, batch,
                            es, fixed_bytes=fixed, budget=budget)
    grid = seq_len // k_block
    scan_desc = not reverse
    kern_fn = _lstm_bwd_dw_accout_kernel if raised else _lstm_bwd_dw_kernel
    kernel = functools.partial(kern_fn, hidden_dim=hidden_dim,
                               k_block=k_block, grid=grid,
                               scan_desc=scan_desc)
    idx = _scan_specs(grid, scan_desc)
    scratch = [
        pltpu.VMEM((batch, hidden_dim), jnp.float32),
        pltpu.VMEM((batch, hidden_dim), jnp.float32),
    ] if pltpu is not None else None
    if scratch is not None and not raised:
        scratch.append(pltpu.VMEM((hidden_dim, four_h), jnp.float32))
    if scratch is not None:
        scratch.append(pltpu.VMEM((batch, four_h), dtype))
    params = (pltpu.CompilerParams(vmem_limit_bytes=_scoped_vmem_cap())
              if raised and pltpu is not None else None)
    dpre, d_whh = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k_block, batch, four_h), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, 1), idx),
            pl.BlockSpec((four_h, hidden_dim), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k_block, batch, four_h), idx),
            pl.BlockSpec((hidden_dim, four_h), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, batch, four_h), dtype),
            jax.ShapeDtypeStruct((hidden_dim, four_h), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(gates, cs, c_prev, d_hs, hs, mask.astype(dtype)[:, :, None],
      jnp.swapaxes(w_hh, 0, 1).astype(dtype))
    return dpre, d_whh


def _backward_pallas(w_hh, mask, gates, cs, c_prev, d_hs,
                     interpret: bool = False, reverse: bool = False):
    """Run the adjoint kernel; returns dpre (T, B, 4H). ``reverse`` is the
    FORWARD scan's direction; the adjoint walks the opposite way."""
    seq_len, batch, four_h = gates.shape
    hidden_dim = four_h // 4
    dtype = gates.dtype
    es = jnp.dtype(dtype).itemsize

    # Batch-chunk when even k=1 exceeds the scoped-VMEM stack: at H=1024,
    # B=128 the adjoint measured a 17.96 MB scoped allocation (compile OOM,
    # 2026-08-18). The transposed-weight block (4H, H) is 8.4 MB at H=1024,
    # so halving the batch-proportional remainder (measured ~9.6 MB at
    # B=128) brings B=64 to ~13 MB. The chunk launches are independent
    # (disjoint batch rows), so the scheduler can overlap them the same way
    # it overlaps the two BiLSTM direction launches. Interpret mode follows
    # the SAME routing so CPU equivalence tests exercise the chunked path.
    fixed_w = four_h * hidden_dim * es
    stream_cols = 2 * four_h + 3 * hidden_dim + 1

    def _fits(b):
        return (fixed_w + 2 * b * hidden_dim * 4
                + 2 * b * stream_cols * es) <= 12 * 1024 * 1024

    # the raised scoped-VMEM limit spares the batch-halving entirely when
    # the full-batch footprint fits under it (6 MB temp margin)
    raised = (not _fits(batch)
              and (fixed_w + 2 * batch * hidden_dim * 4
                   + 2 * batch * stream_cols * es)
              <= _scoped_vmem_cap() - 6 * 1024 * 1024)

    bchunk = batch
    # halving must preserve the sublane constraint (batch % 8 == 0 is a
    # hard Mosaic gate elsewhere in this module) — e.g. 144 may halve to
    # 72 but never to 36
    while (not raised and bchunk > 8 and (bchunk // 2) % 8 == 0
           and not _fits(bchunk)):
        bchunk //= 2
    if bchunk < batch:
        parts = [
            _backward_pallas(w_hh, mask[:, i:i + bchunk],
                             gates[:, i:i + bchunk],
                             cs[:, i:i + bchunk], c_prev[:, i:i + bchunk],
                             d_hs[:, i:i + bchunk], interpret,
                             reverse=reverse)
            for i in range(0, batch, bchunk)
        ]
        return jnp.concatenate(parts, axis=1)

    # streams: gates 4H + cs H + cp H + dy H + mask 1 in, dpre 4H out
    k_block = _pick_k_block(
        seq_len, 2 * four_h + 3 * hidden_dim + 1, batch, es,
        fixed_bytes=four_h * hidden_dim * es + 2 * batch * hidden_dim * 4,
    )
    grid = seq_len // k_block
    scan_desc = not reverse
    kernel = functools.partial(_lstm_bwd_kernel, hidden_dim=hidden_dim,
                               k_block=k_block, scan_desc=scan_desc)
    idx = _scan_specs(grid, scan_desc)
    dpre = pl.pallas_call(
        kernel,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=_scoped_vmem_cap())
            if raised and pltpu is not None else None),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k_block, batch, four_h), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, hidden_dim), idx),
            pl.BlockSpec((k_block, batch, 1), idx),
            pl.BlockSpec((four_h, hidden_dim), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((k_block, batch, four_h), idx),
        out_shape=jax.ShapeDtypeStruct((seq_len, batch, four_h), dtype),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden_dim), jnp.float32),
            pltpu.VMEM((batch, hidden_dim), jnp.float32),
        ] if pltpu is not None else None,
        interpret=interpret,
    )(gates, cs, c_prev, d_hs, mask.astype(dtype)[:, :, None],
      jnp.swapaxes(w_hh, 0, 1).astype(dtype))
    return dpre


# ---------------------------------------------------------------------------
# custom VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_lstm_scan(x_proj, w_hh, mask, interpret: bool = False,
                     reverse: bool = False):
    """Differentiable fused LSTM recurrence.

    Args:
        x_proj: (T, B, 4H) precomputed input projections (+ bias).
        w_hh:   (H, 4H) recurrent weights.
        mask:   (T, B) float, 1.0 where t < length.
        reverse: scan DESCENDING time (the BiLSTM backward direction) —
            zero-copy via reversed index maps; inputs/outputs stay in
            original time order.
    Returns:
        hs: (T, B, H) hidden states, ZERO at padded positions.

    Inference (undifferentiated) runs the lean no-gates, no-cs kernel (the
    cell state never leaves VMEM); under grad, the forward streams out
    activated gates and the backward is the Pallas adjoint kernel with
    in-kernel dW_hh accumulation.
    """
    hs, _ = _forward_pallas(x_proj, w_hh, mask, interpret, reverse=reverse,
                            with_cs=False)
    return hs


def _fwd(x_proj, w_hh, mask, interpret, reverse):
    hs, cs, gates = _forward_pallas_train(x_proj, w_hh, mask, interpret,
                                          reverse=reverse)
    return hs, (w_hh, mask, hs, cs, gates)


def _adjoint_with_dw(w_hh, mask, hs, cs, gates, d_hs, interpret, reverse):
    """Shared VJP core: the Pallas adjoint plus dW_hh, routed by VMEM fit.

    H <= 512 takes the in-kernel fp32-scratch dW accumulator; bigger H
    (whose (H,4H) accumulator alone overflows the scoped stack) takes the
    plain adjoint plus one sliced outside einsum. Returns
    (dpre (T,B,4H), d_whh (H,4H) fp32)."""
    _, batch, four_h = gates.shape
    hidden_dim = four_h // 4
    dtype = gates.dtype

    zero_row = jnp.zeros((1, batch, hidden_dim), dtype)
    if reverse:  # scan-previous of step t is t+1 in a descending-time scan
        c_prev = jnp.concatenate([cs[1:], zero_row], axis=0)
    else:
        c_prev = jnp.concatenate([zero_row, cs[:-1]], axis=0)

    es = jnp.dtype(dtype).itemsize
    if _dw_kernel_fits(batch, hidden_dim, es):
        return _backward_pallas_dw(w_hh, mask, gates, cs, c_prev, hs,
                                   d_hs.astype(dtype), interpret,
                                   reverse=reverse)
    # Big-H (e.g. 1024) default: the UNCHUNKED plain adjoint under the
    # raised scoped-VMEM limit + the outside dW einsum. Measured at the
    # scaled flagship shape (T=1536, B=128, H=1024, bf16, 2026-08-19):
    # round-3 batch-chunked route 154.5 ms; raised unchunked + einsum
    # 122.5 ms (-21%); raised IN-KERNEL dW 124.8 ms — at H=1024 the
    # per-step dW dots lengthen the serial chain by MORE than the parallel
    # outside einsum costs (the opposite of H<=512's +7%), so the einsum
    # stays the default and the in-kernel route is an env-selectable
    # experiment (TPU_LAS_BIGH_DW=inkernel).
    if (os.environ.get("TPU_LAS_BIGH_DW", "einsum") == "inkernel"
            and _dw_kernel_fits_raised(batch, hidden_dim, es)):
        return _backward_pallas_dw(w_hh, mask, gates, cs, c_prev, hs,
                                   d_hs.astype(dtype), interpret,
                                   reverse=reverse, raised=True)
    dpre = _backward_pallas(w_hh, mask, gates, cs, c_prev,
                            d_hs.astype(dtype), interpret, reverse=reverse)
    return dpre, _dw_outside_einsum(hs, dpre, reverse,
                                    matmul_precision(dtype))


def _bwd(interpret, reverse, res, d_hs):
    """Pallas adjoint kernel with in-kernel dW_hh accumulation."""
    w_hh, mask, hs, cs, gates = res
    dpre, d_whh = _adjoint_with_dw(w_hh, mask, hs, cs, gates, d_hs,
                                   interpret, reverse)
    return dpre, d_whh.astype(w_hh.dtype), None


pallas_lstm_scan.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused-input variant: the input projection runs IN-KERNEL for narrow inputs
# ---------------------------------------------------------------------------
#
# For the base listener layer (in_dim = 15 features) the outside
# x @ W_ih matmul materializes a (T, B, 4H) intermediate ~50x larger than x —
# written by XLA, read back by the kernel (~3.2 GB per training step at
# flagship shapes). With W_ih tiny it fits VMEM, so the kernel takes raw x
# and projects per step; the projection dots are carry-independent, letting
# the scheduler overlap them with the recurrent chain. Only used when
# in_dim <= 128 (wider layers' W_ih would evict the stream budget).


def _lstm_scan_fusedin_kernel(x_ref, mask_ref, wih_ref, b_ref, whh_ref,
                              h_out_ref, c_out_ref, h_scratch, c_scratch, *,
                              hidden_dim: int, k_block: int,
                              scan_desc: bool = False,
                              train_gates: bool = False, g_out_ref=None):
    """Lean fused-input recurrence; with ``train_gates`` also streams the
    activated gates (the training forward feeding the Pallas adjoint)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    wdt = whh_ref.dtype

    def one_step(j, carry):
        k = k_block - 1 - j if scan_desc else j
        h, c = carry
        pre = (
            jnp.dot(x_ref[k].astype(wdt), wih_ref[:],
                    preferred_element_type=jnp.float32)
            + b_ref[:].astype(jnp.float32)
            + jnp.dot(h.astype(wdt), whh_ref[:],
                      preferred_element_type=jnp.float32)
        )
        m = mask_ref[k].astype(jnp.float32)
        return _masked_cell_update(
            pre, h, c, m, hidden_dim, h_out_ref, c_out_ref, k,
            g_out_ref if train_gates else None)

    h, c = h_scratch[:], c_scratch[:]
    if k_block == 1:
        h, c = one_step(0, (h, c))
    else:
        h, c = jax.lax.fori_loop(0, k_block, one_step, (h, c),
                                 unroll=k_block)
    h_scratch[:] = h
    c_scratch[:] = c


def _fusedin_call(x, w_ih, b, w_hh, mask, interpret, reverse, train: bool):
    seq_len, batch, in_dim = x.shape
    hidden_dim = w_hh.shape[0]
    four_h = 4 * hidden_dim
    dtype = x.dtype
    es = jnp.dtype(dtype).itemsize
    stream = in_dim + 2 * hidden_dim + 1 + (four_h if train else 0)
    fixed = (in_dim + hidden_dim) * four_h * es + 2 * batch * hidden_dim * 4
    k_block = _pick_k_block(seq_len, stream, batch, es, fixed_bytes=fixed)
    grid = seq_len // k_block
    idx = _scan_specs(grid, reverse)

    kernel = functools.partial(
        _lstm_scan_fusedin_kernel, hidden_dim=hidden_dim, k_block=k_block,
        scan_desc=reverse, train_gates=train,
    )
    if train:
        # gates ref arrives positionally after c_out; rebind the kwarg form
        def kernel(x_r, m_r, wi_r, b_r, wh_r, h_r, c_r, g_r, hs, cs):  # noqa: F811
            return _lstm_scan_fusedin_kernel(
                x_r, m_r, wi_r, b_r, wh_r, h_r, c_r, hs, cs,
                hidden_dim=hidden_dim, k_block=k_block, scan_desc=reverse,
                train_gates=True, g_out_ref=g_r)
    else:
        # inference: no cs stream — the cell state stays in VMEM scratch
        def kernel(x_r, m_r, wi_r, b_r, wh_r, h_r, hs, cs):  # noqa: F811
            return _lstm_scan_fusedin_kernel(
                x_r, m_r, wi_r, b_r, wh_r, h_r, None, hs, cs,
                hidden_dim=hidden_dim, k_block=k_block, scan_desc=reverse)
    out_specs = [
        pl.BlockSpec((k_block, batch, hidden_dim), idx),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((seq_len, batch, hidden_dim), dtype),
    ]
    if train:
        out_specs.append(pl.BlockSpec((k_block, batch, hidden_dim), idx))
        out_shape.append(jax.ShapeDtypeStruct((seq_len, batch, hidden_dim),
                                              dtype))
        out_specs.append(pl.BlockSpec((k_block, batch, four_h), idx))
        out_shape.append(jax.ShapeDtypeStruct((seq_len, batch, four_h), dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k_block, batch, in_dim), idx),
            pl.BlockSpec((k_block, batch, 1), idx),
            pl.BlockSpec((in_dim, four_h), lambda t: (0, 0)),
            pl.BlockSpec((1, four_h), lambda t: (0, 0)),
            pl.BlockSpec((hidden_dim, four_h), lambda t: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((batch, hidden_dim), jnp.float32),
            pltpu.VMEM((batch, hidden_dim), jnp.float32),
        ] if pltpu is not None else None,
        interpret=interpret,
    )(x, mask.astype(dtype)[:, :, None], w_ih.astype(dtype),
      b.astype(dtype)[None], w_hh.astype(dtype))
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def pallas_lstm_scan_fusedin(x, w_ih, b, w_hh, mask, interpret: bool = False,
                             reverse: bool = False):
    """Differentiable fused LSTM recurrence with IN-KERNEL input projection.

    x (T, B, in_dim) raw inputs; w_ih (in_dim, 4H); b (4H,); w_hh (H, 4H);
    mask (T, B). Returns hs (T, B, H), zeroed at padded positions. Same
    adjoint kernel as ``pallas_lstm_scan``; the input-projection gradients
    become big outside matmuls over the streamed dpre.
    """
    (hs,) = _fusedin_call(x, w_ih, b, w_hh, mask, interpret, reverse,
                          train=False)
    return hs


def _fusedin_fwd(x, w_ih, b, w_hh, mask, interpret, reverse):
    hs, cs, gates = _fusedin_call(x, w_ih, b, w_hh, mask, interpret, reverse,
                                  train=True)
    return hs, (x, w_ih, w_hh, mask, hs, cs, gates)


def _fusedin_bwd(interpret, reverse, res, d_hs):
    x, w_ih, w_hh, mask, hs, cs, gates = res
    dtype = gates.dtype
    prec = matmul_precision(dtype)

    dpre, d_whh = _adjoint_with_dw(w_hh, mask, hs, cs, gates, d_hs,
                                   interpret, reverse)
    d_wih = jnp.einsum("tbi,tbk->ik", x, dpre, precision=prec,
                       preferred_element_type=jnp.float32)
    d_b = jnp.sum(dpre, axis=(0, 1), dtype=jnp.float32)
    d_x = jnp.einsum("tbk,ik->tbi", dpre, w_ih.astype(dtype), precision=prec)
    return (d_x, d_wih.astype(w_ih.dtype), d_b.astype(dtype),
            d_whh.astype(w_hh.dtype), None)


pallas_lstm_scan_fusedin.defvjp(_fusedin_fwd, _fusedin_bwd)


# ---------------------------------------------------------------------------
# Drop-in lstm_apply with the Pallas recurrence
# ---------------------------------------------------------------------------

def lstm_apply_pallas(
    params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    reverse: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Same contract as ops.lstm.lstm_apply, with the Pallas recurrence."""
    from attention_based_e2e_asr_dnn_tpu.ops.masking import length_mask

    if interpret is None:
        interpret = _auto_interpret()
    batch, seq_len, _ = x.shape
    four_h = 4 * params["w_hh"].shape[0]
    if not interpret and (batch % 8 != 0 or four_h % 128 != 0):
        # TPU tiling can't block this shape; use the lax.scan path.
        from attention_based_e2e_asr_dnn_tpu.ops.lstm import lstm_apply

        return lstm_apply(params, x, lengths, reverse=reverse)
    dtype = x.dtype
    valid = length_mask(lengths, seq_len, dtype=dtype)  # (B, T) 1/0

    in_dim = params["w_ih"].shape[0]
    if in_dim <= 128:
        # narrow input (the base listener layer): project IN-KERNEL — skips
        # materializing the (T, B, 4H) x_proj intermediate entirely
        hs = pallas_lstm_scan_fusedin(
            jnp.swapaxes(x, 0, 1).astype(dtype),
            params["w_ih"].astype(dtype), params["b"].astype(dtype),
            params["w_hh"].astype(dtype), jnp.swapaxes(valid, 0, 1),
            interpret, reverse,
        )
        return jnp.swapaxes(hs, 0, 1)

    x_proj = jnp.einsum(
        "btd,dh->bth", x, params["w_ih"].astype(dtype),
        precision=matmul_precision(dtype),
    ) + params["b"].astype(dtype)

    # the reversed direction runs inside the kernel via reversed index maps —
    # no jnp.flip copies on either side; padded positions come back zeroed
    # from the kernel, so no outer mask multiply either
    hs = pallas_lstm_scan(
        jnp.swapaxes(x_proj, 0, 1), params["w_hh"].astype(dtype),
        jnp.swapaxes(valid, 0, 1), interpret, reverse,
    )
    return jnp.swapaxes(hs, 0, 1)


# ---------------------------------------------------------------------------
# Fused bidirectional kernel: both directions in ONE pallas_call
# ---------------------------------------------------------------------------
#
# The recurrence is latency-bound: each cell update's (B, H) x (H, 4H) dot
# must wait for the previous step's gate math. Running fwd and the
# time-flipped bwd direction inside the SAME grid step gives the scheduler
# two INDEPENDENT dependency chains to interleave — the MXU works dir-1's dot
# while the VPU does dir-0's gates — the same ~2x the XLA path gets from its
# single fused scan (ops/lstm.py::bilstm_apply), now with the VMEM-resident
# carry on top.


def _bilstm_scan_kernel(xp_ref, mask_ref, w_ref, h_out_ref, c_out_ref,
                        h_scratch, c_scratch, *, hidden_dim: int,
                        k_block: int):
    """One grid step over K timesteps of BOTH directions.

    xp_ref: (K, 2, B, 4H) input projections (dir 1 already time-flipped);
    mask_ref: (K, 2, B, 1); w_ref: (2, H, 4H); outs: (K, 2, B, H);
    scratch: (2, B, H) fp32 carries.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    def one_dir(pre, c):
        i = jax.nn.sigmoid(pre[:, 0 * hidden_dim : 1 * hidden_dim])
        f = jax.nn.sigmoid(pre[:, 1 * hidden_dim : 2 * hidden_dim])
        g = jnp.tanh(pre[:, 2 * hidden_dim : 3 * hidden_dim])
        o = jax.nn.sigmoid(pre[:, 3 * hidden_dim : 4 * hidden_dim])
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    def one_step(k, carry):
        h0, c0, h1, c1 = carry
        # two independent dots — the scheduler interleaves the chains
        pre0 = xp_ref[k, 0].astype(jnp.float32) + jnp.dot(
            h0.astype(w_ref.dtype), w_ref[0],
            preferred_element_type=jnp.float32)
        pre1 = xp_ref[k, 1].astype(jnp.float32) + jnp.dot(
            h1.astype(w_ref.dtype), w_ref[1],
            preferred_element_type=jnp.float32)
        h0_new, c0_new = one_dir(pre0, c0)
        h1_new, c1_new = one_dir(pre1, c1)

        m0 = mask_ref[k, 0].astype(jnp.float32)  # (B, 1)
        m1 = mask_ref[k, 1].astype(jnp.float32)
        h0 = m0 * h0_new + (1.0 - m0) * h0
        c0 = m0 * c0_new + (1.0 - m0) * c0
        h1 = m1 * h1_new + (1.0 - m1) * h1
        c1 = m1 * c1_new + (1.0 - m1) * c1
        h_out_ref[k, 0] = h0.astype(h_out_ref.dtype)
        h_out_ref[k, 1] = h1.astype(h_out_ref.dtype)
        c_out_ref[k, 0] = c0.astype(c_out_ref.dtype)
        c_out_ref[k, 1] = c1.astype(c_out_ref.dtype)
        return h0, c0, h1, c1

    carry = (h_scratch[0], c_scratch[0], h_scratch[1], c_scratch[1])
    if k_block == 1:
        carry = one_step(0, carry)
    else:
        carry = jax.lax.fori_loop(0, k_block, one_step, carry,
                                  unroll=k_block)
    h_scratch[0], c_scratch[0] = carry[0], carry[1]
    h_scratch[1], c_scratch[1] = carry[2], carry[3]


def _fused_k_block(seq_len: int, batch: int, four_h: int, hidden_dim: int,
                   itemsize: int) -> int:
    """K for the direction-fused kernel: both directions' streams, shared
    VMEM-fit search (_pick_k_block)."""
    return _pick_k_block(
        seq_len, 2 * (four_h + 2 * hidden_dim + 1), batch, itemsize,
        fixed_bytes=2 * hidden_dim * four_h * itemsize
        + 2 * 2 * batch * hidden_dim * 4,
    )


def _forward_pallas_bi(xp: jnp.ndarray, w_hh: jnp.ndarray, mask: jnp.ndarray,
                       interpret: bool = False):
    """xp (T, 2, B, 4H), w_hh (2, H, 4H), mask (T, 2, B) -> hs, cs (T, 2, B, H)."""
    seq_len, _, batch, four_h = xp.shape
    hidden_dim = four_h // 4
    dtype = xp.dtype
    k_block = _fused_k_block(seq_len, batch, four_h, hidden_dim,
                             jnp.dtype(dtype).itemsize)

    kernel = functools.partial(_bilstm_scan_kernel, hidden_dim=hidden_dim,
                               k_block=k_block)
    hs, cs = pl.pallas_call(
        kernel,
        grid=(seq_len // k_block,),
        in_specs=[
            pl.BlockSpec((k_block, 2, batch, four_h), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((k_block, 2, batch, 1), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((2, hidden_dim, four_h), lambda t: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k_block, 2, batch, hidden_dim), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((k_block, 2, batch, hidden_dim), lambda t: (t, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, 2, batch, hidden_dim), dtype),
            jax.ShapeDtypeStruct((seq_len, 2, batch, hidden_dim), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, batch, hidden_dim), jnp.float32),
            pltpu.VMEM((2, batch, hidden_dim), jnp.float32),
        ] if pltpu is not None else None,
        interpret=interpret,
    )(xp, mask.astype(dtype)[..., None], w_hh.astype(dtype))
    return hs, cs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_bilstm_scan(xp, w_hh, mask, interpret: bool = False):
    """Differentiable fused BIDIRECTIONAL LSTM recurrence.

    Args:
        xp:   (T, 2, B, 4H) input projections; dir 1 pre-flipped in time.
        w_hh: (2, H, 4H) recurrent weights (fwd, bwd).
        mask: (T, 2, B) float validity (dir 1 pre-flipped).
    Returns:
        hs: (T, 2, B, H) hidden states.
    """
    hs, _ = _forward_pallas_bi(xp, w_hh, mask, interpret)
    return hs


def _fwd_bi(xp, w_hh, mask, interpret):
    hs, cs = _forward_pallas_bi(xp, w_hh, mask, interpret)
    return hs, (xp, w_hh, mask, hs, cs)


def _bwd_bi(interpret, res, d_hs):
    """Fused-direction LSTM adjoint: ONE reverse lax.scan carries both
    directions' (dh, dc), halving the backward's sequential latency exactly
    like the forward fusion (gates recomputed from saved (hs, cs))."""
    xp, w_hh, mask, hs, cs = res
    seq_len, dirs, batch, four_h = xp.shape
    hidden_dim = four_h // 4
    dtype = xp.dtype
    prec = matmul_precision(dtype)

    zero_row = jnp.zeros((1, dirs, batch, hidden_dim), dtype)
    h_prev = jnp.concatenate([zero_row, hs[:-1]], axis=0)
    c_prev = jnp.concatenate([zero_row, cs[:-1]], axis=0)

    def step(carry, inp):
        dh_next, dc_next = carry          # (2, B, H)
        xp_t, m_t, hp, cp, c_t, dy = inp  # (2, B, ...) each
        m = m_t[..., None]                # (2, B, 1)

        pre = xp_t + jnp.einsum("dbh,dhk->dbk", hp, w_hh, precision=prec)
        i = jax.nn.sigmoid(pre[..., 0 * hidden_dim : 1 * hidden_dim])
        f = jax.nn.sigmoid(pre[..., 1 * hidden_dim : 2 * hidden_dim])
        g = jnp.tanh(pre[..., 2 * hidden_dim : 3 * hidden_dim])
        o = jax.nn.sigmoid(pre[..., 3 * hidden_dim : 4 * hidden_dim])
        tanh_ct = jnp.tanh(c_t)

        dh_total = dy + dh_next
        dc_total = dc_next + dh_total * o * (1.0 - tanh_ct * tanh_ct)
        dpre_o = dh_total * tanh_ct * o * (1.0 - o)
        dpre_f = dc_total * cp * f * (1.0 - f)
        dpre_i = dc_total * g * i * (1.0 - i)
        dpre_g = dc_total * i * (1.0 - g * g)
        dpre = jnp.concatenate([dpre_i, dpre_f, dpre_g, dpre_o], axis=-1)
        dpre = dpre * m
        dh_prev_valid = jnp.einsum("dbk,dhk->dbh", dpre, w_hh, precision=prec)
        dc_prev_valid = dc_total * f
        dh_prev = jnp.where(m > 0, dh_prev_valid, dh_total)
        dc_prev = jnp.where(m > 0, dc_prev_valid, dc_next)
        return (dh_prev, dc_prev), dpre

    zeros = jnp.zeros((dirs, batch, hidden_dim), dtype)
    (_, _), d_xp = jax.lax.scan(
        step, (zeros, zeros),
        (xp, mask.astype(dtype), h_prev, c_prev, cs, d_hs),
        reverse=True,
    )
    # weight gradient as ONE outside matmul over all (T*B) rows per direction
    # (a per-step (T, 2, H, 4H) scan output would be a multi-GB transient)
    d_whh = jnp.einsum("tdbh,tdbk->dhk", h_prev, d_xp, precision=prec,
                       preferred_element_type=jnp.float32)
    return d_xp, d_whh.astype(w_hh.dtype), None


pallas_bilstm_scan.defvjp(_fwd_bi, _bwd_bi)


def bilstm_apply_pallas(params: dict, x: jnp.ndarray, lengths: jnp.ndarray,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Bidirectional LSTM on the Pallas recurrence: one kernel per direction.

    MEASURED choice (RESULTS.md): at B>=32 the recurrence is MXU-throughput-
    bound, so two K=8 kernels beat one direction-fused kernel whose doubled
    block footprint forces K<=2 under the ~16MB VMEM budget (the fused
    variant is kept below as ``bilstm_apply_pallas_fused``)."""
    h_fwd = lstm_apply_pallas(params["fwd"], x, lengths, False, interpret)
    h_bwd = lstm_apply_pallas(params["bwd"], x, lengths, True, interpret)
    return jnp.concatenate([h_fwd, h_bwd], axis=-1)


def bilstm_apply_pallas_fused(params: dict, x: jnp.ndarray,
                              lengths: jnp.ndarray,
                              interpret: bool | None = None) -> jnp.ndarray:
    """Bidirectional LSTM with BOTH directions fused into one pallas_call
    (one VMEM carry, halved grid steps — wins only when latency-bound, i.e.
    small B; see bilstm_apply_pallas for the measured default)."""
    from attention_based_e2e_asr_dnn_tpu.ops.masking import length_mask

    if interpret is None:
        interpret = _auto_interpret()
    batch, seq_len, _ = x.shape
    hidden_dim = params["fwd"]["w_hh"].shape[0]
    four_h = 4 * hidden_dim
    if not interpret and (batch % 8 != 0 or four_h % 128 != 0):
        from attention_based_e2e_asr_dnn_tpu.ops.lstm import bilstm_apply

        return bilstm_apply(params, x, lengths)
    dtype = x.dtype
    prec = matmul_precision(dtype)

    # ONE input-projection matmul for both directions: concat W_ih on the
    # output dim -> a single bigger MXU op, then split
    w_ih = jnp.concatenate(
        [params["fwd"]["w_ih"], params["bwd"]["w_ih"]], axis=1
    ).astype(dtype)
    b = jnp.concatenate([params["fwd"]["b"], params["bwd"]["b"]]).astype(dtype)
    xp_cat = jnp.einsum("btd,dh->bth", x, w_ih, precision=prec) + b
    xp_f, xp_b = xp_cat[..., :four_h], xp_cat[..., four_h:]

    valid = length_mask(lengths, seq_len, dtype=dtype)          # (B, T)
    xp = jnp.stack([xp_f, jnp.flip(xp_b, axis=1)], axis=0)      # (2, B, T, 4H)
    vstack = jnp.stack([valid, jnp.flip(valid, axis=1)], 0)     # (2, B, T)
    w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]], 0)

    hs = pallas_bilstm_scan(
        jnp.moveaxis(xp, 2, 0),       # (T, 2, B, 4H)
        w_hh.astype(dtype),
        jnp.moveaxis(vstack, 2, 0),   # (T, 2, B)
        interpret,
    )
    h_fwd = jnp.moveaxis(hs[:, 0], 0, 1)                  # (B, T, H)
    h_bwd = jnp.flip(jnp.moveaxis(hs[:, 1], 0, 1), axis=1)
    out = jnp.concatenate([h_fwd, h_bwd], axis=-1)
    return out * valid[:, :, None]
