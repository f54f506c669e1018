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

Differentiation: ``pallas_lstm_scan`` carries a custom VJP whose backward is
the standard LSTM adjoint recurrence as a reverse ``lax.scan`` that RECOMPUTES
gate activations from the saved (hs, cs) — trading one extra matmul per step
for not materializing (T, B, 4H) gate workspace (what cuDNN stores).

Fallback: non-TPU backends or tiny shapes route to the pure lax.scan path.
"""

from __future__ import annotations

import functools


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


def _lstm_scan_kernel(xp_ref, mask_ref, w_ref, h_out_ref, c_out_ref,
                      h_scratch, c_scratch, *, hidden_dim: int, k_block: int):
    """One grid step: consume x_proj[t*K:(t+1)*K], update carry K times.

    Processing K timesteps per grid step amortizes the pipeline's per-step
    overhead; the sequential dependency only exists on the recurrent matmul,
    which runs K times inside.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    def one_step(k, carry):
        # Gate math in fp32: fp32 carries for stability over long sequences,
        # and Mosaic transcendentals want a uniform element type (bf16
        # sigmoid hits a mixed-dtype broadcast bug).
        h, c = carry
        pre = xp_ref[k].astype(jnp.float32) + jnp.dot(
            h.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(pre[:, 0 * hidden_dim : 1 * hidden_dim])
        f = jax.nn.sigmoid(pre[:, 1 * hidden_dim : 2 * hidden_dim])
        g = jnp.tanh(pre[:, 2 * hidden_dim : 3 * hidden_dim])
        o = jax.nn.sigmoid(pre[:, 3 * hidden_dim : 4 * hidden_dim])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)

        m = mask_ref[k].astype(jnp.float32)  # (B, 1) 1.0 where valid
        h_next = m * h_new + (1.0 - m) * h
        c_next = m * c_new + (1.0 - m) * c
        h_out_ref[k] = h_next.astype(h_out_ref.dtype)
        c_out_ref[k] = c_next.astype(c_out_ref.dtype)
        return h_next, c_next

    h, c = h_scratch[:], c_scratch[:]
    if k_block == 1:
        h, c = one_step(0, (h, c))
    else:
        # Mosaic supports only full unroll inside kernels (unroll == steps)
        h, c = jax.lax.fori_loop(0, k_block, one_step, (h, c),
                                 unroll=k_block)
    h_scratch[:] = h
    c_scratch[:] = c


def _forward_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray, mask: jnp.ndarray,
                    interpret: bool = False, k_block: int = 8):
    """x_proj (T, B, 4H), w_hh (H, 4H), mask (T, B) float -> hs, cs (T, B, H).

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
    if seq_len % k_block != 0:
        k_block = 1

    kernel = functools.partial(_lstm_scan_kernel, hidden_dim=hidden_dim,
                               k_block=k_block)
    hs, cs = pl.pallas_call(
        kernel,
        grid=(seq_len // k_block,),
        in_specs=[
            pl.BlockSpec((k_block, batch, four_h), lambda t: (t, 0, 0)),
            pl.BlockSpec((k_block, batch, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec((hidden_dim, four_h), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k_block, batch, hidden_dim), lambda t: (t, 0, 0)),
            pl.BlockSpec((k_block, batch, hidden_dim), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, batch, hidden_dim), dtype),
            jax.ShapeDtypeStruct((seq_len, batch, hidden_dim), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, hidden_dim), jnp.float32),
            pltpu.VMEM((batch, hidden_dim), jnp.float32),
        ] if pltpu is not None else None,
        interpret=interpret,
    )(x_proj, mask.astype(dtype)[:, :, None], w_hh.astype(dtype))
    return hs, cs


# ---------------------------------------------------------------------------
# custom VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_lstm_scan(x_proj, w_hh, mask, interpret: bool = False):
    """Differentiable fused LSTM recurrence.

    Args:
        x_proj: (T, B, 4H) precomputed input projections (+ bias).
        w_hh:   (H, 4H) recurrent weights.
        mask:   (T, B) float, 1.0 where t < length.
    Returns:
        hs: (T, B, H) hidden states (carry value, NOT output-masked).
    """
    hs, _ = _forward_pallas(x_proj, w_hh, mask, interpret)
    return hs


def _fwd(x_proj, w_hh, mask, interpret):
    hs, cs = _forward_pallas(x_proj, w_hh, mask, interpret)
    return hs, (x_proj, w_hh, mask, hs, cs)


def _bwd(interpret, res, d_hs):
    """LSTM adjoint as a reverse lax.scan, recomputing gates from (hs, cs)."""
    x_proj, w_hh, mask, hs, cs = res
    seq_len, batch, four_h = x_proj.shape
    hidden_dim = four_h // 4
    dtype = x_proj.dtype
    prec = matmul_precision(dtype)

    h_prev = jnp.concatenate(
        [jnp.zeros((1, batch, hidden_dim), dtype), hs[:-1]], axis=0
    )
    c_prev = jnp.concatenate(
        [jnp.zeros((1, batch, hidden_dim), dtype), cs[:-1]], axis=0
    )

    def step(carry, inp):
        dh_next, dc_next = carry
        xp_t, m_t, hp, cp, c_t, dy = inp
        m = m_t[:, None]

        pre = xp_t + jnp.dot(hp, w_hh, precision=prec,
                             preferred_element_type=dtype)
        i = jax.nn.sigmoid(pre[:, 0 * hidden_dim : 1 * hidden_dim])
        f = jax.nn.sigmoid(pre[:, 1 * hidden_dim : 2 * hidden_dim])
        g = jnp.tanh(pre[:, 2 * hidden_dim : 3 * hidden_dim])
        o = jax.nn.sigmoid(pre[:, 3 * hidden_dim : 4 * hidden_dim])
        tanh_ct = jnp.tanh(c_t)

        dh_total = dy + dh_next
        # valid-step gradients
        dc_total = dc_next + dh_total * o * (1.0 - tanh_ct * tanh_ct)
        dpre_o = dh_total * tanh_ct * o * (1.0 - o)
        dpre_f = dc_total * cp * f * (1.0 - f)
        dpre_i = dc_total * g * i * (1.0 - i)
        dpre_g = dc_total * i * (1.0 - g * g)
        dpre = jnp.concatenate([dpre_i, dpre_f, dpre_g, dpre_o], axis=-1)
        dpre = dpre * m  # masked steps contribute nothing
        dh_prev_valid = jnp.dot(dpre, w_hh.T, precision=prec,
                                preferred_element_type=dtype)
        dc_prev_valid = dc_total * f
        # masked steps: identity carry -> adjoints pass straight through
        dh_prev = m * dh_prev_valid + (1.0 - m) * dh_total
        dc_prev = m * dc_prev_valid + (1.0 - m) * dc_next
        # recurrent weight grad contribution
        dw = jnp.einsum("bh,bk->hk", hp, dpre, precision=prec)
        return (dh_prev, dc_prev), (dpre, dw)

    zeros = jnp.zeros((batch, hidden_dim), dtype)
    (_, _), (d_xproj, dws) = jax.lax.scan(
        step, (zeros, zeros),
        (x_proj, mask.astype(dtype), h_prev, c_prev, cs, d_hs),
        reverse=True,
    )
    d_whh = dws.sum(axis=0)
    return d_xproj, d_whh.astype(w_hh.dtype), None


pallas_lstm_scan.defvjp(_fwd, _bwd)


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
    x_proj = jnp.einsum(
        "btd,dh->bth", x, params["w_ih"].astype(dtype),
        precision=matmul_precision(dtype),
    ) + params["b"].astype(dtype)

    valid = length_mask(lengths, seq_len, dtype=dtype)  # (B, T) 1/0
    if reverse:
        x_proj = jnp.flip(x_proj, axis=1)
        valid_scan = jnp.flip(valid, axis=1)
    else:
        valid_scan = valid

    hs = pallas_lstm_scan(
        jnp.swapaxes(x_proj, 0, 1), params["w_hh"].astype(dtype),
        jnp.swapaxes(valid_scan, 0, 1), interpret,
    )
    hs = jnp.swapaxes(hs, 0, 1)
    if reverse:
        hs = jnp.flip(hs, axis=1)
    return hs * valid[:, :, None]


def bilstm_apply_pallas(params: dict, x: jnp.ndarray, lengths: jnp.ndarray,
                        interpret: bool | None = None) -> jnp.ndarray:
    h_fwd = lstm_apply_pallas(params["fwd"], x, lengths, False, interpret)
    h_bwd = lstm_apply_pallas(params["bwd"], x, lengths, True, interpret)
    return jnp.concatenate([h_fwd, h_bwd], axis=-1)
