"""Multi-head cross-attention primitives for the autoregressive decoders.

Reference semantics (src/models.py:70-193), rebuilt functionally:

  * ``cross_attention_precompute`` computes keys, values and the pad mask ONCE
    per utterance batch (reference ``wrapup_encodings``, src/models.py:129-154),
  * ``cross_attention_step`` is the per-decode-step query -> context map used
    inside the decode ``lax.scan``.

Scaling: the reference DIVIDES scores by ``norm_factor = 1/sqrt(d_head)``
(src/models.py:93,170) which actually MULTIPLIES by sqrt(d_head) — an inherited
quirk. This implementation uses the correct ``1/sqrt(d_head)`` scaling by
default; pass ``legacy_scale=True`` for bug-for-bug parity. (Conscious
deviation, see SURVEY.md §7 hard part (f).)

The reference's ``final_map`` layer exists but its application is commented
out (src/models.py:99,186-187); we only create it when ``use_final_map`` is
set, and its application then includes the (otherwise dead) locked dropout.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.ops.masking import pad_mask
from attention_based_e2e_asr_dnn_tpu.ops.precision import matmul_precision


class AttentionCache(NamedTuple):
    """Per-batch precomputed attention state (keys/values/mask)."""

    keys: jnp.ndarray    # (B, heads, T, d_head)
    values: jnp.ndarray  # (B, heads, T, d_head)
    mask: jnp.ndarray    # (B, T) True where PADDED


def _linear_init(rng: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """torch nn.Linear default init: uniform(-1/sqrt(in), 1/sqrt(in))."""
    k = 1.0 / math.sqrt(in_dim)
    k_w, k_b = jax.random.split(rng)
    return {
        "w": jax.random.uniform(k_w, (in_dim, out_dim), dtype, -k, k),
        "b": jax.random.uniform(k_b, (out_dim,), dtype, -k, k),
    }


def linear_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(
        x,
        params["w"].astype(x.dtype),
        precision=matmul_precision(x.dtype),
        preferred_element_type=x.dtype,
    ) + params["b"].astype(x.dtype)


def cross_attention_init(
    rng: jax.Array,
    enc_out_dim: int,
    dec_out_dim: int,
    proj_dim: int,
    heads: int,
    use_final_map: bool = False,
    dtype=jnp.float32,
) -> dict:
    """K/V/Q projection parameters (reference: src/models.py:95-99)."""
    if proj_dim % heads != 0:
        raise ValueError(f"proj_dim {proj_dim} must be divisible by heads {heads}")
    k_k, k_v, k_q, k_f = jax.random.split(rng, 4)
    params = {
        "key_map": _linear_init(k_k, enc_out_dim, proj_dim, dtype),
        "value_map": _linear_init(k_v, enc_out_dim, proj_dim, dtype),
        "query_map": _linear_init(k_q, dec_out_dim, proj_dim, dtype),
    }
    if use_final_map:
        params["final_map"] = _linear_init(k_f, proj_dim, proj_dim, dtype)
    return params


def cross_attention_precompute(
    params: dict, enc_h: jnp.ndarray, enc_l: jnp.ndarray, heads: int
) -> AttentionCache:
    """Project encoder outputs to keys/values once per batch.

    enc_h: (B, T, enc_out_dim); enc_l: (B,). Returns an AttentionCache.
    """
    batch, seq_len, _ = enc_h.shape
    proj_dim = params["key_map"]["w"].shape[1]
    d_head = proj_dim // heads
    keys = linear_apply(params["key_map"], enc_h).reshape(batch, seq_len, heads, d_head)
    values = linear_apply(params["value_map"], enc_h).reshape(batch, seq_len, heads, d_head)
    return AttentionCache(
        keys=jnp.swapaxes(keys, 1, 2),      # (B, heads, T, d_head)
        values=jnp.swapaxes(values, 1, 2),  # (B, heads, T, d_head)
        mask=pad_mask(enc_l, seq_len),      # (B, T)
    )


def cross_attention_step(
    params: dict,
    cache: AttentionCache,
    dec_h: jnp.ndarray,
    heads: int,
    legacy_scale: bool = False,
    init_wgts_row: Optional[jnp.ndarray] = None,
):
    """One decode-step attention query (reference: src/models.py:157-192).

    Args:
        dec_h: (B, dec_out_dim) decoder hidden state.
        init_wgts_row: optional (T,) diagonal-forcing prior for this step
            (reference init_force path, src/models.py:177-181).

    Returns:
        context: (B, proj_dim)
        wgts:    (B, heads, T) — pre-forcing weights when init forcing is on,
                 matching the reference's recorded map (src/models.py:190).
        q_proj:  (B, proj_dim) projected queries (fed to the classifier,
                 reference src/models.py:370).
    """
    batch = dec_h.shape[0]
    proj_dim = params["query_map"]["w"].shape[1]
    d_head = proj_dim // heads
    dtype = dec_h.dtype

    q_proj = linear_apply(params["query_map"], dec_h)            # (B, P)
    q = q_proj.reshape(batch, heads, d_head)                     # (B, h, d)

    prec = matmul_precision(dtype)
    scale = math.sqrt(d_head) if legacy_scale else 1.0 / math.sqrt(d_head)
    scores = jnp.einsum(
        "bhd,bhtd->bht", q, cache.keys, precision=prec
    ) * jnp.asarray(scale, dtype)

    neg = jnp.finfo(dtype).min
    mask = cache.mask[:, None, :]                                # (B, 1, T)
    scores = jnp.where(mask, neg, scores)
    wgts = jax.nn.softmax(scores, axis=-1)
    wgts = jnp.where(mask, jnp.zeros((), dtype), wgts)           # re-zero pads

    if init_wgts_row is not None:
        recorded = wgts
        forced = wgts * init_wgts_row[None, None, :].astype(dtype)
        # Reference renormalizes the masked weights with ANOTHER softmax
        # (src/models.py:181) rather than dividing by the sum — replicated
        # so the early-epoch alignment-forcing dynamics match.
        forced = jax.nn.softmax(forced, axis=-1)
        context = jnp.einsum("bht,bhtd->bhd", forced, cache.values, precision=prec)
    else:
        recorded = wgts
        context = jnp.einsum("bht,bhtd->bhd", wgts, cache.values, precision=prec)

    context = context.reshape(batch, proj_dim)
    if "final_map" in params:
        context = linear_apply(params["final_map"], context)
    return context, recorded, q_proj


def block_diagonal_prior(enc_len: int, steps: int, blocks: int = 6) -> jnp.ndarray:
    """Block-diagonal attention prior for early-epoch alignment forcing.

    Parity with the reference's 6-block ``torch.block_diag`` construction
    (src/models.py:327-330): entry (i, t) is 1 when encoder frame i and decode
    step t fall in the same block. Returns (enc_len, steps) float32.
    """
    a_side = enc_len // blocks + 1
    b_side = steps // blocks + 1
    rows = jnp.arange(enc_len) // a_side
    cols = jnp.arange(steps) // b_side
    return (rows[:, None] == cols[None, :]).astype(jnp.float32)
