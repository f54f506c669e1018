"""Masked token-mean cross-entropy (reference: src/train.py:133-136).

loss = sum(CE(logits, y) * non_pad_mask) / n_non_pad_tokens ; ppl = exp(loss)
(reference divides additionally by accu_grad before backward; here gradient
accumulation averages inside optax.MultiSteps instead, producing the same
effective update while the REPORTED loss stays the true token mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.ops.masking import length_mask


def masked_ce_loss(logits: jnp.ndarray, targets: jnp.ndarray, target_lens: jnp.ndarray):
    """logits (B, L, V) vs targets (B, L) with valid lengths (B,).

    Returns (loss, n_tokens). Cross-entropy in float32 regardless of the
    compute dtype (softmax accumulations need it).
    """
    logits = logits.astype(jnp.float32)
    mask = length_mask(target_lens, targets.shape[1], dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    n_tokens = jnp.maximum(mask.sum(), 1.0)
    return (ce * mask).sum() / n_tokens, n_tokens
