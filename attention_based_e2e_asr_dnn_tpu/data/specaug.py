"""On-device SpecAugment as XLA ops.

The reference applies torchaudio FrequencyMasking(6) + TimeMasking(200) on
the padded batch in the host-side collate (src/utils.py:82-84, 122-126); on
TPU the masks are cheap ``where`` ops inside the jitted train step, so
augmentation rides the accelerator (BASELINE.json north star).

torchaudio semantics replicated: mask width ~ Uniform[0, param); start
~ Uniform[0, size - width); masked value 0.0; a 3-D (B, F, T) input gets ONE
shared mask across the batch. ``iid`` extends this with per-example masks (an
upgrade; default off for parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_axis(rng: jax.Array, size: int, param: int, batch: int, iid: bool):
    """Returns (B, size) keep-mask (True = keep)."""
    shape = (batch,) if iid else (1,)
    k_w, k_s = jax.random.split(rng)
    width = jax.random.uniform(k_w, shape, minval=0.0, maxval=float(param))
    start = jax.random.uniform(k_s, shape) * (size - width)
    pos = jnp.arange(size, dtype=jnp.float32)[None, :]
    masked = (pos >= start[:, None]) & (pos < (start + width)[:, None])
    return ~masked  # (B or 1, size)


def specaugment(
    rng: jax.Array,
    x: jnp.ndarray,
    freq_mask_param: int = 6,
    time_mask_param: int = 200,
    iid: bool = False,
) -> jnp.ndarray:
    """Apply one frequency + one time mask to (B, T, F) features."""
    batch, seq_len, n_feats = x.shape
    k_f, k_t = jax.random.split(rng)
    keep_f = _mask_axis(k_f, n_feats, freq_mask_param, batch, iid)  # (B|1, F)
    keep_t = _mask_axis(k_t, seq_len, time_mask_param, batch, iid)  # (B|1, T)
    x = x * keep_f[:, None, :].astype(x.dtype)
    x = x * keep_t[:, :, None].astype(x.dtype)
    return x
