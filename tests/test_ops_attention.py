"""Cross-attention: mask correctness, normalization, forcing prior."""

import numpy as np

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.ops.attention import (
    block_diagonal_prior,
    cross_attention_init,
    cross_attention_precompute,
    cross_attention_step,
)
from attention_based_e2e_asr_dnn_tpu.ops.masking import length_mask, pad_mask


def test_pad_mask():
    m = np.asarray(pad_mask(jnp.array([3, 1]), 4))
    assert m[0].tolist() == [False, False, False, True]
    assert m[1].tolist() == [False, True, True, True]


def test_length_mask_complement():
    lm = length_mask(jnp.array([2, 4]), 4)
    pm = pad_mask(jnp.array([2, 4]), 4)
    assert np.all(np.asarray(lm) == ~np.asarray(pm))


def _setup(heads=2, B=3, T=6, enc_dim=8, dec_dim=5, proj=4):
    params = cross_attention_init(jax.random.key(0), enc_dim, dec_dim, proj, heads)
    enc_h = jax.random.normal(jax.random.key(1), (B, T, enc_dim))
    enc_l = jnp.array([6, 4, 1])
    cache = cross_attention_precompute(params, enc_h, enc_l, heads)
    dec_h = jax.random.normal(jax.random.key(2), (B, dec_dim))
    return params, cache, dec_h, heads


def test_attention_weights_sum_to_one_and_zero_on_pads():
    params, cache, dec_h, heads = _setup()
    context, wgts, q_proj = cross_attention_step(params, cache, dec_h, heads)
    w = np.asarray(wgts)
    # zero on padded positions (reference re-zeroes after softmax, src/models.py:174-175)
    assert np.all(w[1, :, 4:] == 0.0)
    assert np.all(w[2, :, 1:] == 0.0)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
    assert context.shape == (3, 4)
    assert q_proj.shape == (3, 4)


def test_single_valid_frame_gets_all_weight():
    params, cache, dec_h, heads = _setup()
    w = np.asarray(cross_attention_step(params, cache, dec_h, heads)[1])
    np.testing.assert_allclose(w[2, :, 0], 1.0, atol=1e-6)


def test_legacy_scale_differs():
    params, cache, dec_h, heads = _setup()
    _, w_correct, _ = cross_attention_step(params, cache, dec_h, heads, legacy_scale=False)
    _, w_legacy, _ = cross_attention_step(params, cache, dec_h, heads, legacy_scale=True)
    assert not np.allclose(np.asarray(w_correct), np.asarray(w_legacy))


def test_block_diagonal_prior_shape_and_blocks():
    p = np.asarray(block_diagonal_prior(12, 18, blocks=6))
    assert p.shape == (12, 18)
    assert p[0, 0] == 1.0
    # frame 0 (block 0) should not attend to the last step (block 5)
    assert p[0, -1] == 0.0
    # ones exactly where row-block == col-block
    a_side, b_side = 12 // 6 + 1, 18 // 6 + 1
    for i in range(12):
        for t in range(18):
            assert p[i, t] == float(i // a_side == t // b_side)


def test_init_force_uses_prior_for_context():
    params, cache, dec_h, heads = _setup()
    row = jnp.zeros((6,)).at[0].set(1.0)  # force all mass toward frame 0
    ctx_forced, w_recorded, _ = cross_attention_step(
        params, cache, dec_h, heads, init_wgts_row=row
    )
    ctx_free, w_free, _ = cross_attention_step(params, cache, dec_h, heads)
    # recorded weights are the PRE-forcing ones (reference src/models.py:190)
    np.testing.assert_allclose(np.asarray(w_recorded), np.asarray(w_free), atol=1e-6)
    assert not np.allclose(np.asarray(ctx_forced), np.asarray(ctx_free))
