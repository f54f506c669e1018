"""LAS model: shapes, teacher forcing, free-running decode, rewriter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.models.las import (
    LASConfig,
    ListenerConfig,
    SpellerConfig,
    las_apply,
    las_config_from_dicts,
    las_init,
    listener_apply,
    listener_init,
)
from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
    RewriterConfig,
    rewriter_apply,
    rewriter_init,
)

TINY = LASConfig(
    listener=ListenerConfig(input_dim=15, uniform_hid_dim=16, lstm_layers=1,
                            plstm_layers=2, init_dropout=0.1, mid_dropout=0.1,
                            final_dropout=0.1),
    speller=SpellerConfig(enc_out_dim=32, att_proj_dim=8, att_heads=2,
                          dec_vocab_size=30, dec_emb_dim=16,
                          dec_lstm_hid_dim=16, dec_lstm_out_dim=8,
                          dec_lstm_dropout=0.1, CHR_MAX_STEPS=12),
)


def _batch(B=2, T=16, L=6):
    x = jax.random.normal(jax.random.key(1), (B, T, 15))
    lx = jnp.array([T, T - 5][:B])
    y = jax.random.randint(jax.random.key(2), (B, L), 0, 30)
    ly = jnp.array([L, L - 2][:B])
    return x, lx, y, ly


def test_config_from_dicts_derives_enc_out_dim():
    cfg = las_config_from_dicts(
        {"uniform_hid_dim": 64},
        {"att_proj_dim": 8, "dec_emb_dim": 16, "dec_lstm_out_dim": 8,
         "dec_lstm_hid_dim": 16, "att_heads": 1},
    )
    # enc_out_dim = 2 * uniform_hid_dim (reference src/models.py:512)
    assert cfg.speller.enc_out_dim == 128


def test_weight_tying_constraint_enforced():
    with pytest.raises(ValueError):
        SpellerConfig(att_proj_dim=8, dec_emb_dim=17)


def test_listener_shapes_and_lengths():
    params = listener_init(jax.random.key(0), TINY.listener)
    x, lx, _, _ = _batch(T=16)
    h, l = listener_apply(params, TINY.listener, None, x, lx)
    assert h.shape == (2, 4, 32)  # 16 / 2**2, 2*hid
    assert list(np.asarray(l)) == [4, 2]  # 16->8->4, 11->5->2


def test_las_training_forward_shapes():
    params = las_init(jax.random.key(0), TINY)
    x, lx, y, ly = _batch()
    out = las_apply(params, TINY, jax.random.key(3), x, lx, y,
                    tf_rate=0.8, train=True)
    assert out.logits.shape == (2, 6, 30)
    # att map: (heads, enc_len, steps+1), plot layout (src/models.py:385)
    assert out.att_map.shape == (2, 4, 7)
    w = np.asarray(out.att_map)
    # each decode step's weights over sample-0's valid frames sum to 1
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_las_eval_free_runs_max_steps():
    params = las_init(jax.random.key(0), TINY)
    x, lx, _, _ = _batch()
    out = las_apply(params, TINY, None, x, lx, dec_y=None, train=False)
    assert out.logits.shape == (2, 12, 30)


def test_teacher_forcing_rate_changes_outputs():
    params = las_init(jax.random.key(0), TINY)
    x, lx, y, ly = _batch()
    cfg_nodrop = LASConfig(
        listener=ListenerConfig(**{**TINY.listener.__dict__, "init_dropout": 0.0,
                                   "mid_dropout": 0.0, "final_dropout": 0.0}),
        speller=SpellerConfig(**{**TINY.speller.__dict__, "dec_lstm_dropout": 0.0}),
    )
    rng = jax.random.key(3)
    out_tf = las_apply(params, cfg_nodrop, rng, x, lx, y, tf_rate=1.0, train=True)
    out_free = las_apply(params, cfg_nodrop, rng, x, lx, y, tf_rate=0.0, train=True)
    # tf=1 forces gold everywhere (from t=1); tf=0 free-runs -> different logits
    assert not np.allclose(np.asarray(out_tf.logits)[:, 2:],
                           np.asarray(out_free.logits)[:, 2:])
    # step 0 is never forced (reference t>0 gate, src/models.py:356): identical
    np.testing.assert_allclose(np.asarray(out_tf.logits)[:, 0],
                               np.asarray(out_free.logits)[:, 0], atol=1e-5)


def test_eval_is_deterministic_without_rng():
    params = las_init(jax.random.key(0), TINY)
    x, lx, _, _ = _batch()
    a = las_apply(params, TINY, None, x, lx, train=False)
    b = las_apply(params, TINY, None, x, lx, train=False)
    np.testing.assert_array_equal(np.asarray(a.logits), np.asarray(b.logits))


def test_init_force_changes_training_dynamics():
    params = las_init(jax.random.key(0), TINY)
    x, lx, y, ly = _batch()
    rng = jax.random.key(4)
    out_f = las_apply(params, TINY, rng, x, lx, y, tf_rate=1.0, init_force=True,
                      train=True)
    out_n = las_apply(params, TINY, rng, x, lx, y, tf_rate=1.0, init_force=False,
                      train=True)
    assert not np.allclose(np.asarray(out_f.logits), np.asarray(out_n.logits))


def test_las_jits_and_grads_flow():
    params = las_init(jax.random.key(0), TINY)
    x, lx, y, ly = _batch()

    @jax.jit
    def loss_fn(p):
        out = las_apply(p, TINY, jax.random.key(0), x, lx, y, tf_rate=1.0,
                        train=True)
        return jnp.mean(out.logits ** 2)

    g = jax.grad(loss_fn)(params)
    # every parameter gets a gradient — incl. the registered init states
    # (deviation fixing reference's unregistered-param quirk, src/models.py:275)
    leaves = jax.tree_util.tree_leaves_with_path(g)
    nonzero = {jax.tree_util.keystr(k): float(jnp.abs(v).sum()) for k, v in leaves}
    assert nonzero["['speller']['init_query']"] > 0.0
    assert nonzero["['speller']['init_h1']"] > 0.0
    assert all(np.isfinite(v) for v in nonzero.values())


def test_rewriter_shapes():
    cfg = RewriterConfig(vocab_size=30, emb_dim=16, enc_lstm_layers=2,
                         enc_lstm_hid_dim=8, enc_dropouts=(0.1, 0.1),
                         att_proj_dim=8, att_heads=1, dec_lstm_hid_dim=16,
                         dec_lstm_out_dim=8, dec_lstm_dropout=0.1,
                         CHR_MAX_STEPS=10)
    params = rewriter_init(jax.random.key(0), cfg)
    x = jax.random.randint(jax.random.key(1), (2, 9), 0, 30)
    lx = jnp.array([9, 5])
    y = jax.random.randint(jax.random.key(2), (2, 7), 0, 30)
    out = rewriter_apply(params, cfg, jax.random.key(3), x, lx, y, tf_rate=1.0,
                         train=True)
    assert out.logits.shape == (2, 7, 30)
    out_eval = rewriter_apply(params, cfg, None, x, lx, train=False)
    assert out_eval.logits.shape == (2, 10, 30)


def test_rewriter_teacher_forcing_actually_applies():
    """The reference's TF was dead code via the `char_meb` typo
    (src/lmtrain.py:231); ours must actually force."""
    cfg = RewriterConfig(vocab_size=30, emb_dim=16, enc_lstm_layers=1,
                         enc_lstm_hid_dim=8, enc_dropouts=(0.0, 0.0),
                         att_proj_dim=8, att_heads=1, dec_lstm_hid_dim=16,
                         dec_lstm_out_dim=8, dec_lstm_dropout=0.0,
                         CHR_MAX_STEPS=10)
    params = rewriter_init(jax.random.key(0), cfg)
    x = jax.random.randint(jax.random.key(1), (2, 9), 0, 30)
    lx = jnp.array([9, 5])
    y = jax.random.randint(jax.random.key(2), (2, 7), 0, 30)
    rng = jax.random.key(3)
    out_tf = rewriter_apply(params, cfg, rng, x, lx, y, tf_rate=1.0, train=True)
    out_fr = rewriter_apply(params, cfg, rng, x, lx, y, tf_rate=0.0, train=True)
    assert not np.allclose(np.asarray(out_tf.logits)[:, 2:],
                           np.asarray(out_fr.logits)[:, 2:])
