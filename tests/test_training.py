"""Training engine: loss, steps, schedulers, checkpoints, mini end-to-end."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.models.las import (
    LASConfig,
    ListenerConfig,
    SpellerConfig,
    las_apply,
    las_init,
)
from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
    CheckpointManager,
    average_checkpoints,
    load_checkpoint,
    save_checkpoint,
)
from attention_based_e2e_asr_dnn_tpu.training.loss import masked_ce_loss
from attention_based_e2e_asr_dnn_tpu.training.optim import (
    CosineWarmupSchedule,
    ReduceLROnPlateau,
    TeacherForcingScheduler,
    build_optimizer,
)
from attention_based_e2e_asr_dnn_tpu.training.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

TINY = LASConfig(
    listener=ListenerConfig(input_dim=15, uniform_hid_dim=24, lstm_layers=1,
                            plstm_layers=1, init_dropout=0.0, mid_dropout=0.0,
                            final_dropout=0.0),
    speller=SpellerConfig(enc_out_dim=48, att_proj_dim=12, att_heads=1,
                          dec_vocab_size=30, dec_emb_dim=24,
                          dec_lstm_hid_dim=24, dec_lstm_out_dim=12,
                          dec_lstm_dropout=0.0, CHR_MAX_STEPS=10),
)


def _apply_fn(params, rng, x, lx, dec_y=None, tf_rate=1.0, init_force=False,
              train=False):
    return las_apply(params, TINY, rng, x, lx, dec_y, tf_rate, init_force, train)


def _synthetic_batch(rng, batch=8, T=16, L=8):
    """Learnable toy task: the label char id is encoded in the features."""
    char_codes = rng.normal(size=(30, 15)).astype(np.float32)
    y = rng.integers(1, 27, size=(batch, L - 1)).astype(np.int32)
    y = np.concatenate([y, np.full((batch, 1), 29, np.int32)], axis=1)  # eos
    reps = T // L
    x = char_codes[y].repeat(reps, axis=1).astype(np.float32)
    lx = np.full((batch,), T, np.int32)
    ly = np.full((batch,), L, np.int32)
    return x, lx, y, ly


def test_masked_ce_loss_ignores_padding():
    logits = jnp.zeros((2, 4, 30))
    y = jnp.full((2, 4), 5, jnp.int32)
    full, n_full = masked_ce_loss(logits, y, jnp.array([4, 4]))
    half, n_half = masked_ce_loss(logits, y, jnp.array([2, 2]))
    np.testing.assert_allclose(float(full), float(half), atol=1e-6)
    assert float(n_full) == 8 and float(n_half) == 4
    # uniform logits -> loss == log(30)
    np.testing.assert_allclose(float(full), np.log(30), atol=1e-5)


def test_train_step_learns_synthetic_task():
    rng = np.random.default_rng(0)
    x, lx, y, ly = _synthetic_batch(rng)
    params = las_init(jax.random.key(0), TINY)
    tx = build_optimizer("adamw", {"lr": 5e-3, "weight_decay": 1e-6,
                                   "amsgrad": True})
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(_apply_fn, tx)

    losses = []
    for _ in range(30):
        state, metrics, att = step(
            state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(5e-3),
            init_force=False,
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses
    assert att.shape[0] == 1  # (heads, enc_len, steps+1)


def test_gradient_accumulation_updates_every_k():
    rng = np.random.default_rng(0)
    x, lx, y, ly = _synthetic_batch(rng)
    params = las_init(jax.random.key(0), TINY)
    tx = build_optimizer("adamw", {"lr": 1e-3}, accum_steps=2)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(_apply_fn, tx, accum_steps=2)

    p0 = jax.tree.leaves(state.params)[0].copy()
    state, _, _ = step(state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))
    # after 1 of 2 micro-steps params must be unchanged
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.params)[0]),
                                  np.asarray(p0))
    state, _, _ = step(state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))
    assert not np.array_equal(np.asarray(jax.tree.leaves(state.params)[0]),
                              np.asarray(p0))


def test_eval_step_free_runs_and_truncates_loss():
    rng = np.random.default_rng(0)
    x, lx, y, ly = _synthetic_batch(rng)
    params = las_init(jax.random.key(0), TINY)
    eval_step = make_eval_step(_apply_fn)
    metrics, pred_ids = eval_step(params, x, lx, y, ly)
    assert np.isfinite(float(metrics["loss"]))
    assert pred_ids.shape == (8, TINY.speller.CHR_MAX_STEPS)


def test_nan_guard_skips_bad_update():
    rng = np.random.default_rng(0)
    x, lx, y, ly = _synthetic_batch(rng)
    x_bad = x.copy()
    x_bad[0, 0, 0] = np.inf
    params = las_init(jax.random.key(0), TINY)
    tx = build_optimizer("adamw", {"lr": 1e-3})
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(_apply_fn, tx)
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, metrics, _ = step(state, x_bad, lx, y, ly, jnp.asarray(1.0),
                             jnp.asarray(1e-3))
    assert not bool(metrics["finite"])
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.params)[0]), p0)


def test_checkpoint_roundtrip_and_average(tmp_path):
    params = las_init(jax.random.key(0), TINY)
    p1 = str(tmp_path / "a.ckpt")
    save_checkpoint(p1, {"params": params, "epoch": 3})
    loaded = load_checkpoint(p1)
    assert loaded["epoch"] == 3
    ours = jax.tree.leaves(params)
    theirs = jax.tree.leaves(loaded["params"])
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    params2 = jax.tree.map(lambda a: a + 2.0, params)
    p2 = str(tmp_path / "b.ckpt")
    save_checkpoint(p2, {"params": params2, "epoch": 4})
    avg = average_checkpoints([p1, p2])["params"]
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(avg)[0]),
        np.asarray(jax.tree.leaves(params)[0]) + 1.0, atol=1e-6)


def test_checkpoint_manager_policy(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"), str(tmp_path / "mst"),
                            max_savings=2)
    # epoch 0: all-best -> saved with full tag
    path = mgr.maybe_save(0, 1.0, 10.0, 2.0, {"params": {"w": np.ones(2)}})
    assert path.endswith("min-loss-ld-ppl-epoch[0].ckpt")
    # epoch 1: worse everywhere -> not saved
    assert mgr.maybe_save(1, 2.0, 20.0, 3.0, {"params": {}}) is None
    # epochs 2,3: better ld only -> eviction kicks in at the 3rd best
    mgr.maybe_save(2, 2.0, 9.0, 3.0, {"params": {}})
    p3 = mgr.maybe_save(3, 2.0, 8.0, 3.0, {"params": {}})
    assert p3.endswith("min-ld-epoch[3].ckpt")
    files = os.listdir(tmp_path / "ckpts")
    assert len(files) == 2  # epoch[0] evicted
    assert not any("epoch[0]" in f for f in files)
    # milestone at epoch 9 ((9+1) % 10 == 0) even with no best
    mgr.maybe_save(9, 99.0, 99.0, 99.0, {"params": {}})
    assert os.listdir(tmp_path / "mst") == ["epoch[9].ckpt"]


def test_plateau_scheduler_torch_semantics():
    sch = ReduceLROnPlateau(1.0, factor=0.5, patience=3)
    assert sch.step(10.0) == 1.0  # first value becomes best
    for _ in range(3):
        assert sch.step(10.0) == 1.0  # within patience
    assert sch.step(10.0) == 0.5  # 4th bad epoch -> cut
    assert sch.step(5.0) == 0.5   # improvement resets


def test_tf_scheduler_reference_semantics():
    """Parity with src/train.py:448-456."""
    sch = TeacherForcingScheduler(0.9, factor=0.1, interval=3, lowest=0.6)
    hist = []
    # no history / high LD -> no change
    assert sch.step(1, hist) == 0.9
    hist = [25.0]
    assert sch.step(2, hist) == 0.9          # LD gate (<= 20) fails
    hist = [15.0]
    assert abs(sch.step(4, hist) - 0.8) < 1e-9   # fires: epoch-(-1)>3, 15<inf
    assert sch.step(5, hist) == pytest.approx(0.8)  # interval not elapsed
    hist = [14.0]
    assert sch.step(8, hist) == pytest.approx(0.7)  # 8-4>3 and improved
    sch.tf_rate = 0.6
    hist = [10.0]
    assert sch.step(20, hist) == pytest.approx(0.6)  # floor


def test_cosine_warmup_schedule_shape():
    sch = CosineWarmupSchedule(num_batches=10, warmup_epochs=1, max_epochs=4,
                               init_lr=1e-3, min_lr=1e-6)
    lrs = [sch.step() for _ in range(40)]
    assert lrs[0] == pytest.approx(1e-6)
    assert max(lrs) == pytest.approx(1e-3, rel=1e-6)
    assert lrs[-1] >= 0.0  # never negative (fixes reference bug)
    assert lrs[-1] < 1e-4


def test_nan_guard_is_noop_with_warm_optimizer_state():
    """A non-finite step must not move params even AFTER momentum built up
    (stale Adam moments + AdamW weight decay must not apply)."""
    rng = np.random.default_rng(0)
    x, lx, y, ly = _synthetic_batch(rng)
    params = las_init(jax.random.key(0), TINY)
    tx = build_optimizer("adamw", {"lr": 1e-3, "weight_decay": 0.1,
                                   "amsgrad": True})
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(_apply_fn, tx)
    # build momentum with two good steps
    for _ in range(2):
        state, m, _ = step(state, x, lx, y, ly, jnp.asarray(1.0),
                           jnp.asarray(1e-3))
    p_before = jax.tree.map(lambda a: np.asarray(a).copy(), state.params)
    # materialize: the jitted step donates state, deleting the old buffers
    opt_before = [np.asarray(a).copy() for a in jax.tree.leaves(state.opt_state)
                  if hasattr(a, "shape")]

    x_bad = x.copy()
    x_bad[0, 0, 0] = np.inf
    state, metrics, _ = step(state, x_bad, lx, y, ly, jnp.asarray(1.0),
                             jnp.asarray(1e-3))
    assert not bool(metrics["finite"])
    for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments (and counters) also untouched
    opt_after = [np.asarray(a) for a in jax.tree.leaves(state.opt_state)
                 if hasattr(a, "shape")]
    for a, b in zip(opt_before, opt_after):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_format_is_data_only_with_legacy_fallback(tmp_path):
    """New checkpoints are npz (no code execution on load); legacy pickle
    files still load behind a trust warning."""
    import pickle
    import warnings

    p = str(tmp_path / "new.ckpt")
    save_checkpoint(p, {"params": {"w": np.ones(3, np.float32)}, "epoch": 7})
    with open(p, "rb") as fh:
        assert fh.read(2) == b"PK"  # zip/npz magic, not a pickle opcode
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a warning here would raise
        loaded = load_checkpoint(p)
    assert loaded["epoch"] == 7

    legacy = str(tmp_path / "old.ckpt")
    with open(legacy, "wb") as fh:
        pickle.dump({"params": {"w": np.zeros(2)}, "epoch": 1}, fh)
    with pytest.warns(UserWarning, match="legacy pickle"):
        loaded = load_checkpoint(legacy)
    assert loaded["epoch"] == 1
