"""Pipeline-parallel (2-stage listener|speller) tests on the CPU mesh.

The pipelined step must reproduce the single-device train step exactly when
randomness is quiesced (tf_rate=1.0, no dropout/SpecAug): same loss, same
updated parameters — the pipeline is a pure re-staging of the computation
(SURVEY.md §2.9: all distributed support is additive over the reference).
"""

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.models.las import (
    las_apply,
    las_config_from_dicts,
    las_init,
)
from attention_based_e2e_asr_dnn_tpu.parallel.pipeline import (
    init_pipeline_state,
    make_pipeline_train_step,
)
from attention_based_e2e_asr_dnn_tpu.training.optim import build_optimizer
from attention_based_e2e_asr_dnn_tpu.training.steps import (
    create_train_state,
    make_train_step,
)


def _cfg():
    return las_config_from_dicts(
        dict(input_dim=15, uniform_hid_dim=16, lstm_layers=1, plstm_layers=1,
             init_dropout=0.0, mid_dropout=0.0, final_dropout=0.0),
        dict(att_proj_dim=8, att_heads=1, att_dropout=0.0, dec_emb_dim=16,
             dec_emb_dropout=0.0, dec_lstm_hid_dim=16, dec_lstm_out_dim=8,
             dec_lstm_dropout=0.0, CHR_MAX_STEPS=12),
    )


def _batch(batch=8, t=32, label=10, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, t, 15)).astype(np.float32)
    lx = rng.integers(t // 2, t + 1, size=(batch,)).astype(np.int32)
    y = rng.integers(0, 30, size=(batch, label)).astype(np.int32)
    ly = rng.integers(2, label + 1, size=(batch,)).astype(np.int32)
    return x, lx, y, ly


@pytest.mark.parametrize("n_microbatches", [1, 2, 4])
def test_pipeline_matches_single_device(n_microbatches):
    assert len(jax.devices()) >= 2, "conftest forces an 8-device CPU mesh"
    cfg = _cfg()
    params = las_init(jax.random.key(0), cfg)
    x, lx, y, ly = _batch()

    def mktx(grad_norm=1e9):
        return build_optimizer(
            "adamw", {"lr": 1e-3, "weight_decay": 1e-6, "amsgrad": True},
            grad_norm=grad_norm)

    # single-device reference step
    def apply_fn(p, rng, x_, lx_, dec_y=None, tf_rate=1.0, init_force=False,
                 train=False):
        return las_apply(p, cfg, rng, x_, lx_, dec_y, tf_rate, init_force,
                         train)

    tx_ref = mktx()
    ref_state = create_train_state(params, tx_ref, jax.random.key(1))
    ref_step = make_train_step(apply_fn, tx_ref, use_specaug=False,
                               donate=False)
    ref_state, ref_metrics, _ = ref_step(
        ref_state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))

    # pipelined step over 2 CPU devices
    tx_pipe = mktx()
    pipe_state = init_pipeline_state(params, tx_pipe, jax.random.key(1),
                                     devices=jax.devices()[:2])
    pipe_step = make_pipeline_train_step(cfg, tx_pipe,
                                         devices=jax.devices()[:2],
                                         n_microbatches=n_microbatches)
    pipe_state, pipe_metrics = pipe_step(
        pipe_state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))

    np.testing.assert_allclose(float(pipe_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    # updated parameters identical stage-by-stage
    f_ref, _ = jax.flatten_util.ravel_pytree(
        {"listener": ref_state.params["listener"],
         "speller": ref_state.params["speller"]})
    f_pipe, _ = jax.flatten_util.ravel_pytree(
        {"listener": jax.device_get(pipe_state.params_listener),
         "speller": jax.device_get(pipe_state.params_speller)})
    np.testing.assert_allclose(np.asarray(f_pipe), np.asarray(f_ref),
                               atol=2e-5)


def test_pipeline_global_clip_matches_single_device():
    """Cross-stage global-norm clipping == single-device clip_by_global_norm
    (per-stage clipping would be a different optimizer)."""
    cfg = _cfg()
    params = las_init(jax.random.key(0), cfg)
    x, lx, y, ly = _batch(seed=3)
    clip = 0.05  # low enough that clipping actually engages

    def apply_fn(p, rng, x_, lx_, dec_y=None, tf_rate=1.0, init_force=False,
                 train=False):
        return las_apply(p, cfg, rng, x_, lx_, dec_y, tf_rate, init_force,
                         train)

    tx_ref = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=clip)
    ref_state = create_train_state(params, tx_ref, jax.random.key(1))
    ref_step = make_train_step(apply_fn, tx_ref, use_specaug=False,
                               donate=False)
    ref_state, _, _ = ref_step(ref_state, x, lx, y, ly, jnp.asarray(1.0),
                               jnp.asarray(1e-3))

    tx_pipe = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=1e9)
    pipe_state = init_pipeline_state(params, tx_pipe, jax.random.key(1),
                                     devices=jax.devices()[:2])
    pipe_step = make_pipeline_train_step(cfg, tx_pipe,
                                         devices=jax.devices()[:2],
                                         n_microbatches=2, grad_norm=clip)
    pipe_state, _ = pipe_step(pipe_state, x, lx, y, ly, jnp.asarray(1.0),
                              jnp.asarray(1e-3))

    f_ref, _ = jax.flatten_util.ravel_pytree(ref_state.params)
    f_pipe, _ = jax.flatten_util.ravel_pytree(
        {"listener": jax.device_get(pipe_state.params_listener),
         "speller": jax.device_get(pipe_state.params_speller)})
    np.testing.assert_allclose(np.asarray(f_pipe), np.asarray(f_ref),
                               atol=2e-5)


def test_pipeline_stages_live_on_their_devices():
    cfg = _cfg()
    params = las_init(jax.random.key(0), cfg)
    tx = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=0.0)
    d = jax.devices()[:2]
    state = init_pipeline_state(params, tx, jax.random.key(1), devices=d)
    ls_dev = jax.tree.leaves(state.params_listener)[0].devices()
    sp_dev = jax.tree.leaves(state.params_speller)[0].devices()
    assert ls_dev == {d[0]} and sp_dev == {d[1]}

    # two consecutive steps run and keep placement
    x, lx, y, ly = _batch()
    step = make_pipeline_train_step(cfg, tx, devices=d, n_microbatches=2)
    for _ in range(2):
        state, metrics = step(state, x, lx, y, ly, jnp.asarray(1.0),
                              jnp.asarray(1e-3))
        assert np.isfinite(float(metrics["loss"]))
    assert jax.tree.leaves(state.params_listener)[0].devices() == {d[0]}
    assert jax.tree.leaves(state.params_speller)[0].devices() == {d[1]}


@pytest.mark.parametrize("pp_dp,pp_tp", [(1, 1), (2, 1), (1, 2)])
def test_train_cli_with_pipeline_parallelism(tmp_path, pp_dp, pp_tp):
    """`parallel: {use: true, pipeline: 2[, data: D][, model: M]}` drives
    the full train entry through the pipelined Trainer: same loss
    trajectory as the plain run (randomness quiesced) + checkpoints
    written."""
    import os
    import yaml

    from tests.test_e2e_pipeline import _make_dataset, _train_config
    from attention_based_e2e_asr_dnn_tpu import train as train_mod

    root = str(tmp_path / "data")
    _make_dataset(root, n=8)

    losses = {}
    for mode in ("plain", "pipeline"):
        exp_dir = str(tmp_path / f"exp-{mode}")
        cfg = _train_config(root, exp_dir)
        cfg["epochs"] = 2
        cfg["tf_rate"] = 1.0
        if mode == "pipeline":
            cfg["parallel"] = {"use": True, "pipeline": 2, "data": pp_dp,
                               "model": pp_tp}
        cfg_path = str(tmp_path / f"cfg-{mode}.yml")
        with open(cfg_path, "w") as fh:
            yaml.safe_dump(cfg, fh)
        trainer = train_mod.main(
            train_mod.build_argparser().parse_args(["-c", cfg_path]))
        losses[mode] = trainer.train_history["loss"]
        run_dir = [d for d in os.listdir(exp_dir) if d != "milestones"][0]
        assert os.listdir(os.path.join(exp_dir, run_dir, "ckpts"))

    np.testing.assert_allclose(losses["pipeline"], losses["plain"],
                               rtol=2e-3)


def test_pipeline_dp_matches_single_device():
    """PP x DP composition: dp=2 stage meshes over 4 devices reproduce the
    single-device step exactly (quiesced randomness) — microbatches shard
    over each stage's 'data' axis, GSPMD derives the in-stage all-reduce."""
    assert len(jax.devices()) >= 4, "conftest forces an 8-device CPU mesh"
    cfg = _cfg()
    params = las_init(jax.random.key(0), cfg)
    x, lx, y, ly = _batch()

    def apply_fn(p, rng, x_, lx_, dec_y=None, tf_rate=1.0, init_force=False,
                 train=False):
        return las_apply(p, cfg, rng, x_, lx_, dec_y, tf_rate, init_force,
                         train)

    tx_ref = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=5.0)
    ref_state = create_train_state(params, tx_ref, jax.random.key(1))
    ref_step = make_train_step(apply_fn, tx_ref, use_specaug=False,
                               donate=False)
    ref_state, ref_metrics, _ = ref_step(
        ref_state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))

    d = jax.devices()[:4]
    tx_pipe = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=1e9)
    pipe_state = init_pipeline_state(params, tx_pipe, jax.random.key(1),
                                     devices=d, dp=2)
    pipe_step = make_pipeline_train_step(cfg, tx_pipe, devices=d,
                                         n_microbatches=2, grad_norm=5.0,
                                         dp=2)
    pipe_state, pipe_metrics = pipe_step(
        pipe_state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))

    np.testing.assert_allclose(float(pipe_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    f_ref, _ = jax.flatten_util.ravel_pytree(
        {"listener": ref_state.params["listener"],
         "speller": ref_state.params["speller"]})
    f_pipe, _ = jax.flatten_util.ravel_pytree(
        {"listener": jax.device_get(pipe_state.params_listener),
         "speller": jax.device_get(pipe_state.params_speller)})
    np.testing.assert_allclose(np.asarray(f_pipe), np.asarray(f_ref),
                               atol=2e-5)

    # stage state actually lives replicated on each stage's dp-device group
    ls_dev = jax.tree.leaves(pipe_state.params_listener)[0].devices()
    sp_dev = jax.tree.leaves(pipe_state.params_speller)[0].devices()
    assert ls_dev == set(d[:2]), f"listener on {ls_dev}, want {set(d[:2])}"
    assert sp_dev == set(d[2:4]), f"speller on {sp_dev}, want {set(d[2:4])}"

    # indivisible microbatch fails loudly
    with pytest.raises(ValueError, match="divisible by dp"):
        pipe_step(pipe_state, x[:6], lx[:6], y[:6], ly[:6],
                  jnp.asarray(1.0), jnp.asarray(1e-3))


def test_pipeline_dp_tp_matches_single_device():
    """Full PP x DP x TP composition: (2,2) stage meshes over 8 devices
    reproduce the single-device step (quiesced randomness) AND the TP
    placement genuinely shards the gate matrices within each stage."""
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU mesh"
    cfg = _cfg()
    params = las_init(jax.random.key(0), cfg)
    x, lx, y, ly = _batch()

    def apply_fn(p, rng, x_, lx_, dec_y=None, tf_rate=1.0, init_force=False,
                 train=False):
        return las_apply(p, cfg, rng, x_, lx_, dec_y, tf_rate, init_force,
                         train)

    tx_ref = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=5.0)
    ref_state = create_train_state(params, tx_ref, jax.random.key(1))
    ref_step = make_train_step(apply_fn, tx_ref, use_specaug=False,
                               donate=False)
    ref_state, ref_metrics, _ = ref_step(
        ref_state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))

    d = jax.devices()[:8]
    tx_pipe = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=1e9)
    pipe_state = init_pipeline_state(params, tx_pipe, jax.random.key(1),
                                     devices=d, dp=2, tp=2)
    pipe_step = make_pipeline_train_step(cfg, tx_pipe, devices=d,
                                         n_microbatches=2, grad_norm=5.0,
                                         dp=2, tp=2)
    pipe_state, pipe_metrics = pipe_step(
        pipe_state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))

    np.testing.assert_allclose(float(pipe_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    f_ref, _ = jax.flatten_util.ravel_pytree(
        {"listener": ref_state.params["listener"],
         "speller": ref_state.params["speller"]})
    f_pipe, _ = jax.flatten_util.ravel_pytree(
        {"listener": jax.device_get(pipe_state.params_listener),
         "speller": jax.device_get(pipe_state.params_speller)})
    np.testing.assert_allclose(np.asarray(f_pipe), np.asarray(f_ref),
                               atol=2e-5)

    # each stage occupies its own 4-device group
    ls_dev = jax.tree.leaves(pipe_state.params_listener)[0].devices()
    sp_dev = jax.tree.leaves(pipe_state.params_speller)[0].devices()
    assert ls_dev == set(d[:4]) and sp_dev == set(d[4:8])

    # gate matrices are genuinely column-sharded within the stage: each
    # addressable shard holds 1/tp of the columns
    def gate_leaf(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            if "'w_hh'" in jax.tree_util.keystr(path):
                return leaf
        raise AssertionError("no w_hh leaf")

    g = gate_leaf(pipe_state.params_listener)
    shard_cols = {s.data.shape[-1] for s in g.addressable_shards}
    assert shard_cols == {g.shape[-1] // 2}, (
        f"expected column shards of {g.shape[-1] // 2}, got {shard_cols}")


def test_train_cli_pipeline_dp_resume(tmp_path):
    """A pipeline checkpoint resumes into a PP x DP run: the data-only npz
    format carries no placement, so a dp=1 pipeline checkpoint loads into
    dp=2 stage meshes (and training continues with finite losses)."""
    import os
    import yaml

    from tests.test_e2e_pipeline import _make_dataset, _train_config
    from attention_based_e2e_asr_dnn_tpu import train as train_mod

    root = str(tmp_path / "data")
    _make_dataset(root, n=8)

    # first run: PP at dp=1, 2 epochs, checkpoint written
    exp_a = str(tmp_path / "exp-a")
    cfg = _train_config(root, exp_a)
    cfg["epochs"] = 2
    cfg["tf_rate"] = 1.0
    cfg["parallel"] = {"use": True, "pipeline": 2, "data": 1}
    cfg_path = str(tmp_path / "cfg-a.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))
    run_a = [d for d in os.listdir(exp_a) if d != "milestones"][0]
    ckpt_dir = os.path.join(exp_a, run_a, "ckpts")
    ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[0])

    # second run: resume that checkpoint into PP x dp=2
    exp_b = str(tmp_path / "exp-b")
    cfg = _train_config(root, exp_b)
    cfg["epochs"] = 3
    cfg["tf_rate"] = 1.0
    cfg["parallel"] = {"use": True, "pipeline": 2, "data": 2}
    cfg["finetune"] = {"use": True, "reinit_lr": False, "checkpoint": ckpt}
    cfg_path = str(tmp_path / "cfg-b.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    trainer = train_mod.main(
        train_mod.build_argparser().parse_args(["-c", cfg_path]))

    assert all(np.isfinite(trainer.train_history["loss"]))
    # stage params landed on the dp=2 stage groups after resume
    d = jax.devices()
    ls_dev = jax.tree.leaves(trainer.state.params_listener)[0].devices()
    sp_dev = jax.tree.leaves(trainer.state.params_speller)[0].devices()
    assert ls_dev == set(d[:2]) and sp_dev == set(d[2:4])


def test_pipeline_nan_guard_is_true_noop():
    """A non-finite batch must leave BOTH stages' params untouched (the
    single-device step's guard semantics, steps.py:115-131)."""
    cfg = _cfg()
    params = las_init(jax.random.key(0), cfg)
    tx = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=1e9)
    d = jax.devices()[:2]
    state = init_pipeline_state(params, tx, jax.random.key(1), devices=d)
    step = make_pipeline_train_step(cfg, tx, devices=d, n_microbatches=2,
                                    grad_norm=5.0)
    x, lx, y, ly = _batch()
    x_bad = x.copy()
    x_bad[0, 0, 0] = np.inf
    before, _ = jax.flatten_util.ravel_pytree(
        jax.device_get(state.params))
    state, metrics = step(state, x_bad, lx, y, ly, jnp.asarray(1.0),
                          jnp.asarray(1e-3))
    assert not bool(metrics["finite"])
    after, _ = jax.flatten_util.ravel_pytree(jax.device_get(state.params))
    np.testing.assert_array_equal(np.asarray(after), np.asarray(before))


def test_pipeline_accu_grad_matches_single_device():
    """accu_grad > 1 through the pipeline: grads accumulate across calls and
    the update fires at the window boundary on the accumulated mean —
    matching single-device optax.MultiSteps (clip-after-accumulate).
    (VERDICT r2 weak #6: the restriction is lifted.)"""
    cfg = _cfg()
    params = las_init(jax.random.key(0), cfg)
    batches = [_batch(seed=s) for s in (0, 1)]
    accu = 2

    def apply_fn(p, rng, x_, lx_, dec_y=None, tf_rate=1.0, init_force=False,
                 train=False):
        return las_apply(p, cfg, rng, x_, lx_, dec_y, tf_rate, init_force,
                         train)

    # single-device: MultiSteps-wrapped optimizer with the SAME clip
    tx_ref = build_optimizer(
        "adamw", {"lr": 1e-3, "weight_decay": 1e-6, "amsgrad": True},
        grad_norm=5.0, accum_steps=accu)
    ref_state = create_train_state(params, tx_ref, jax.random.key(1))
    ref_step = make_train_step(apply_fn, tx_ref, accum_steps=accu,
                               use_specaug=False, donate=False)
    for x, lx, y, ly in batches:
        ref_state, ref_metrics, _ = ref_step(
            ref_state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))

    # pipeline: bare per-stage optimizer; accumulation + clip in the step
    tx_pipe = build_optimizer(
        "adamw", {"lr": 1e-3, "weight_decay": 1e-6, "amsgrad": True},
        grad_norm=1e30)
    pipe_state = init_pipeline_state(params, tx_pipe, jax.random.key(1),
                                     devices=jax.devices()[:2])
    pipe_step = make_pipeline_train_step(cfg, tx_pipe,
                                         devices=jax.devices()[:2],
                                         n_microbatches=2, grad_norm=5.0,
                                         accum_steps=accu)
    for i, (x, lx, y, ly) in enumerate(batches):
        pipe_state, pipe_metrics = pipe_step(
            pipe_state, x, lx, y, ly, jnp.asarray(1.0), jnp.asarray(1e-3))
        if i == 0:
            # mid-window: params untouched, accumulators stashed
            assert pipe_state.acc_listener is not None
            f0, _ = jax.flatten_util.ravel_pytree(
                jax.device_get(pipe_state.params_listener))
            fp, _ = jax.flatten_util.ravel_pytree(params["listener"])
            np.testing.assert_array_equal(np.asarray(f0), np.asarray(fp))

    assert pipe_state.acc_listener is None  # window closed, accs reset
    f_ref, _ = jax.flatten_util.ravel_pytree(
        {"listener": ref_state.params["listener"],
         "speller": ref_state.params["speller"]})
    f_pipe, _ = jax.flatten_util.ravel_pytree(
        {"listener": jax.device_get(pipe_state.params_listener),
         "speller": jax.device_get(pipe_state.params_speller)})
    np.testing.assert_allclose(np.asarray(f_pipe), np.asarray(f_ref),
                               atol=2e-5)
