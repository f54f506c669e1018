"""Data-parallel mesh tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch_fn,
)


def test_mesh_spans_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.size == 8
    mesh4 = make_mesh(4)
    assert mesh4.size == 4


def test_shard_batch_axis0():
    mesh = make_mesh(8)
    shard = shard_batch_fn(mesh)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    (xd,) = shard((x,))
    assert xd.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(xd), x)


def test_dryrun_multichip_full_train_step():
    """The driver's multi-chip validation: one DP train step on 8 devices."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_dp_grads_match_single_device():
    """Data-parallel loss on 8 devices == single-device loss on same batch."""
    from attention_based_e2e_asr_dnn_tpu.models.las import las_apply, las_init
    from attention_based_e2e_asr_dnn_tpu.training.loss import masked_ce_loss
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = mod._flagship_config(small=True)
    params = las_init(jax.random.key(0), cfg)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 16, 15)).astype(np.float32)
    lx = np.full((8,), 16, np.int32)
    y = rng.integers(0, 30, size=(8, 8)).astype(np.int32)
    ly = np.full((8,), 8, np.int32)

    def loss_fn(p, xs, lxs, ys, lys):
        out = las_apply(p, cfg, None, xs, lxs, dec_y=ys, tf_rate=1.0,
                        train=False)
        return masked_ce_loss(out.logits[:, : ys.shape[1]], ys, lys)[0]

    single = float(jax.jit(loss_fn)(params, x, lx, y, ly))

    mesh = make_mesh(8)
    shard = shard_batch_fn(mesh)
    xb, lxb, yb, lyb = shard((x, lx, y, ly))
    dp = float(jax.jit(loss_fn)(params, xb, lxb, yb, lyb))
    np.testing.assert_allclose(dp, single, rtol=1e-5)
