"""Pallas fused LSTM kernel vs the pure lax.scan reference (interpret mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.ops.lstm import bilstm_init, bilstm_apply, lstm_apply, lstm_init
from attention_based_e2e_asr_dnn_tpu.ops.lstm_pallas import (
    bilstm_apply_pallas,
    lstm_apply_pallas,
)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_forward_matches_scan(reverse):
    B, T, D, H = 4, 10, 6, 8
    params = lstm_init(jax.random.key(0), D, H)
    x = jax.random.normal(jax.random.key(1), (B, T, D))
    lengths = jnp.array([10, 7, 3, 1])
    ref = lstm_apply(params, x, lengths, reverse=reverse)
    ours = lstm_apply_pallas(params, x, lengths, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_pallas_bilstm_matches_scan():
    B, T, D, H = 3, 8, 5, 8
    params = bilstm_init(jax.random.key(2), D, H)
    x = jax.random.normal(jax.random.key(3), (B, T, D))
    lengths = jnp.array([8, 5, 2])
    ref = bilstm_apply(params, x, lengths)
    ours = bilstm_apply_pallas(params, x, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_pallas_gradients_match_scan():
    """Custom-VJP adjoint vs autodiff through the lax.scan reference."""
    B, T, D, H = 3, 6, 4, 8
    params = lstm_init(jax.random.key(4), D, H)
    x = jax.random.normal(jax.random.key(5), (B, T, D))
    lengths = jnp.array([6, 4, 2])

    def loss_ref(p, xx):
        out = lstm_apply(p, xx, lengths)
        return jnp.sum(out ** 2)

    def loss_pal(p, xx):
        out = lstm_apply_pallas(p, xx, lengths, interpret=True)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(params, x)

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


def test_pallas_gradients_match_scan_big_hidden(monkeypatch):
    """H >= 1024 exceeds the in-kernel-dW kernel's DEFAULT scoped-VMEM fit
    (fp32 accumulator alone — compile OOM measured on the scaled arch,
    2026-08-18) and routes onto the plain adjoint (UNCHUNKED under the
    raised Mosaic limit) + the outside sliced einsum — measured fastest at
    the scaled flagship shape. TPU_LAS_BIGH_DW=inkernel selects the
    raised-limit accumulate-into-output dW kernel; TPU_LAS_SCOPED_VMEM_MB=0
    restores the round-3 batch-chunked route. Gradients must stay
    equivalent on ALL three routes."""
    from attention_based_e2e_asr_dnn_tpu.ops.lstm_pallas import (
        _dw_kernel_fits, _dw_kernel_fits_raised)

    B, T, D, H = 2, 4, 4, 1024
    assert not _dw_kernel_fits(B, H, 2)       # default fit says no at H=1024
    assert _dw_kernel_fits(128, 512, 2)       # flagship keeps the dW kernel
    assert _dw_kernel_fits_raised(B, H, 2)    # raised accout route reachable
    assert _dw_kernel_fits_raised(128, 1024, 2)  # scaled flagship shape too
    params = lstm_init(jax.random.key(6), D, H)
    x = jax.random.normal(jax.random.key(7), (B, T, D))
    lengths = jnp.array([4, 2])

    def loss_ref(p, xx):
        return jnp.sum(lstm_apply(p, xx, lengths) ** 2)

    def loss_pal(p, xx):
        return jnp.sum(lstm_apply_pallas(p, xx, lengths, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(params, x)  # default: einsum
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)

    # the raised-limit in-kernel dW route, same gradients
    monkeypatch.setenv("TPU_LAS_BIGH_DW", "inkernel")
    g_ik = jax.grad(loss_pal, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ik)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)
    monkeypatch.delenv("TPU_LAS_BIGH_DW")

    # raise disabled -> the round-3 batch-chunked route, same gradients
    monkeypatch.setenv("TPU_LAS_SCOPED_VMEM_MB", "0")
    assert not _dw_kernel_fits_raised(B, H, 2)
    g_fb = jax.grad(loss_pal, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


def test_pallas_masked_gradients_zero_past_length():
    """No gradient may flow from padded frames into parameters."""
    B, T, D, H = 2, 6, 4, 8
    params = lstm_init(jax.random.key(6), D, H)
    x = jax.random.normal(jax.random.key(7), (B, T, D))
    lengths = jnp.array([3, 6])

    def loss(xx):
        out = lstm_apply_pallas(params, xx, lengths, interpret=True)
        return jnp.sum(out ** 2)

    gx = np.asarray(jax.grad(loss)(x))
    assert np.all(gx[0, 3:] == 0.0)   # frames past length get no grad
    assert np.any(gx[1, 3:] != 0.0)


def test_listener_pallas_impl_matches_scan():
    """lstm_impl='pallas' dispatch through the Listener == 'scan' impl."""
    import dataclasses
    from attention_based_e2e_asr_dnn_tpu.models.las import (
        ListenerConfig, listener_apply, listener_init)

    cfg = ListenerConfig(input_dim=15, uniform_hid_dim=8, lstm_layers=1,
                         plstm_layers=1, init_dropout=0.0, mid_dropout=0.0,
                         final_dropout=0.0)
    params = listener_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 8, 15))
    lx = jnp.array([8, 5])
    h_scan, l_scan = listener_apply(params, cfg, None, x, lx)
    cfg_p = dataclasses.replace(cfg, lstm_impl="pallas")
    h_pal, l_pal = listener_apply(params, cfg_p, None, x, lx)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_scan), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(l_pal), np.asarray(l_scan))


def test_listener_remat_matches_no_remat():
    import dataclasses
    from attention_based_e2e_asr_dnn_tpu.models.las import (
        ListenerConfig, listener_apply, listener_init)

    cfg = ListenerConfig(input_dim=15, uniform_hid_dim=8, lstm_layers=1,
                         plstm_layers=1, init_dropout=0.0, mid_dropout=0.0,
                         final_dropout=0.0)
    params = listener_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 8, 15))
    lx = jnp.array([8, 5])

    def loss(p, c):
        return jnp.sum(listener_apply(p, c, None, x, lx)[0] ** 2)

    cfg_r = dataclasses.replace(cfg, remat=True)
    g0 = jax.grad(lambda p: loss(p, cfg))(params)
    g1 = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("variant", ["split", "fused"])
def test_pallas_bilstm_gradients_match_scan(variant):
    """Both Pallas BiLSTM variants' custom VJPs vs autodiff through the
    lax.scan BiLSTM (split = default kernel-per-direction with the Pallas
    adjoint kernel; fused = both directions in one pallas_call)."""
    from attention_based_e2e_asr_dnn_tpu.ops.lstm_pallas import (
        bilstm_apply_pallas_fused,
    )

    fn = bilstm_apply_pallas if variant == "split" else bilstm_apply_pallas_fused
    B, T, D, H = 3, 6, 4, 8
    params = bilstm_init(jax.random.key(6), D, H)
    x = jax.random.normal(jax.random.key(7), (B, T, D))
    lengths = jnp.array([6, 4, 2])

    def loss_ref(p, xx):
        return jnp.sum(bilstm_apply(p, xx, lengths) ** 2)

    def loss_pal(p, xx):
        return jnp.sum(fn(p, xx, lengths, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


def test_pallas_wide_input_xproj_route_matches_scan():
    """in_dim > 128 takes the outside-x_proj route (the fused-input kernel is
    for narrow inputs only); both routes must match the scan — fwd + grads."""
    B, T, D, H = 3, 6, 160, 8
    params = lstm_init(jax.random.key(11), D, H)
    x = jax.random.normal(jax.random.key(12), (B, T, D))
    lengths = jnp.array([6, 5, 3])

    out_ref = lstm_apply(params, x, lengths)
    out_pal = lstm_apply_pallas(params, x, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=1e-5)

    g_ref = jax.grad(lambda p: jnp.sum(lstm_apply(p, x, lengths) ** 2))(params)
    g_pal = jax.grad(lambda p: jnp.sum(
        lstm_apply_pallas(p, x, lengths, interpret=True) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


def test_pallas_fusedin_reverse_matches_scan():
    """Fused-input kernel in the reversed (BiLSTM backward) direction."""
    B, T, D, H = 3, 8, 15, 8
    params = lstm_init(jax.random.key(13), D, H)
    x = jax.random.normal(jax.random.key(14), (B, T, D))
    lengths = jnp.array([8, 6, 4])
    out_ref = lstm_apply(params, x, lengths, reverse=True)
    out_pal = lstm_apply_pallas(params, x, lengths, reverse=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=1e-5)


def test_pallas_gradients_match_scan_chunked_adjoint():
    """H=1024 at large batch engages the adjoint's batch-chunked launches
    (the un-chunked kernel measured a 17.96 MB scoped allocation on-chip).
    The chunked route — disjoint batch-row slices concatenated back — must
    be gradient-equivalent to the scan; this is the exact routing the
    SCALED arch trains on (B=32+ per direction at H=1024)."""
    B, T, D, H = 128, 4, 4, 1024
    params = lstm_init(jax.random.key(8), D, H)
    x = jax.random.normal(jax.random.key(9), (B, T, D))
    lengths = jnp.concatenate(
        [jnp.full((B // 2,), T, jnp.int32),
         jnp.full((B // 2,), T // 2, jnp.int32)])

    def loss_ref(p, xx):
        return jnp.sum(lstm_apply(p, xx, lengths) ** 2)

    def loss_pal(p, xx):
        return jnp.sum(lstm_apply_pallas(p, xx, lengths, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=1e-4)


def test_scoped_vmem_default_is_generation_aware(monkeypatch):
    """Unset, the raised scoped-VMEM budget defaults per device generation:
    v5e+ (where 96 MB scratch is MEASURED to compile/run) and interpret-mode
    backends raise to 64 MB; older real chips (v2/v3/v4) keep the round-3
    conservative routing that is known to compile — a 64 MB Mosaic request
    there could fail where batch-chunking worked. Env always wins."""
    from attention_based_e2e_asr_dnn_tpu.ops import lstm_pallas as lp

    assert lp._raised_mb_for_kind("TPU v5 lite") == 64   # this box, measured
    assert lp._raised_mb_for_kind("TPU v5p") == 64
    assert lp._raised_mb_for_kind("TPU v6e") == 64
    assert lp._raised_mb_for_kind("cpu") == 64           # interpret routing
    assert lp._raised_mb_for_kind("TPU v4") == 0
    assert lp._raised_mb_for_kind("TPU v3") == 0
    assert lp._raised_mb_for_kind("TPU v2") == 0
    # unparseable generation (unknown/future naming): conservative routing,
    # not a 64 MB Mosaic request that might not compile there (ADVICE r4)
    assert lp._raised_mb_for_kind("TPU weirdname") == 0
    assert lp._raised_mb_for_kind("TPU ultra") == 0

    monkeypatch.setenv("TPU_LAS_SCOPED_VMEM_MB", "32")
    assert lp._scoped_vmem_cap() == 32 * 1024 * 1024
    monkeypatch.setenv("TPU_LAS_SCOPED_VMEM_MB", "0")
    assert lp._scoped_vmem_cap() == 0
    monkeypatch.delenv("TPU_LAS_SCOPED_VMEM_MB")
    # unset on the CPU test backend -> the raised (v5e-mirroring) default
    assert lp._scoped_vmem_cap() == 64 * 1024 * 1024
