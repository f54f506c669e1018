"""LSTM scan correctness: against torch.nn.LSTM packed-sequence semantics.

The masked-scan + length-mask design must reproduce what the reference got
from pack_padded_sequence -> cuDNN LSTM -> pad_packed_sequence
(reference: src/modules.py:74-85).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.ops.lstm import (
    bilstm_apply,
    bilstm_init,
    lstm_apply,
    lstm_init,
    lstm_cell_init,
    lstm_cell_step,
    pyramidal_lstm_stack_apply,
    pyramidal_lstm_stack_init,
)


def _torch_lstm_reference(params, x, lengths, bidirectional):
    """Run torch nn.LSTM with our parameters on a packed batch."""
    import torch
    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

    in_dim = params["fwd" if bidirectional else "w_ih"]["w_ih"].shape[0] if bidirectional else params["w_ih"].shape[0]
    hid = (params["fwd"]["w_hh"].shape[0] if bidirectional else params["w_hh"].shape[0])
    lstm = torch.nn.LSTM(in_dim, hid, num_layers=1, batch_first=True,
                         bidirectional=bidirectional)

    def load_dir(p, suffix=""):
        # our gates [i,f,g,o] match torch's order; torch stores (4H, D)
        getattr(lstm, f"weight_ih_l0{suffix}").data = torch.tensor(
            np.asarray(p["w_ih"]).T.copy())
        getattr(lstm, f"weight_hh_l0{suffix}").data = torch.tensor(
            np.asarray(p["w_hh"]).T.copy())
        getattr(lstm, f"bias_ih_l0{suffix}").data = torch.tensor(np.asarray(p["b"]))
        getattr(lstm, f"bias_hh_l0{suffix}").data = torch.zeros(4 * hid)

    if bidirectional:
        load_dir(params["fwd"])
        load_dir(params["bwd"], "_reverse")
    else:
        load_dir(params)

    xt = torch.tensor(np.asarray(x))
    packed = pack_padded_sequence(xt, torch.tensor(lengths), batch_first=True,
                                  enforce_sorted=False)
    with torch.no_grad():
        out, _ = lstm(packed)
    out, _ = pad_packed_sequence(out, batch_first=True, total_length=x.shape[1])
    return out.numpy()


@pytest.mark.parametrize("reverse", [False, True])
def test_unidirectional_masked_scan_matches_torch(reverse):
    rng = jax.random.key(0)
    B, T, D, H = 3, 12, 5, 7
    params = lstm_init(rng, D, H)
    x = jax.random.normal(jax.random.key(1), (B, T, D))
    lengths = np.array([12, 7, 3])

    ours = lstm_apply(params, x, jnp.array(lengths), reverse=reverse, unroll=2)

    if not reverse:
        ref = _torch_lstm_reference(params, x, lengths, bidirectional=False)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)
    else:
        # reverse == the backward half of a torch BiLSTM
        bi = {"fwd": params, "bwd": params}
        ref = _torch_lstm_reference(bi, x, lengths, bidirectional=True)[:, :, 7:]
        np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)


def test_bilstm_matches_torch_packed():
    B, T, D, H = 4, 10, 6, 5
    params = bilstm_init(jax.random.key(2), D, H)
    x = jax.random.normal(jax.random.key(3), (B, T, D))
    lengths = np.array([10, 9, 4, 1])
    ours = bilstm_apply(params, x, jnp.array(lengths), unroll=1)
    ref = _torch_lstm_reference(params, x, lengths, bidirectional=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)


def test_outputs_zero_at_padding():
    params = lstm_init(jax.random.key(4), 3, 4)
    x = jax.random.normal(jax.random.key(5), (2, 8, 3))
    out = lstm_apply(params, x, jnp.array([5, 8]))
    assert np.all(np.asarray(out)[0, 5:] == 0.0)
    assert not np.all(np.asarray(out)[1, 5:] == 0.0)


def test_cell_step_matches_scan_step():
    """One lstm_cell_step == first step of lstm_apply."""
    D, H = 6, 5
    params = lstm_cell_init(jax.random.key(6), D, H)
    x = jax.random.normal(jax.random.key(7), (2, 1, D))
    out_scan = lstm_apply(params, x, jnp.array([1, 1]))
    h0 = jnp.zeros((2, H))
    c0 = jnp.zeros((2, H))
    h1, _ = lstm_cell_step(params, x[:, 0], h0, c0)
    np.testing.assert_allclose(np.asarray(out_scan[:, 0]), np.asarray(h1), atol=1e-6)


def test_pyramid_halves_time_and_lengths():
    """pBLSTM length math parity: lx //= 2 per layer (src/modules.py:183)."""
    B, T, D, H, L = 2, 16, 4, 3, 2
    params = pyramidal_lstm_stack_init(jax.random.key(8), D, H, L)
    x = jax.random.normal(jax.random.key(9), (B, T, D))
    out, lens = pyramidal_lstm_stack_apply(
        params, None, x, jnp.array([16, 13]), 0.0, 0.0, train=False
    )
    assert out.shape == (B, T // 4, 2 * H)
    # 16 -> 8 -> 4 ; 13 -> 6 -> 3
    assert list(np.asarray(lens)) == [4, 3]


def test_pyramid_rejects_odd_time():
    params = pyramidal_lstm_stack_init(jax.random.key(10), 4, 3, 1)
    x = jnp.zeros((1, 7, 4))
    with pytest.raises(ValueError):
        pyramidal_lstm_stack_apply(params, None, x, jnp.array([7]), 0.0, 0.0)


def test_length_one_and_full_length_edge_cases():
    params = bilstm_init(jax.random.key(11), 3, 4)
    x = jax.random.normal(jax.random.key(12), (2, 6, 3))
    lengths = np.array([1, 6])
    ours = bilstm_apply(params, x, jnp.array(lengths))
    ref = _torch_lstm_reference(params, x, lengths, bidirectional=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)
