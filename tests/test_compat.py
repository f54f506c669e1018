"""Reference-checkpoint interop (compat.py): layout, parity, round-trip.

Builds reference-NAMED state_dicts by composing torch primitives
(nn.LSTM / nn.LSTMCell / nn.Linear / nn.Embedding) with the key scheme the
reference's modules produce (src/models.py:500-527, src/lmtrain.py:98-253)
— no reference code is imported. Parity tests drive the same weights
through torch and through our apply fns.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu import compat
from attention_based_e2e_asr_dnn_tpu.models.las import (
    LASConfig,
    ListenerConfig,
    SpellerConfig,
    las_apply,
    las_init,
)
from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
    RewriterConfig,
    rewriter_apply,
    rewriter_init,
)
from attention_based_e2e_asr_dnn_tpu.ops.lstm import (
    locked_lstm_stack_apply,
    lstm_cell_step,
)

torch = pytest.importorskip("torch")

# tiny-but-structured dims (dec_emb == 2*att_proj is the tying constraint)
IDIM, HID, NBASE, NPYR = 6, 8, 2, 2
PROJ, HEADS, EMB, DEC_HID, DEC_OUT, VOCAB = 8, 2, 16, 12, 10, 30
ENC_OUT = 2 * HID

LAS_CFG = LASConfig(
    listener=ListenerConfig(
        input_dim=IDIM, uniform_hid_dim=HID, lstm_layers=NBASE,
        plstm_layers=NPYR,
    ),
    speller=SpellerConfig(
        enc_out_dim=ENC_OUT, att_proj_dim=PROJ, att_heads=HEADS,
        dec_vocab_size=VOCAB, dec_emb_dim=EMB, dec_lstm_hid_dim=DEC_HID,
        dec_lstm_out_dim=DEC_OUT,
    ),
)


def _add(sd, prefix, module):
    for k, v in module.state_dict().items():
        sd[f"{prefix}.{k}"] = v.clone()


def _speller_sd(sd, names, enc_out):
    torch.manual_seed(1)
    _add(sd, f"{names['att']}.key_map", torch.nn.Linear(enc_out, PROJ))
    _add(sd, f"{names['att']}.value_map", torch.nn.Linear(enc_out, PROJ))
    _add(sd, f"{names['att']}.query_map", torch.nn.Linear(DEC_OUT, PROJ))
    _add(sd, f"{names['att']}.final_map", torch.nn.Linear(PROJ, PROJ))
    emb = torch.nn.Embedding(VOCAB, EMB, padding_idx=29)
    _add(sd, names["emb"].rsplit(".", 1)[0], emb)
    _add(sd, f"{names['cells']}.0", torch.nn.LSTMCell(EMB + PROJ, DEC_HID))
    _add(sd, f"{names['cells']}.1", torch.nn.LSTMCell(DEC_HID, DEC_OUT))
    sd[names["init_query"]] = torch.rand(1, DEC_OUT)
    cls = torch.nn.Linear(EMB, VOCAB)
    cls.weight = emb.weight  # reference ties them (src/models.py:287)
    _add(sd, names["cls"], cls)


def make_ref_las_state_dict(seed=0):
    """state_dict with the exact key scheme ListenAttendSpell produces."""
    torch.manual_seed(seed)
    sd = {}
    in_d = IDIM
    for i in range(NBASE):
        _add(sd, f"listen.base.lstms.{i}",
             torch.nn.LSTM(in_d, HID, batch_first=True, bidirectional=True))
        in_d = ENC_OUT
    for i in range(NPYR):
        _add(sd, f"listen.pyramid.plstms.{i}",
             torch.nn.LSTM(2 * ENC_OUT, HID, batch_first=True,
                           bidirectional=True))
    _speller_sd(sd, {
        "att": "spell.attention", "emb": "spell.char_emb.weight",
        "cells": "spell.lstms.lstms", "init_query": "spell.init_query",
        "cls": "spell.cls",
    }, ENC_OUT)
    return sd


def make_ref_rewriter_state_dict(seed=0):
    torch.manual_seed(seed)
    sd = {}
    in_d = EMB
    for i in range(NBASE):
        _add(sd, f"enc_lstm.lstms.{i}",
             torch.nn.LSTM(in_d, HID, batch_first=True, bidirectional=True))
        in_d = ENC_OUT
    _speller_sd(sd, {
        "att": "mha", "emb": "char_emb.weight", "cells": "dec_lstm.lstms",
        "init_query": "init_query", "cls": "cls",
    }, ENC_OUT)
    return sd


def test_las_import_matches_init_tree():
    """Imported tree has the exact structure + shapes of las_init's."""
    params = compat.las_params_from_state_dict(make_ref_las_state_dict())
    ref = las_init(jax.random.PRNGKey(0), LAS_CFG)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref))
    for got, want in zip(jax.tree_util.tree_leaves(params),
                         jax.tree_util.tree_leaves(ref)):
        assert got.shape == want.shape


def test_imported_base_stack_matches_torch_forward():
    """The layout conversion end-to-end: torch packed BiLSTM stack forward
    == our masked-scan stack forward on the imported weights."""
    sd = make_ref_las_state_dict()
    params = compat.las_params_from_state_dict(sd)
    rng = np.random.default_rng(0)
    B, T = 3, 11
    x = rng.standard_normal((B, T, IDIM)).astype(np.float32)
    lengths = np.array([11, 7, 4])

    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence
    h = torch.tensor(x)
    for i in range(NBASE):
        m = torch.nn.LSTM(IDIM if i == 0 else ENC_OUT, HID,
                          batch_first=True, bidirectional=True)
        prefix = f"listen.base.lstms.{i}."
        m.load_state_dict({k[len(prefix):]: v for k, v in sd.items()
                           if k.startswith(prefix)})
        m.eval()
        packed = pack_padded_sequence(h, torch.tensor(lengths),
                                      batch_first=True, enforce_sorted=False)
        with torch.no_grad():
            out, _ = m(packed)
        h, _ = pad_packed_sequence(out, batch_first=True, total_length=T)
    want = h.numpy()

    got, got_l = locked_lstm_stack_apply(
        params["listener"]["base"], None, jnp.asarray(x),
        jnp.asarray(lengths), 0.2, 0.3, True, False)
    np.testing.assert_array_equal(np.asarray(got_l), lengths)
    for b in range(B):  # pad region is policy (we zero; torch zeros too)
        np.testing.assert_allclose(np.asarray(got)[b, :lengths[b]],
                                   want[b, :lengths[b]], atol=2e-5)


def test_imported_cell_matches_torch_step():
    sd = make_ref_las_state_dict()
    params = compat.las_params_from_state_dict(sd)
    cell = torch.nn.LSTMCell(EMB + PROJ, DEC_HID)
    cell.load_state_dict({k.rsplit(".", 1)[-1]: v for k, v in sd.items()
                          if k.startswith("spell.lstms.lstms.0.")})
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, EMB + PROJ)).astype(np.float32)
    h0 = rng.standard_normal((4, DEC_HID)).astype(np.float32)
    c0 = rng.standard_normal((4, DEC_HID)).astype(np.float32)
    with torch.no_grad():
        h1, c1 = cell(torch.tensor(x), (torch.tensor(h0), torch.tensor(c0)))
    got_h, got_c = lstm_cell_step(params["speller"]["cell1"],
                                  jnp.asarray(x), jnp.asarray(h0),
                                  jnp.asarray(c0))
    np.testing.assert_allclose(np.asarray(got_h), h1.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_c), c1.numpy(), atol=2e-5)


def test_imported_las_full_forward_runs():
    params = jax.tree.map(jnp.asarray, compat.las_params_from_state_dict(
        make_ref_las_state_dict()))
    B, T, S = 2, 16, 5
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, IDIM)).astype(np.float32))
    lx = jnp.asarray([16, 12])
    dec_y = jnp.asarray(rng.integers(0, VOCAB, (B, S)))
    # train=True: the teacher-forced decode (eval free-runs CHR_MAX_STEPS)
    out = las_apply(params, LAS_CFG, jax.random.PRNGKey(0), x, lx, dec_y,
                    tf_rate=1.0, train=True)
    assert out.logits.shape == (B, S, VOCAB)
    assert bool(jnp.all(jnp.isfinite(out.logits)))


def test_imported_rewriter_full_forward_runs():
    cfg = RewriterConfig(vocab_size=VOCAB, emb_dim=EMB, enc_lstm_layers=NBASE,
                         enc_lstm_hid_dim=HID, att_proj_dim=PROJ,
                         att_heads=HEADS, dec_lstm_hid_dim=DEC_HID,
                         dec_lstm_out_dim=DEC_OUT)
    params = jax.tree.map(jnp.asarray, compat.rewriter_params_from_state_dict(
        make_ref_rewriter_state_dict()))
    ref = rewriter_init(jax.random.PRNGKey(0), cfg)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref))
    B, S = 2, 6
    x = jnp.asarray([[3, 4, 5, 6, 29, 29], [7, 8, 9, 10, 11, 12]])
    lx = jnp.asarray([4, 6])
    dec_y = jnp.asarray([[3, 4, 5, 29, 29, 29], [7, 8, 9, 10, 29, 29]])
    out = rewriter_apply(params, cfg, jax.random.PRNGKey(0), x, lx, dec_y,
                         tf_rate=1.0, train=True)
    assert out.logits.shape == (B, S, VOCAB)
    assert bool(jnp.all(jnp.isfinite(out.logits)))


def test_unidirectional_and_deep_stack_import():
    """Importer infers layer count and directionality from the keys alone:
    a 3-layer unidirectional base stack (no `_reverse` keys) maps onto the
    flat (non fwd/bwd) layer dicts and matches torch's forward."""
    torch.manual_seed(2)
    sd = {}
    in_d = IDIM
    for i in range(3):
        _add(sd, f"enc_lstm.lstms.{i}",
             torch.nn.LSTM(in_d, HID, batch_first=True,
                           bidirectional=False))
        in_d = HID
    layers = compat._stack_in(sd, "enc_lstm.lstms.{}")
    assert len(layers) == 3
    assert all("fwd" not in l and "w_ih" in l for l in layers)
    assert layers[0]["w_ih"].shape == (IDIM, 4 * HID)
    assert layers[1]["w_ih"].shape == (HID, 4 * HID)

    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

    rng = np.random.default_rng(4)
    B, T = 2, 9
    x = rng.standard_normal((B, T, IDIM)).astype(np.float32)
    lengths = np.array([9, 5])
    h = torch.tensor(x)
    for i in range(3):
        m = torch.nn.LSTM(IDIM if i == 0 else HID, HID, batch_first=True)
        prefix = f"enc_lstm.lstms.{i}."
        m.load_state_dict({k[len(prefix):]: v for k, v in sd.items()
                           if k.startswith(prefix)})
        m.eval()
        packed = pack_padded_sequence(h, torch.tensor(lengths),
                                      batch_first=True,
                                      enforce_sorted=False)
        with torch.no_grad():
            out, _ = m(packed)
        h, _ = pad_packed_sequence(out, batch_first=True, total_length=T)
    got, _ = locked_lstm_stack_apply(layers, None, jnp.asarray(x),
                                     jnp.asarray(lengths), 0.0, 0.0,
                                     False, False)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(got)[b, :lengths[b]],
                                   h.numpy()[b, :lengths[b]], atol=2e-5)


def test_round_trip_las_params_exact():
    """ours -> reference naming -> ours is exact (incl. bias re-fold)."""
    params = las_init(jax.random.PRNGKey(3), LAS_CFG)
    back = compat.las_params_from_state_dict(
        compat.state_dict_from_las_params(params))
    for got, want in zip(jax.tree_util.tree_leaves(back),
                         jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_round_trip_rewriter_state_dict_keys():
    """imported-then-exported state_dict keeps every reference key and
    preserves the torch-side bias SUM (the quantity torch applies)."""
    sd = make_ref_rewriter_state_dict()
    params = compat.rewriter_params_from_state_dict(sd)
    out = compat.state_dict_from_rewriter_params(params)
    assert set(out) == {k for k in sd}
    for k in sd:
        if "bias_ih" in k:
            hh = k.replace("bias_ih", "bias_hh")
            np.testing.assert_allclose(
                out[k] + out[hh], (sd[k] + sd[hh]).numpy(), atol=1e-6)
        elif "bias_hh" in k or "final_map" in k:
            continue  # folded above / synthesized zeros (unused in ref fwd)
        else:
            np.testing.assert_allclose(out[k], sd[k].numpy(), atol=1e-6)


def test_untied_classifier_rejected():
    sd = make_ref_las_state_dict()
    sd["spell.cls.weight"] = sd["spell.cls.weight"] + 1.0
    with pytest.raises(ValueError, match="tied"):
        compat.las_params_from_state_dict(sd)


def test_unknown_keys_rejected():
    sd = make_ref_las_state_dict()
    sd["spell.mystery.weight"] = torch.zeros(3)
    with pytest.raises(KeyError, match="unrecognised"):
        compat.las_params_from_state_dict(sd)


def test_gap_in_layer_indices_rejected():
    """A truncated/drifted checkpoint with lstms.0 and lstms.2 but no
    lstms.1 must fail loudly, not silently import a 1-layer stack."""
    sd = make_ref_las_state_dict()
    for k in list(sd):
        if k.startswith("listen.base.lstms.1."):
            sd[k.replace(".lstms.1.", ".lstms.2.")] = sd.pop(k)
    with pytest.raises(KeyError, match="lstms.2"):
        compat.las_params_from_state_dict(sd)


def test_nonzero_init_states_warn_on_export():
    """Trained init_h/c have no reference slot; exporting them must warn."""
    params = las_init(jax.random.PRNGKey(4), LAS_CFG)
    params["speller"]["init_h1"] = params["speller"]["init_h1"] + 0.5
    with pytest.warns(UserWarning, match="init_h1.*dropped"):
        compat.state_dict_from_las_params(params)


def test_cli_import_produces_loadable_ckpt(tmp_path):
    """torch .pt (trainer payload shape, src/train.py:352) -> our .ckpt."""
    import sys
    sys.path.insert(0, "tools")
    try:
        import import_reference_ckpt as cli
    finally:
        sys.path.pop(0)
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        load_checkpoint,
    )

    sd = make_ref_las_state_dict()
    pt = tmp_path / "ref.pt"
    torch.save({"model_state_dict": sd, "epoch": 7}, pt)
    out = tmp_path / "imported.ckpt"
    assert cli.main(["las", str(pt), "-o", str(out)]) == 0
    payload = load_checkpoint(str(out))
    want = compat.las_params_from_state_dict(sd)
    got = payload["params"]
    np.testing.assert_allclose(
        got["speller"]["cell1"]["w_ih"], want["speller"]["cell1"]["w_ih"])
    # and the reverse direction emits a strict-loadable .pt payload
    back = tmp_path / "back.pt"
    assert cli.main(["las", str(out), "-o", str(back), "--export"]) == 0
    rt = torch.load(back, map_location="cpu", weights_only=True)
    assert set(rt["model_state_dict"]) == set(sd)


# ---------------------------------------------------------------------------
# transparent .pt loading: reference checkpoints work wherever .ckpt does
# ---------------------------------------------------------------------------


def test_params_from_state_dict_autodetects_family():
    p, fam = compat.params_from_state_dict(make_ref_las_state_dict())
    assert fam == "las" and "listener" in p
    p, fam = compat.params_from_state_dict(make_ref_rewriter_state_dict())
    assert fam == "rewriter" and "encoder" in p
    with pytest.raises(ValueError, match="neither reference family"):
        compat.params_from_state_dict({"foo.weight": np.zeros(2)})


def test_load_checkpoint_reads_torch_zip_pt(tmp_path):
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        load_checkpoint,
    )

    sd = make_ref_las_state_dict()
    pt = tmp_path / "min-ld-epoch[7].pt"
    torch.save({"model_state_dict": sd, "epoch": 7}, pt)
    with pytest.warns(UserWarning, match="reference PyTorch checkpoint"):
        payload = load_checkpoint(str(pt))
    assert payload["torch_import"] == "las"
    assert payload["opt_state"] is None
    assert payload["epoch"] == 7
    want = compat.las_params_from_state_dict(sd)
    np.testing.assert_allclose(
        payload["params"]["speller"]["cell1"]["w_hh"],
        want["speller"]["cell1"]["w_hh"])


def test_load_checkpoint_reads_torch_legacy_pickle(tmp_path):
    """torch<1.6 pickle serialization (no zip magic) also routes to compat."""
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        load_checkpoint,
    )

    sd = make_ref_rewriter_state_dict()
    pt = tmp_path / "lm.pt"
    torch.save({"model_state_dict": sd}, pt,
               _use_new_zipfile_serialization=False)
    with pytest.warns(UserWarning, match="reference PyTorch checkpoint"):
        payload = load_checkpoint(str(pt))
    assert payload["torch_import"] == "rewriter"
    want = compat.rewriter_params_from_state_dict(sd)
    np.testing.assert_allclose(
        payload["params"]["decoder"]["cell2"]["w_ih"],
        want["decoder"]["cell2"]["w_ih"])


def test_load_checkpoint_rejects_foreign_zip(tmp_path):
    import zipfile

    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        load_checkpoint,
    )

    bad = tmp_path / "not-a-ckpt.zip"
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("readme.txt", "hello")
    with pytest.raises(ValueError, match="neither our npz checkpoint"):
        load_checkpoint(str(bad))


def test_average_checkpoints_mixes_pt_and_ckpt(tmp_path):
    """run_avg over a folder holding BOTH formats averages them uniformly."""
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        average_checkpoints,
        load_checkpoint,
        save_checkpoint,
    )

    sd = make_ref_las_state_dict()
    pt = tmp_path / "min-ld-epoch[1].pt"
    torch.save({"model_state_dict": sd}, pt)
    params = compat.las_params_from_state_dict(sd)
    doubled = jax.tree.map(lambda a: np.asarray(a) * 3.0, params)
    ck = tmp_path / "min-ld-epoch[2].ckpt"
    save_checkpoint(str(ck), {"params": doubled, "epoch": 2, "batch": 0})
    avg = average_checkpoints([str(pt), str(ck)])
    np.testing.assert_allclose(
        avg["params"]["speller"]["init_query"],
        2.0 * np.asarray(params["speller"]["init_query"]), rtol=1e-6)


def test_infer_cli_runs_on_reference_experiment_folder(tmp_path):
    """Our infer CLI consumes an UNTOUCHED reference experiment folder:
    config.json straight from the reference's snapshot shape (no vocab
    injection, torch-only keys present) + ckpts/min-*.pt checkpoints.
    Covers discovery, epoch_num matching, run_avg over .pt, and CSV naming.
    """
    import argparse

    import pandas as pd
    import yaml

    from attention_based_e2e_asr_dnn_tpu import infer as infer_mod
    from attention_based_e2e_asr_dnn_tpu.constants import VOCAB_MAP

    # --- 6-dim dataset matching the fixture dims, reference layout
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    n = 6
    tst = data / "test-clean"
    (tst / "mfcc").mkdir(parents=True)
    (tst / "transcript").mkdir(parents=True)
    for i in range(n):
        feats = rng.normal(size=(24 + 4 * i, IDIM)).astype(np.float32)
        np.save(tst / "mfcc" / f"utt{i:03d}.npy", feats)
    pd.DataFrame({"id": list(range(n)), "label": ["X"] * n}).to_csv(
        tst / "transcript" / "random_submission.csv", index=False)

    # --- reference-style experiment folder
    exp = tmp_path / "ref-exp"
    (exp / "ckpts").mkdir(parents=True)
    ref_cfg = {
        # exactly the reference's snapshot: its training yaml, verbatim —
        # torch-only keys included, no VOCAB/SOS/EOS injection
        "TRN_FOLDER": str(data / "train-clean-100"),
        "num_workers": 8,
        "scaler": {"use": True},
        "model": {
            "tag": "ref-las",
            "configs": {
                "listener_configs": {
                    "input_dim": IDIM, "uniform_hid_dim": HID,
                    "lstm_layers": NBASE, "plstm_layers": NPYR,
                    "bidirectional": True,
                },
                "speller_configs": {
                    "att_proj_dim": PROJ, "att_heads": HEADS,
                    "dec_emb_dim": EMB, "dec_lstm_hid_dim": DEC_HID,
                    "dec_lstm_out_dim": DEC_OUT,
                    "CHR_MAX_STEPS": 8, "USE_GREEDY": True,
                },
            },
        },
    }
    import json

    (exp / "config.json").write_text(json.dumps(ref_cfg))
    for ep, seed in ((3, 0), (5, 1)):
        torch.save(
            {"model_state_dict": make_ref_las_state_dict(seed), "epoch": ep},
            exp / "ckpts" / f"min-ld-epoch[{ep}].pt")

    inf_cfg = {
        "SOME_FOLDER": str(tst),
        "exp_folder": str(exp),
        "batch_size": 3,
        "pad_time_multiple": 8,
        "run_all": False,
        "run_avg": True,
        "epoch_num": 5,
        "use_greedy": True,
        "beam_size": 0,
    }
    cfg_path = tmp_path / "inf.yml"
    cfg_path.write_text(yaml.safe_dump(inf_cfg))
    infer_mod.main(argparse.Namespace(config_file=str(cfg_path)))

    preds = exp / "preds"
    named = preds / "min-ld-epoch[5]-tst.csv"
    avg = preds / "avg-all-tst.csv"
    assert named.exists(), sorted(os.listdir(preds))
    assert avg.exists()
    df = pd.read_csv(named)
    assert list(df["id"]) == list(range(n))
    # decoded strings are in-vocab (garbage weights, but valid chars)
    legal = set("".join(k for k in VOCAB_MAP if len(k) == 1))
    for s in df["label"].fillna(""):
        assert set(str(s)) <= legal


def test_torch_legacy_pt_never_unpickled(tmp_path):
    """Header-byte detection routes torch legacy files to the weights_only
    loader WITHOUT a raw pickle.load, and without the 'legacy pickle'
    trust warning meant for our own deprecated format."""
    import warnings as warnings_mod

    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        load_checkpoint,
    )

    sd = make_ref_las_state_dict()
    pt = tmp_path / "old.pt"
    torch.save({"model_state_dict": sd}, pt,
               _use_new_zipfile_serialization=False)
    with open(pt, "rb") as fh:
        assert fh.read(3) == b"\x80\x02\x8a"  # the signature we key on
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        payload = load_checkpoint(str(pt))
    messages = [str(w.message) for w in caught]
    assert any("reference PyTorch checkpoint" in m for m in messages)
    assert not any("legacy pickle checkpoint" in m for m in messages)
    assert payload["torch_import"] == "las"


def test_list_best_checkpoints_dedupes_converted_twins(tmp_path):
    """A .pt alongside its imported same-stem .ckpt must list once (the
    .ckpt), or run_avg would average the same epoch twice."""
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        list_best_checkpoints,
        save_checkpoint,
    )

    sd = make_ref_las_state_dict()
    torch.save({"model_state_dict": sd}, tmp_path / "min-ld-epoch[3].pt")
    torch.save({"model_state_dict": sd}, tmp_path / "min-ld-epoch[5].pt")
    params = compat.las_params_from_state_dict(sd)
    save_checkpoint(str(tmp_path / "min-ld-epoch[3].ckpt"),
                    {"params": params, "epoch": 3, "batch": 0})
    (tmp_path / "emergency-epoch[4].ckpt").write_bytes(b"x")
    (tmp_path / "avg-all.ckpt").write_bytes(b"x")
    assert list_best_checkpoints(str(tmp_path)) == [
        "min-ld-epoch[3].ckpt", "min-ld-epoch[5].pt"]
