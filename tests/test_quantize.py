"""Weights-only int8 artifacts (quantize.py + export.py quantize=).

Three layers of proof:
  * numeric: per-channel symmetric quantization has the promised
    elementwise error bound (scale/2) and skips small/non-float leaves;
  * program: the exported quantized program equals the in-process step
    run on the DEQUANTIZED tree exactly — quantization error is the only
    delta a quantized artifact can introduce;
  * system: quantized LAS + Rewriter artifacts load through the standard
    ExportedDecoder/ExportedCorrector (no new code path), the file is
    genuinely smaller, and the gate scorer still applies.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu import constants
from attention_based_e2e_asr_dnn_tpu.export import (
    ExportedCorrector,
    ExportedDecoder,
    export_las_decoder,
    export_rewriter_corrector,
    save_artifact,
)
from attention_based_e2e_asr_dnn_tpu.models.las import (
    LASConfig,
    ListenerConfig,
    SpellerConfig,
    las_init,
)
from attention_based_e2e_asr_dnn_tpu.quantize import (
    dequantize_tree,
    is_quantized_leaf,
    quantize_tree,
    quantized_nbytes,
)

# hid 64 so the LSTM/attention matrices cross the 4096-element
# quantization threshold (w_hh: 64x256) — the tiny test_export.py config
# would quantize nothing
CFG = LASConfig(
    listener=ListenerConfig(input_dim=15, uniform_hid_dim=64, lstm_layers=1,
                            plstm_layers=1),
    speller=SpellerConfig(enc_out_dim=128, att_proj_dim=32, att_heads=1,
                          dec_emb_dim=64, dec_lstm_hid_dim=64,
                          dec_lstm_out_dim=32, CHR_MAX_STEPS=12),
)
BATCH, T_PAD = 4, 32


def _count_quantized(t) -> int:
    if is_quantized_leaf(t):
        return 1
    if isinstance(t, dict):
        return sum(_count_quantized(v) for v in t.values())
    if isinstance(t, (list, tuple)):
        return sum(_count_quantized(v) for v in t)
    return 0


def test_quantize_error_bound_and_skip_rules():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((96, 128)) * rng.uniform(0.01, 5)).astype(
        np.float32)
    tree = {
        "big": w,
        "bias": np.float32(rng.standard_normal(128)),      # 1-D: skipped
        "small": np.float32(rng.standard_normal((8, 8))),  # < 4096: skipped
        "ids": np.arange(70000, dtype=np.int32).reshape(700, 100),  # int
    }
    q = quantize_tree(tree)
    assert is_quantized_leaf(q["big"])
    assert not is_quantized_leaf(q["small"])
    assert q["ids"] is tree["ids"] or np.array_equal(q["ids"], tree["ids"])
    scale = q["big"]["__q8_scale__"]
    assert scale.shape == (1, 128)  # per-output-channel (last axis)
    deq = np.asarray(dequantize_tree(q)["big"])
    assert np.all(np.abs(deq - w) <= scale / 2 + 1e-7)
    # unquantized leaves pass through dequantize untouched
    np.testing.assert_array_equal(
        np.asarray(dequantize_tree(q)["bias"]), tree["bias"])
    qb, fb = quantized_nbytes(q)
    assert qb < fb  # the matrix mass actually shrank


def test_quantized_artifact_program_parity_and_size(tmp_path):
    """The quantized program must equal the in-process greedy step on the
    dequantized tree EXACTLY (cpu platform, same XLA arithmetic) — so the
    only behavior delta of --quantize is the bounded weight rounding."""
    from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
        make_las_greedy_step,
    )

    params = las_init(jax.random.PRNGKey(0), CFG)
    common = dict(vocab=constants.VOCAB, sos_idx=constants.SOS_IDX,
                  eos_idx=constants.EOS_IDX, pad_idx=constants.PAD_IDX,
                  platforms=("cpu",))
    p_fp = str(tmp_path / "fp.tlas")
    p_q8 = str(tmp_path / "q8.tlas")
    save_artifact(p_fp, export_las_decoder(params, CFG, BATCH, T_PAD,
                                           **common))
    save_artifact(p_q8, export_las_decoder(params, CFG, BATCH, T_PAD,
                                           quantize="int8", **common))
    assert os.path.getsize(p_q8) < 0.75 * os.path.getsize(p_fp)

    dec = ExportedDecoder(p_q8)
    assert dec.meta["quantize"] == "int8"
    assert _count_quantized(dec.params) > 0
    rng = np.random.default_rng(1)
    x = rng.standard_normal((BATCH, T_PAD, 15)).astype(np.float32)
    lx = np.array([32, 20, 9, 4], np.int32)
    got = dec.decode_ids(x, lx)

    deq = dequantize_tree(dec.params)
    want = np.asarray(make_las_greedy_step(CFG)(
        jax.tree.map(jnp.asarray, deq), jnp.asarray(x), jnp.asarray(lx)))
    np.testing.assert_array_equal(got, want)

    with pytest.raises(ValueError, match="only 'int8'"):
        export_las_decoder(params, CFG, BATCH, T_PAD, quantize="fp4",
                           **common)


def test_quantized_corrector_gate_still_applies(tmp_path):
    from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
        RewriterConfig,
        rewriter_init,
    )

    lm_cfg = RewriterConfig(
        vocab_size=30, emb_dim=64, enc_lstm_layers=1, enc_lstm_hid_dim=32,
        att_proj_dim=32, att_heads=1, dec_lstm_hid_dim=64,
        dec_lstm_out_dim=32, CHR_MAX_STEPS=12)
    params = rewriter_init(jax.random.PRNGKey(3), lm_cfg)
    art = export_rewriter_corrector(
        params, lm_cfg, 2, 32, vocab=constants.VOCAB,
        sos_idx=constants.SOS_IDX, eos_idx=constants.EOS_IDX,
        pad_idx=constants.PAD_IDX, quantize="int8", platforms=("cpu",))
    path = str(tmp_path / "corr-q8.tlas")
    save_artifact(path, art)
    corr = ExportedCorrector(path)
    assert corr.meta["quantize"] == "int8" and corr.meta["gate"]
    texts = ["HELLO WORLD", "THE CAT"]
    out = corr.correct(texts, margin=0.0)
    assert len(out) == 2 and all(isinstance(t, str) for t in out)
    # the scorer program shares the quantized tree: a huge margin keeps
    # nothing, so inputs pass through — the never-worse gate works on
    # quantized artifacts
    assert corr.correct(texts, margin=1e9) == texts
