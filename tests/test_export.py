"""StableHLO deployment export (export.py): fidelity + artifact contract.

The exported artifact must reproduce the in-process decode exactly, load
without model code (ExportedDecoder touches only jax + numpy), and respect
its declared bucket shape.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu import constants
from attention_based_e2e_asr_dnn_tpu.export import (
    ExportedDecoder,
    export_from_experiment,
    export_las_decoder,
    save_artifact,
)
from attention_based_e2e_asr_dnn_tpu.models.las import (
    LASConfig,
    ListenerConfig,
    SpellerConfig,
    las_init,
)

CFG = LASConfig(
    listener=ListenerConfig(input_dim=15, uniform_hid_dim=16, lstm_layers=1,
                            plstm_layers=1),
    speller=SpellerConfig(enc_out_dim=32, att_proj_dim=8, att_heads=1,
                          dec_emb_dim=16, dec_lstm_hid_dim=16,
                          dec_lstm_out_dim=8, CHR_MAX_STEPS=12),
)
BATCH, T_PAD = 4, 32


@pytest.fixture(scope="module")
def artifact_path(tmp_path_factory):
    params = las_init(jax.random.PRNGKey(0), CFG)
    art = export_las_decoder(
        params, CFG, BATCH, T_PAD, vocab=constants.VOCAB,
        sos_idx=constants.SOS_IDX, eos_idx=constants.EOS_IDX,
        pad_idx=constants.PAD_IDX, platforms=("cpu",))
    path = str(tmp_path_factory.mktemp("export") / "las.tlas")
    save_artifact(path, art)
    return path, params


def test_exported_matches_in_process_decode(artifact_path):
    path, params = artifact_path
    from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
        make_las_greedy_step,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH, T_PAD, 15)).astype(np.float32)
    lx = np.array([32, 20, 9, 4], np.int32)
    dec = ExportedDecoder(path)
    got = dec.decode_ids(x, lx)
    want = np.asarray(make_las_greedy_step(CFG)(params, jnp.asarray(x),
                                                jnp.asarray(lx)))
    np.testing.assert_array_equal(got, want)


def test_beam_export_matches_in_process_beam():
    """Beam artifacts: exported scan + shared host-side selection must
    reproduce make_las_beam_step's ids exactly (incl. length_alpha)."""
    from attention_based_e2e_asr_dnn_tpu.decoding.beam import (
        make_las_beam_step,
    )

    params = las_init(jax.random.PRNGKey(2), CFG)
    art = export_las_decoder(
        params, CFG, BATCH, T_PAD, vocab=constants.VOCAB,
        sos_idx=constants.SOS_IDX, eos_idx=constants.EOS_IDX,
        pad_idx=constants.PAD_IDX, beam_size=3, length_alpha=0.7,
        platforms=("cpu",))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "beam.tlas")
        save_artifact(path, art)
        dec = ExportedDecoder(path)
        rng = np.random.default_rng(3)
        x = rng.standard_normal((BATCH, T_PAD, 15)).astype(np.float32)
        lx = np.array([32, 17, 25, 8], np.int32)
        got = dec.decode_ids(x, lx)
    step = make_las_beam_step(CFG, beam_size=3, length_alpha=0.7)
    want = np.asarray(step(params, jnp.asarray(x), jnp.asarray(lx)))
    np.testing.assert_array_equal(got, want)


def test_transcribe_pads_and_detokenizes(artifact_path):
    path, _ = artifact_path
    dec = ExportedDecoder(path)
    rng = np.random.default_rng(1)
    feats = [rng.standard_normal((t, 15)).astype(np.float32)
             for t in (30, 7)]
    texts = dec.transcribe(feats)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)
    vocab_ok = set("".join(texts)) <= set("".join(constants.VOCAB))
    assert vocab_ok


def test_transcribe_rejects_overlong_and_overbatch(artifact_path):
    path, _ = artifact_path
    dec = ExportedDecoder(path)
    with pytest.raises(ValueError, match="frames > exported"):
        dec.transcribe([np.zeros((T_PAD + 1, 15), np.float32)])
    with pytest.raises(ValueError, match="> exported batch"):
        dec.transcribe([np.zeros((4, 15), np.float32)] * (BATCH + 1))
    with pytest.raises(ValueError, match="feature dim"):
        dec.transcribe([np.zeros((4, 14), np.float32)])


def test_pallas_configured_model_exports_portable(tmp_path):
    """A model trained with the Pallas kernel tiers (the recommended fast
    config) must still export a portable multi-platform artifact: the
    export forces the scan impls (Mosaic only lowers for TPU), and the
    artifact reproduces the scan-impl in-process decode exactly."""
    import dataclasses

    from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
        make_las_greedy_step,
    )

    cfg_pallas = dataclasses.replace(
        CFG,
        listener=dataclasses.replace(CFG.listener, lstm_impl="pallas"),
        speller=dataclasses.replace(CFG.speller, decoder_impl="pallas"),
    )
    params = las_init(jax.random.PRNGKey(1), cfg_pallas)
    art = export_las_decoder(
        params, cfg_pallas, BATCH, T_PAD, vocab=constants.VOCAB,
        sos_idx=constants.SOS_IDX, eos_idx=constants.EOS_IDX,
        pad_idx=constants.PAD_IDX, platforms=("tpu", "cpu"))
    path = str(tmp_path / "las-pallas.tlas")
    save_artifact(path, art)
    dec = ExportedDecoder(path)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((BATCH, T_PAD, 15)).astype(np.float32)
    lx = np.array([32, 20, 9, 4], np.int32)
    want = np.asarray(make_las_greedy_step(CFG)(params, jnp.asarray(x),
                                                jnp.asarray(lx)))
    np.testing.assert_array_equal(dec.decode_ids(x, lx), want)


def test_pallas_configured_corrector_exports_portable(tmp_path):
    """Same rule for Rewriter artifacts: pallas-configured corrector +
    default platforms must export (and carry the gate scorer)."""
    from attention_based_e2e_asr_dnn_tpu.export import (
        export_rewriter_corrector,
    )
    from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
        RewriterConfig,
        rewriter_init,
    )

    cfg = RewriterConfig(emb_dim=16, enc_lstm_layers=1, enc_lstm_hid_dim=8,
                         att_proj_dim=8, att_heads=1, dec_lstm_hid_dim=16,
                         dec_lstm_out_dim=8, CHR_MAX_STEPS=12,
                         lstm_impl="pallas", decoder_impl="pallas")
    params = rewriter_init(jax.random.PRNGKey(2), cfg)
    art = export_rewriter_corrector(
        params, cfg, batch=2, t_pad=32, vocab=constants.VOCAB,
        sos_idx=constants.SOS_IDX, eos_idx=constants.EOS_IDX,
        pad_idx=constants.PAD_IDX, platforms=("tpu", "cpu"))
    assert "mlir_scorer" in art
    assert art["meta"]["platforms"] == ["tpu", "cpu"]


def test_bad_format_rejected(tmp_path):
    path = str(tmp_path / "bogus.tlas")
    np.savez(path[:-5] + ".npz", __record__=np.frombuffer(
        json.dumps({"meta": {"format": "other"}, "params_tree": None})
        .encode(), dtype=np.uint8))
    os.rename(path[:-5] + ".npz", path)
    with pytest.raises(ValueError, match="not a tpu-las-export"):
        ExportedDecoder(path)


def _make_lm_experiment(root, cfg):
    """Fabricated Rewriter experiment folder (config.json + one ckpt)."""
    from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
        rewriter_init,
    )
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        save_checkpoint,
    )

    os.makedirs(os.path.join(root, "ckpts"))
    snap = {
        "compute_dtype": "float32",
        "model": {"configs": {
            "vocab_size": cfg.vocab_size, "emb_dim": cfg.emb_dim,
            "enc_lstm_layers": cfg.enc_lstm_layers,
            "enc_lstm_hid_dim": cfg.enc_lstm_hid_dim,
            "att_proj_dim": cfg.att_proj_dim, "att_heads": cfg.att_heads,
            "dec_lstm_hid_dim": cfg.dec_lstm_hid_dim,
            "dec_lstm_out_dim": cfg.dec_lstm_out_dim,
            "CHR_MAX_STEPS": cfg.CHR_MAX_STEPS,
        }},
    }
    with open(os.path.join(root, "config.json"), "w") as fh:
        json.dump(snap, fh)
    params = rewriter_init(jax.random.PRNGKey(5), cfg)
    save_checkpoint(os.path.join(root, "ckpts",
                                 "min-loss-ld-ppl-epoch[2].ckpt"),
                    {"params": params, "epoch": 2})
    return root


def test_corrector_export_matches_serving_corrector(tmp_path):
    """Rewriter artifact (decode + gate scorer): gated corrections must
    equal serving.Corrector's on the same checkpoint, and the kind guard
    must reject cross-loading."""
    from attention_based_e2e_asr_dnn_tpu.export import (
        ExportedCorrector,
        export_corrector_from_experiment,
    )
    from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
        RewriterConfig,
    )
    from attention_based_e2e_asr_dnn_tpu.serving import Corrector

    lm_cfg = RewriterConfig(
        vocab_size=30, emb_dim=16, enc_lstm_layers=2, enc_lstm_hid_dim=8,
        att_proj_dim=8, att_heads=2, dec_lstm_hid_dim=12,
        dec_lstm_out_dim=10, CHR_MAX_STEPS=12)
    exp = _make_lm_experiment(str(tmp_path / "lm"), lm_cfg)
    out = str(tmp_path / "corr.tlas")
    export_corrector_from_experiment(exp, out, batch=2, t_pad=32,
                                     platforms=("cpu",))
    dec = ExportedCorrector(out)
    assert dec.meta["kind"] == "rewriter" and dec.meta["gate"]
    # the scorer's static width covers the longest possible candidate
    # (CHR_MAX_STEPS + SOS/EOS), so the gate scores FULL rewrites
    assert dec.meta["score_width"] >= lm_cfg.CHR_MAX_STEPS + 2

    texts = ["HELLO WORLD", "THE CAT", "A", "HI THERE YO"]  # 2 chunks of 2
    corr = Corrector(exp, beam_size=0, confidence_margin=0.0, batch_size=2)
    want = corr.correct(texts)
    got = dec.correct(texts, margin=0.0)
    assert got == want
    # huge margin -> gate keeps nothing, inputs pass through unchanged
    assert dec.correct(texts, margin=1e9) == texts

    # over-width text: raise by default, pass through (never-worse) when
    # asked — short co-batched texts still get corrected normally
    long_text = "A" * 40  # 42 ids > t_pad 32
    with pytest.raises(ValueError, match="exported t_pad"):
        dec.correct([long_text])
    mixed = dec.correct([long_text, "HELLO WORLD"],
                        on_overflow="passthrough")
    assert mixed[0] == long_text
    assert mixed[1] == want[0]  # same as the batched run above

    # kind guards both ways
    with pytest.raises(ValueError, match="kind"):
        ExportedDecoder(out)
    with pytest.raises(TypeError, match="correct"):
        dec.transcribe([np.zeros((4, 15), np.float32)])

    # CLI drive with the real parity check
    import sys
    sys.path.insert(0, "tools")
    try:
        import export_serving as cli
    finally:
        sys.path.pop(0)
    out2 = str(tmp_path / "cli-corr.tlas")
    assert cli.main([exp, "-o", out2, "--model", "rewriter", "--batch", "2",
                     "--t-pad", "32", "--platforms", "cpu", "--check"]) == 0
    # quantized --check stays strict: exact vs the dequantized tree
    out3 = str(tmp_path / "cli-corr-q8.tlas")
    assert cli.main([exp, "-o", out3, "--model", "rewriter", "--batch", "2",
                     "--t-pad", "32", "--platforms", "cpu",
                     "--quantize", "int8", "--check"]) == 0


def test_data_parallel_export_matches_single_device(tmp_path):
    """A dp=2-sharded artifact (params replicated, batch split over a
    2-device mesh — serving's data_parallel layout) decodes identically
    to the single-device artifact. Runs on the conftest-forced 8-CPU
    virtual mesh, validating the multi-chip serving-artifact path without
    TPU hardware."""
    from attention_based_e2e_asr_dnn_tpu.export import ExportedDecoder

    if len(jax.devices()) < 2:
        pytest.skip("needs the forced multi-device CPU mesh")
    params = las_init(jax.random.PRNGKey(0), CFG)
    common = dict(vocab=constants.VOCAB, sos_idx=constants.SOS_IDX,
                  eos_idx=constants.EOS_IDX, pad_idx=constants.PAD_IDX,
                  platforms=("cpu",))
    p1 = str(tmp_path / "dp1.tlas")
    p2 = str(tmp_path / "dp2.tlas")
    save_artifact(p1, export_las_decoder(params, CFG, BATCH, T_PAD,
                                         **common))
    save_artifact(p2, export_las_decoder(params, CFG, BATCH, T_PAD,
                                         data_parallel=2, **common))
    rng = np.random.default_rng(9)
    x = rng.standard_normal((BATCH, T_PAD, 15)).astype(np.float32)
    lx = np.array([32, 20, 9, 4], np.int32)
    d2 = ExportedDecoder(p2)
    assert d2.meta["data_parallel"] == 2
    got = d2.decode_ids(x, lx)
    want = ExportedDecoder(p1).decode_ids(x, lx)
    np.testing.assert_array_equal(got, want)
    # beam + dp: tokens/parents shard on the BATCH axis (1), scores on
    # axis 0; the dp=2 beam artifact must decode identically to the
    # single-device beam artifact (same host backpointer walk)
    b1 = str(tmp_path / "beam-dp1.tlas")
    b2 = str(tmp_path / "beam-dp2.tlas")
    save_artifact(b1, export_las_decoder(params, CFG, BATCH, T_PAD,
                                         beam_size=3, **common))
    save_artifact(b2, export_las_decoder(params, CFG, BATCH, T_PAD,
                                         beam_size=3, data_parallel=2,
                                         **common))
    db2 = ExportedDecoder(b2)
    assert db2.meta["data_parallel"] == 2
    assert db2.meta["beam_size"] == 3
    got_beam = db2.decode_ids(x, lx)
    want_beam = ExportedDecoder(b1).decode_ids(x, lx)
    np.testing.assert_array_equal(got_beam, want_beam)


def test_artifact_transcriber_routes_by_length(tmp_path):
    """Multi-bucket artifact serving: each utterance runs on the smallest
    exported bucket that fits, results come back in request order."""
    from attention_based_e2e_asr_dnn_tpu.export import ArtifactTranscriber

    params = las_init(jax.random.PRNGKey(7), CFG)
    paths = []
    for tp in (32, 16):  # deliberately unsorted
        art = export_las_decoder(
            params, CFG, 2, tp, vocab=constants.VOCAB,
            sos_idx=constants.SOS_IDX, eos_idx=constants.EOS_IDX,
            pad_idx=constants.PAD_IDX, platforms=("cpu",))
        p = str(tmp_path / f"las-{tp}.tlas")
        save_artifact(p, art)
        paths.append(p)
    at = ArtifactTranscriber(paths)
    assert [d.meta["t_pad"] for d in at.buckets] == [16, 32]
    at.warmup()

    rng = np.random.default_rng(5)
    lens = [10, 25, 7, 30, 12]  # 3 -> bucket 16 (2 chunks), 2 -> bucket 32
    feats = [rng.standard_normal((n, 15)).astype(np.float32) for n in lens]
    got = at.transcribe(feats)

    by_pad = {d.meta["t_pad"]: d for d in at.buckets}
    want = [None] * len(feats)
    for pad in (16, 32):
        idx = [i for i, n in enumerate(lens)
               if (n <= 16) == (pad == 16)]
        for s in range(0, len(idx), 2):
            chunk = idx[s:s + 2]
            texts = by_pad[pad].transcribe([feats[i] for i in chunk])
            for i, t in zip(chunk, texts):
                want[i] = t
    assert got == want

    with pytest.raises(ValueError, match="largest exported bucket"):
        at.transcribe([np.zeros((40, 15), np.float32)])
    assert at.max_frames == 32 and at.bucket_t_pads == [16, 32]

    # background warmup + readiness gate (Transcriber.wait_ready contract)
    at2 = ArtifactTranscriber(paths)
    at2.warmup(background=True)
    assert at2.wait_ready(timeout=60.0)

    # a transient warmup failure is retryable — state resets, readiness
    # is not poisoned (sync path included)
    at3 = ArtifactTranscriber(paths)
    orig = at3.buckets[0].decode_ids
    calls = {"n": 0}

    def flaky(x, lx):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("transient device loss")
        return orig(x, lx)

    at3.buckets[0].decode_ids = flaky
    with pytest.raises(RuntimeError, match="warmup failed"):
        at3.warmup()
    with pytest.raises(RuntimeError, match="warmup failed"):
        at3.wait_ready(timeout=0)
    at3.warmup()  # retry succeeds and clears the failure
    assert at3.wait_ready(timeout=0)
    at3.buckets[0].decode_ids = orig

    # buckets exported from different models are rejected at startup
    other = export_las_decoder(
        params, CFG, 2, 16, vocab=list(constants.VOCAB)[::-1],
        sos_idx=constants.SOS_IDX, eos_idx=constants.EOS_IDX,
        pad_idx=constants.PAD_IDX, platforms=("cpu",))
    p_other = str(tmp_path / "other.tlas")
    save_artifact(p_other, other)
    with pytest.raises(ValueError, match="different models"):
        ArtifactTranscriber([paths[0], p_other])


def test_corrector_kind_guard_on_las_artifact(artifact_path):
    from attention_based_e2e_asr_dnn_tpu.export import ExportedCorrector

    path, _ = artifact_path
    with pytest.raises(ValueError, match="kind"):
        ExportedCorrector(path)


def test_gateless_corrector_rejects_margin_and_warmup_covers_corrector(
        tmp_path, artifact_path):
    """gate=False artifacts must not silently discard a margin, and
    ArtifactTranscriber's warmup also compiles the corrector programs."""
    from attention_based_e2e_asr_dnn_tpu.export import (
        ArtifactTranscriber,
        ExportedCorrector,
        export_corrector_from_experiment,
    )
    from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
        RewriterConfig,
    )

    lm_cfg = RewriterConfig(
        vocab_size=30, emb_dim=16, enc_lstm_layers=2, enc_lstm_hid_dim=8,
        att_proj_dim=8, att_heads=2, dec_lstm_hid_dim=12,
        dec_lstm_out_dim=10, CHR_MAX_STEPS=12)
    exp = _make_lm_experiment(str(tmp_path / "lm"), lm_cfg)
    nogate = str(tmp_path / "nogate.tlas")
    export_corrector_from_experiment(exp, nogate, batch=2, t_pad=32,
                                     gate=False, platforms=("cpu",))
    corr = ExportedCorrector(nogate)
    assert corr.meta["gate"] is False
    with pytest.raises(ValueError, match="gate=False"):
        corr.correct(["HELLO"], margin=0.5)
    corr.correct(["HELLO"], margin=0.0)  # explicit ungated use still works

    las_path, _ = artifact_path
    with pytest.raises(ValueError, match="gate=False"):
        ArtifactTranscriber([las_path], corrector=corr, margin=0.5)

    gated = str(tmp_path / "gated.tlas")
    export_corrector_from_experiment(exp, gated, batch=2, t_pad=32,
                                     platforms=("cpu",))
    gcorr = ExportedCorrector(gated)
    seen = []
    orig = gcorr.correct
    gcorr.correct = lambda texts, **kw: (seen.append(texts), orig(texts, **kw))[1]
    at = ArtifactTranscriber([las_path], corrector=gcorr, margin=0.1)
    at.warmup()
    assert seen, "warmup must compile the corrector programs too"
    assert at.wait_ready(timeout=0)


def test_span_corrector_artifact_matches_serving(tmp_path, artifact_path):
    """A span_rewrite artifact bundles the anchored decode + per-token
    scorer; correct(span_family=...) must reproduce serving.Corrector's
    fitted-policy chain exactly — the model-code-free deployment of the
    net-positive mid-regime mechanism."""
    from attention_based_e2e_asr_dnn_tpu.export import (
        ExportedCorrector,
        export_corrector_from_experiment,
    )
    from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
        RewriterConfig,
    )
    from attention_based_e2e_asr_dnn_tpu.serving import Corrector

    lm_cfg = RewriterConfig(
        vocab_size=30, emb_dim=16, enc_lstm_layers=2, enc_lstm_hid_dim=8,
        att_proj_dim=8, att_heads=2, dec_lstm_hid_dim=12,
        dec_lstm_out_dim=10, CHR_MAX_STEPS=12)
    exp = _make_lm_experiment(str(tmp_path / "lm"), lm_cfg)
    out = str(tmp_path / "span.tlas")
    export_corrector_from_experiment(exp, out, batch=2, t_pad=32,
                                     span_rewrite=True, platforms=("cpu",))
    dec = ExportedCorrector(out)
    assert dec.meta["span_fracs"] == [0.25, 0.5, 0.75, 0.9]

    texts = ["HELLO WORLD", "THE CAT", "A", "HI THERE YO"]  # 2 chunks of 2
    for family, margin in (("best", 0.0), ("f75", -1e9), ("conf", -0.5),
                           ("free", -1e9)):
        serv = Corrector(exp, beam_size=0, confidence_margin=margin,
                         batch_size=2, span_rewrite=True,
                         span_family=family)
        got = dec.correct(texts, margin=margin, span_family=family)
        assert got == serv.correct(texts), (family, margin)

    # huge margin -> exact identity through the artifact too
    assert dec.correct(texts, margin=1e9, span_family="best") == texts
    # anchored family preserves the forced prefix of every kept rewrite
    kept = dec.correct(texts, margin=-1e9, span_family="f75")
    for inp, rew in zip(texts, kept):
        alen = int(len(inp) * 0.75)
        assert rew[:alen] == inp[:alen]
    # unknown family + span on a non-span artifact both fail loudly
    with pytest.raises(ValueError, match="span_family"):
        dec.correct(texts, span_family="nope")
    plain = str(tmp_path / "plain.tlas")
    export_corrector_from_experiment(exp, plain, batch=2, t_pad=32,
                                     platforms=("cpu",))
    with pytest.raises(ValueError, match="span programs"):
        ExportedCorrector(plain).correct(texts, span_family="best")

    # the CLI exports + checks a span artifact end-to-end
    import sys
    sys.path.insert(0, "tools")
    try:
        import export_serving as cli
    finally:
        sys.path.pop(0)
    out2 = str(tmp_path / "cli-span.tlas")
    assert cli.main([exp, "-o", out2, "--model", "rewriter", "--batch", "2",
                     "--t-pad", "32", "--platforms", "cpu",
                     "--span-rewrite", "--check"]) == 0
    assert ExportedCorrector(out2)._anchored is not None

    # ArtifactTranscriber chains the span policy (and validates it up
    # front: a plain-gate corrector artifact cannot take a span family)
    from attention_based_e2e_asr_dnn_tpu.export import ArtifactTranscriber

    las_path, _ = artifact_path
    at = ArtifactTranscriber([las_path], corrector=dec, margin=-1e9,
                             span_family="f75")
    feats = [np.random.default_rng(3).standard_normal((12, 15))
             .astype(np.float32)]
    plain_texts = ArtifactTranscriber([las_path]).transcribe(feats)
    assert at.transcribe(feats) == dec.correct(
        plain_texts, margin=-1e9, on_overflow="passthrough",
        span_family="f75")
    with pytest.raises(ValueError, match="span programs"):
        ArtifactTranscriber([las_path], corrector=ExportedCorrector(plain),
                            span_family="f75")
    with pytest.raises(ValueError, match="needs a corrector"):
        ArtifactTranscriber([las_path], span_family="f75")


def test_export_from_experiment_and_cli(tmp_path):
    """Fabricated experiment folder (config.json snapshot + ckpt) exports,
    and the CLI --check path drives the artifact end to end."""
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        save_checkpoint,
    )

    exp = tmp_path / "run"
    (exp / "ckpts").mkdir(parents=True)
    snap = {
        "compute_dtype": "float32",
        "VOCAB": list(constants.VOCAB),
        "SOS_IDX": constants.SOS_IDX,
        "EOS_IDX": constants.EOS_IDX,
        "model": {"configs": {
            "listener_configs": {
                "input_dim": 15, "uniform_hid_dim": 16, "lstm_layers": 1,
                "plstm_layers": 1, "bidirectional": True,
                "init_dropout": 0.0, "mid_dropout": 0.0,
                "final_dropout": 0.0},
            "speller_configs": {
                "att_proj_dim": 8, "att_heads": 1, "att_dropout": 0.0,
                "dec_emb_dim": 16, "dec_emb_dropout": 0.0,
                "dec_lstm_hid_dim": 16, "dec_lstm_out_dim": 8,
                "dec_lstm_dropout": 0.0, "CHR_MAX_STEPS": 12,
                "CHR_PAD_IDX": constants.PAD_IDX,
                "CHR_SOS_IDX": constants.SOS_IDX, "USE_GREEDY": True},
        }},
    }
    with open(exp / "config.json", "w") as fh:
        json.dump(snap, fh)
    params = las_init(jax.random.PRNGKey(1), CFG)
    save_checkpoint(str(exp / "ckpts" / "min-loss-ld-ppl-epoch[3].ckpt"),
                    {"params": params, "epoch": 3})

    out = str(tmp_path / "exp.tlas")
    export_from_experiment(str(exp), out, batch=2, t_pad=16,
                           platforms=("cpu",))
    dec = ExportedDecoder(out)
    assert dec.meta["batch"] == 2 and dec.meta["t_pad"] == 16

    import sys
    sys.path.insert(0, "tools")
    try:
        import export_serving as cli
    finally:
        sys.path.pop(0)
    out2 = str(tmp_path / "cli.tlas")
    assert cli.main([str(exp), "-o", out2, "--batch", "2", "--t-pad", "16",
                     "--platforms", "cpu", "--check"]) == 0
    assert os.path.exists(out2)
    # quantized --check: exact ids vs the in-process step on the artifact's
    # own dequantized tree (advisor round-3 medium finding)
    out3 = str(tmp_path / "cli-q8.tlas")
    assert cli.main([str(exp), "-o", out3, "--batch", "2", "--t-pad", "16",
                     "--platforms", "cpu", "--quantize", "int8",
                     "--check"]) == 0


def _import_tool(name):
    import sys
    sys.path.insert(0, "tools")
    try:
        return __import__(name)
    finally:
        sys.path.pop(0)


def test_export_cli_forwards_span_knobs(monkeypatch, tmp_path):
    """--span-conf-tau/--span-fracs reach the artifact: the fitted policy's
    family names (fNN) and the 'conf' split are DEFINED by these knobs, so
    exporting with other values would deploy a different policy than the
    one lminfer calibrated (review finding, round 4)."""
    import attention_based_e2e_asr_dnn_tpu.export as export_mod

    cli = _import_tool("export_serving")
    seen = {}

    def fake_export(exp, out, **kw):
        seen.update(kw)
        p = tmp_path / "fake.tlas"
        p.write_bytes(b"x")
        return str(p)

    monkeypatch.setattr(export_mod, "export_corrector_from_experiment",
                        fake_export)
    rc = cli.main(["lm_exp", "-o", str(tmp_path / "c.tlas"),
                   "--model", "rewriter", "--span-rewrite",
                   "--span-conf-tau", "0.3", "--span-fracs", "0.33", "0.66"])
    assert rc == 0
    assert seen["span_conf_tau"] == 0.3
    assert seen["span_fracs"] == (0.33, 0.66)
    assert seen["span_rewrite"] is True


def test_export_cli_rejects_span_knobs_without_span_rewrite(tmp_path):
    cli = _import_tool("export_serving")
    with pytest.raises(SystemExit):
        cli.main(["lm_exp", "-o", str(tmp_path / "c.tlas"),
                  "--model", "rewriter", "--span-conf-tau", "0.3"])
