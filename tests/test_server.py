"""HTTP serving front end (server.py): API contract + parity with the
underlying Transcriber."""

import json
import os
import urllib.error
import urllib.request

import numpy as np
import pytest
import jax

from attention_based_e2e_asr_dnn_tpu import constants
from attention_based_e2e_asr_dnn_tpu.models.las import (
    LASConfig,
    ListenerConfig,
    SpellerConfig,
    las_init,
)
from attention_based_e2e_asr_dnn_tpu.server import AsrHttpServer
from attention_based_e2e_asr_dnn_tpu.serving import Transcriber
from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
    save_checkpoint,
)

CFG = LASConfig(
    listener=ListenerConfig(input_dim=15, uniform_hid_dim=16, lstm_layers=1,
                            plstm_layers=1),
    speller=SpellerConfig(enc_out_dim=32, att_proj_dim=8, att_heads=1,
                          dec_emb_dim=16, dec_lstm_hid_dim=16,
                          dec_lstm_out_dim=8, CHR_MAX_STEPS=12),
)


def _make_experiment(root):
    os.makedirs(os.path.join(root, "ckpts"))
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
    with open(os.path.join(root, "config.json"), "w") as fh:
        json.dump(snap, fh)
    save_checkpoint(os.path.join(root, "ckpts",
                                 "min-loss-ld-ppl-epoch[1].ckpt"),
                    {"params": las_init(jax.random.PRNGKey(0), CFG),
                     "epoch": 1})
    return root


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload, raw: bytes = None):
    data = raw if raw is not None else json.dumps(payload).encode()
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    run_dir = _make_experiment(str(tmp_path_factory.mktemp("exp") / "run"))
    t = Transcriber(run_dir, batch_size=4, pad_time_multiple=16)
    server = AsrHttpServer(t, port=0, max_wait_ms=5.0).start()
    yield server, t
    server.close()


def test_health_ready_meta(http_server):
    server, t = http_server
    base = f"http://127.0.0.1:{server.port}"
    assert _get(f"{base}/healthz") == (200, {"ok": True})
    code, body = _get(f"{base}/readyz")
    assert code == 200 and body["ready"]  # no warmup ladder -> always ready
    code, meta = _get(f"{base}/v1/meta")
    assert code == 200
    assert meta["input_dim"] == 15 and meta["batch_size"] == 4
    assert meta["corrector"] is False
    assert _get(f"{base}/nope")[0] == 404


def test_transcribe_single_and_batch_match_direct(http_server):
    server, t = http_server
    base = f"http://127.0.0.1:{server.port}"
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((n, 15)).astype(np.float32)
             for n in (20, 9, 14)]
    want = t.transcribe(feats)

    code, body = _post(f"{base}/v1/transcribe",
                       {"features": feats[0].tolist()})
    assert code == 200 and body["transcript"] == want[0]

    code, body = _post(f"{base}/v1/transcribe", {
        "instances": [{"features": f.tolist()} for f in feats]})
    assert code == 200 and body["transcripts"] == want


def test_features_b64_wire_format(http_server):
    """base64 float32 payloads decode to the same transcripts as the JSON
    list form; malformed/ragged payloads 400."""
    import base64

    server, t = http_server
    url = f"http://127.0.0.1:{server.port}/v1/transcribe"
    rng = np.random.default_rng(3)
    f = rng.standard_normal((17, 15)).astype(np.float32)
    _, want = _post(url, {"features": f.tolist()})
    b64 = base64.b64encode(f.astype("<f4").tobytes()).decode()
    code, got = _post(url, {"features_b64": b64})
    assert code == 200 and got == want
    code, got = _post(url, {"instances": [{"features_b64": b64},
                                          {"features": f.tolist()}]})
    assert code == 200 and got["transcripts"] == [want["transcript"]] * 2

    assert _post(url, {"features_b64": "!!!not-base64!!!"})[0] == 400
    ragged = base64.b64encode(b"\x00" * 61).decode()  # not /60
    code, body = _post(url, {"features_b64": ragged})
    assert code == 400 and "float32" in body["error"]


def test_concurrent_posts_are_batched_and_ordered(http_server):
    server, t = http_server
    base = f"http://127.0.0.1:{server.port}"
    rng = np.random.default_rng(1)
    feats = [rng.standard_normal((10 + i, 15)).astype(np.float32)
             for i in range(6)]
    want = t.transcribe(feats)

    import threading

    results = [None] * len(feats)

    def hit(i):
        _, body = _post(f"{base}/v1/transcribe",
                        {"features": feats[i].tolist()})
        results[i] = body["transcript"]

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(feats))]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert results == want


def test_error_statuses(http_server):
    server, _ = http_server
    base = f"http://127.0.0.1:{server.port}"
    url = f"{base}/v1/transcribe"
    assert _post(url, None, raw=b"{not json")[0] == 400
    assert _post(url, {"nope": 1})[0] == 400
    code, body = _post(url, {"features": [[1.0] * 14] * 5})
    assert code == 400 and "input_dim" in body["error"]
    assert _post(url, {"features": [1.0, 2.0]})[0] == 400
    assert _post(url, {"instances": []})[0] == 400
    code, _ = _post(url, {"instances": [
        {"features": [[0.0] * 15] * 2}] * 257})
    assert code == 413
    assert _post(f"{base}/other", {})[0] == 404


def test_metrics_endpoint(http_server):
    """Prometheus exposition: request counts by status, utterance totals,
    latency histogram invariants."""
    server, t = http_server
    base = f"http://127.0.0.1:{server.port}"
    rng = np.random.default_rng(7)
    _post(f"{base}/v1/transcribe", {"instances": [
        {"features": rng.standard_normal((8, 15)).tolist()}
        for _ in range(3)]})
    _post(f"{base}/v1/transcribe", {"nope": 1})  # a 400

    import urllib.request
    with urllib.request.urlopen(f"{base}/metrics", timeout=30) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    lines = dict()
    for ln in text.splitlines():
        if ln and not ln.startswith("#"):
            k, v = ln.rsplit(" ", 1)
            lines[k] = float(v)
    assert lines['asr_requests_total{status="200"}'] >= 1
    assert lines['asr_requests_total{status="400"}'] >= 1
    assert lines["asr_utterances_total"] >= 3
    assert lines["asr_request_seconds_count"] >= 2
    assert lines["asr_request_seconds_sum"] > 0
    assert (lines['asr_request_seconds_bucket{le="+Inf"}']
            == lines["asr_request_seconds_count"])
    assert lines["asr_in_flight"] == 0


def test_body_size_cap(http_server):
    server, _ = http_server
    url = f"http://127.0.0.1:{server.port}/v1/transcribe"
    old = server.max_body_bytes
    server.max_body_bytes = 64
    try:
        code, body = _post(url, {"features": [[0.0] * 15] * 20})
        assert code == 413 and "limit 64" in body["error"]
    finally:
        server.max_body_bytes = old


def test_http_serving_from_artifact(tmp_path):
    """The HTTP endpoint runs over exported artifacts (model-code-free
    serving host): same API, transcripts equal the artifact's own."""
    from attention_based_e2e_asr_dnn_tpu.export import (
        ArtifactTranscriber,
        export_las_decoder,
        save_artifact,
    )
    from attention_based_e2e_asr_dnn_tpu.models.las import las_init

    params = las_init(jax.random.PRNGKey(3), CFG)
    art = export_las_decoder(
        params, CFG, 2, 32, vocab=constants.VOCAB,
        sos_idx=constants.SOS_IDX, eos_idx=constants.EOS_IDX,
        pad_idx=constants.PAD_IDX, platforms=("cpu",))
    p = str(tmp_path / "las.tlas")
    save_artifact(p, art)
    at = ArtifactTranscriber([p])
    server = AsrHttpServer(at, port=0, max_wait_ms=5.0).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        assert _get(f"{base}/readyz")[0] == 200
        rng = np.random.default_rng(2)
        feats = [rng.standard_normal((n, 15)).astype(np.float32)
                 for n in (20, 9)]
        want = at.transcribe(feats)
        code, body = _post(f"{base}/v1/transcribe", {
            "instances": [{"features": f.tolist()} for f in feats]})
        assert code == 200 and body["transcripts"] == want
        code, meta = _get(f"{base}/v1/meta")
        assert meta["input_dim"] == 15 and meta["corrector"] is False
        assert meta["max_frames"] == 32 and meta["buckets"] == [32]
        # over-capacity requests 400 BEFORE batching (a raise inside the
        # shared batch would 500 innocent co-batched requests)
        code, body = _post(f"{base}/v1/transcribe",
                           {"features": [[0.0] * 15] * 40})
        assert code == 400 and "capacity" in body["error"]
    finally:
        server.close()


def test_negative_content_length_rejected(http_server):
    """A negative Content-Length must 400 immediately — read(-1) would
    block the handler thread until the client hangs up (DoS)."""
    import http.client

    server, _ = http_server
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=15)
    try:
        conn.putrequest("POST", "/v1/transcribe")
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"Content-Length" in resp.read()
    finally:
        conn.close()


def test_readyz_surfaces_warmup_failure(http_server):
    """A dead background warmup must yield a 503 JSON body, not a dropped
    connection."""
    server, t = http_server
    base = f"http://127.0.0.1:{server.port}"
    orig = t.wait_ready
    t.wait_ready = lambda timeout=None: (_ for _ in ()).throw(
        RuntimeError("background auto-warmup failed"))
    try:
        code, body = _get(f"{base}/readyz")
        assert code == 503
        assert body["ready"] is False and "auto-warmup" in body["error"]
    finally:
        t.wait_ready = orig


def test_serve_http_rejects_corrector_flags_without_corrector(tmp_path):
    """Experiment mode must error on --corrector-span-family /
    --corrector-margin without --corrector — silently serving with no
    correction at all is the exact hole artifact mode already rejects."""
    import sys

    sys.path.insert(0, "tools")
    try:
        import serve_http as cli
    finally:
        sys.path.pop(0)
    with pytest.raises(SystemExit):
        cli.main([str(tmp_path), "--corrector-span-family", "f90"])
    with pytest.raises(SystemExit):
        cli.main([str(tmp_path), "--corrector-margin", "0.2"])
