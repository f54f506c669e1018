"""Serving latency/throughput bench: cold mixed-length stream + P50/P99.

Round-2 baseline: a COLD mixed-length stream ran 46.6 utt/s vs 484 warm —
every unseen (batch, t_pad) bucket stalled the stream on a compile. The
round-3 hardening (Transcriber auto-warmup ladder, largest-first + route-up
to warm buckets; serving.py) is measured here:

    python tools/serving_bench.py --exp <experiment-dir> [--n 256]

Prints one JSON line:
  ready_s        — startup cost: construct the Transcriber and wait_ready()
                   (largest bucket warm, every request can route up to it —
                   a deployment gates traffic on this, like a k8s readiness
                   probe)
  cold_utt_s     — throughput of the READY server on its first mixed-length
                   stream (route-up engaged; tighter buckets still cold)
  warm_utt_s     — same stream again, the full bucket ladder warm
  p50_ms/p99_ms  — per-request latency through the StreamingTranscriber
                   batching queue at a steady trickle

Note the measurement environment: the first-ever compile of each program
shape pays a 200-500 s deferred remote compile through the axon tunnel
(persistent cache makes reruns ~3 s/shape); production TPU hosts compile
locally in ~10-30 s and deployments ship a populated persistent cache, so
ready_s here is tunnel-dominated, not a property of the server design.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_stream(n: int, n_feats: int, seed: int = 0):
    """Mixed-length utterances spanning several time buckets."""
    rng = np.random.default_rng(seed)
    lengths = rng.integers(200, 1537, size=(n,))
    return [rng.normal(size=(int(t), n_feats)).astype(np.float32) * 0.5
            for t in lengths]


def main():
    from attention_based_e2e_asr_dnn_tpu.utils.backend import probe_backend

    if not probe_backend():
        print("device backend unavailable (tunnel down) — aborting",
              file=sys.stderr)
        sys.exit(3)
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--pad-time-multiple", type=int, default=256)
    args = ap.parse_args()

    from attention_based_e2e_asr_dnn_tpu.serving import (
        StreamingTranscriber,
        Transcriber,
    )

    ladder = list(range(args.pad_time_multiple, 1537,
                        args.pad_time_multiple))
    t0 = time.perf_counter()
    t = Transcriber(args.exp, batch_size=args.batch_size,
                    pad_time_multiple=args.pad_time_multiple,
                    auto_warmup=ladder)
    t.wait_ready()
    ready_s = time.perf_counter() - t0

    feats = make_stream(args.n, t.n_feats)

    # cold stream on the READY server: the largest bucket is warm so every
    # batch routes up to a compiled program; the background ladder yields
    # to this burst and fills the tighter buckets in afterwards
    t0 = time.perf_counter()
    cold_preds = t.transcribe(feats)
    cold_s = args.n / (time.perf_counter() - t0)

    t.wait_warm()
    t0 = time.perf_counter()
    warm_preds = t.transcribe(feats)
    warm_s = args.n / (time.perf_counter() - t0)
    same = sum(a == b for a, b in zip(cold_preds, warm_preds)) / args.n

    # steady-trickle latency through the batching queue
    st = StreamingTranscriber(t, max_wait_ms=15.0)
    lat = []
    for f in feats[:min(args.n, 128)]:
        s = time.perf_counter()
        st.submit(f).result(timeout=600)
        lat.append((time.perf_counter() - s) * 1e3)
    st.close()
    lat = np.array(lat)

    print(json.dumps({
        "ready_s": round(ready_s, 2),
        "cold_utt_s": round(cold_s, 2),
        "warm_utt_s": round(warm_s, 2),
        "cold_warm_accuracy_match": round(same, 4),
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
        "n": args.n,
    }))


if __name__ == "__main__":
    main()
