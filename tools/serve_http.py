"""Serve a trained experiment — or exported artifacts — over HTTP.

    python tools/serve_http.py experiments/<run> --port 8080 \
        [--batch-size 32] [--beam-size 8] [--warmup 256 512 1024 1536] \
        [--corrector lm_experiments/<run>] [--data-parallel N]

    python tools/serve_http.py --artifact las-b8-t256.tlas \
        --artifact las-b8-t512.tlas [--corrector-artifact corr.tlas] \
        --port 8080        # model-code-free host: .tlas files only

Gates traffic on readiness when a warmup ladder is given (the first/largest
bucket compiles before "ready"); POST /v1/transcribe afterwards.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python tools/<name>.py` without an editable install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("exp_folder", nargs="?", default=None)
    ap.add_argument("--artifact", action="append", default=None,
                    help="serve from exported .tlas bucket(s) instead of "
                         "an experiment folder (repeatable)")
    ap.add_argument("--corrector-artifact", default=None,
                    help="rewriter .tlas for gated auto-correction")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--average", action="store_true")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--pad-time-multiple", type=int, default=128)
    ap.add_argument("--beam-size", type=int, default=0)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--warmup", type=int, nargs="*", default=None,
                    help="bucket ladder (frame counts) to precompile")
    ap.add_argument("--corrector", default=None,
                    help="LM experiment folder for gated auto-correction")
    ap.add_argument("--corrector-margin", type=float, default=0.0,
                    help="score margin for the never-worse gate (fit one "
                         "with lminfer confidence_margin: auto)")
    ap.add_argument("--corrector-span-family", default=None,
                    help="deploy the fitted span-rewrite policy: candidate "
                         "family name printed by lminfer's auto "
                         "calibration (e.g. f90, conf, best, free). Works "
                         "with --corrector (experiment mode) and with "
                         "--corrector-artifact exported --span-rewrite")
    ap.add_argument("--corrector-span-conf-tau", type=float, default=0.5,
                    help="confidence threshold for the 'conf' anchor family "
                         "— must match the value lminfer calibrated with "
                         "(span_conf_tau); experiment mode only (artifacts "
                         "bake it into meta at export time)")
    ap.add_argument("--corrector-span-fracs", type=float, nargs="+",
                    default=[0.25, 0.5, 0.75, 0.9],
                    help="fraction-anchor candidate set (fNN families) — "
                         "must match lminfer's span_fracs calibration knob; "
                         "experiment mode only")
    ap.add_argument("--data-parallel", type=int, default=1)
    args = ap.parse_args(argv)

    from attention_based_e2e_asr_dnn_tpu.server import AsrHttpServer

    if bool(args.exp_folder) == bool(args.artifact):
        ap.error("give exactly one of: an experiment folder, or --artifact")

    # fail fast at startup: a dead device backend would otherwise bind a
    # server whose every request hangs in uninterruptible backend init
    from attention_based_e2e_asr_dnn_tpu.utils.backend import probe_backend

    if not probe_backend():
        print("device backend unavailable (tunnel down?) — refusing to "
              "start a server that would hang every request",
              file=sys.stderr)
        return 3
    if args.exp_folder and args.warmup == []:
        ap.error("experiment-mode --warmup needs at least one bucket frame "
                 "count (e.g. --warmup 512 1024); bare --warmup only means "
                 "something in --artifact mode, where buckets are baked in")

    if args.artifact:
        # reject experiment-only flags instead of silently ignoring them —
        # an operator passing --corrector here would otherwise serve with
        # NO correction gate and no warning
        ignored = [flag for flag, val in [
            ("--corrector", args.corrector),
            ("--corrector-span-family",
             args.corrector_span_family
             if not args.corrector_artifact else None),
            ("--corrector-margin",
             args.corrector_margin
             if not args.corrector_artifact else None),
            ("--corrector-span-conf-tau",
             args.corrector_span_conf_tau
             if args.corrector_span_conf_tau != 0.5 else None),
            ("--corrector-span-fracs",
             args.corrector_span_fracs
             if args.corrector_span_fracs != [0.25, 0.5, 0.75, 0.9]
             else None),
            ("--checkpoint", args.checkpoint),
            ("--average", args.average or None),
            ("--beam-size", args.beam_size or None),
            ("--batch-size",
             args.batch_size if args.batch_size != 32 else None),
            ("--pad-time-multiple",
             args.pad_time_multiple if args.pad_time_multiple != 128
             else None),
            ("--data-parallel",
             args.data_parallel if args.data_parallel != 1 else None),
        ] if val]
        if args.warmup:  # values are frame counts for experiment mode only
            ignored.append("--warmup <values>")
        if ignored:
            ap.error(f"{', '.join(ignored)} appl{'y' if len(ignored) > 1 else 'ies'} "
                     f"to experiment-folder serving, not --artifact mode "
                     f"(use --corrector-artifact for artifact correction; "
                     f"beam/checkpoint choices are baked in at export time)")

        from attention_based_e2e_asr_dnn_tpu.export import (
            ArtifactTranscriber,
            ExportedCorrector,
        )

        corrector = (ExportedCorrector(args.corrector_artifact)
                     if args.corrector_artifact else None)
        transcriber = ArtifactTranscriber(
            args.artifact, corrector=corrector,
            margin=args.corrector_margin,
            span_family=args.corrector_span_family)
        if args.warmup is not None:
            # background: the HTTP server binds first; /readyz gates
            transcriber.warmup(background=True)
    else:
        if args.corrector_artifact:
            ap.error("--corrector-artifact applies to --artifact mode; "
                     "use --corrector <lm_experiment> here")
        if args.corrector is None and (args.corrector_span_family is not None
                                       or args.corrector_margin):
            # mirror the artifact-mode strictness: these flags without a
            # corrector would silently serve with NO correction at all
            ap.error("--corrector-span-family/--corrector-margin need "
                     "--corrector <lm_experiment> in experiment mode")
        from attention_based_e2e_asr_dnn_tpu.serving import (
            Corrector,
            Transcriber,
        )

        corrector = None
        if args.corrector:
            span = args.corrector_span_family
            # tau/fracs must match what lminfer calibrated with — defaults
            # here would otherwise silently serve a DIFFERENT candidate set
            # than the fitted policy was chosen over (ADVICE r4)
            corrector = Corrector(args.corrector,
                                  confidence_margin=args.corrector_margin,
                                  span_rewrite=span is not None,
                                  span_family=span or "best",
                                  span_conf_tau=args.corrector_span_conf_tau,
                                  span_fracs=tuple(args.corrector_span_fracs))
        transcriber = Transcriber(
            args.exp_folder,
            checkpoint=args.checkpoint,
            average=args.average,
            beam_size=args.beam_size,
            batch_size=args.batch_size,
            pad_time_multiple=args.pad_time_multiple,
            auto_warmup=args.warmup,
            data_parallel=args.data_parallel,
            corrector=corrector,
        )
    # bind FIRST: /healthz answers during warmup and /readyz gates traffic
    # (a readiness probe that can't connect looks like a dead pod)
    server = AsrHttpServer(transcriber, host=args.host, port=args.port,
                           max_wait_ms=args.max_wait_ms).start()
    print(f"listening on {server.host}:{server.port}"
          + (" (readiness gated on warmup via /readyz)"
             if args.warmup is not None else ""), flush=True)
    if args.warmup is not None:
        import threading

        def _announce():
            try:
                transcriber.wait_ready()
                print("ready: first warmup bucket compiled", flush=True)
            except RuntimeError as exc:
                print(f"warmup FAILED: {exc}", flush=True)

        threading.Thread(target=_announce, daemon=True).start()
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
