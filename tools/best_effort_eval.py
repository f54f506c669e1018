"""One combined best-effort number: beam + fitted corrector, model-code-free
(VERDICT r4 #7).

Exports the converged LAS run's decode graph twice (greedy and beam-K) plus
the fitted Rewriter corrector as ``.tlas`` artifacts, then decodes the full
dev set through ``ArtifactTranscriber`` — the deployment path a user of the
exported artifacts actually runs (no model code on the host) — and reports
one table:

    greedy | beam | beam + fitted corrector      (dev LD each)

This is the reference's intended two-stage pipeline (reference
README.md:51-53: LAS then a Rewriter that "auto-corrects" its predictions),
which the reference itself never got running (its lminfer is syntactically
broken, src/lminfer.py:13,37) — measured here end-to-end from artifacts.

    python tools/best_effort_eval.py --data-dir /tmp/full100 \
        --run-dir /tmp/fullscale150/las/<ts> --lm-run <chainrefit lm run> \
        --span-family f90 --margin -0.94 --out results/best_effort_fullscale.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _export(exp_folder: str, out: str, batch: int, t_pad: int,
            beam_size: int = 0, model: str = "las",
            span_rewrite: bool = False) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "export_serving.py"),
           exp_folder, "-o", out, "--batch", str(batch),
           "--t-pad", str(t_pad)]
    if model != "las":
        cmd += ["--model", model]
    if beam_size:
        cmd += ["--beam-size", str(beam_size)]
    if span_rewrite:
        cmd += ["--span-rewrite"]
    if model == "rewriter":
        cmd += ["--average"]
    subprocess.run(cmd, check=True)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--run-dir", required=True)
    parser.add_argument("--lm-run", default=None,
                        help="Rewriter experiment dir (fitted corrector); "
                             "omit to skip the corrector row")
    parser.add_argument("--span-family", default=None,
                        help="fitted family from lminfer auto calibration")
    parser.add_argument("--margin", type=float, default=0.0,
                        help="fitted gate margin from lminfer")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--beam-size", type=int, default=8)
    parser.add_argument("--split", default="dev-clean")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import tempfile

    work = args.work_dir or tempfile.mkdtemp(prefix="besteffort-")
    os.makedirs(work, exist_ok=True)

    # dev set + the t_pad that covers its longest utterance
    mfcc_dir = os.path.join(args.data_dir, args.split, "mfcc")
    trans_dir = os.path.join(args.data_dir, args.split, "transcript", "raw")
    files = sorted(f for f in os.listdir(mfcc_dir) if f.endswith(".npy"))
    feats = [np.load(os.path.join(mfcc_dir, f)) for f in files]
    golds = ["".join(str(c) for c in np.load(
        os.path.join(trans_dir, f))[1:-1]) for f in files]
    t_max = max(f.shape[0] for f in feats)
    t_pad = int(-(-t_max // 128) * 128)
    print(f"[best_effort] {len(feats)} utterances, longest {t_max} frames "
          f"-> t_pad {t_pad}")

    greedy_art = _export(args.run_dir, os.path.join(work, "las-greedy.tlas"),
                         args.batch, t_pad)
    beam_art = _export(args.run_dir, os.path.join(work, "las-beam.tlas"),
                       args.batch, t_pad, beam_size=args.beam_size)
    corr_art = None
    if args.lm_run:
        corr_art = _export(args.lm_run, os.path.join(work, "corr.tlas"),
                           32, 320, model="rewriter",
                           span_rewrite=args.span_family is not None)

    from attention_based_e2e_asr_dnn_tpu.export import (
        ArtifactTranscriber,
        ExportedCorrector,
    )
    from attention_based_e2e_asr_dnn_tpu.utils.levenshtein import levenshtein

    def decode_all(transcriber) -> list:
        out = []
        for i in range(0, len(feats), args.batch):
            out.extend(transcriber.transcribe(feats[i:i + args.batch]))
        return out

    def mean_ld(preds) -> float:
        return float(np.mean([levenshtein(p, g)
                              for p, g in zip(preds, golds)]))

    result = {"run_dir": args.run_dir, "lm_run": args.lm_run,
              "split": args.split, "n_utts": len(feats),
              "beam_size": args.beam_size,
              "span_family": args.span_family, "margin": args.margin}

    greedy_preds = decode_all(ArtifactTranscriber(greedy_art))
    result["greedy_dev_ld"] = mean_ld(greedy_preds)
    print(f"[best_effort] greedy dev LD {result['greedy_dev_ld']:.3f}")

    beam_preds = decode_all(ArtifactTranscriber(beam_art))
    result["beam_dev_ld"] = mean_ld(beam_preds)
    print(f"[best_effort] beam-{args.beam_size} dev LD "
          f"{result['beam_dev_ld']:.3f}")

    if corr_art:
        corrector = ExportedCorrector(corr_art)
        chained = ArtifactTranscriber(
            beam_art, corrector=corrector, margin=args.margin,
            span_family=args.span_family)
        chain_preds = decode_all(chained)
        result["beam_corrector_dev_ld"] = mean_ld(chain_preds)
        print(f"[best_effort] beam+corrector dev LD "
              f"{result['beam_corrector_dev_ld']:.3f} "
              f"(family {args.span_family}, margin {args.margin})")

    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"[best_effort] written {args.out}")


if __name__ == "__main__":
    main()
