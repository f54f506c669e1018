"""Export a trained experiment's decode graph to a deployable .tlas artifact.

    python tools/export_serving.py experiments/<run> -o las-b8-t512.tlas \
        --batch 8 --t-pad 512 [--beam-size 8] [--average] [--check]
    python tools/export_serving.py lm_experiments/<run> -o corr.tlas \
        --model rewriter --t-pad 256 [--no-gate]

``--check`` reloads the artifact through ExportedDecoder/ExportedCorrector
(model-code-free path) and verifies it reproduces the in-process serving
step's output on random input.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python tools/<name>.py` without an editable install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("exp_folder")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--model", choices=["las", "rewriter"], default="las")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t-pad", type=int, default=512)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--average", action="store_true")
    ap.add_argument("--beam-size", type=int, default=0)
    ap.add_argument("--length-alpha", type=float, default=0.0)
    ap.add_argument("--max-len-factor", type=float, default=3.0)
    ap.add_argument("--no-gate", action="store_true",
                    help="rewriter only: skip the never-worse scorer")
    ap.add_argument("--span-rewrite", action="store_true",
                    help="rewriter only: also bundle the prefix-anchored "
                         "decode + per-token confidence scorer so the "
                         "fitted span policy runs model-code-free "
                         "(correct(span_family=...))")
    ap.add_argument("--span-conf-tau", type=float, default=0.5,
                    help="with --span-rewrite: the 'conf' family's "
                         "per-token confidence threshold — MUST match the "
                         "lminfer span_conf_tau the policy was fitted with")
    ap.add_argument("--span-fracs", type=float, nargs="+",
                    default=[0.25, 0.5, 0.75, 0.9],
                    help="with --span-rewrite: fixed-fraction anchor "
                         "families (fNN names) — MUST match the lminfer "
                         "span_fracs the policy was fitted with")
    ap.add_argument("--data-parallel", type=int, default=1,
                    help="las only (greedy or beam): export sharded over an "
                         "N-device dp mesh (requires N devices wherever it "
                         "runs)")
    ap.add_argument("--quantize", choices=["int8"], default=None,
                    help="weights-only int8: large matrices stored int8 + "
                         "per-channel scales, dequantize baked into the "
                         "program (size/upload win; see quantize.py)")
    ap.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args(argv)
    if args.span_rewrite and args.model != "rewriter":
        ap.error("--span-rewrite applies to --model rewriter")
    if args.span_rewrite and args.no_gate:
        ap.error("--span-rewrite requires the gate scorer (drop --no-gate)")
    if not args.span_rewrite and (args.span_conf_tau != 0.5
                                  or args.span_fracs != [0.25, 0.5, 0.75,
                                                         0.9]):
        ap.error("--span-conf-tau/--span-fracs only apply with "
                 "--span-rewrite (they name the candidate families the "
                 "fitted policy points into)")

    # tracing/lowering touches the pinned device backend — fail fast with
    # a diagnostic when it is down instead of hanging in backend init
    from attention_based_e2e_asr_dnn_tpu.utils.backend import probe_backend

    if not probe_backend():
        print("device backend unavailable (tunnel down?) — export needs "
              "a live backend to trace the decode graph", file=sys.stderr)
        return 3

    from attention_based_e2e_asr_dnn_tpu.export import (
        ExportedCorrector,
        ExportedDecoder,
        export_corrector_from_experiment,
        export_from_experiment,
    )

    if args.model == "rewriter":
        path = export_corrector_from_experiment(
            args.exp_folder, args.output, batch=args.batch,
            t_pad=args.t_pad, checkpoint=args.checkpoint,
            average=args.average, beam_size=args.beam_size,
            length_alpha=args.length_alpha,
            max_len_factor=args.max_len_factor, gate=not args.no_gate,
            span_rewrite=args.span_rewrite,
            span_conf_tau=args.span_conf_tau,
            span_fracs=tuple(args.span_fracs),
            quantize=args.quantize, platforms=tuple(args.platforms),
        )
        print(f"exported -> {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
        if args.check:
            from attention_based_e2e_asr_dnn_tpu.serving import Corrector

            corr = Corrector(args.exp_folder, checkpoint=args.checkpoint,
                             average=args.average, beam_size=args.beam_size,
                             length_alpha=args.length_alpha,
                             max_len_factor=args.max_len_factor,
                             gate=not args.no_gate, batch_size=args.batch)
            texts = ["HELLO WORLD", "THE CAT SAT", "A"]
            exported = ExportedCorrector(path)
            got = exported.correct(texts)
            if args.quantize:
                # the artifact's only behavior delta vs in-process is the
                # bounded weight rounding: rerun the in-process Corrector on
                # the artifact's own dequantized tree — parity is exact
                # (tests/test_quantize.py proves this for the program), so a
                # mismatch here is a real export bug, not quantization noise
                import jax
                import jax.numpy as jnp

                from attention_based_e2e_asr_dnn_tpu.quantize import (
                    dequantize_tree,
                )

                corr.params = jax.tree.map(
                    jnp.asarray, dequantize_tree(exported.params))
                want = corr.correct(texts)
                if got != want:
                    print(f"check FAILED (quantized): artifact corrections "
                          f"{got!r} != in-process on the dequantized tree "
                          f"{want!r}")
                    return 1
                print(f"check: quantized artifact matches the in-process "
                      f"Corrector on its dequantized weights exactly "
                      f"({len(texts)} texts)")
            elif got != (want := corr.correct(texts)):
                print(f"check FAILED: artifact corrections {got!r} != "
                      f"in-process {want!r}")
                return 1
            else:
                print(f"check: artifact corrections match the in-process "
                      f"Corrector exactly ({len(texts)} texts)")
        return 0

    path = export_from_experiment(
        args.exp_folder, args.output, batch=args.batch, t_pad=args.t_pad,
        checkpoint=args.checkpoint, average=args.average,
        beam_size=args.beam_size, length_alpha=args.length_alpha,
        max_len_factor=args.max_len_factor,
        data_parallel=args.data_parallel, quantize=args.quantize,
        platforms=tuple(args.platforms),
    )
    print(f"exported -> {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

    if args.check:
        import numpy as np
        import jax
        import jax.numpy as jnp

        from attention_based_e2e_asr_dnn_tpu.models.las import (
            las_config_from_dicts,
        )
        from attention_based_e2e_asr_dnn_tpu.serving import load_experiment

        dec = ExportedDecoder(path)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(
            (args.batch, args.t_pad, dec.meta["input_dim"])
        ).astype(np.float32)
        lx = rng.integers(args.t_pad // 2, args.t_pad + 1,
                          args.batch).astype(np.int32)
        got = dec.decode_ids(x, lx)

        # the in-process serving step on the same checkpoint must agree
        snap, payload = load_experiment(args.exp_folder, args.checkpoint,
                                        args.average)
        cfg = las_config_from_dicts(
            snap.model.configs["listener_configs"],
            snap.model.configs["speller_configs"])
        cdt = jnp.dtype(getattr(snap, "compute_dtype", "float32"))
        if args.quantize:
            # compare against the in-process step on the artifact's OWN
            # dequantized tree: the quantized program equals that exactly
            # (tests/test_quantize.py::test_quantized_artifact_program_parity
            # _and_size), so this check stays strict under --quantize
            from attention_based_e2e_asr_dnn_tpu.quantize import (
                dequantize_tree,
            )

            params = jax.tree.map(jnp.asarray, dequantize_tree(dec.params))
        else:
            params = jax.tree.map(jnp.asarray, payload["params"])
        if args.beam_size > 1:
            from attention_based_e2e_asr_dnn_tpu.decoding.beam import (
                make_las_beam_step,
            )

            step = make_las_beam_step(
                cfg, beam_size=args.beam_size,
                length_alpha=args.length_alpha, compute_dtype=cdt,
                max_len_factor=args.max_len_factor)
        else:
            from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (
                make_las_greedy_step,
            )

            step = make_las_greedy_step(
                cfg, compute_dtype=cdt,
                max_len_factor=args.max_len_factor)
        want = np.asarray(step(params, jnp.asarray(x), jnp.asarray(lx)))
        if not np.array_equal(got, want):
            n_bad = int((got != want).any(axis=-1).sum())
            print(f"check FAILED: artifact ids differ from the in-process "
                  f"step on {n_bad}/{args.batch} rows")
            return 1
        print(f"check: artifact ids match the in-process decode exactly "
              f"({args.batch} rows x {got.shape[1]} steps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
