"""Migrate checkpoints between the reference (PyTorch) and this framework.

Import a reference ``.pt`` (src/train.py:352 payload or a bare state_dict)
into our data-only ``.ckpt`` format, ready for ``infer.py`` / resume::

    python tools/import_reference_ckpt.py las     min-loss-epoch[42].pt -o las.ckpt
    python tools/import_reference_ckpt.py rewriter lm.pt                -o lm.ckpt

Export back to reference naming (loadable with ``load_state_dict`` strict)::

    python tools/import_reference_ckpt.py las our.ckpt -o ref.pt --export
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python tools/<name>.py` without an editable install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", choices=["las", "rewriter"])
    ap.add_argument("input", help=".pt (import) or .ckpt (with --export)")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument(
        "--export", action="store_true",
        help="reverse direction: our .ckpt -> reference-named .pt",
    )
    args = ap.parse_args(argv)

    from attention_based_e2e_asr_dnn_tpu import compat
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )

    if args.export:
        import torch

        params = load_checkpoint(args.input)["params"]
        to_sd = (
            compat.state_dict_from_las_params
            if args.model == "las"
            else compat.state_dict_from_rewriter_params
        )
        sd = {k: torch.from_numpy(v.copy()) for k, v in to_sd(params).items()}
        torch.save({"model_state_dict": sd}, args.output)
        print(f"exported {len(sd)} tensors -> {args.output}")
    else:
        sd = compat.load_torch_state_dict(args.input)
        from_sd = (
            compat.las_params_from_state_dict
            if args.model == "las"
            else compat.rewriter_params_from_state_dict
        )
        params = from_sd(sd)
        save_checkpoint(
            args.output,
            {"params": params, "epoch": 0, "source": f"reference:{args.input}"},
        )
        print(f"imported {len(sd)} tensors -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
