"""Re-fit the span-rewrite policy on a NEW run's milestones (VERDICT r4 #6).

Round 4 calibrated the fitted rewrite policy on one corpus and one recipe
run. This driver shows the PROCEDURE generalizes: given any finished LAS
experiment (e.g. the full-scale 150-epoch run from tools/fullscale_run.py),
it re-drives the whole milestone -> Rewriter -> fitted-policy chain through
the same lmtrain/lminfer CLIs with ZERO code changes, and reports held-out
test LD per operating point:

  for each requested milestone epoch M:
    1. decode train/dev/test prediction CSVs with milestone M
       (the reference's Rewriter-data generation step, src/train.py:323)
    2. lmtrain the corrector on (train predictions, gold transcripts)
    3. lminfer the TEST csv three ways:
         margin-0 free rewrite   (the unguarded chain)
         auto margin, no spans   (the round-3 chain)
         auto policy + spans     (the round-4 fitted policy; CAL = dev pairs)
    4. record input/corrected test LD per mode

Usage:
    python tools/chain_refit.py --data-dir /tmp/full100 \
        --run-dir /tmp/fullscale150/las/<ts> \
        --milestones 9 19 29 --out results/chain_refit_fullscale.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

from tools.full_recipe_run import dev_ld_of_csv, rewriter_config, run_infer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--run-dir", required=True,
                        help="finished LAS experiment dir (config.json, "
                             "ckpts/); milestones live in ../../milestones")
    parser.add_argument("--milestone-dir", default=None)
    parser.add_argument("--milestones", type=int, nargs="+", default=[9, 19, 29])
    parser.add_argument("--lm-epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--lm-max-steps", type=int, default=288,
                        help="corrector decode cap — must cover the "
                             "corpus's longest transcript")
    parser.add_argument("--lm-beam", type=int, default=8)
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import tempfile

    work = args.work_dir or tempfile.mkdtemp(prefix="chainrefit-")
    os.makedirs(work, exist_ok=True)
    mst_dir = args.milestone_dir or os.path.join(
        os.path.dirname(os.path.dirname(args.run_dir)), "las", "milestones")
    if not os.path.isdir(mst_dir):
        mst_dir = os.path.join(os.path.dirname(args.run_dir), "milestones")

    from attention_based_e2e_asr_dnn_tpu import lminfer as lminfer_mod
    from attention_based_e2e_asr_dnn_tpu import lmtrain as lmtrain_mod

    dev_trans = os.path.join(args.data_dir, "dev-clean", "transcript", "raw")
    tst_trans = os.path.join(args.data_dir, "test-clean", "transcript", "raw")

    rows = []
    for m_epoch in args.milestones:
        mst = os.path.join(mst_dir, f"epoch[{m_epoch}].ckpt")
        if not os.path.exists(mst):
            print(f"[chain_refit] SKIP epoch {m_epoch}: {mst} missing",
                  file=sys.stderr)
            continue
        mst_local = os.path.join(args.run_dir, "ckpts",
                                 f"milestone-epoch[{m_epoch}].ckpt")
        shutil.copyfile(mst, mst_local)

        # 1. decode prediction CSVs (train feeds lmtrain; dev = calibration
        # pairs; test = the held-out set every number reports on).
        # Idempotent: an existing CSV (from an interrupted attempt) is reused.
        def decode(split, tag):
            csv = os.path.join(args.run_dir, "preds",
                               f"milestone-epoch[{m_epoch}]-{tag}.csv")
            if os.path.exists(csv):
                print(f"[chain_refit] reuse {csv}")
                return csv
            return run_infer(None, args.run_dir,
                             os.path.join(args.data_dir, split),
                             mst_local, args.batch_size)

        trn_pred = decode("train-clean-100", "trn")
        dev_pred = decode("dev-clean", "dev")
        tst_pred = decode("test-clean", "tst")
        ld_dev_in = dev_ld_of_csv(dev_pred, dev_trans)
        ld_tst_in = dev_ld_of_csv(tst_pred, tst_trans)
        print(f"[chain_refit] milestone {m_epoch}: input dev LD "
              f"{ld_dev_in:.2f}, held-out test LD {ld_tst_in:.2f}")

        # 2. train the corrector on the milestone's train predictions.
        # Idempotent: a finished run (one with a non-emergency checkpoint)
        # from an interrupted attempt is reused.
        lm_exp = os.path.join(work, f"lm-m{m_epoch}")

        def finished_runs():
            if not os.path.isdir(lm_exp):
                return []
            return [os.path.join(lm_exp, d) for d in sorted(os.listdir(lm_exp))
                    if any(not f.startswith("emergency")
                           for f in os.listdir(os.path.join(lm_exp, d, "ckpts")))]

        done = finished_runs()
        if done:
            lm_run = done[-1]
            print(f"[chain_refit] reuse trained corrector {lm_run}")
        else:
            lm_cfg = rewriter_config(args.data_dir, lm_exp, trn_pred, dev_pred,
                                     args.lm_epochs)
            lm_cfg["model"]["configs"]["CHR_MAX_STEPS"] = args.lm_max_steps
            lm_cfg_path = os.path.join(work, f"rewriter-m{m_epoch}.yml")
            with open(lm_cfg_path, "w") as fh:
                yaml.safe_dump(lm_cfg, fh)
            lmtrain_mod.main(
                lmtrain_mod.build_argparser().parse_args(["-c", lm_cfg_path]))
            lm_run = finished_runs()[-1]

        # 3. correct the held-out TEST csv under each chain mode
        modes = {
            "margin0_free": dict(gate_correction=True, confidence_margin=0.0,
                                 span_rewrite=False),
            "auto_margin_r3": dict(gate_correction=True,
                                   confidence_margin="auto",
                                   span_rewrite=False),
            "auto_policy_r4": dict(gate_correction=True,
                                   confidence_margin="auto",
                                   span_rewrite=True),
        }
        row = {"milestone_epoch": m_epoch,
               "input_dev_ld": ld_dev_in, "input_test_ld": ld_tst_in,
               "modes": {}}
        for name, extra in modes.items():
            li_cfg = {
                "TST_DIR": tst_pred,
                "TST_FOLDER": os.path.join(args.data_dir, "test-clean"),
                "exp_folder": lm_run, "use_greedy": True,
                "batch_size": args.batch_size,
                "run_all": False, "epoch_num": None, "run_avg": True,
                "beam_size": args.lm_beam,
                "CAL_PRED_DIR": dev_pred, "CAL_TRANS_DIR": dev_trans,
                **extra,
            }
            li_path = os.path.join(work, f"lminfer-m{m_epoch}-{name}.yml")
            with open(li_path, "w") as fh:
                yaml.safe_dump(li_cfg, fh)
            lminfer_mod.main(
                lminfer_mod.build_argparser().parse_args(["-c", li_path]))
            corrected = os.path.join(lm_run, "ckpts", "avg-all-pred.csv")
            ld_after = dev_ld_of_csv(corrected, tst_trans)
            row["modes"][name] = {
                "test_ld": ld_after,
                "delta": ld_tst_in - ld_after,
            }
            print(f"[chain_refit] m{m_epoch} {name}: test LD "
                  f"{ld_after:.2f} (delta {ld_tst_in - ld_after:+.2f})")
        rows.append(row)

    result = {"run_dir": args.run_dir, "lm_epochs": args.lm_epochs,
              "lm_beam": args.lm_beam, "milestones": rows, "work_dir": work}
    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"[chain_refit] written {args.out}")


if __name__ == "__main__":
    main()
