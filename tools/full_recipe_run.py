"""Full reference-recipe certification on synthetic data.

Exercises the ENTIRE reference workflow as one system (reference
README.md:107-154 stages + the milestone->Rewriter chain,
src/train.py:323,366-368):

  1. Train base-LAS with the REAL hyperparameters: dropouts 0.3/0.3/0.35
     (listener) + 0.3 (decoder), on-device SpecAugment, the LD-gated staged
     teacher-forcing schedule (tf 1.0 -> 0.6), ReduceLROnPlateau, milestone
     checkpoints every 10 epochs.
  2. Decode the train/dev sets with an EARLY (imperfect) milestone — exactly
     the reference's Rewriter-data generation step.
  3. Train the Rewriter corrector LM on (milestone predictions, gold
     transcripts) via the lmtrain CLI.
  4. Correct the milestone's dev prediction CSV via the lminfer CLI and
     report dev LD before/after correction.

One deviation, documented: SpecAugment's time-mask width scales with the
corpus (synthetic utterances are ~100-400 frames vs LibriSpeech's ~1200-1600,
so the reference's 200-frame mask would erase whole utterances; the masked
FRACTION is kept comparable).

Run:
    python tools/make_synthetic_data.py --out-dir /tmp/synth
    python tools/full_recipe_run.py --data-dir /tmp/synth
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def las_recipe_config(data_dir: str, exp_dir: str, epochs: int,
                      batch_size: int, decoder_impl: str = "scan",
                      max_steps: int = 120, init_force: bool = False) -> dict:
    """Base-LAS with the reference's real training hyperparameters
    (reference config/sample-attention.yml:45-104, README.md:61-104)."""
    return {
        "TRN_FOLDER": os.path.join(data_dir, "train-clean-100"),
        "DEV_FOLDER": os.path.join(data_dir, "dev-clean"),
        "TST_FOLDER": os.path.join(data_dir, "test-clean"),
        "EXP_FOLDER": exp_dir,
        "MST_FOLDER": os.path.join(exp_dir, "milestones"),
        "seed": 416,
        "epochs": epochs,
        "batch_size": batch_size,
        "accu_grad": 1,
        "grad_norm": 5.0,
        "eval_ld_interval": 1,
        "init_force": init_force,
        "tf_rate": 1.0,
        "max_savings": 3,
        "use_specaug": True,
        "specaug_freq": 6,       # reference FrequencyMasking(6)
        "specaug_time": 40,      # scaled mask width (see module docstring)
        "compute_dtype": "bfloat16",
        "pad_time_multiple": 128,
        "pad_label_multiple": 32,
        "scan_unroll": 8,
        "wandb": {"use": False},
        "finetune": {"use": False, "reinit_lr": False, "checkpoint": None},
        "model": {
            "tag": "recipe-LAS",
            "configs": {
                "listener_configs": {
                    "input_dim": 15, "uniform_hid_dim": 512, "lstm_layers": 1,
                    "plstm_layers": 3, "bidirectional": True,
                    "init_dropout": 0.3, "mid_dropout": 0.3,
                    "final_dropout": 0.35, "lstm_impl": "pallas",
                },
                "speller_configs": {
                    "att_proj_dim": 256, "att_heads": 1, "att_dropout": 0.0,
                    "dec_emb_dim": 512, "dec_emb_dropout": 0.0,
                    "dec_lstm_hid_dim": 512, "dec_lstm_out_dim": 256,
                    "dec_lstm_dropout": 0.3, "CHR_MAX_STEPS": max_steps,
                    "USE_GREEDY": True, "decoder_impl": decoder_impl,
                },
            },
        },
        # reference best-model optimizer: AdamW lr 1e-3 wd 5e-6 amsgrad
        "optimizer": {"name": "adamw",
                      "configs": {"lr": 1e-3, "weight_decay": 5e-6,
                                  "amsgrad": True}},
        "batch_scheduler": {"use": False, "configs": {}},
        "epoch_scheduler": {"use": True},
        # staged tf 1.0 -> 0.6 (README stages 2-5), LD-gated
        "tf_rate_scheduler": {"use": True,
                              "configs": {"factor": 0.1, "interval": 4,
                                          "lowest": 0.6}},
        # README stage 6: dropouts scaled down late in training
        "dropout_scheduler": {"use": True,
                              "configs": {max(epochs - 10, 1): 0.667}},
    }


def rewriter_config(data_dir: str, exp_dir: str, trn_pred: str,
                    dev_pred: str, epochs: int) -> dict:
    return {
        "TRN_FOLDER": os.path.join(data_dir, "train-clean-100", "transcript", "raw"),
        "DEV_FOLDER": os.path.join(data_dir, "dev-clean", "transcript", "raw"),
        "TST_FOLDER": os.path.join(data_dir, "test-clean"),
        "EXP_FOLDER": exp_dir,
        "TRN_PRED_DIR": trn_pred,
        "DEV_PRED_DIR": dev_pred,
        "seed": 416,
        "epochs": epochs,
        "batch_size": 64,
        "accu_grad": 1,
        "grad_norm": 10.0,
        "eval_ld_interval": 1,
        "tf_rate": 1.0,
        "max_savings": 1,
        "init_force": False,
        "compute_dtype": "bfloat16",
        "pad_label_multiple": 32,
        "wandb": {"use": False},
        "finetune": {"use": False, "reinit_lr": False, "checkpoint": None},
        "model": {
            "tag": "recipe-Rewriter",
            "configs": {
                "emb_dim": 256, "enc_lstm_layers": 2, "enc_lstm_hid_dim": 256,
                "enc_dropouts": [0.2, 0.2], "att_proj_dim": 128,
                "att_heads": 1, "att_dropout": 0.2, "dec_lstm_layers": 2,
                "dec_lstm_hid_dim": 256, "dec_lstm_out_dim": 128,
                "dec_lstm_dropout": 0.2, "CHR_MAX_STEPS": 120,
                # round 3: the LM trains on the Pallas tiers too
                "lstm_impl": "pallas", "decoder_impl": "pallas",
            },
        },
        "optimizer": {"name": "adamw",
                      "configs": {"lr": 1e-3, "weight_decay": 5e-6,
                                  "amsgrad": True}},
        "batch_scheduler": {"use": False, "configs": {}},
        "epoch_scheduler": {"use": True},
        "tf_rate_scheduler": {"use": False, "configs": {}},
        "dropout_scheduler": {"use": False, "configs": {}},
    }


def dev_ld_of_csv(pred_csv: str, trans_dir: str) -> float:
    """Mean Levenshtein distance of a prediction CSV vs gold transcripts."""
    import pandas as pd
    from attention_based_e2e_asr_dnn_tpu.utils.levenshtein import levenshtein

    preds = [str(p) for p in
             pd.read_csv(pred_csv, keep_default_na=False)["label"].tolist()]
    golds = []
    for f in sorted(os.listdir(trans_dir)):
        if f.endswith(".npy"):
            raw = np.load(os.path.join(trans_dir, f))
            golds.append("".join(str(c) for c in raw[1:-1]))
    assert len(preds) == len(golds)
    return float(np.mean([levenshtein(p, g) for p, g in zip(preds, golds)]))


def run_infer(exp_dir: str, run_dir: str, some_folder: str, ckpt_path: str,
              batch_size: int) -> str:
    """Decode a dataset folder with one specific checkpoint via the infer
    machinery (infer_one_checkpoint is the CLI's own worker)."""
    from attention_based_e2e_asr_dnn_tpu import infer as infer_mod
    from attention_based_e2e_asr_dnn_tpu.config import Config, load_config
    from attention_based_e2e_asr_dnn_tpu.data.batching import BucketBatcher
    from attention_based_e2e_asr_dnn_tpu.data.datasets import AsrTestDataset

    model_cfgs = load_config(os.path.join(run_dir, "config.json"))
    infcfgs = Config({
        "SOME_FOLDER": some_folder, "exp_folder": run_dir,
        "use_greedy": True, "beam_size": 0, "early_stop": True,
        "batch_size": batch_size, "run_all": False, "epoch_num": None,
        "run_avg": False,
    })
    ds = AsrTestDataset(std_dir=some_folder)
    batcher = BucketBatcher(ds, batch_size, pad_time_multiple=128,
                            has_labels=False)
    base = os.path.basename(os.path.normpath(some_folder))
    tag = "trn" if "train" in base else "dev" if "dev" in base else "tst"
    template = os.path.join(some_folder, "transcript", "random_submission.csv")
    infer_mod.infer_one_checkpoint(
        model_cfgs=model_cfgs, infcfgs=infcfgs,
        checkpoint_filepath=ckpt_path, batcher=batcher, n_examples=len(ds),
        tag=tag, template_filepath=template, vocab=model_cfgs.VOCAB,
        sos_idx=model_cfgs.SOS_IDX, eos_idx=model_cfgs.EOS_IDX,
    )
    return ckpt_path.replace(".ckpt", f"-{tag}.csv").replace("ckpts", "preds")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--lm-epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--milestone-epoch", type=int, default=9)
    parser.add_argument("--decoder-impl", choices=["scan", "pallas"],
                        default="scan")
    parser.add_argument("--max-steps", type=int, default=120)
    parser.add_argument("--init-force", action="store_true")
    parser.add_argument("--lm-beam", type=int, default=8,
                        help="beam size for the corrector decode (round 3)")
    parser.add_argument("--lm-margin", type=float, default=0.0,
                        help="confidence-gate margin (avg logprob/char)")
    args = parser.parse_args()

    work = args.work_dir or tempfile.mkdtemp(prefix="recipe-")
    os.makedirs(work, exist_ok=True)
    las_exp = os.path.join(work, "las")
    lm_exp = os.path.join(work, "lm")

    from attention_based_e2e_asr_dnn_tpu import lminfer as lminfer_mod
    from attention_based_e2e_asr_dnn_tpu import lmtrain as lmtrain_mod
    from attention_based_e2e_asr_dnn_tpu import train as train_mod

    # ---- Phase 1: LAS with the full reference recipe -------------------
    cfg = las_recipe_config(args.data_dir, las_exp, args.epochs,
                            args.batch_size, args.decoder_impl,
                            args.max_steps, args.init_force)
    cfg_path = os.path.join(work, "las.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    trainer = train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))
    run_dir = [os.path.join(las_exp, d) for d in sorted(os.listdir(las_exp))
               if d != "milestones"][0]

    # ---- Phase 2: milestone -> Rewriter training data ------------------
    mst_dir = os.path.join(las_exp, "milestones")

    def _epoch_of(name: str) -> int:
        import re

        m = re.search(r"epoch\[(\d+)\]", name)
        return int(m.group(1)) if m else -1

    # NUMERIC epoch sort: lexicographic would rank epoch[19] before epoch[9]
    milestones = sorted(
        (f for f in os.listdir(mst_dir) if f.endswith(".ckpt")),
        key=_epoch_of,
    ) if os.path.isdir(mst_dir) else []
    if not milestones:
        raise FileNotFoundError(f"no milestone checkpoints in {mst_dir}")
    want = f"epoch[{args.milestone_epoch}].ckpt"
    mst = os.path.join(mst_dir, want if want in milestones else milestones[0])
    # preds dir must live under the run for the ckpts->preds path rewrite
    import shutil

    mst_local = os.path.join(run_dir, "ckpts", "milestone-" + os.path.basename(mst))
    shutil.copyfile(mst, mst_local)
    trn_pred = run_infer(las_exp, run_dir,
                         os.path.join(args.data_dir, "train-clean-100"),
                         mst_local, args.batch_size)
    dev_pred = run_infer(las_exp, run_dir,
                         os.path.join(args.data_dir, "dev-clean"),
                         mst_local, args.batch_size)
    dev_trans = os.path.join(args.data_dir, "dev-clean", "transcript", "raw")
    ld_before = dev_ld_of_csv(dev_pred, dev_trans)

    # ---- Phase 3: Rewriter training (lmtrain CLI) ----------------------
    lm_cfg = rewriter_config(args.data_dir, lm_exp, trn_pred, dev_pred,
                             args.lm_epochs)
    lm_cfg_path = os.path.join(work, "rewriter.yml")
    with open(lm_cfg_path, "w") as fh:
        yaml.safe_dump(lm_cfg, fh)
    lmtrain_mod.main(lmtrain_mod.build_argparser().parse_args(["-c", lm_cfg_path]))
    lm_run = [os.path.join(lm_exp, d) for d in sorted(os.listdir(lm_exp))][0]

    # ---- Phase 4: correct the dev CSV (lminfer CLI) --------------------
    li_cfg = {
        "TST_DIR": dev_pred,
        "TST_FOLDER": os.path.join(args.data_dir, "dev-clean"),
        "exp_folder": lm_run, "use_greedy": True, "batch_size": 64,
        "run_all": False, "epoch_num": None, "run_avg": True,
        # round 3: beam rewrite + never-worse confidence gate
        "beam_size": args.lm_beam, "gate_correction": True,
        "confidence_margin": args.lm_margin,
    }
    li_path = os.path.join(work, "lminfer.yml")
    with open(li_path, "w") as fh:
        yaml.safe_dump(li_cfg, fh)
    lminfer_mod.main(lminfer_mod.build_argparser().parse_args(["-c", li_path]))
    corrected = os.path.join(lm_run, "ckpts", "avg-all-pred.csv")
    ld_after = dev_ld_of_csv(corrected, dev_trans)

    import numpy as _np

    steady = trainer.epoch_seconds[1:] or trainer.epoch_seconds
    n_train_utts = len(os.listdir(
        os.path.join(args.data_dir, "train-clean-100", "mfcc")))
    result = {
        # honest end-to-end epoch throughput: train + SpecAug + eval + ckpt
        # (median of steady-state epochs; epoch 0 carries the compiles)
        "epoch_seconds_median": float(_np.median(steady)),
        "epoch_utt_s_end_to_end": float(n_train_utts / _np.median(steady)),
        "las_dev_ld_history": trainer.dev_history["ld"],
        "las_best_dev_ld": min(trainer.dev_history["ld"]),
        "final_tf_rate": trainer.tf_rate,
        "final_lr": trainer.current_lr,
        "milestone": os.path.basename(mst),
        "milestone_dev_ld": ld_before,
        "rewriter_corrected_dev_ld": ld_after,
        "rewriter_delta": ld_before - ld_after,
        "work_dir": work,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
