"""Full-dataset-scale convergence run (the reference's headline regimen).

The reference's published result is 150 epochs on the ~28k-utterance
train-clean-100 corpus (reference README.md:59, setup.sh:11-13). This driver
runs the SAME regimen on the synthetic train-clean-100-like corpus (the
bench's named realistic distribution, ``make_synthetic_data.py --words 25
45``): flagship base-LAS, both Pallas kernel tiers, B=128, on-device
SpecAugment, init_force alignment prior, LD-gated staged teacher forcing,
ReduceLROnPlateau, milestones every 10 epochs — and records the full LD
trajectory as a committed artifact (results/), not a /tmp transcript.

Modes:
  * ``--mode resident``  — ``device_resident_data: true``: the whole corpus
    lives in HBM after a one-time upload (the TPU-native feed at this scale;
    trade: batch COMPOSITION freezes at the epoch-0 plan).
  * ``--mode streamed``  — disk -> native assembler -> H2D per step (the
    general pipeline; composition reshuffles every epoch).

The streamed-vs-resident CONTROL (same seed, short horizon) quantifies the
resident mode's frozen-composition trade on the LD trajectory:

    python tools/make_synthetic_data.py --out-dir /tmp/full100 \
        --n-train 28000 --n-dev 200 --n-test 200 --words 25 45
    python tools/fullscale_run.py --data-dir /tmp/full100 --epochs 150 \
        --mode resident --out results/fullscale_150ep.json
    python tools/fullscale_run.py --data-dir /tmp/full100 --epochs 10 \
        --mode streamed --out results/feed_control_streamed.json
    python tools/fullscale_run.py --data-dir /tmp/full100 --epochs 10 \
        --mode resident --out results/feed_control_resident.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def max_label_chars(data_dir: str, split: str) -> int:
    """Longest transcript (chars incl. <sos>/<eos>) in a split — sizes
    CHR_MAX_STEPS so the free-running eval decode can emit every gold
    label in full (a shorter cap would floor the best reachable LD)."""
    raw = os.path.join(data_dir, split, "transcript", "raw")
    longest = 0
    for f in os.listdir(raw):
        if f.endswith(".npy"):
            longest = max(longest, len(np.load(os.path.join(raw, f))))
    return longest


def fullscale_config(data_dir: str, exp_dir: str, epochs: int, mode: str,
                     batch_size: int, max_steps: int, seed: int) -> dict:
    """The reference's best-model recipe (reference README.md:61-104,
    config/sample-attention.yml:45-104) at full-dataset scale, with both
    Pallas kernel tiers and the feed mode under test."""
    return {
        "TRN_FOLDER": os.path.join(data_dir, "train-clean-100"),
        "DEV_FOLDER": os.path.join(data_dir, "dev-clean"),
        "TST_FOLDER": os.path.join(data_dir, "test-clean"),
        "EXP_FOLDER": exp_dir,
        "MST_FOLDER": os.path.join(exp_dir, "milestones"),
        "seed": seed,
        "epochs": epochs,
        "batch_size": batch_size,
        "accu_grad": 1,
        "grad_norm": 5.0,
        "eval_ld_interval": 1,
        "init_force": True,
        "tf_rate": 1.0,
        "max_savings": 3,
        "use_specaug": True,
        "specaug_freq": 6,
        # full-length corpus (~1250-frame mean): the reference's 200-frame
        # TimeMasking is the right scale here, unlike the short-corpus runs
        "specaug_time": 200,
        "compute_dtype": "bfloat16",
        "feed_dtype": "auto",
        "lazy_data": True,
        "device_resident_data": mode == "resident",
        "pad_time_multiple": 256,
        "pad_label_multiple": 32,
        "scan_unroll": 8,
        "wandb": {"use": False},
        "finetune": {"use": False, "reinit_lr": False, "checkpoint": None},
        "model": {
            "tag": "fullscale-LAS",
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
                    "USE_GREEDY": True, "decoder_impl": "pallas",
                },
            },
        },
        "optimizer": {"name": "adamw",
                      "configs": {"lr": 1e-3, "weight_decay": 5e-6,
                                  "amsgrad": True}},
        "batch_scheduler": {"use": False, "configs": {}},
        "epoch_scheduler": {"use": True},
        "tf_rate_scheduler": {"use": True,
                              "configs": {"factor": 0.1, "interval": 4,
                                          "lowest": 0.6}},
        "dropout_scheduler": {"use": True,
                              "configs": {max(epochs - 10, 1): 0.667}},
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--epochs", type=int, default=150)
    parser.add_argument("--mode", choices=["resident", "streamed"],
                        default="resident")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--seed", type=int, default=416)
    parser.add_argument("--out", default=None,
                        help="result JSON path (e.g. results/fullscale_150ep.json)")
    args = parser.parse_args()

    import tempfile

    work = args.work_dir or tempfile.mkdtemp(prefix="fullscale-")
    os.makedirs(work, exist_ok=True)

    longest = max(max_label_chars(args.data_dir, "train-clean-100"),
                  max_label_chars(args.data_dir, "dev-clean"))
    # free-running decode cap: longest gold label (minus the stripped <sos>),
    # rounded up to the label pad multiple
    max_steps = int(np.ceil((longest - 1) / 32) * 32)
    print(f"[fullscale] longest transcript {longest} chars -> "
          f"CHR_MAX_STEPS {max_steps}")

    cfg = fullscale_config(args.data_dir, os.path.join(work, "las"),
                           args.epochs, args.mode, args.batch_size,
                           max_steps, args.seed)
    cfg_path = os.path.join(work, "fullscale.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    from attention_based_e2e_asr_dnn_tpu import train as train_mod

    trainer = train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))

    n_train = len(os.listdir(
        os.path.join(args.data_dir, "train-clean-100", "mfcc")))
    steady_tr = trainer.train_seconds[1:] or trainer.train_seconds
    steady_ep = trainer.epoch_seconds[1:] or trainer.epoch_seconds
    las_exp = os.path.join(work, "las")
    run_dir = [os.path.join(las_exp, d) for d in sorted(os.listdir(las_exp))
               if d != "milestones"][0]
    result = {
        "mode": args.mode,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "seed": args.seed,
        "n_train_utterances": n_train,
        "chr_max_steps": max_steps,
        "dev_ld_history": trainer.dev_history["ld"],
        "dev_loss_history": trainer.dev_history["loss"],
        "train_loss_history": trainer.train_history["loss"],
        "best_dev_ld": float(min(trainer.dev_history["ld"])),
        "best_dev_ld_epoch": int(np.argmin(trainer.dev_history["ld"])),
        "final_tf_rate": trainer.tf_rate,
        "final_lr": trainer.current_lr,
        "train_seconds": trainer.train_seconds,
        "eval_seconds": trainer.eval_seconds,
        "epoch_seconds": trainer.epoch_seconds,
        "steady_train_seconds_median": float(np.median(steady_tr)),
        "steady_epoch_seconds_median": float(np.median(steady_ep)),
        "epoch_utt_s_end_to_end": float(n_train / np.median(steady_ep)),
        "train_utt_s": float(n_train / np.median(steady_tr)),
        "run_dir": run_dir,
        "milestone_dir": os.path.join(las_exp, "milestones"),
        "work_dir": work,
    }
    print(json.dumps({k: v for k, v in result.items()
                      if not k.endswith("_history")}))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"[fullscale] result written to {args.out}")


if __name__ == "__main__":
    main()
