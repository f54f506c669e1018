"""End-to-end pipeline test: train.main -> checkpoints -> infer.main on a
fabricated reference-layout dataset (the SURVEY.md §4 mini integration test).
"""

import json
import os

import numpy as np
import pytest
import yaml

from attention_based_e2e_asr_dnn_tpu.constants import EOS_IDX, SOS_IDX, VOCAB_MAP


def _make_dataset(root, n=12, seed=0):
    """Reference data layout: mfcc/*.npy + transcript/raw/*.npy + template."""
    rng = np.random.default_rng(seed)
    words = ["HI", "YO", "HEY ALL", "OK"]
    char_codes = rng.normal(size=(30, 15)).astype(np.float32) * 2.0
    for split in ("train-clean-100", "dev-clean", "test-clean"):
        mfcc = os.path.join(root, split, "mfcc")
        raw = os.path.join(root, split, "transcript", "raw")
        os.makedirs(mfcc, exist_ok=True)
        os.makedirs(raw, exist_ok=True)
        labels = []
        for i in range(n):
            text = words[i % len(words)]
            ids = [VOCAB_MAP[c] for c in text]
            # learnable features: each char's code repeated 4 frames
            feats = char_codes[ids].repeat(4, axis=0)
            feats += rng.normal(size=feats.shape).astype(np.float32) * 0.05
            np.save(os.path.join(mfcc, f"utt{i:03d}.npy"), feats)
            np.save(os.path.join(raw, f"utt{i:03d}.npy"),
                    np.array(["<sos>"] + list(text) + ["<eos>"]))
            labels.append(text)
        # submission template
        import pandas as pd

        pd.DataFrame({"id": list(range(n)), "label": ["X"] * n}).to_csv(
            os.path.join(root, split, "transcript", "random_submission.csv"),
            index=False,
        )
    return words


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    words = _make_dataset(str(root))
    return str(root), words


def _train_config(root, exp_dir):
    return {
        "TRN_FOLDER": os.path.join(root, "train-clean-100"),
        "DEV_FOLDER": os.path.join(root, "dev-clean"),
        "TST_FOLDER": os.path.join(root, "test-clean"),
        "EXP_FOLDER": exp_dir,
        "MST_FOLDER": os.path.join(exp_dir, "milestones"),
        "seed": 1,
        "epochs": 2,
        "batch_size": 4,
        "accu_grad": 1,
        "grad_norm": 5.0,
        "eval_ld_interval": 1,
        "init_force": False,
        "tf_rate": 1.0,
        "max_savings": 2,
        "use_specaug": False,
        "compute_dtype": "float32",
        "pad_time_multiple": 16,
        "pad_label_multiple": 8,
        "scan_unroll": 2,
        "wandb": {"use": False},
        "finetune": {"use": False, "reinit_lr": False, "checkpoint": None},
        "model": {
            "tag": "e2e-test",
            "configs": {
                "listener_configs": {
                    "input_dim": 15, "uniform_hid_dim": 16, "lstm_layers": 1,
                    "plstm_layers": 1, "bidirectional": True,
                    "init_dropout": 0.0, "mid_dropout": 0.0,
                    "final_dropout": 0.0,
                },
                "speller_configs": {
                    "att_proj_dim": 8, "att_heads": 1, "att_dropout": 0.0,
                    "dec_emb_dim": 16, "dec_emb_dropout": 0.0,
                    "dec_lstm_hid_dim": 16, "dec_lstm_out_dim": 8,
                    "dec_lstm_dropout": 0.0, "CHR_MAX_STEPS": 16,
                    "USE_GREEDY": True,
                },
            },
        },
        "optimizer": {"name": "adamw",
                      "configs": {"lr": 0.005, "weight_decay": 1e-6,
                                  "amsgrad": True}},
        "batch_scheduler": {"use": False, "configs": {}},
        "epoch_scheduler": {"use": True},
        "tf_rate_scheduler": {"use": False, "configs": {}},
        "dropout_scheduler": {"use": False, "configs": {}},
        # deployable artifact straight from training (export.py)
        "export_artifact": {"batch": 2, "t_pad": 32},
    }


def test_train_infer_roundtrip(pipeline_dirs, tmp_path):
    from attention_based_e2e_asr_dnn_tpu import infer as infer_mod
    from attention_based_e2e_asr_dnn_tpu import train as train_mod

    root, words = pipeline_dirs
    exp_dir = str(tmp_path / "experiments")
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(_train_config(root, exp_dir), fh)

    args = train_mod.build_argparser().parse_args(["-c", cfg_path])
    trainer = train_mod.main(args)

    # training ran 2 epochs and recorded histories
    assert len(trainer.train_history["loss"]) == 2
    assert len(trainer.dev_history["ld"]) == 2
    assert all(np.isfinite(v) for v in trainer.train_history["loss"])

    # experiment folder contents: config.json snapshot, ckpts, imgs, log.json
    runs = os.listdir(exp_dir)
    runs = [r for r in runs if r != "milestones"]
    assert len(runs) == 1
    run_dir = os.path.join(exp_dir, runs[0])
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "log.json"))
    ckpts = os.listdir(os.path.join(run_dir, "ckpts"))
    assert any(c.startswith("min-") for c in ckpts)
    imgs = os.listdir(os.path.join(run_dir, "imgs"))
    assert "attention-map-epoch0.png" in imgs

    # config-driven export produced a loadable serving artifact
    art = os.path.join(run_dir, "artifacts", "las-b2-t32.tlas")
    assert os.path.exists(art)
    from attention_based_e2e_asr_dnn_tpu.export import ExportedDecoder

    dec = ExportedDecoder(art)
    assert dec.meta["batch"] == 2 and dec.meta["t_pad"] == 32
    texts = dec.transcribe([np.zeros((16, 15), np.float32)])
    assert isinstance(texts[0], str)

    # config.json re-read rebuilds the exact model for inference
    infer_cfg = {
        "SOME_FOLDER": os.path.join(root, "test-clean"),
        "exp_folder": run_dir,
        "use_greedy": True,
        "beam_size": 0,
        "batch_size": 4,
        "pad_time_multiple": 16,
        "run_all": False,
        "epoch_num": None,
        "run_avg": True,
    }
    inf_path = str(tmp_path / "infer.yml")
    with open(inf_path, "w") as fh:
        yaml.safe_dump(infer_cfg, fh)
    infer_mod.main(infer_mod.build_argparser().parse_args(["-c", inf_path]))

    preds_dir = os.path.join(run_dir, "preds")
    pred_files = os.listdir(preds_dir)
    assert any("avg-all" in f for f in pred_files)
    # avg checkpoint was created
    assert "avg-all.ckpt" in os.listdir(os.path.join(run_dir, "ckpts"))
    # submission preserves template row count and order
    import pandas as pd

    df = pd.read_csv(os.path.join(preds_dir, [f for f in pred_files
                                              if f.endswith(".csv")][0]))
    assert len(df) == 12
    assert list(df.columns) == ["id", "label"]


def test_resume_from_checkpoint(pipeline_dirs, tmp_path):
    from attention_based_e2e_asr_dnn_tpu import train as train_mod

    root, _ = pipeline_dirs
    exp_dir = str(tmp_path / "exp2")
    cfg = _train_config(root, exp_dir)
    cfg_path = str(tmp_path / "cfg2.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    trainer = train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))

    run_dir = [os.path.join(exp_dir, r) for r in os.listdir(exp_dir)
               if r != "milestones"][0]
    ckpts = [f for f in os.listdir(os.path.join(run_dir, "ckpts"))
             if f.endswith(".ckpt")]
    ckpt_path = os.path.join(run_dir, "ckpts", sorted(ckpts)[-1])

    cfg["finetune"] = {"use": True, "reinit_lr": True, "checkpoint": ckpt_path}
    cfg["epochs"] = 3
    cfg["EXP_FOLDER"] = str(tmp_path / "exp3")
    cfg_path2 = str(tmp_path / "cfg3.yml")
    with open(cfg_path2, "w") as fh:
        yaml.safe_dump(cfg, fh)
    trainer2 = train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path2]))
    # reference resume semantics: epoch = loaded['epoch'] RE-RUNS the saved
    # epoch (src/train.py:378), so history = loaded history + (epochs - loaded)
    from attention_based_e2e_asr_dnn_tpu.training.checkpoints import load_checkpoint

    loaded = load_checkpoint(ckpt_path)
    expect = len(loaded["dev_loss"]) + (3 - loaded["epoch"])
    assert len(trainer2.dev_history["loss"]) == expect
    assert trainer2.epoch == 3


def test_train_with_lazy_data(pipeline_dirs, tmp_path):
    """End-to-end training from a disk-backed layout (lazy_data: true) —
    features are never preloaded; loss trajectory matches the eager path."""
    from attention_based_e2e_asr_dnn_tpu import train as train_mod

    root, _ = pipeline_dirs
    cfg = _train_config(root, str(tmp_path / "exp_lazy"))
    cfg["lazy_data"] = True
    cfg_path = str(tmp_path / "cfg_lazy.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    trainer_lazy = train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))

    cfg["lazy_data"] = False
    cfg["EXP_FOLDER"] = str(tmp_path / "exp_eager")
    cfg_path2 = str(tmp_path / "cfg_eager.yml")
    with open(cfg_path2, "w") as fh:
        yaml.safe_dump(cfg, fh)
    trainer_eager = train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path2]))

    np.testing.assert_allclose(
        trainer_lazy.train_history["loss"], trainer_eager.train_history["loss"],
        rtol=1e-6,
    )


def test_lm_pipeline_roundtrip(pipeline_dirs, tmp_path):
    """Rewriter chain through the real CLIs: lmtrain on (prediction, gold)
    pairs, then lminfer corrects a prediction CSV (reference workflow:
    src/lmtrain.py:258-375, src/lminfer.py:86-232)."""
    from attention_based_e2e_asr_dnn_tpu import lminfer as lminfer_mod
    from attention_based_e2e_asr_dnn_tpu import lmtrain as lmtrain_mod

    root, words = pipeline_dirs
    trn_trans = os.path.join(root, "train-clean-100", "transcript", "raw")
    dev_trans = os.path.join(root, "dev-clean", "transcript", "raw")
    # imperfect "LAS predictions": gold with one char corrupted
    n = len([f for f in os.listdir(trn_trans) if f.endswith(".npy")])
    preds = [(words[i % len(words)][:-1] + "Q") for i in range(n)]
    trn_pred = str(tmp_path / "trn_pred.txt")
    dev_pred = str(tmp_path / "dev_pred.txt")
    for p in (trn_pred, dev_pred):
        with open(p, "w") as fh:
            fh.write("\n".join(preds) + "\n")

    lm_exp = str(tmp_path / "lm_exp")
    cfg = {
        "TRN_FOLDER": trn_trans, "DEV_FOLDER": dev_trans,
        "TST_FOLDER": os.path.join(root, "test-clean"),
        "EXP_FOLDER": lm_exp,
        "TRN_PRED_DIR": trn_pred, "DEV_PRED_DIR": dev_pred,
        "seed": 3, "epochs": 2, "batch_size": 4, "accu_grad": 1,
        "grad_norm": 5.0, "eval_ld_interval": 1, "tf_rate": 1.0,
        "max_savings": 2, "init_force": False,
        "compute_dtype": "float32", "pad_label_multiple": 8,
        "wandb": {"use": False},
        "finetune": {"use": False, "reinit_lr": False, "checkpoint": None},
        "model": {"tag": "lm-e2e", "configs": {
            "emb_dim": 16, "enc_lstm_layers": 1, "enc_lstm_hid_dim": 8,
            "enc_dropouts": [0.0], "att_proj_dim": 8, "att_heads": 1,
            "att_dropout": 0.0, "dec_lstm_layers": 2,
            "dec_lstm_hid_dim": 16, "dec_lstm_out_dim": 8,
            "dec_lstm_dropout": 0.0, "CHR_MAX_STEPS": 16}},
        "optimizer": {"name": "adamw", "configs": {"lr": 0.003}},
        "batch_scheduler": {"use": False, "configs": {}},
        "epoch_scheduler": {"use": False},
        "tf_rate_scheduler": {"use": False, "configs": {}},
        "dropout_scheduler": {"use": False, "configs": {}},
        "export_artifact": {"batch": 2, "t_pad": 32},
    }
    cfg_path = str(tmp_path / "lm.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    trainer = lmtrain_mod.main(lmtrain_mod.build_argparser().parse_args(["-c", cfg_path]))
    assert len(trainer.train_history["loss"]) == 2
    assert all(np.isfinite(v) for v in trainer.train_history["loss"])

    lm_run = [os.path.join(lm_exp, d) for d in sorted(os.listdir(lm_exp))][0]

    # config-driven export produced a loadable gated-correction artifact
    from attention_based_e2e_asr_dnn_tpu.export import ExportedCorrector

    corr_art = os.path.join(lm_run, "artifacts", "corrector-b2-t32.tlas")
    assert os.path.exists(corr_art)
    dec = ExportedCorrector(corr_art)
    assert dec.meta["gate"] is True
    assert isinstance(dec.correct(["HI"])[0], str)

    # prediction CSV to correct (submission format)
    import pandas as pd

    tst_csv = str(tmp_path / "tst_pred.csv")
    pd.DataFrame({"id": list(range(n)), "label": preds}).to_csv(tst_csv, index=False)
    li_cfg = {
        "TST_DIR": tst_csv,
        "TST_FOLDER": os.path.join(root, "test-clean"),
        "exp_folder": lm_run, "use_greedy": True, "batch_size": 4,
        "run_all": False, "epoch_num": None, "run_avg": True,
    }
    li_path = str(tmp_path / "lminfer.yml")
    with open(li_path, "w") as fh:
        yaml.safe_dump(li_cfg, fh)
    lminfer_mod.main(lminfer_mod.build_argparser().parse_args(["-c", li_path]))
    out = os.path.join(lm_run, "ckpts", "avg-all-pred.csv")
    assert os.path.exists(out)
    df = pd.read_csv(out, keep_default_na=False)
    assert len(df) == n and list(df.columns) == ["id", "label"]

    # auto-calibrated gate: margin fitted on the labeled dev pairs, applied
    # to the target csv (never-worse on calibration by construction)
    li_cfg_auto = dict(li_cfg)
    li_cfg_auto.update({
        "confidence_margin": "auto",
        "CAL_PRED_DIR": dev_pred,
        "CAL_TRANS_DIR": dev_trans,
        "beam_size": 2,
    })
    li_auto_path = str(tmp_path / "lminfer-auto.yml")
    with open(li_auto_path, "w") as fh:
        yaml.safe_dump(li_cfg_auto, fh)
    lminfer_mod.main(
        lminfer_mod.build_argparser().parse_args(["-c", li_auto_path]))
    df2 = pd.read_csv(out, keep_default_na=False)
    assert len(df2) == n

    # span rewrites (round 4): prefix-anchored candidate set + the same
    # auto-fitted gate, through the same CLI
    li_cfg_span = dict(li_cfg_auto)
    li_cfg_span.update({"span_rewrite": True, "beam_size": 0})
    li_span_path = str(tmp_path / "lminfer-span.yml")
    with open(li_span_path, "w") as fh:
        yaml.safe_dump(li_cfg_span, fh)
    lminfer_mod.main(
        lminfer_mod.build_argparser().parse_args(["-c", li_span_path]))
    df3 = pd.read_csv(out, keep_default_na=False)
    assert len(df3) == n and df3["label"].notna().all()


def test_serving_transcriber_matches_infer(pipeline_dirs, tmp_path):
    """The serving API loads an experiment and produces the same strings as
    the infer CLI machinery (and preserves request order)."""
    from attention_based_e2e_asr_dnn_tpu import train as train_mod
    from attention_based_e2e_asr_dnn_tpu.serving import Transcriber

    root, words = pipeline_dirs
    exp_dir = str(tmp_path / "exp_srv")
    cfg_path = str(tmp_path / "cfg_srv.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(_train_config(root, exp_dir), fh)
    train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))
    run_dir = [os.path.join(exp_dir, r) for r in os.listdir(exp_dir)
               if r != "milestones"][0]

    t = Transcriber(run_dir, batch_size=4, pad_time_multiple=16)
    t.warmup([32])
    mfcc_dir = os.path.join(root, "test-clean", "mfcc")
    feats = [np.load(os.path.join(mfcc_dir, f))
             for f in sorted(os.listdir(mfcc_dir)) if f.endswith(".npy")]
    preds = t.transcribe(feats)
    assert len(preds) == len(feats)
    assert all(isinstance(p, str) for p in preds)

    # must agree with the infer-CLI decode of the same checkpoint
    from attention_based_e2e_asr_dnn_tpu import infer as infer_mod
    from attention_based_e2e_asr_dnn_tpu.config import Config, load_config
    from attention_based_e2e_asr_dnn_tpu.data.batching import BucketBatcher
    from attention_based_e2e_asr_dnn_tpu.data.datasets import AsrTestDataset

    model_cfgs = load_config(os.path.join(run_dir, "config.json"))
    infcfgs = Config({"SOME_FOLDER": os.path.join(root, "test-clean"),
                      "exp_folder": run_dir, "use_greedy": True,
                      "beam_size": 0, "batch_size": 4, "run_all": False,
                      "epoch_num": None, "run_avg": False})
    ds = AsrTestDataset(std_dir=os.path.join(root, "test-clean"))
    batcher = BucketBatcher(ds, 4, pad_time_multiple=16, has_labels=False)
    from attention_based_e2e_asr_dnn_tpu.serving import _best_checkpoint
    cli_preds = infer_mod.infer_one_checkpoint(
        model_cfgs=model_cfgs, infcfgs=infcfgs,
        checkpoint_filepath=_best_checkpoint(os.path.join(run_dir, "ckpts")),
        batcher=batcher, n_examples=len(ds), tag="tst",
        template_filepath=None, vocab=model_cfgs.VOCAB,
        sos_idx=model_cfgs.SOS_IDX, eos_idx=model_cfgs.EOS_IDX)
    assert preds == cli_preds


def test_best_checkpoint_sorts_epochs_numerically(tmp_path):
    """min-...-epoch[10] must outrank epoch[9] (lexicographic sort would
    invert them and serve a stale model)."""
    from attention_based_e2e_asr_dnn_tpu.serving import _best_checkpoint

    d = str(tmp_path)
    for name in ("min-loss-ld-ppl-epoch[9].ckpt",
                 "min-loss-ld-ppl-epoch[10].ckpt",
                 "min-ld-epoch[2].ckpt"):
        open(os.path.join(d, name), "wb").close()
    assert _best_checkpoint(d).endswith("epoch[10].ckpt")


def test_train_cli_with_beam_eval(pipeline_dirs, tmp_path):
    """eval_beam_size>1 through the CLI: wires make_las_eval_beam_step (one
    encoder pass for loss+LD) — guards the train.py import/wiring path."""
    from attention_based_e2e_asr_dnn_tpu import train as train_mod

    root, _ = pipeline_dirs
    exp_dir = str(tmp_path / "experiments")
    cfg = _train_config(root, exp_dir)
    cfg["epochs"] = 1
    cfg["eval_beam_size"] = 2
    cfg_path = str(tmp_path / "cfg-beam.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    trainer = train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))
    assert trainer.eval_beam_step is not None
    assert len(trainer.dev_history["ld"]) == 1
    assert np.isfinite(trainer.dev_history["ld"][0])


def test_serving_route_up_and_streaming(pipeline_dirs, tmp_path):
    """Serving hardening (VERDICT r2 weak/next #7): auto-warmup ladder with
    largest-first ordering, route-up to warm buckets (no compile stall on a
    cold mixed-length stream), and the batching-queue front end returning
    identical strings to the direct call."""
    from attention_based_e2e_asr_dnn_tpu import train as train_mod
    from attention_based_e2e_asr_dnn_tpu.serving import (
        StreamingTranscriber,
        Transcriber,
    )

    root, words = pipeline_dirs
    exp_dir = str(tmp_path / "exp_srv2")
    cfg_path = str(tmp_path / "cfg_srv2.yml")
    cfg = _train_config(root, exp_dir)
    cfg["epochs"] = 1
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))
    run_dir = [os.path.join(exp_dir, r) for r in os.listdir(exp_dir)
               if r != "milestones"][0]

    t = Transcriber(run_dir, batch_size=4, pad_time_multiple=16,
                    auto_warmup=[16, 48])
    # readiness gate: True once the FIRST (largest-first) bucket is warm
    assert t.wait_ready(timeout=300)
    assert 48 in t._warm
    t.wait_warm()
    assert t._warm == {16, 48}
    # route-up: a 17-frame batch needs t_pad 32 (cold) -> routes to warm 48
    assert t._route_bucket(17) == 48
    # tight bucket warm -> stays tight
    assert t._route_bucket(10) == 16
    # larger than any warm bucket -> tight (compile is unavoidable)
    assert t._route_bucket(100) == 112

    mfcc_dir = os.path.join(root, "test-clean", "mfcc")
    feats = [np.load(os.path.join(mfcc_dir, f))
             for f in sorted(os.listdir(mfcc_dir)) if f.endswith(".npy")][:6]
    direct = t.transcribe(feats)

    st = StreamingTranscriber(t, max_wait_ms=30.0)
    futs = [st.submit(f) for f in feats]
    streamed = [f.result(timeout=120) for f in futs]
    st.close()
    assert streamed == direct

    # background warmup yields to foreground traffic: with a request "in
    # flight" (fg_count held), a yield_to_foreground warmup on a READY
    # server must not touch its bucket until the foreground drains
    import threading
    import time as _time

    t2 = Transcriber(run_dir, batch_size=4, pad_time_multiple=16)
    assert t2.wait_ready(timeout=1)  # no auto-warmup -> trivially ready
    t2._step = lambda p, x, lx: np.zeros((4, 5), np.int32)  # instant stub
    t2._ready_evt.set()
    with t2._fg_cv:
        t2._fg_count += 1
    th = threading.Thread(
        target=t2.warmup,
        kwargs={"time_buckets": [32], "yield_to_foreground": True})
    th.start()
    _time.sleep(0.3)
    assert 32 not in t2._warm  # blocked behind the live request
    with t2._fg_cv:
        t2._fg_count -= 1
        t2._fg_cv.notify_all()
    th.join(30)
    assert 32 in t2._warm


def test_serving_data_parallel_matches_single_device(pipeline_dirs, tmp_path):
    """DP-sharded serving (batch split over the 8-CPU virtual mesh, params
    replicated) returns the SAME transcripts as single-device decode, and the
    sharded inputs actually land distributed."""
    import jax

    from attention_based_e2e_asr_dnn_tpu import train as train_mod
    from attention_based_e2e_asr_dnn_tpu.serving import Transcriber

    root, words = pipeline_dirs
    exp_dir = str(tmp_path / "exp_srvdp")
    cfg_path = str(tmp_path / "cfg_srvdp.yml")
    cfg = _train_config(root, exp_dir)
    cfg["epochs"] = 1
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))
    run_dir = [os.path.join(exp_dir, r) for r in os.listdir(exp_dir)
               if r != "milestones"][0]

    mfcc_dir = os.path.join(root, "test-clean", "mfcc")
    feats = [np.load(os.path.join(mfcc_dir, f))
             for f in sorted(os.listdir(mfcc_dir)) if f.endswith(".npy")][:8]

    t1 = Transcriber(run_dir, batch_size=8, pad_time_multiple=16)
    tdp = Transcriber(run_dir, batch_size=8, pad_time_multiple=16,
                      data_parallel=4)
    # the batch really shards: 4 addressable shards, 2 rows each
    x = np.zeros((8, 16, tdp.n_feats), np.float32)
    sharded = jax.device_put(x, tdp._x_sharding)
    assert len(sharded.addressable_shards) == 4
    assert sharded.addressable_shards[0].data.shape[0] == 2
    assert t1.transcribe(feats) == tdp.transcribe(feats)

    with pytest.raises(ValueError, match="divisible"):
        Transcriber(run_dir, batch_size=6, pad_time_multiple=16,
                    data_parallel=4)


def test_streaming_worker_survives_cancelled_future():
    """A client that times out and cancel()s its Future must not kill the
    dispatcher thread (set_result on a CANCELLED future raises); later
    submits still resolve and close() still returns. Also: submit/close
    are serialized, so an accepted request always resolves."""
    import threading

    from attention_based_e2e_asr_dnn_tpu.serving import StreamingTranscriber

    release = threading.Event()
    first_call = [True]

    class FakeTranscriber:
        batch_size = 2

        def transcribe(self, feats):
            if first_call[0]:
                first_call[0] = False
                release.wait(timeout=30)
            return ["ok"] * len(feats)

    st = StreamingTranscriber(FakeTranscriber(), max_wait_ms=1.0)
    f1 = st.submit(np.zeros((3, 15), np.float32))   # worker blocks on this
    import time as _time

    _time.sleep(0.1)                                 # worker inside batch 1
    f2 = st.submit(np.zeros((3, 15), np.float32))   # still PENDING
    assert f2.cancel()                               # client gave up
    release.set()
    assert f1.result(timeout=30) == "ok"
    # worker must still be alive: a fresh submit resolves
    f3 = st.submit(np.zeros((3, 15), np.float32))
    assert f3.result(timeout=30) == "ok"
    st.close()                                       # no hang
    with pytest.raises(RuntimeError, match="closed"):
        st.submit(np.zeros((3, 15), np.float32))


def test_serving_corrector_gate(pipeline_dirs, tmp_path):
    """Serving-side Rewriter chain: Corrector gates rewrites by score
    margin (an infinite margin is an exact no-op), and a Transcriber built
    with corrector= pipes its transcriptions through the chain."""
    from tests.test_parallel import _lm_config
    from attention_based_e2e_asr_dnn_tpu import lmtrain as lmtrain_mod
    from attention_based_e2e_asr_dnn_tpu import train as train_mod
    from attention_based_e2e_asr_dnn_tpu.serving import Corrector, Transcriber

    root, words = pipeline_dirs

    # tiny Rewriter experiment
    lm_exp = str(tmp_path / "lm_exp")
    lm_cfg = _lm_config(root, words, lm_exp, tmp_path, n=12)
    lm_cfg_path = str(tmp_path / "lm.yml")
    with open(lm_cfg_path, "w") as fh:
        yaml.safe_dump(lm_cfg, fh)
    lmtrain_mod.main(
        lmtrain_mod.build_argparser().parse_args(["-c", lm_cfg_path]))
    lm_run = [os.path.join(lm_exp, d) for d in sorted(os.listdir(lm_exp))][0]

    texts = [w[:-1] + "Q" for w in words]  # corrupted "predictions"

    # infinite margin blocks every rewrite -> exact identity
    c_block = Corrector(lm_run, beam_size=2, confidence_margin=1e9,
                        batch_size=4)
    assert c_block.correct(texts) == texts

    # -inf margin keeps every rewrite == ungated output
    c_all = Corrector(lm_run, beam_size=2, confidence_margin=-1e9,
                      batch_size=4)
    c_raw = Corrector(lm_run, beam_size=2, gate=False, batch_size=4)
    kept = c_all.correct(texts)
    assert kept == c_raw.correct(texts)
    assert all(isinstance(s, str) for s in kept)

    # Transcriber(corrector=) == corrector.correct(plain transcribe)
    exp_dir = str(tmp_path / "exp_chain")
    cfg_path = str(tmp_path / "cfg_chain.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(_train_config(root, exp_dir), fh)
    train_mod.main(train_mod.build_argparser().parse_args(["-c", cfg_path]))
    run_dir = [os.path.join(exp_dir, r) for r in os.listdir(exp_dir)
               if r != "milestones"][0]
    mfcc_dir = os.path.join(root, "test-clean", "mfcc")
    feats = [np.load(os.path.join(mfcc_dir, f))
             for f in sorted(os.listdir(mfcc_dir)) if f.endswith(".npy")][:4]

    plain = Transcriber(run_dir, batch_size=4, pad_time_multiple=16)
    chained = Transcriber(run_dir, batch_size=4, pad_time_multiple=16,
                          corrector=c_block)
    assert chained.transcribe(feats) == c_block.correct(
        plain.transcribe(feats))

    # --- span_rewrite: the fitted-policy chain as a serving object ---
    # huge margin -> exact identity (never-worse holds for every family)
    sp_block = Corrector(lm_run, beam_size=0, confidence_margin=1e9,
                         batch_size=4, span_rewrite=True,
                         span_family="best")
    assert sp_block.correct(texts) == texts

    # fraction-anchored family: every KEPT rewrite preserves the forced
    # prefix of its input (the decode is anchored there by construction)
    sp_f75 = Corrector(lm_run, beam_size=0, confidence_margin=-1e9,
                       batch_size=4, span_rewrite=True, span_family="f75")
    rewrites = sp_f75.correct(texts)
    for inp, rew in zip(texts, rewrites):
        alen = int(len(inp) * 0.75)
        assert rew[:alen] == inp[:alen]

    # "free" family at margin -inf == the ungated plain rewrite
    sp_free = Corrector(lm_run, beam_size=0, confidence_margin=-1e9,
                        batch_size=4, span_rewrite=True, span_family="free")
    c_plain = Corrector(lm_run, beam_size=0, gate=False, batch_size=4)
    assert sp_free.correct(texts) == c_plain.correct(texts)

    # config guards
    with pytest.raises(ValueError, match="span_family"):
        Corrector(lm_run, span_rewrite=True, span_family="nope")
    with pytest.raises(ValueError, match="gate"):
        Corrector(lm_run, span_rewrite=True, gate=False)
