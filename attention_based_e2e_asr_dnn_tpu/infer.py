"""LAS inference entry point.

CLI parity with the reference (src/infer.py:86-195):

    python -m attention_based_e2e_asr_dnn_tpu.infer -c configs/infer.yml

Reads the infer YAML plus the experiment's snapshotted ``config.json`` to
rebuild the exact model, then runs greedy (or beam) decoding over the test
set for: every checkpoint (``run_all``), a single ``epoch_num``, and/or the
uniform checkpoint average (``run_avg`` -> ``avg-all.ckpt``,
src/infer.py:158-172).

Fix over the reference (documented): predictions are written back in the
TEMPLATE's original utterance order — the reference's length-sorted test
dataset wrote predictions length-sorted (SURVEY.md §2 quirk).
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.config import cfg_float, load_config
from attention_based_e2e_asr_dnn_tpu.data.batching import BucketBatcher
from attention_based_e2e_asr_dnn_tpu.data.datasets import AsrTestDataset, ToyTestDataset
from attention_based_e2e_asr_dnn_tpu.models.las import las_apply, las_config_from_dicts
from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (
    average_checkpoints,
    list_best_checkpoints,
    load_checkpoint,
    save_checkpoint,
)
from attention_based_e2e_asr_dnn_tpu.training.steps import make_infer_step
from attention_based_e2e_asr_dnn_tpu.utils.levenshtein import ids_to_str


def decode_dataset(params, apply_fn, batcher, vocab, sos_idx, eos_idx,
                   n_examples, compute_dtype=jnp.float32,
                   beam_step=None) -> List[str]:
    """Decode every utterance; returns predictions in DATASET order."""
    if beam_step is not None:
        step = beam_step
    else:
        step = make_infer_step(apply_fn, compute_dtype=compute_dtype)
    preds = [None] * n_examples
    for bt in batcher.epoch(0):
        ids = np.asarray(step(params, bt.x, bt.lx.astype(np.int32)))
        for row, orig in enumerate(bt.indices):
            if orig >= 0:
                preds[orig] = ids_to_str(ids[row], vocab, sos_idx, eos_idx)
    assert all(p is not None for p in preds)
    return preds


def write_submission(preds: List[str], template_filepath: str, out_filepath: str):
    import pandas as pd

    df = pd.read_csv(template_filepath)
    df["label"] = preds
    os.makedirs(os.path.dirname(out_filepath) or ".", exist_ok=True)
    df.to_csv(out_filepath, index=False)
    return out_filepath


def infer_one_checkpoint(model_cfgs, infcfgs, checkpoint_filepath, batcher,
                         n_examples, tag, template_filepath, vocab,
                         sos_idx, eos_idx):
    print(f"running inference on checkpoint [{checkpoint_filepath}]")
    las_cfg = las_config_from_dicts(
        model_cfgs.model.configs["listener_configs"],
        model_cfgs.model.configs["speller_configs"],
    )
    params = jax.tree.map(jnp.asarray, load_checkpoint(checkpoint_filepath)["params"])
    # decode with the dtype the experiment trained in (snapshotted config):
    # a bf16-trained run must not silently fall back to the slower fp32 path
    compute_dtype = jnp.dtype(getattr(model_cfgs, "compute_dtype", "float32"))

    def apply_fn(p, rng, x, lx, dec_y=None, tf_rate=1.0, init_force=False,
                 train=False):
        return las_apply(p, las_cfg, rng, x, lx, dec_y, tf_rate, init_force, train)

    beam = int(getattr(infcfgs, "beam_size", 0) or 0)
    # degenerate-repeat cap in chars per encoder frame; 0 disables
    len_factor = cfg_float(infcfgs, "max_len_factor", 3.0)
    beam_step = None
    if beam > 1:
        from attention_based_e2e_asr_dnn_tpu.decoding.beam import make_las_beam_step

        beam_step = make_las_beam_step(
            las_cfg, beam_size=beam,
            length_alpha=float(getattr(infcfgs, "length_alpha", 0.0) or 0.0),
            compute_dtype=compute_dtype, max_len_factor=len_factor,
        )
    elif bool(getattr(infcfgs, "early_stop", True)):
        # all-finished early exit: identical strings, ~3-4x faster than the
        # fixed CHR_MAX_STEPS scan on real utterances
        from attention_based_e2e_asr_dnn_tpu.decoding.greedy import make_las_greedy_step

        beam_step = make_las_greedy_step(las_cfg, compute_dtype=compute_dtype,
                                         max_len_factor=len_factor)
    preds = decode_dataset(params, apply_fn, batcher, vocab, sos_idx, eos_idx,
                           n_examples, compute_dtype=compute_dtype,
                           beam_step=beam_step)

    # rewrite the BASENAME and the immediate ckpts/ parent only — path
    # components elsewhere that contain ".ckpt"/"ckpts" must survive
    ckpt_dir = os.path.dirname(checkpoint_filepath)
    out_dir = (os.path.join(os.path.dirname(ckpt_dir), "preds")
               if os.path.basename(ckpt_dir) == "ckpts" else ckpt_dir)
    ckpt_base = os.path.splitext(os.path.basename(checkpoint_filepath))[0]
    out_filepath = os.path.join(out_dir, f"{ckpt_base}-{tag}.csv")
    if template_filepath and os.path.exists(template_filepath):
        write_submission(preds, template_filepath, out_filepath)
    else:
        os.makedirs(os.path.dirname(out_filepath) or ".", exist_ok=True)
        with open(out_filepath, "w") as fh:
            fh.write("\n".join(preds) + "\n")
    print(f"wrote [{out_filepath}]")
    return preds


def main(args):
    from attention_based_e2e_asr_dnn_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    infcfgs = load_config(args.config_file)
    exp_folder = infcfgs.exp_folder
    model_cfgs = load_config(os.path.join(exp_folder, "config.json"))

    use_mini = os.path.basename(model_cfgs.TRN_FOLDER).startswith("mini")
    # our train.py injects VOCAB/SOS/EOS into the snapshot; a REFERENCE
    # experiment's config.json (src/train.py:527) has none — its vocabulary
    # is the fixed constants table, which is exactly ours
    vocab = getattr(model_cfgs, "VOCAB", None)
    if vocab is None:
        from attention_based_e2e_asr_dnn_tpu import constants

        vocab = constants.VOCAB
        sos_idx, eos_idx = constants.SOS_IDX, constants.EOS_IDX
    else:
        sos_idx = model_cfgs.SOS_IDX
        eos_idx = model_cfgs.EOS_IDX

    if use_mini:
        ds = ToyTestDataset(infcfgs.SOME_FOLDER)
    else:
        ds = AsrTestDataset(std_dir=infcfgs.SOME_FOLDER)
    batcher = BucketBatcher(
        ds, infcfgs.batch_size,
        pad_time_multiple=int(getattr(infcfgs, "pad_time_multiple", 128)),
        has_labels=False,
    )
    base = os.path.basename(os.path.normpath(infcfgs.SOME_FOLDER))
    tag = "trn" if "train" in base else "dev" if "dev" in base else "tst"

    template = os.path.join(infcfgs.SOME_FOLDER, "transcript", "random_submission.csv")
    if not os.path.exists(template):
        template = os.path.join(infcfgs.SOME_FOLDER, "transcript", "processed.csv")
        if not os.path.exists(template):
            template = None

    ckpt_dir = os.path.join(exp_folder, "ckpts")
    # only best-tag checkpoints: crash saves (emergency-*) and a previous
    # run's avg-all.* must not leak into run_all / the uniform average;
    # reference .pt files load transparently (compat import)
    ckpts = list_best_checkpoints(ckpt_dir)

    common = dict(model_cfgs=model_cfgs, infcfgs=infcfgs, batcher=batcher,
                  n_examples=len(ds), tag=tag, template_filepath=template,
                  vocab=vocab, sos_idx=sos_idx, eos_idx=eos_idx)

    if infcfgs.run_all:
        for fp in ckpts:
            infer_one_checkpoint(
                checkpoint_filepath=os.path.join(ckpt_dir, fp), **common)
    elif getattr(infcfgs, "epoch_num", None) is not None:
        match = [f for f in ckpts
                 if os.path.splitext(f)[0].endswith(f"epoch[{infcfgs.epoch_num}]")]
        if not match:
            # fail loudly — a silent skip here reads as success with no output
            raise FileNotFoundError(
                f"no checkpoint matches epoch[{infcfgs.epoch_num}] in "
                f"{ckpt_dir}; available: {ckpts}"
            )
        infer_one_checkpoint(
            checkpoint_filepath=os.path.join(ckpt_dir, match[0]), **common)

    if getattr(infcfgs, "run_avg", False):
        avg = average_checkpoints([os.path.join(ckpt_dir, f) for f in ckpts])
        avg_path = os.path.join(ckpt_dir, "avg-all.ckpt")
        save_checkpoint(avg_path, avg)
        infer_one_checkpoint(checkpoint_filepath=avg_path, **common)


def build_argparser():
    parser = argparse.ArgumentParser(description="LAS model inference on TPU")
    parser.add_argument("--config-file", "-c", default="./configs/infer.yml",
                        type=str, help="filepath of the inference YAML")
    return parser


if __name__ == "__main__":
    main(build_argparser().parse_args())
