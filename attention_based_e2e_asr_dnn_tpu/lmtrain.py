"""Rewriter LM training entry point.

CLI parity with the reference (src/lmtrain.py:258-375):

    python -m attention_based_e2e_asr_dnn_tpu.lmtrain -c configs/rewriter.yml

Pairs LAS prediction strings with gold transcripts and trains the seq2seq
Rewriter with the SAME Trainer the LAS pipeline uses (reference reuses its
Trainer wholesale, src/lmtrain.py:342-352).
"""

from __future__ import annotations

import argparse
import dataclasses
import os



import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu import constants
from attention_based_e2e_asr_dnn_tpu.config import Config, load_yaml, snapshot_config
from attention_based_e2e_asr_dnn_tpu.data.batching import BucketBatcher
from attention_based_e2e_asr_dnn_tpu.data.datasets import LmTrainDevDataset
from attention_based_e2e_asr_dnn_tpu.models.rewriter import (
    RewriterConfig,
    rewriter_apply,
    rewriter_init,
)
from attention_based_e2e_asr_dnn_tpu.training.trainer import Trainer
from attention_based_e2e_asr_dnn_tpu.utils.logging import (
    MetricLogger,
    dump_log_json,
    experiment_folder,
)


def scale_rewriter_dropouts(cfg: RewriterConfig, scale: float) -> RewriterConfig:
    if scale == 1.0:
        return cfg
    return dataclasses.replace(
        cfg,
        enc_dropouts=tuple(d * scale for d in cfg.enc_dropouts),
        att_dropout=cfg.att_dropout * scale,
        dec_lstm_dropout=cfg.dec_lstm_dropout * scale,
    )


def make_rewriter_apply_factory(base_cfg: RewriterConfig, unroll: int = 8,
                                compute_dtype=None):
    def make_apply(dropout_scale: float):
        cfg = scale_rewriter_dropouts(base_cfg, dropout_scale)

        def apply_fn(params, rng, x, lx, dec_y=None, tf_rate=1.0,
                     init_force=False, train=False):
            return rewriter_apply(params, cfg, rng, x, lx, dec_y, tf_rate,
                                  init_force, train, unroll,
                                  compute_dtype=compute_dtype)

        return apply_fn

    return make_apply


def inject_lm_vocab(cfg_dict: dict) -> dict:
    """Derived-config injection for the LM (reference src/lmtrain.py:270-278)."""
    cfg_dict["model"]["configs"]["vocab_size"] = len(constants.VOCAB)
    cfg_dict["model"]["configs"]["CHR_SOS_IDX"] = constants.SOS_IDX
    cfg_dict["model"]["configs"]["CHR_PAD_IDX"] = constants.EOS_IDX
    cfg_dict["VOCAB"] = list(constants.VOCAB)
    cfg_dict["VOCAB_MAP"] = dict(constants.VOCAB_MAP)
    cfg_dict["EOS_IDX"] = constants.EOS_IDX
    cfg_dict["SOS_IDX"] = constants.SOS_IDX
    return cfg_dict


def main(args):
    from attention_based_e2e_asr_dnn_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    trncfgs_dict = inject_lm_vocab(load_yaml(args.config_file))
    trncfgs = Config(trncfgs_dict)

    wandb_cfg = getattr(trncfgs, "wandb", None)
    logger = MetricLogger(
        use_wandb=bool(wandb_cfg and wandb_cfg.use),
        wandb_configs=getattr(wandb_cfg, "configs", None),
        run_config=trncfgs_dict,
    )
    tgt_folder = experiment_folder(trncfgs.EXP_FOLDER, logger.run_name)
    snapshot_config(trncfgs_dict, tgt_folder)

    trn_ds = LmTrainDevDataset(trncfgs.TRN_FOLDER, trncfgs.TRN_PRED_DIR,
                               constants.VOCAB_MAP)
    dev_ds = LmTrainDevDataset(trncfgs.DEV_FOLDER, trncfgs.DEV_PRED_DIR,
                               constants.VOCAB_MAP)
    pad_mult = int(getattr(trncfgs, "pad_label_multiple", 32))
    trn_batcher = BucketBatcher(
        trn_ds, trncfgs.batch_size, pad_time_multiple=pad_mult,
        pad_label_multiple=pad_mult, label_pad_id=constants.EOS_IDX,
        shuffle=True, seed=int(trncfgs.seed),
    )
    dev_batcher = BucketBatcher(
        dev_ds, trncfgs.batch_size, pad_time_multiple=pad_mult,
        pad_label_multiple=pad_mult, label_pad_id=constants.EOS_IDX,
    )
    print(f"[data] {len(trn_batcher)} train batches, {len(dev_batcher)} dev batches")

    lm_cfg = RewriterConfig(**trncfgs.model.configs)
    compute_dtype = (jnp.bfloat16 if getattr(trncfgs, "compute_dtype", "float32")
                     == "bfloat16" else jnp.float32)

    # optional data / data x model parallelism over a device mesh — the same
    # `parallel:` configs as the LAS entry (train.py). The TP placement
    # pattern-matches the Rewriter's param names too (w_ih/w_hh gate
    # matrices, the 3-way-shared char_emb), so tensor parallelism carries
    # over unchanged. Sequence/pipeline parallelism are LAS-only (the
    # Rewriter has no listener|speller split and its encoder is not
    # time-shardable through a config hook); rejected with clear errors.
    shard_batch = None
    shard_state = None
    dp_mesh = None
    par = getattr(trncfgs, "parallel", None)
    if par is not None and par.use:
        from attention_based_e2e_asr_dnn_tpu.parallel.mesh import (
            make_mesh,
            make_mesh_2d,
            shard_batch_fn,
            shard_train_state,
        )

        if int(getattr(par, "pipeline", 0) or 0) > 0:
            raise ValueError(
                "parallel: pipeline is LAS-only (the Rewriter has no "
                "listener|speller stage split)")
        if int(getattr(par, "sequence", 0) or 0) > 1:
            raise ValueError(
                "parallel: sequence is LAS-only (no encoder-output "
                "sharding hook on the Rewriter)")
        model_par = int(getattr(par, "model", 1) or 1)
        if model_par > 1:
            # same TP x Pallas boundary as train.py: TP shards the gate
            # matrices, which the fused kernels cannot consume sharded
            _pallas_flags = [
                name for name, v in (
                    ("lstm_impl", getattr(lm_cfg, "lstm_impl", "scan")),
                    ("decoder_impl", getattr(lm_cfg, "decoder_impl",
                                             "scan")),
                ) if v == "pallas"]
            if _pallas_flags:
                raise ValueError(
                    f"parallel: model={model_par} (tensor parallelism) "
                    f"requires the scan implementations, but "
                    f"{' and '.join(_pallas_flags)} is 'pallas'. Use scan "
                    "impls with parallel.model, or keep the Pallas tiers "
                    "and scale with parallel.data.")
            mesh = make_mesh_2d(getattr(par, "data", None), model_par)
            shard_state = lambda s: shard_train_state(s, mesh)
            print(f"[parallel] 2-D mesh: data={mesh.shape['data']} x "
                  f"model={mesh.shape['model']}")
        else:
            mesh = make_mesh(getattr(par, "data", None)
                             or getattr(par, "n_devices", None))
            print(f"[parallel] data-parallel mesh over {mesh.size} devices "
                  "(shard_map: per-device batch shards, explicit psum)")
            # pure DP rides shard_map (parallel/dp.py) like the LAS entry —
            # the Rewriter's Pallas tiers run per shard by construction
            dp_mesh = mesh
        shard_batch = shard_batch_fn(mesh)

    trainer = Trainer(
        init_fn=lambda rng: rewriter_init(rng, lm_cfg),
        make_apply=make_rewriter_apply_factory(lm_cfg,
                                               compute_dtype=compute_dtype),
        trn_batcher=trn_batcher,
        dev_batcher=dev_batcher,
        trncfgs=trncfgs,
        saving_dir=tgt_folder,
        sos_idx=constants.SOS_IDX,
        eos_idx=constants.EOS_IDX,
        compute_dtype=compute_dtype,
        logger=logger,
        shard_batch=shard_batch,
        shard_state=shard_state,
        dp_mesh=dp_mesh,
    )
    trainer.train_eval(int(trncfgs.epochs))
    dump_log_json(os.path.join(tgt_folder, "log.json"),
                  trainer.train_history, trainer.dev_history)
    logger.finish()

    # optional: emit a deployable correction artifact from the best ckpt.
    #   export_artifact: {batch: 8, t_pad: 256, beam_size: 0, gate: true}
    # (mirrors train.py's hook; see docs/deployment.md §3)
    exp_cfg = getattr(trncfgs, "export_artifact", None)
    if exp_cfg:
        from attention_based_e2e_asr_dnn_tpu.export import (
            export_corrector_from_experiment,
        )

        try:
            batch = int(getattr(exp_cfg, "batch", 8))
            t_pad = int(getattr(exp_cfg, "t_pad", 256))
            out = os.path.join(tgt_folder, "artifacts",
                               f"corrector-b{batch}-t{t_pad}.tlas")
            export_corrector_from_experiment(
                tgt_folder, out, batch=batch, t_pad=t_pad,
                average=bool(getattr(exp_cfg, "average", False)),
                beam_size=int(getattr(exp_cfg, "beam_size", 0)),
                gate=bool(getattr(exp_cfg, "gate", True)),
            )
            print(f"exported correction artifact: {out}")
        except Exception as exc:
            import sys

            print(f"WARNING: export_artifact failed: {exc}",
                  file=sys.stderr)
    return trainer


def build_argparser():
    parser = argparse.ArgumentParser(description="Training the Rewriter LM on TPU")
    parser.add_argument("--config-file", "-c", type=str,
                        default="./configs/rewriter.yml",
                        help="filepath to the configuration file")
    return parser


if __name__ == "__main__":
    main(build_argparser().parse_args())
