"""Core layer tests: vocabulary, config tree, Levenshtein metric."""

import json
import os

import pytest

from attention_based_e2e_asr_dnn_tpu.constants import EOS_IDX, SOS_IDX, VOCAB, VOCAB_MAP
from attention_based_e2e_asr_dnn_tpu.config import Config, inject_vocab, load_config, snapshot_config
from attention_based_e2e_asr_dnn_tpu.utils.levenshtein import (
    batch_levenshtein,
    ids_to_str,
    levenshtein,
)

import numpy as np


def test_vocab_parity():
    # 30 symbols, <sos>=0, <eos>=29 doubling as pad (reference src/constants.py:6-19)
    assert len(VOCAB) == 30
    assert SOS_IDX == 0
    assert EOS_IDX == 29
    assert VOCAB[0] == "<sos>" and VOCAB[29] == "<eos>"
    assert VOCAB_MAP["A"] == 1 and VOCAB_MAP[" "] == 28 and VOCAB_MAP["'"] == 27


def test_config_splat_semantics():
    cfg = Config({
        "model": {"tag": "base", "configs": {"a": 1, "nested": {"b": 2}}},
        "optimizer": {"name": "adamw", "configs": {"lr": 1e-3}},
        "batch_size": 96,
    })
    # keys ending in `configs` stay dicts for ** splat (reference src/utils.py:31)
    assert isinstance(cfg.model.configs, dict)
    assert cfg.model.configs["nested"] == {"b": 2}
    assert cfg.model.tag == "base"
    assert cfg.optimizer.configs == {"lr": 1e-3}
    assert cfg.batch_size == 96


def test_config_snapshot_roundtrip(tmp_path):
    d = {"model": {"configs": {"speller_configs": {}}}, "seed": 1}
    d = inject_vocab(d, VOCAB, VOCAB_MAP)
    path = snapshot_config(d, str(tmp_path))
    cfg = load_config(path)
    assert cfg.model.configs["speller_configs"]["dec_vocab_size"] == 30
    assert cfg.model.configs["speller_configs"]["CHR_PAD_IDX"] == 29
    assert cfg.EOS_IDX == 29 and cfg.SOS_IDX == 0
    assert cfg.VOCAB == VOCAB


def test_levenshtein_basic():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein([1, 2, 3], [1, 3]) == 1


def test_ids_to_str_skips_sos_stops_at_eos():
    seq = [SOS_IDX, 8, 9, EOS_IDX, 1, 2]
    assert ids_to_str(seq, VOCAB, SOS_IDX, EOS_IDX) == "HI"


def test_batch_levenshtein_matches_string_distance():
    # "CAB<eos>pad" vs gold "CB"
    pred = np.array([[3, 1, 2, EOS_IDX, 5]], dtype=np.int32)
    gold = np.array([[3, 2, EOS_IDX, EOS_IDX, EOS_IDX]], dtype=np.int32)
    lens = np.array([3], dtype=np.int32)  # gold content incl. its eos
    d = batch_levenshtein(pred, gold, lens, SOS_IDX, EOS_IDX)
    assert d == levenshtein("CAB", "CB") == 1


def test_resolve_vocab_mini_branch(tmp_path):
    """Mini-dataset vocab rebuild (reference src/train.py:495-501)."""
    from attention_based_e2e_asr_dnn_tpu.train import resolve_vocab

    mini = tmp_path / "mini-data"
    mini.mkdir()
    labels = np.array([["[SOS]", "A", "B", "[EOS]"],
                       ["[SOS]", "B", "C", "[EOS]"]])
    np.save(mini / "dev_labels.npy", labels)
    use_mini, vocab, vocab_map, sos_key, eos_key = resolve_vocab(
        {"TRN_FOLDER": str(mini)})
    assert use_mini
    assert sos_key == "[SOS]" and eos_key == "[EOS]"
    assert "[PAD]" in vocab_map
    assert set(vocab) == {"[SOS]", "[EOS]", "A", "B", "C", "[PAD]"}

    use_mini2, vocab2, *_ = resolve_vocab({"TRN_FOLDER": "data/train-clean-100"})
    assert not use_mini2 and len(vocab2) == 30


def test_cfg_float_zero_survives():
    """Explicit 0 must survive (0 = 'disable the length cap'); only absent or
    null keys fall back to the default (ADVICE r2 #1)."""
    from attention_based_e2e_asr_dnn_tpu.config import Config, cfg_float

    cfg = Config({"max_len_factor": 0, "other": 1.5, "nul": None})
    assert cfg_float(cfg, "max_len_factor", 3.0) == 0.0
    assert cfg_float(cfg, "other", 3.0) == 1.5
    assert cfg_float(cfg, "nul", 3.0) == 3.0
    assert cfg_float(cfg, "missing", 3.0) == 3.0


def test_bench_realistic_planner():
    """bench.py realistic mode: length-sorted static buckets with real pad
    waste (lx < T), flagship pad multiples, plausible long-form lengths."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import plan_realistic_batches

    plans, waste = plan_realistic_batches(128)
    assert plans and 0.03 < waste < 0.35
    for t_pad, l_pad, lx, ly in plans:
        assert t_pad % 256 == 0 and l_pad % 32 == 0
        assert lx.max() <= t_pad and ly.max() <= l_pad
        assert lx.min() > 0 and len(lx) == 128
    # mixed shapes (the dense bench's single shape is the dishonest part)
    assert len({(t, l) for t, l, _, _ in plans}) >= 3


def test_probe_backend_true_on_cpu_and_false_on_timeout():
    """probe_backend: True when the probed code can init a backend; False
    when it cannot finish in time. The sitecustomize pin ignores env
    overrides, so steering to CPU must happen IN the probed code."""
    from attention_based_e2e_asr_dnn_tpu.utils.backend import probe_backend

    cpu = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
           "jax.devices()")
    assert probe_backend(timeout_s=120, code=cpu) is True
    assert probe_backend(timeout_s=0.01, code=cpu) is False
    # default probe short-circuits in a cpu-forced process (this one)
    assert probe_backend(timeout_s=0.01) is True
