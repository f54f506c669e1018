"""Native C++ tier: batch Levenshtein kernel + npy batch assembler.

These tests require native/libasrtpu.so (built by `make -C native`); they
skip when it isn't present so the pure-Python fallbacks keep the suite green.
"""

import os
import subprocess

import numpy as np
import pytest

from attention_based_e2e_asr_dnn_tpu.constants import EOS_IDX, SOS_IDX
import importlib

lev_mod = importlib.import_module(
    "attention_based_e2e_asr_dnn_tpu.utils.levenshtein"
)
from attention_based_e2e_asr_dnn_tpu.data import native_loader

NATIVE = lev_mod._load_native()


@pytest.mark.skipif(not NATIVE, reason="native library not built")
def test_native_levenshtein_matches_python():
    rng = np.random.default_rng(0)
    B, Tp, Tg = 16, 40, 35
    pred = rng.integers(0, 30, size=(B, Tp)).astype(np.int32)
    gold = rng.integers(0, 30, size=(B, Tg)).astype(np.int32)
    lens = rng.integers(1, Tg, size=(B,)).astype(np.int32)

    native = lev_mod.batch_levenshtein(pred, gold, lens, SOS_IDX, EOS_IDX)

    total = 0
    for b in range(B):
        p = lev_mod._trim_ids(pred[b], SOS_IDX, EOS_IDX)
        g = lev_mod._trim_ids(gold[b, : lens[b]], SOS_IDX, EOS_IDX)
        total += lev_mod.levenshtein(p, g)
    assert native == pytest.approx(total / B)


@pytest.mark.skipif(not native_loader.native_available(),
                    reason="native library not built")
def test_native_npy_assembler_matches_numpy(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    arrays = []
    for i, t in enumerate([37, 80, 5]):
        a = rng.normal(size=(t, 15)).astype(np.float32)
        p = str(tmp_path / f"u{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)

    x, lengths = native_loader.assemble_batch(paths, t_pad=96, n_feats=15)
    assert x.shape == (3, 96, 15)
    assert list(lengths) == [37, 80, 5]
    for b, a in enumerate(arrays):
        np.testing.assert_array_equal(x[b, : len(a)], a)
        assert np.all(x[b, len(a):] == 0.0)


@pytest.mark.skipif(not native_loader.native_available(),
                    reason="native library not built")
def test_native_npy_assembler_truncates_long(tmp_path):
    a = np.ones((50, 15), np.float32)
    p = str(tmp_path / "long.npy")
    np.save(p, a)
    x, lengths = native_loader.assemble_batch([p], t_pad=32, n_feats=15)
    assert lengths[0] == 32
    assert np.all(x[0] == 1.0)
