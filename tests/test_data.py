"""Data layer: datasets, bucketed batching, on-device SpecAugment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.constants import EOS_IDX, VOCAB_MAP
from attention_based_e2e_asr_dnn_tpu.data.batching import Batch, BucketBatcher, pad_to_multiple
from attention_based_e2e_asr_dnn_tpu.data.datasets import (
    AsrTestDataset,
    AsrTrainDevDataset,
    LmTrainDevDataset,
    ToyTrainDevDataset,
)
from attention_based_e2e_asr_dnn_tpu.data.specaug import specaugment


class _FakeSet:
    """Variable-length (T, F) features with (L,) labels."""

    def __init__(self, lengths, label_lengths, n_feats=15):
        rng = np.random.default_rng(0)
        self.items = [
            (rng.normal(size=(t, n_feats)).astype(np.float32),
             rng.integers(0, 30, size=(l,)).astype(np.int32))
            for t, l in zip(lengths, label_lengths)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_pad_to_multiple():
    assert pad_to_multiple(1, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(9, 8) == 16


def test_batcher_static_shapes_and_padding():
    ds = _FakeSet([100, 50, 130, 20, 77], [10, 5, 13, 2, 7])
    b = BucketBatcher(ds, batch_size=2, pad_time_multiple=64,
                      pad_label_multiple=16, label_pad_id=EOS_IDX)
    batches = list(b.epoch(0))
    assert len(batches) == 3
    for bt in batches:
        assert bt.x.shape[0] == 2               # static batch size
        assert bt.x.shape[1] % 64 == 0          # time bucket
        assert bt.y.shape[1] % 16 == 0          # label bucket
        # features zero-padded, labels EOS-padded (reference src/utils.py:96)
        for i in range(2):
            assert np.all(bt.x[i, bt.lx[i]:] == 0.0)
            assert np.all(bt.y[i, bt.ly[i]:] == EOS_IDX)


def test_batcher_covers_all_examples_once():
    ds = _FakeSet([30, 40, 50, 60, 70], [3, 4, 5, 6, 7])
    b = BucketBatcher(ds, batch_size=2, pad_time_multiple=8, pad_label_multiple=8)
    seen = []
    for bt in b.epoch(0):
        seen.extend(i for i in bt.indices if i >= 0)
    assert sorted(seen) == [0, 1, 2, 3, 4]


def test_batcher_shuffles_batch_order_across_epochs():
    ds = _FakeSet(list(range(20, 120, 5)), [5] * 20)
    b = BucketBatcher(ds, batch_size=4, shuffle=True, seed=1)
    e0 = [tuple(bt.indices) for bt in b.epoch(0)]
    e1 = [tuple(bt.indices) for bt in b.epoch(1)]
    assert e0 != e1
    flat = sorted(i for bt in e0 for i in bt if i >= 0)
    assert flat == list(range(20))


def test_batcher_length_sorted_batches_are_tight():
    ds = _FakeSet([800, 790, 100, 90], [10, 10, 10, 10])
    b = BucketBatcher(ds, batch_size=2, pad_time_multiple=8, shuffle=False)
    shapes = sorted(bt.x.shape[1] for bt in b.epoch(0))
    assert shapes == [104, 800]  # long pair together, short pair together


def test_specaugment_masks_and_preserves_shape():
    x = jnp.ones((3, 64, 15))
    out = specaugment(jax.random.key(0), x, freq_mask_param=6, time_mask_param=20)
    o = np.asarray(out)
    assert o.shape == (3, 64, 15)
    assert np.all((o == 0.0) | (o == 1.0))
    assert o.sum() < x.size            # something was masked
    assert o.sum() > 0.5 * x.size      # but not everything
    # batch-shared masks by default (torchaudio 3-D semantics)
    assert np.array_equal(o[0], o[1])


def test_specaugment_iid_differs_per_example():
    x = jnp.ones((4, 64, 15))
    o = np.asarray(specaugment(jax.random.key(3), x, 6, 30, iid=True))
    assert any(not np.array_equal(o[0], o[i]) for i in range(1, 4))


def test_asr_datasets_from_disk(tmp_path):
    # fabricate a reference-layout data dir: mfcc/*.npy + transcript/raw/*.npy
    mfcc = tmp_path / "mfcc"
    raw = tmp_path / "transcript" / "raw"
    mfcc.mkdir()
    raw.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i, (t, text) in enumerate([(50, "AB"), (30, "HI THERE")]):
        np.save(mfcc / f"utt{i}.npy", rng.normal(size=(t, 15)).astype(np.float32))
        np.save(raw / f"utt{i}.npy",
                np.array(["<sos>"] + list(text) + ["<eos>"]))
    ds = AsrTrainDevDataset(std_dir=str(tmp_path), label_to_idx=VOCAB_MAP,
                            keep_tags=True)
    assert len(ds) == 2
    x, y = ds[0]
    assert x.shape == (50, 15)
    assert y[0] == VOCAB_MAP["<sos>"] and y[-1] == EOS_IDX
    # strip tags
    ds2 = AsrTrainDevDataset(std_dir=str(tmp_path), label_to_idx=VOCAB_MAP,
                             keep_tags=False)
    assert len(ds2[0][1]) == len(ds[0][1]) - 2

    tst = AsrTestDataset(std_dir=str(tmp_path))
    assert len(tst) == 2 and tst[1].shape == (30, 15)


def test_lm_dataset(tmp_path):
    trans = tmp_path / "trans"
    trans.mkdir()
    np.save(trans / "a.npy", np.array(list("HI")))
    np.save(trans / "b.npy", np.array(list("YO")))
    preds = tmp_path / "preds.txt"
    preds.write_text("HA\nYO\n")
    ds = LmTrainDevDataset(str(trans), str(preds), VOCAB_MAP)
    p, t = ds[0]
    assert p[0] == VOCAB_MAP["<sos>"] and p[-1] == EOS_IDX
    assert list(t) == [VOCAB_MAP["H"], VOCAB_MAP["I"]]


def test_lazy_dataset_native_assembly(tmp_path):
    """Lazy disk-backed dataset: header-only lengths + batch assembly."""
    from attention_based_e2e_asr_dnn_tpu.data.lazy import (
        LazyAsrTestDataset, npy_header_shape)

    mfcc = tmp_path / "mfcc"
    mfcc.mkdir()
    rng = np.random.default_rng(3)
    arrays = []
    for i, t in enumerate([60, 35, 90, 10]):
        a = rng.normal(size=(t, 15)).astype(np.float32)
        np.save(mfcc / f"u{i}.npy", a)
        arrays.append(a)

    assert npy_header_shape(str(mfcc / "u0.npy")) == (60, 15)

    ds = LazyAsrTestDataset(str(tmp_path))
    assert list(ds.feature_lengths) == [60, 35, 90, 10]

    b = BucketBatcher(ds, batch_size=2, pad_time_multiple=32, has_labels=False)
    seen = {}
    for bt in b.epoch(0):
        assert bt.x.shape[1] % 32 == 0
        for row, orig in enumerate(bt.indices):
            if orig >= 0:
                seen[int(orig)] = (bt.x[row], int(bt.lx[row]))
    assert sorted(seen) == [0, 1, 2, 3]
    for i, a in enumerate(arrays):
        x_row, lx = seen[i]
        assert lx == len(a)
        np.testing.assert_array_equal(x_row[: len(a)], a)
        assert np.all(x_row[len(a):] == 0.0)


def test_lazy_train_dev_dataset_matches_eager(tmp_path):
    """Disk-backed train/dev batches == the in-RAM dataset's batches."""
    from attention_based_e2e_asr_dnn_tpu.data.datasets import AsrTrainDevDataset
    from attention_based_e2e_asr_dnn_tpu.data.lazy import LazyAsrTrainDevDataset

    mfcc = tmp_path / "mfcc"
    raw = tmp_path / "transcript" / "raw"
    mfcc.mkdir()
    raw.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i, (t, text) in enumerate(zip([48, 21, 70], ["HI", "YO", "HEY"])):
        np.save(mfcc / f"u{i}.npy", rng.normal(size=(t, 15)).astype(np.float32))
        np.save(raw / f"u{i}.npy", np.array(["<sos>"] + list(text) + ["<eos>"]))

    eager = AsrTrainDevDataset(std_dir=str(tmp_path), label_to_idx=VOCAB_MAP)
    lazy = LazyAsrTrainDevDataset(str(tmp_path), VOCAB_MAP)
    assert list(lazy.feature_lengths) == [48, 21, 70]

    def batches(ds):
        b = BucketBatcher(ds, batch_size=2, pad_time_multiple=16,
                          pad_label_multiple=8)
        return list(b.epoch(0))

    for be, bl in zip(batches(eager), batches(lazy)):
        np.testing.assert_array_equal(bl.x, be.x)
        np.testing.assert_array_equal(bl.lx, be.lx)
        np.testing.assert_array_equal(bl.y, be.y)
        np.testing.assert_array_equal(bl.ly, be.ly)
        np.testing.assert_array_equal(bl.indices, be.indices)

    # item contract matches too (feature loaded on demand)
    xf, yt = lazy[1]
    np.testing.assert_array_equal(xf, eager[1][0])
    np.testing.assert_array_equal(yt, eager[1][1])


def test_lm_dataset_reads_submission_csv(tmp_path):
    """LmTrainDevDataset accepts infer.py's id,label submission CSVs."""
    trans = tmp_path / "trans"
    trans.mkdir()
    np.save(trans / "a.npy", np.array(list("HI")))
    np.save(trans / "b.npy", np.array(list("YO")))
    csv_path = tmp_path / "preds.csv"
    csv_path.write_text("id,label\n0,HA\n1,YO\n")
    ds = LmTrainDevDataset(str(trans), str(csv_path), VOCAB_MAP)
    p, t = ds[0]
    assert p[0] == VOCAB_MAP["<sos>"] and p[-1] == EOS_IDX
    assert [VOCAB_MAP["H"], VOCAB_MAP["A"]] == list(p[1:-1])


def test_threaded_prefetcher_preserves_order_and_errors(tmp_path):
    from attention_based_e2e_asr_dnn_tpu.data.batching import ThreadedPrefetcher

    items = list(range(20))
    out = list(ThreadedPrefetcher(iter(items), depth=3))
    assert out == items

    def boom():
        yield 1
        raise ValueError("assembler failed")

    it = ThreadedPrefetcher(boom(), depth=2)
    assert next(it) == 1
    try:
        next(it)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "assembler failed" in str(e)


def test_threaded_prefetcher_close_unblocks_worker():
    """An abandoned consumer must be able to shut the worker down — without
    close() the thread would block forever on a full queue."""
    import itertools
    import time

    from attention_based_e2e_asr_dnn_tpu.data.batching import (
        ThreadedPrefetcher,
    )

    pf = ThreadedPrefetcher(iter(itertools.repeat(object())), depth=2)
    next(pf)  # consumer takes one, then abandons
    pf.close()
    deadline = time.time() + 3.0
    while pf._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not pf._thread.is_alive()
