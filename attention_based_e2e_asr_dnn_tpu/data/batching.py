"""Length-bucketed static-shape batching.

XLA traces one program per distinct input shape, so the reference's
sort-within-batch + pad-to-batch-max collate (src/utils.py:95-128) would
trigger a recompile per batch. Instead:

  * examples are sorted by feature length and chunked into batches of
    ``batch_size`` (tight padding, like the reference test loader's global
    length sort, src/utils.py:148-149);
  * every batch is padded UP to shape buckets: time to a multiple of
    ``pad_time_multiple`` (itself a multiple of 2**plstm_layers so pyramid
    reshapes stay exact) and label length to a multiple of
    ``pad_label_multiple`` — bounding the number of compiled programs;
  * batch ORDER is shuffled per epoch, and examples are shuffled within
    windows of ``shuffle_window`` batches so batch composition varies across
    epochs without destroying the length sort.

Features pad with 0.0 and transcripts with the EOS/PAD id, matching the
reference collate (src/utils.py:96).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np


def pad_to_multiple(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


@dataclass
class Batch:
    """One padded batch. ``indices`` are original dataset positions."""

    x: np.ndarray                    # (B, T, F) float32 or (B, T) int32 for LM
    lx: np.ndarray                   # (B,)
    y: Optional[np.ndarray] = None   # (B, L) int32
    ly: Optional[np.ndarray] = None  # (B,)
    indices: Optional[np.ndarray] = None


class BucketBatcher:
    """Length-bucketed batch planner over a dataset of variable-length examples.

    Works for both feature datasets (x: (T, F) float) and id datasets
    (x: (T,) int). Non-full final batches are padded by repeating the last
    example, with ``valid`` marking real rows (static batch size for XLA);
    repeated rows carry index -1.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        pad_time_multiple: int = 128,
        pad_label_multiple: int = 32,
        label_pad_id: int = 29,
        has_labels: bool = True,
        shuffle: bool = False,
        shuffle_window: int = 4,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_time_multiple = pad_time_multiple
        self.pad_label_multiple = pad_label_multiple
        self.label_pad_id = label_pad_id
        self.has_labels = has_labels
        self.shuffle = shuffle
        self.shuffle_window = shuffle_window
        self.seed = seed
        self.drop_last = drop_last
        if hasattr(dataset, "feature_lengths"):
            # lazy datasets expose lengths without loading payloads
            self._lengths = np.asarray(dataset.feature_lengths, dtype=np.int64)
        else:
            lengths = []
            for i in range(len(dataset)):
                item = dataset[i]
                x = item[0] if has_labels else item
                lengths.append(len(x))
            self._lengths = np.array(lengths, dtype=np.int64)
        self._sorted = np.argsort(-self._lengths, kind="stable")

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_plan(self, epoch: int) -> List[np.ndarray]:
        order = self._sorted.copy()
        rng = np.random.default_rng(self.seed + epoch)
        if self.shuffle and self.shuffle_window > 0:
            window = self.shuffle_window * self.batch_size
            for start in range(0, len(order), window):
                seg = order[start : start + window]
                rng.shuffle(seg)
                order[start : start + window] = seg
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.shuffle:
            rng.shuffle(batches)
        return batches

    def _assemble(self, idx: np.ndarray) -> Batch:
        take = list(idx)
        n_real = len(take)
        while len(take) < self.batch_size:  # repeat-pad the final batch
            take.append(take[-1])

        if hasattr(self.dataset, "assemble"):
            # lazy path: the native C++ thread pool reads + pads features in
            # one pass; labels (if any) come from the dataset's in-RAM
            # transcripts via label(i) — no per-item feature loads
            t_pad = pad_to_multiple(
                int(self._lengths[take].max()), self.pad_time_multiple
            )
            x, lx = self.dataset.assemble(take, t_pad)
            indices = np.array(
                list(idx) + [-1] * (self.batch_size - n_real), dtype=np.int64
            )
            if not self.has_labels:
                return Batch(x=x, lx=lx, indices=indices)
            ys = [self.dataset.label(i) for i in take]
            y, ly = self._pad_labels(ys)
            return Batch(x=x, lx=lx, y=y, ly=ly, indices=indices)

        items = [self.dataset[i] for i in take]
        if self.has_labels:
            xs = [it[0] for it in items]
            ys = [it[1] for it in items]
        else:
            xs = items
            ys = None

        lx = np.array([len(x) for x in xs], dtype=np.int32)
        t_pad = pad_to_multiple(int(lx.max()), self.pad_time_multiple)
        if xs[0].ndim == 2:
            x = np.zeros((self.batch_size, t_pad, xs[0].shape[1]), dtype=np.float32)
            for b, ex in enumerate(xs):
                x[b, : len(ex)] = ex
        else:
            x = np.full((self.batch_size, t_pad), self.label_pad_id, dtype=np.int32)
            for b, ex in enumerate(xs):
                x[b, : len(ex)] = ex

        indices = np.array(
            list(idx) + [-1] * (self.batch_size - n_real), dtype=np.int64
        )

        if ys is None:
            return Batch(x=x, lx=lx, indices=indices)

        y, ly = self._pad_labels(ys)
        return Batch(x=x, lx=lx, y=y, ly=ly, indices=indices)

    def _pad_labels(self, ys):
        ly = np.array([len(y) for y in ys], dtype=np.int32)
        l_pad = pad_to_multiple(int(ly.max()), self.pad_label_multiple)
        y = np.full((self.batch_size, l_pad), self.label_pad_id, dtype=np.int32)
        for b, ey in enumerate(ys):
            y[b, : len(ey)] = ey
        return y, ly

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        for idx in self._batch_plan(epoch):
            yield self._assemble(idx)

    def __iter__(self) -> Iterator[Batch]:
        return self.epoch(0)


class ThreadedPrefetcher:
    """Background-thread batch prefetch — the role the reference gave
    torch DataLoader worker processes (src/train.py:553,581 num_workers).

    Wraps any batch iterator and assembles up to ``depth`` batches ahead on a
    worker thread; the native C++ assembler and numpy IO release the GIL, so
    file reads + padding overlap the main thread's dispatch work. Order is
    preserved. Exceptions propagate to the consumer.
    """

    _DONE = object()

    def __init__(self, batch_iter: Iterator[Batch], depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer closed us — an
            abandoned iterator must not pin the worker (and its assembled
            batches) on a full queue forever."""
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in batch_iter:
                    if not _put(item):
                        return
            except BaseException as exc:  # re-raised on the consumer side
                _put(exc)
                return
            _put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the worker and drop any queued batches (idempotent)."""
        import queue

        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=2.0)

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        item = self._q.get()
        if item is self._DONE:
            self._thread.join()
            raise StopIteration
        if isinstance(item, BaseException):
            self._thread.join()
            raise item
        return item
