"""Host-streaming window loader for trajectory stores that exceed HBM.

The default path (``data/windows.py``) keeps the whole store on device and
gathers windows inside the jitted step.  Production NS stores (256^2 x
1000 frames x hundreds of trajectories) do not fit; this loader keeps the
store in host RAM, gathers windows with NumPy, and overlaps the gather of
batch k+1 with device compute of batch k via a single-slot prefetch
thread (the TPU analogue of the reference's DataLoader worker prefetch,
``config_ns.yaml:18``).

Batches match ``gather_windows`` bit-for-bit (tested in
tests/test_stream.py), so ``build_baseline_step(...).xy`` consumes them
unchanged.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def _gather_np(data: np.ndarray, idx: np.ndarray, initial_step: int, rollout: int):
    span = initial_step + rollout
    offs = np.arange(span)
    win = data[idx[:, 0, None], idx[:, 1, None] + offs[None, :]]
    win = np.moveaxis(win, 1, -2)
    return (
        np.ascontiguousarray(win[..., :initial_step, :]),
        np.ascontiguousarray(win[..., initial_step:, :]),
    )


class HostWindowLoader:
    """Iterable of ``(x, y)`` window batches gathered on the host.

    Args:
      data: ``(N, T, *spatial, C)`` host array (np.memmap works too, so a
        store can stream straight off disk).
      index: ``(n, 2)`` int32 (trajectory, t0) rows.
      initial_step / rollout: window split, as in ``gather_windows``.
      batch_size: fixed batch size; the remainder is dropped, and when
        fewer rows than ``batch_size`` exist they are tiled to one batch
        (same policy as ``epoch_batches`` for jit-cache stability).
      shuffle: reshuffle rows each epoch.
      seed: RNG seed for shuffling.
      prefetch: overlap next-batch gather with consumer compute.
    """

    def __init__(self, data, index, initial_step: int, rollout: int,
                 batch_size: int, shuffle: bool = True, seed: int | None = None,
                 prefetch: bool = True):
        self.data = np.asarray(data)
        self.index = np.asarray(index, np.int32)
        self.initial_step = int(initial_step)
        self.rollout = int(rollout)
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.prefetch = bool(prefetch)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return max(len(self.index) // self.batch_size, 1)

    def _epoch_order(self) -> np.ndarray:
        n = len(self.index)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        if n < self.batch_size:
            reps = -(-self.batch_size // max(n, 1))
            return np.tile(order, reps)[: self.batch_size]
        return order

    def _epoch_rows(self):
        order = self._epoch_order()
        for b in range(len(self)):
            yield self.index[order[b * self.batch_size : (b + 1) * self.batch_size]]

    def _batches(self):
        for rows in self._epoch_rows():
            yield _gather_np(self.data, rows, self.initial_step, self.rollout)

    def __iter__(self):
        if not self.prefetch:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()

        def worker():
            try:
                for item in self._batches():
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()


class AuxHostWindowLoader(HostWindowLoader):
    """Host-streaming loader for aux joint training.

    Yields ``(x, y, xa, ya)`` batches: primary windows plus their paired
    aux windows at the same t0, gathered from a second host-resident
    store.  Pairing follows the trainer's semantics
    (``train/fno_train.build_aux_step``): ``row_map`` ((Np, nA) int32)
    when given (NS per-file pairing), else the DR scheme
    ``p*num_aux + (0..num_aux-1)``.
    """

    def __init__(self, data, aux_data, index, initial_step: int, rollout: int,
                 batch_size: int, num_aux: int, row_map=None, **kw):
        super().__init__(data, index, initial_step, rollout, batch_size, **kw)
        self.aux_data = np.asarray(aux_data)
        self.num_aux = int(num_aux)
        self.row_map = None if row_map is None else np.asarray(row_map, np.int64)

    def _batches(self):
        for rows in self._epoch_rows():
            x, y = _gather_np(self.data, rows, self.initial_step, self.rollout)
            p, t0 = rows[:, 0], rows[:, 1]
            if self.row_map is None:
                offs = np.arange(self.num_aux)
                ap = (p[:, None] * self.num_aux + offs[None, :]).reshape(-1)
            else:
                ap = self.row_map[p].reshape(-1)
            a_rows = np.stack(
                [ap, np.repeat(t0, self.num_aux)], axis=1
            ).astype(np.int32)
            xa, ya = _gather_np(self.aux_data, a_rows, self.initial_step, self.rollout)
            yield x, y, xa, ya
