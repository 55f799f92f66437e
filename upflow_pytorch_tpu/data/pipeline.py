"""Host-side input pipeline: threaded decode + batch + device prefetch.

Replaces the reference's ``tools.data_prefetcher`` / ``DataProvider``
(/root/reference/utils/tools.py:166-252), which wrap a torch DataLoader and
copy batches to the GPU on a side stream.  Here: a thread pool decodes and
augments items, batches are assembled as pinned numpy arrays, and up to
``prefetch`` batches are device_put ahead of consumption so the TPU never
waits on the host (the JAX analog of the side-stream H2D copy).

Deterministic iteration: per-epoch order comes from a seeded RNG, and the
loader's (epoch, position) cursor is exposed for checkpointing so training
can resume mid-epoch — a capability the reference lacks.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

import jax


def _stack_batch(items):
    if isinstance(items[0], dict):
        return {k: np.stack([it[k] for it in items]) for k in items[0]}
    return np.stack(items)


class DataLoader:
    """Epoch-shuffled, thread-decoded, device-prefetched batch loader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True, seed: int = 0,
                 prefetch: int = 2, device=None, epoch: int = 0,
                 position: int = 0,
                 post_fn: Optional[Callable[[Dict[str, np.ndarray]], Any]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.device = device
        self.post_fn = post_fn
        self.epoch = epoch
        self.position = position  # batch index within the epoch
        self._pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # --- iteration state (for checkpoint/resume) ---
    def state(self) -> Dict[str, int]:
        return {"epoch": self.epoch, "position": self.position, "seed": self.seed}

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState((self.seed * 100003 + epoch) % (2 ** 31)
                                  ).shuffle(order)
        return order

    def _produce(self):
        while not self._stop.is_set():
            order = self._epoch_order(self.epoch)
            n_batches = (len(order) // self.batch_size if self.drop_last
                         else -(-len(order) // self.batch_size))
            while self.position < n_batches:
                if self._stop.is_set():
                    return
                lo = self.position * self.batch_size
                idx = order[lo:lo + self.batch_size]
                items = list(self._pool.map(self.dataset.__getitem__, idx))
                batch = _stack_batch(items)
                if self.post_fn is not None:
                    batch = self.post_fn(batch)
                elif self.device is not None:
                    batch = jax.device_put(batch, self.device)
                self._queue.put((self.epoch, self.position, batch))
                self.position += 1
            self.epoch += 1
            self.position = 0

    def __iter__(self) -> Iterator:
        if self._thread is None:
            self._thread = threading.Thread(target=self._produce, daemon=True)
            self._thread.start()
        return self

    def __next__(self):
        if self._thread is None:
            iter(self)
        epoch, pos, batch = self._queue.get()
        return batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._pool.shutdown(wait=False)
