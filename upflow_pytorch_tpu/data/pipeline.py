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
        self.position = position  # producer: next batch index to decode
        # consumed cursor: the (epoch, position) to RESUME from — i.e. the
        # first batch the training loop has not yet received.  The producer
        # counter alone runs up to ``prefetch+1`` batches ahead, so saving
        # it would skip batches on resume.
        self._resume_epoch = epoch
        self._resume_position = position
        self._pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # --- iteration state (for checkpoint/resume) ---
    def state(self) -> Dict[str, int]:
        """Cursor of the next batch the CONSUMER will see; constructing a
        loader with these values resumes exactly after the last batch
        returned by ``__next__`` (including stateless augmentation, which
        keys off (seed, epoch, index) — see data/rng.py)."""
        return {"epoch": self._resume_epoch,
                "position": self._resume_position,
                "seed": self.seed}

    def set_cursor(self, epoch: int, position: int):
        """Reposition the loader (before iteration starts) — resume path."""
        assert self._thread is None, "set_cursor before iterating"
        self.epoch = int(epoch)
        self.position = int(position)
        self._resume_epoch = int(epoch)
        self._resume_position = int(position)

    def _n_batches(self) -> int:
        n = len(self.dataset)
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState((self.seed * 100003 + epoch) % (2 ** 31)
                                  ).shuffle(order)
        return order

    def _get_item(self, epoch: int, index: int):
        item_fn = getattr(self.dataset, "item", None)
        if item_fn is not None:
            return item_fn(int(index), epoch=epoch)
        return self.dataset[int(index)]

    def _put(self, item) -> bool:
        """Queue put that stays responsive to close(); returns False if
        stopping (a blocked ``put`` into a full prefetch queue would
        otherwise leak the producer thread)."""
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self):
        while not self._stop.is_set():
            order = self._epoch_order(self.epoch)
            n_batches = self._n_batches()
            while self.position < n_batches:
                if self._stop.is_set():
                    return
                epoch, pos = self.epoch, self.position
                lo = pos * self.batch_size
                idx = order[lo:lo + self.batch_size]
                items = list(self._pool.map(
                    lambda i: self._get_item(epoch, i), idx))
                batch = _stack_batch(items)
                if self.post_fn is not None:
                    batch = self.post_fn(batch)
                elif self.device is not None:
                    batch = jax.device_put(batch, self.device)
                if not self._put((epoch, pos, batch)):
                    return
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
        if pos + 1 < self._n_batches():
            self._resume_epoch, self._resume_position = epoch, pos + 1
        else:
            self._resume_epoch, self._resume_position = epoch + 1, 0
        return batch

    def close(self):
        self._stop.set()
        # drain until the producer exits — it may be blocked mid-put
        thread = self._thread
        while thread is not None and thread.is_alive():
            try:
                self._queue.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=0.05)
        self._pool.shutdown(wait=False)
