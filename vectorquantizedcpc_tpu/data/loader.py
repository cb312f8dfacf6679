"""Host -> device batch pipeline with background prefetch.

JAX-native replacement for the reference's torch DataLoader usage
(train_cpc.py:89-94, datamodule.py:99-122): batches are assembled in numpy
on a background thread and transferred with ``jax.device_put`` one step
ahead of consumption, overlapping host work and H2D DMA with TPU compute
(double buffering). Shapes are fixed, so there is exactly one compiled
train-step executable.
"""

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np

import jax


class PrefetchLoader:
    """Iterate fixed-shape batches of a map-style dataset, prefetched to device.

    Args:
        dataset: map-style object with ``__len__``/``__getitem__`` and an
            optional ``set_epoch``.
        batch_size: items per batch.
        shuffle: reshuffle item order every epoch (seeded, reproducible).
        drop_last: drop the trailing partial batch (the CPC trainer always
            does; reference train_cpc.py:94).
        device_put: move batches onto the default device (or a provided
            sharding via ``sharding``).
        prefetch: number of batches to stage ahead.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        device_put: bool = True,
        sharding=None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.device_put = device_put
        self.sharding = sharding
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        return np.random.default_rng(self.seed * 7919 + self.epoch).permutation(n)

    def _assemble(self, indices: Sequence[int]):
        # Datasets may expose a batched sampler (bit-identical to per-item
        # access) that copies windows in the native GIL-free engine
        # (data/native.py) — preferred: item loops contend with the dispatch
        # thread for the GIL.
        if hasattr(self.dataset, "sample_batch"):
            return tuple(self.dataset.sample_batch(indices))
        items = [self.dataset[int(i)] for i in indices]
        parts = list(zip(*items))
        return tuple(np.stack(p) for p in parts)

    def __iter__(self) -> Iterator:
        order = self._order()
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                    batch = self._assemble(idx)
                    if self.device_put:
                        if self.sharding is not None:
                            batch = tuple(
                                jax.device_put(x, self.sharding) for x in batch
                            )
                        else:
                            batch = jax.device_put(batch)
                    q.put(batch)
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit if blocked on put().
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
