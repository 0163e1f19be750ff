"""Threaded prefetching batch loader.

The host-side input-pipeline replacement for the reference's
``torch.utils.data.DataLoader`` with worker processes (reference
data/build.py:58-93): a thread pool decodes/augments samples (cv2/numpy
release the GIL for the heavy parts) while the accelerator runs the previous
step, with a bounded prefetch queue of assembled batches. Determinism: each
sample is preprocessed with an RNG keyed on (seed, epoch, dataset index).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        sampler,
        batch_size: int,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _sample(self, idx: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, int(idx)])
        )
        return self.dataset.get_sample(idx, rng)

    def __iter__(self) -> Iterator[dict]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        err: list = []

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    indices = list(self.sampler)
                    batches = [
                        indices[i : i + self.batch_size]
                        for i in range(0, len(indices), self.batch_size)
                    ]
                    if self.drop_last:
                        batches = [b for b in batches if len(b) == self.batch_size]
                    # map keeps order; chunks pipeline across the pool
                    pending = []
                    for batch_idx in batches:
                        futs = [pool.submit(self._sample, i) for i in batch_idx]
                        pending.append(futs)
                        # bound in-flight decode work to ~2 batches beyond the queue
                        while len(pending) > 2:
                            done = pending.pop(0)
                            samples = [f.result() for f in done]
                            out_q.put(self.dataset.batch_collator(samples))
                    for done in pending:
                        samples = [f.result() for f in done]
                        out_q.put(self.dataset.batch_collator(samples))
            except BaseException as e:  # propagate into the consumer
                err.append(e)
            finally:
                out_q.put(_SENTINEL)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is _SENTINEL:
                break
            yield item
        thread.join()
        if err:
            raise err[0]
