"""Host-side batching + prefetch.

Replaces the reference's torch DataLoader(num_workers=4) with a thread-pool
prefetcher: samples are assembled in worker threads (PIL decode + numpy ops
release the GIL for the heavy parts), stacked, and queued so the accelerator
never waits on the host. Keys with per-frame variable shapes ("depth_gt")
are collated as lists, everything else as stacked numpy arrays.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np

_UNSTACKED_KEYS = {"depth_gt"}


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, object]:
    batch: Dict[str, object] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in _UNSTACKED_KEYS:
            batch[key] = vals
        else:
            batch[key] = np.stack(vals)
    return batch


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 2,
                 prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(idx)
        out = [idx[i: i + self.batch_size]
               for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            out = [b for b in out if len(b) == self.batch_size]
        return out

    def __iter__(self) -> Iterator[Dict[str, object]]:
        batches = self._batches()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(collate([self.dataset[i] for i in b]))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
