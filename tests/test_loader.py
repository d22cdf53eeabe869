"""DataLoader: parallel sample assembly (reference trainer.py:158-160 uses
DataLoader(num_workers=4); here worker THREADS — PIL/numpy release the GIL
for the heavy parts)."""

import time

import numpy as np
import pytest

from fusiondepth_tpu.data.loader import DataLoader


class _IndexDataset:
    def __init__(self, n, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)  # releases the GIL like PIL/numpy do
        return {"idx": np.array([i], np.int64)}


@pytest.mark.parametrize("num_workers", [1, 4])
def test_order_preserved(num_workers):
    dl = DataLoader(_IndexDataset(23), batch_size=4, shuffle=False,
                    num_workers=num_workers)
    got = np.concatenate([b["idx"][:, 0] for b in dl])
    np.testing.assert_array_equal(got, np.arange(23))
    assert len(dl) == 6


def test_parallel_workers_beat_single():
    ds = _IndexDataset(32, delay=0.01)

    def run(num_workers):
        t0 = time.perf_counter()
        n = sum(b["idx"].shape[0]
                for b in DataLoader(ds, 4, num_workers=num_workers))
        assert n == 32
        return time.perf_counter() - t0

    t1 = run(1)
    t4 = run(4)
    # serial floor is 0.32s; 4 workers should land well under it
    assert t4 < t1 * 0.6, (t1, t4)


def test_worker_error_propagates():
    class Bad(_IndexDataset):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return super().__getitem__(i)

    with pytest.raises(ValueError, match="boom"):
        list(DataLoader(Bad(8), 2, num_workers=3))


def test_early_break_shuts_down():
    dl = DataLoader(_IndexDataset(100, delay=0.001), batch_size=2,
                    num_workers=4)
    for i, _ in enumerate(dl):
        if i == 2:
            break
    # a fresh iteration still works after an abandoned one
    assert sum(1 for _ in dl) == 50
