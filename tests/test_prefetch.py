"""Host->device prefetch pipeline (data/prefetch.py)."""

import time

import pytest

from fusiondepth_tpu.data.prefetch import prefetch_to_device


def test_yields_all_in_order_with_put():
    got = list(prefetch_to_device(range(10), put=lambda x: x * 2, size=3))
    assert got == [x * 2 for x in range(10)]


def test_producer_runs_ahead():
    produced = []

    def gen():
        for i in range(6):
            produced.append(i)
            yield i

    it = prefetch_to_device(gen(), size=3)
    first = next(it)
    time.sleep(0.05)  # let the producer fill the queue
    assert first == 0
    # with the consumer stalled, the producer is several items ahead
    assert len(produced) >= 3
    assert list(it) == [1, 2, 3, 4, 5]


def test_producer_exception_surfaces():
    def gen():
        yield 1
        raise ValueError("loader died")

    it = prefetch_to_device(gen(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="loader died"):
        list(it)
