"""Tests for utils/prefetch.py — the DataLoader-worker-style host overlap
(reference forfeits it: `code/train.py:66-67` uses num_workers=0)."""
import threading
import time

import numpy as np
import pytest

from slowfast_vos_tpu.utils.prefetch import PrefetchIterator, prefetch


def test_order_preserved():
    assert list(prefetch(range(100), depth=3)) == list(range(100))


def test_empty_iterable():
    assert list(prefetch([], depth=2)) == []


def test_exception_propagates_at_consumption_point():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)
    # terminal: subsequent next() raises StopIteration, thread is gone
    with pytest.raises(StopIteration):
        next(it)


def test_early_close_unblocks_and_joins_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=1)
    assert next(it) == 0
    it.close()  # producer is blocked on a full queue here
    assert not it._thread.is_alive()
    # bounded read-ahead: producer never ran far beyond the queue depth
    assert len(produced) < 10
    it.close()  # idempotent


def test_context_manager_closes_on_break():
    with prefetch(iter(range(1000)), depth=2) as it:
        for v in it:
            if v == 5:
                break
    assert not it._thread.is_alive()


def test_actually_overlaps():
    """Consumer work and producer work overlap: total wall < serial sum."""
    n, d = 8, 0.02

    def gen():
        for i in range(n):
            time.sleep(d)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(gen(), depth=2):
        time.sleep(d)
    wall = time.perf_counter() - t0
    assert wall < 2 * n * d * 0.85  # serial would be 2*n*d


def test_stateful_rng_draw_order_matches_serial():
    """One producer thread preserves a shared-RNG dataset's draw sequence —
    the OSVOS dataset pattern (data/osvos_dataset.py shared Generator)."""

    class DS:
        def __init__(self):
            self.rng = np.random.default_rng(63)

        def __getitem__(self, i):
            return self.rng.integers(0, 1 << 30)

    ds0 = DS()
    serial = [ds0[i] for i in range(50)]
    ds = DS()
    fetched = list(prefetch((ds[i] for i in range(50)), depth=4))
    assert fetched == serial


def test_depth_validation():
    with pytest.raises(ValueError):
        PrefetchIterator([1], depth=0)


def test_no_thread_leak_across_many_epochs():
    start = threading.active_count()
    for _ in range(20):
        with prefetch(iter(range(10)), depth=2) as it:
            list(it)
    assert threading.active_count() <= start
