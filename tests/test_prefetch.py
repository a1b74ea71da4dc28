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
    # Serial would be 2*n*d; perfect overlap ~n*d. 1.5x leaves headroom for
    # thread-scheduling jitter on a loaded host (this suite shares the box
    # with TPU benchmark runs) while still proving overlap happened.
    assert wall < 1.5 * n * d


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


def test_close_does_not_advance_source_iterator():
    """close() must not cost one more decode: the producer checks the stop
    flag BEFORE advancing the source, so an early exit (e.g. the
    max_steps_per_epoch break in train/pretrain.py) never blocks on a full
    item production."""
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=1)
    assert next(it) == 0
    # Let the producer reach its steady state: queue full, blocked in put.
    time.sleep(0.1)
    before = len(produced)
    it.close()
    time.sleep(0.1)
    assert len(produced) == before  # no extra pull after close
    assert before <= 3


def test_abandoned_iterator_is_garbage_collected():
    """The producer thread must not keep the iterator alive: its target is a
    module-level function, so dropping the last reference collects the
    PrefetchIterator and the __del__ backstop stops the producer."""
    import gc
    import weakref

    def gen():
        i = 0
        while True:
            yield i
            i += 1

    it = prefetch(gen(), depth=1)
    assert next(it) == 0
    thread = it._thread
    ref = weakref.ref(it)
    del it
    gc.collect()
    assert ref() is None, "producer thread kept the iterator alive"
    thread.join(timeout=2.0)
    assert not thread.is_alive()


def test_depth_validation():
    with pytest.raises(ValueError):
        PrefetchIterator([1], depth=0)


def test_no_thread_leak_across_many_epochs():
    start = threading.active_count()
    for _ in range(20):
        with prefetch(iter(range(10)), depth=2) as it:
            list(it)
    assert threading.active_count() <= start
