"""DevicePrefetcher: overlap semantics and shutdown behavior.

The prefetcher is the TPU-native equivalent of the reference's pinned-memory
non_blocking H2D copies behind DataLoader workers
(reference tools/train_net.py:79-98).
"""

import threading
import time

import pytest

from slowfast_tpu.parallel.prefetch import DevicePrefetcher


def test_yields_all_items_in_order():
    staged = []

    def stage(x):
        staged.append(x)
        return x * 10

    out = list(DevicePrefetcher(iter(range(8)), stage, depth=2))
    assert out == [x * 10 for x in range(8)]
    assert staged == list(range(8))


def test_stage_exception_propagates():
    def stage(x):
        if x == 3:
            raise ValueError("boom")
        return x

    it = iter(DevicePrefetcher(iter(range(8)), stage, depth=2))
    got = []
    with pytest.raises(ValueError, match="boom"):
        for x in it:
            got.append(x)
    assert got == [0, 1, 2]


def test_early_break_releases_staging_thread():
    """A consumer that stops early (bench loops, NaN aborts) must not
    strand the staging thread blocked on a full queue holding
    device-resident batches."""
    alive = threading.Event()
    alive.set()
    produced = []

    def infinite():
        i = 0
        while alive.is_set():
            yield i
            i += 1

    def stage(x):
        produced.append(x)
        return x

    before = threading.active_count()
    for x in DevicePrefetcher(infinite(), stage, depth=2):
        if x >= 3:
            break
    # The generator's finally sets the shutdown flag and joins the thread.
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    # Staging ran ahead of the consumer but stopped shortly after the break
    # (bounded by queue depth, not the infinite iterator).
    assert len(produced) < 16
    alive.clear()


def test_consumer_runs_while_staging_blocks():
    """Items already staged are consumable while the next stage() call is
    still in flight (the overlap the class exists for)."""
    gate = threading.Event()

    def stage(x):
        if x == 2:
            gate.wait(timeout=5.0)
        return x

    it = iter(DevicePrefetcher(iter(range(4)), stage, depth=2))
    assert next(it) == 0
    assert next(it) == 1  # staged while item 2 is blocked
    gate.set()
    assert list(it) == [2, 3]
