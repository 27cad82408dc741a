"""AsyncPredictor pipeline: ordering, backpressure, error propagation."""

import time

import pytest

from slowfast_tpu.visualization.demo import AsyncPredictor


class _SlowDoubler:
    def __init__(self, fail_on=None):
        self.fail_on = fail_on

    def __call__(self, task):
        time.sleep(0.01)
        if task == self.fail_on:
            raise ValueError("boom")
        return task * 2


def test_async_predictor_preserves_order():
    p = AsyncPredictor(cfg=None, num_inflight=2, predictor=_SlowDoubler())
    got = list(p.run(range(7)))
    p.shutdown()
    assert got == [0, 2, 4, 6, 8, 10, 12]


def test_async_predictor_propagates_errors():
    p = AsyncPredictor(cfg=None, num_inflight=2,
                       predictor=_SlowDoubler(fail_on=3))
    with pytest.raises(ValueError, match="boom"):
        list(p.run(range(6)))


def test_async_predictor_single_item():
    p = AsyncPredictor(cfg=None, num_inflight=2, predictor=_SlowDoubler())
    assert list(p.run([5])) == [10]
    p.shutdown()
