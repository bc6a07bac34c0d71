"""Prefetcher: ordering, transform application, error propagation."""
import time
import pytest

from speech_distill_tpu.core.prefetch import prefetch


def test_prefetch_preserves_order_and_applies_put():
    out = list(prefetch(iter(range(10)), put=lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(10)]


def test_prefetch_overlaps_production():
    def slow_gen():
        for i in range(4):
            time.sleep(0.05)
            yield i

    it = prefetch(slow_gen(), depth=4)
    time.sleep(0.3)  # producer finishes while we wait
    t0 = time.perf_counter()
    assert list(it) == [0, 1, 2, 3]
    assert time.perf_counter() - t0 < 0.05  # all items were prefetched


def test_prefetch_propagates_errors():
    def bad_gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad_gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)
