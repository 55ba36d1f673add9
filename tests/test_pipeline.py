"""Tests for the parallel input pipeline (reference
`DataLoader(num_workers=8)` equivalent, `train_temporal.py:85-107`)."""

import threading
import time

import numpy as np
import pytest

from garment4d_tpu.data.pipeline import ParallelItemLoader, prefetch_iterator


class TestParallelItemLoader:
    def test_preserves_order_and_values(self):
        loader = ParallelItemLoader(lambda j: {"v": j * j}, num_workers=4)
        batches = [[0, 1, 2], [5, 4], [9]]
        got = [[it["v"] for it in items]
               for items in loader.map_batches(batches)]
        assert got == [[0, 1, 4], [25, 16], [81]]
        loader.close()

    def test_zero_workers_synchronous(self):
        calls = []
        loader = ParallelItemLoader(lambda j: calls.append(j) or j,
                                    num_workers=0)
        out = list(loader.map_batches([[3, 1], [2]]))
        assert out == [[3, 1], [2]] and calls == [3, 1, 2]

    def test_overlaps_reads(self):
        """With workers, the 2nd batch's reads happen while the 1st is being
        consumed (prefetch depth >= 1)."""
        started = set()
        lock = threading.Lock()

        def load(j):
            with lock:
                started.add(j)
            time.sleep(0.01)
            return j

        loader = ParallelItemLoader(load, num_workers=4, prefetch_batches=1)
        it = loader.map_batches([[0, 1], [2, 3], [4, 5]])
        first = next(it)
        time.sleep(0.05)  # let prefetch run
        with lock:
            ahead = {2, 3} <= started
        assert first == [0, 1] and ahead
        loader.close()

    def test_propagates_exceptions(self):
        def load(j):
            if j == 7:
                raise ValueError("boom")
            return j

        loader = ParallelItemLoader(load, num_workers=2)
        with pytest.raises(ValueError, match="boom"):
            list(loader.map_batches([[1, 7]]))
        loader.close()


class TestPrefetchIterator:
    def test_yields_all_in_order(self):
        got = list(prefetch_iterator(lambda: iter(range(10)), depth=2))
        assert got == list(range(10))

    def test_propagates_exceptions(self):
        def gen():
            yield 1
            raise RuntimeError("bad batch")

        it = prefetch_iterator(gen, depth=1)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="bad batch"):
            next(it)
