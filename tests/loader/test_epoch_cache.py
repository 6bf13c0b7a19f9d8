"""EpochCache: replay between resampling epochs, reshuffled order,
invalidate() forces a resample."""

import numpy as np

from gammagl_tpu.loader import EpochCache


class CountingLoader:
    def __init__(self, n=6):
        self.n = n
        self.iterations = 0

    def __len__(self):
        return self.n

    def __iter__(self):
        self.iterations += 1
        for i in range(self.n):
            yield (self.iterations, i)


def test_replay_between_resamples():
    src = CountingLoader()
    cache = EpochCache(src, resample_every=3, reshuffle=False)
    e0 = list(cache)
    e1 = list(cache)
    e2 = list(cache)
    e3 = list(cache)
    assert src.iterations == 2          # epochs 0 and 3 sampled
    assert e0 == e1 == e2               # replayed identically (no shuffle)
    assert e3[0][0] == 2                # fresh pass
    assert len(cache) == 6


def test_reshuffle_permutes_order():
    src = CountingLoader(n=32)
    cache = EpochCache(src, resample_every=10, reshuffle=True, seed=1)
    e0 = list(cache)
    e1 = list(cache)
    assert sorted(e0) == sorted(e1)
    assert e0 != e1                     # permuted with high probability


def test_invalidate_forces_resample():
    src = CountingLoader()
    cache = EpochCache(src, resample_every=100)
    list(cache)
    cache.invalidate()
    list(cache)
    assert src.iterations == 2


def test_resample_every_one_is_plain():
    src = CountingLoader()
    cache = EpochCache(src, resample_every=1)
    list(cache), list(cache), list(cache)
    assert src.iterations == 3
