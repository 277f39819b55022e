"""HyperLogLog sketch kernel: estimate accuracy at realistic cardinalities,
merge algebra (associative / commutative / idempotent), and partial-batch
equivalence (split input == whole input)."""

import numpy as np
import pytest

from cassandra_data_migrator_ray.functions.sketch import (
    hll_estimate,
    hll_merge,
    hll_partial,
)


class TestHLLAccuracy:
    @pytest.mark.parametrize("n", [100, 10_000, 1_000_000])
    def test_relative_error_within_3_sigma(self, n):
        # p=14 → σ ≈ 1.04/sqrt(16384) ≈ 0.81%; allow 3σ
        vals = np.arange(n, dtype=np.int64) * 2_654_435_761  # distinct ids
        est = hll_estimate(hll_partial(vals))
        assert abs(est - n) / n < 0.0244, (n, est)

    def test_duplicates_do_not_inflate(self):
        vals = np.tile(np.arange(1000, dtype=np.int64), 50)  # 50× repeated
        est = hll_estimate(hll_partial(vals))
        assert abs(est - 1000) / 1000 < 0.03

    def test_string_values(self):
        vals = np.array([f"doc-{i}" for i in range(5000)], dtype=object)
        est = hll_estimate(hll_partial(vals))
        assert abs(est - 5000) / 5000 < 0.03

    def test_empty(self):
        assert hll_estimate(hll_partial(np.array([], dtype=np.int64))) == 0.0


class TestHLLMergeAlgebra:
    def _three(self):
        rng = np.random.default_rng(7)
        return [
            hll_partial(rng.integers(0, 1 << 62, 20_000).astype(np.int64))
            for _ in range(3)
        ]

    def test_associative_commutative(self):
        a, b, c = self._three()
        left = hll_merge(hll_merge(a, b), c)
        right = hll_merge(a, hll_merge(b, c))
        swapped = hll_merge(c, a, b)
        assert np.array_equal(left, right)
        assert np.array_equal(left, swapped)

    def test_idempotent_under_redelivery(self):
        a, b, _ = self._three()
        once = hll_merge(a, b)
        twice = hll_merge(a, b, a, b)  # a retried stage re-delivers partials
        assert np.array_equal(once, twice)

    def test_split_equals_whole(self):
        vals = np.arange(50_000, dtype=np.int64) * 11_400_714_819_323_198_485
        whole = hll_partial(vals)
        halves = hll_merge(hll_partial(vals[:20_000]), hll_partial(vals[20_000:]))
        assert np.array_equal(whole, halves)
