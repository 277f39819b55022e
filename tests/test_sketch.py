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


class TestGroupedHll:
    def test_grouped_accuracy_and_determinism(self):
        """Per-group estimates within 3σ of exact; merged registers from any
        batch split are byte-identical to the one-shot computation."""
        import numpy as np
        import pandas as pd

        from cassandra_data_migrator_ray.functions.sketch import (
            hll_estimate,
            hll_merge,
            hll_partial_grouped,
        )

        rng = np.random.default_rng(7)
        p = 12
        sigma = 1.04 / np.sqrt(1 << p)
        truth = {"a": 5000, "b": 800, "c": 25}
        keys, vals = [], []
        for k, n in truth.items():
            ids = rng.choice(np.arange(n, dtype=np.int64) + hash(k) % 10**6, size=n * 3)
            keys.extend([k] * len(ids))
            vals.extend(ids.tolist())
        keys = np.array(keys)
        vals = np.array(vals, dtype=np.int64)
        perm = rng.permutation(len(keys))
        keys, vals = keys[perm], vals[perm]

        def run(splits):
            regs = {}
            for lo, hi in splits:
                part = hll_partial_grouped(keys[lo:hi], vals[lo:hi], p=p)
                for k, b in zip(part["key"], part["regs"]):
                    r = np.frombuffer(b, dtype=np.uint8)
                    regs[k] = hll_merge(regs[k], r) if k in regs else r
            return regs

        one = run([(0, len(keys))])
        cuts = sorted(rng.integers(1, len(keys) - 1, size=5).tolist())
        bounds = [0] + cuts + [len(keys)]
        many = run(list(zip(bounds[:-1], bounds[1:])))
        assert set(one) == set(truth) == set(many)
        for k, n in truth.items():
            assert bytes(one[k]) == bytes(many[k])  # split-invariant registers
            est = hll_estimate(one[k])
            # np.unique over the drawn ids = the real distinct count
            exact = len(np.unique(vals[keys == k]))
            assert abs(est - exact) <= max(3 * sigma * exact, 3), (k, est, exact)

    def test_grouped_query_matches_exact_counts(self, ray_session):
        """The distributed grouped-HLL query tracks the exact grouped
        distinct counts on the shared events table (3σ at p=14)."""
        import numpy as np

        from cassandra_data_migrator_ray.pipelines.queries import (
            distinct_users_by_type,
            hll_distinct_users_by_type,
        )

        sf = "/root/testdata/sf0.001"
        approx = hll_distinct_users_by_type(sf).set_index("event_type")
        exact = distinct_users_by_type(sf).set_index("event_type")
        assert sorted(approx.index) == sorted(exact.index)
        sigma = 1.04 / np.sqrt(1 << 14)
        for k in exact.index:
            e = int(exact.loc[k].iloc[0])
            a = int(approx.loc[k, "n_users_approx"])
            assert abs(a - e) <= max(3 * sigma * e, 3), (k, a, e)
