"""t-digest and KLL: rank-error gates vs exact quantiles + merge laws
(north_rule sketch set)."""

import numpy as np
import pytest

from gostatix_spark.kernels import kll, tdigest


RNG = np.random.default_rng(5)


def _rank_err(values: np.ndarray, est: np.ndarray, qs: np.ndarray) -> float:
    sv = np.sort(values)
    ranks = np.searchsorted(sv, est, side="right") / len(sv)
    return float(np.abs(ranks - qs).max())


QS = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


class TestTDigest:
    @pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform"])
    def test_rank_error(self, dist):
        v = getattr(RNG, dist)(size=200_000)
        m, w = tdigest.new_state()
        for chunk in np.array_split(v, 10):
            m, w = tdigest.update_batch(m, w, chunk)
        est = tdigest.quantile(m, w, QS)
        assert _rank_err(v, est, QS) <= 0.01
        assert w.sum() == pytest.approx(len(v))

    def test_merge_accuracy_and_weight(self):
        v = RNG.normal(size=100_000)
        parts = np.array_split(v, 7)
        digests = []
        for p in parts:
            m, w = tdigest.new_state()
            m, w = tdigest.update_batch(m, w, p)
            digests.append((m, w))
        acc = digests[0]
        for d in digests[1:]:
            acc = tdigest.merge(acc, d)
        assert acc[1].sum() == pytest.approx(len(v))
        est = tdigest.quantile(acc[0], acc[1], QS)
        assert _rank_err(v, est, QS) <= 0.015

    def test_codec_roundtrip(self):
        m, w = tdigest.update_batch(*tdigest.new_state(), RNG.normal(size=1000))
        blob = tdigest.to_bytes(m, w, 1000)
        m2, w2, n, delta = tdigest.from_bytes(blob)
        assert n == 1000 and np.array_equal(m, m2) and np.array_equal(w, w2)

    def test_centroid_count_bounded(self):
        m, w = tdigest.update_batch(*tdigest.new_state(),
                                    RNG.uniform(size=500_000))
        assert len(m) <= 2 * tdigest.DELTA_DEFAULT  # compact state


class TestKLL:
    def test_rank_error(self):
        v = RNG.lognormal(size=200_000)
        sk = kll.KLL(k=200)
        for chunk in np.array_split(v, 20):
            sk.update_batch(chunk)
        est = sk.quantile(QS)
        assert _rank_err(v, est, QS) <= 0.03
        assert sk.n == len(v)

    def test_merge(self):
        v = RNG.normal(size=100_000)
        parts = np.array_split(v, 5)
        sks = []
        for p in parts:
            s = kll.KLL(k=200)
            s.update_batch(p)
            sks.append(s)
        acc = sks[0]
        for s in sks[1:]:
            acc = acc.merge(s)
        assert acc.n == len(v)
        assert _rank_err(v, acc.quantile(QS), QS) <= 0.035

    def test_rank_query(self):
        v = RNG.uniform(size=50_000)
        sk = kll.KLL(k=200)
        sk.update_batch(v)
        med = float(np.median(v))
        assert abs(sk.rank(med) - 0.5) <= 0.03

    def test_codec_roundtrip(self):
        sk = kll.KLL(k=100)
        sk.update_batch(RNG.normal(size=5000))
        sk2 = kll.KLL.from_bytes(sk.to_bytes())
        assert sk2.n == sk.n
        assert all(np.array_equal(a, b)
                   for a, b in zip(sk.levels, sk2.levels))
        assert np.array_equal(sk.quantile(QS), sk2.quantile(QS))

    def test_state_size_sublinear(self):
        sk = kll.KLL(k=200)
        sk.update_batch(RNG.normal(size=500_000))
        stored = sum(len(lv) for lv in sk.levels)
        assert stored < 3000  # ~k·Σc^h, far below n


class TestSparkQuantiles:
    def test_tdigest_and_kll_per_key(self, spark):
        from pyspark.sql import functions as F
        from gostatix_spark.agg import sketch_agg
        from gostatix_spark.query import quantiles

        events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        exact = {(r["event_type"], q): r[f"q{int(q*100)}"]
                 for r in events.groupBy("event_type").agg(
                     *[F.expr(f"percentile(value, {q})").alias(f"q{int(q*100)}")
                       for q in (0.1, 0.5, 0.9)]).collect()
                 for q in (0.1, 0.5, 0.9)}
        n_per = {r["event_type"]: r["n"] for r in
                 events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}

        for kind in ("tdigest", "kll"):
            states = sketch_agg(events, kind, "value", key_col="event_type")
            got = quantiles(states, [0.1, 0.5, 0.9]).collect()
            assert len(got) == len(n_per) * 3
            for r in got:
                want = exact[(r["event_type"], r["q"])]
                # rank-error check: estimated value's true rank near q
                within = events.where(
                    (F.col("event_type") == r["event_type"])
                    & (F.col("value") <= r["quantile_value"])).count()
                rank = within / n_per[r["event_type"]]
                assert abs(rank - r["q"]) <= 0.05, (kind, r, want)