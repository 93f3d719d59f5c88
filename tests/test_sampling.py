"""Deterministic sampling / split-assignment operators."""

import pytest

from pyspark.sql import functions as F

from gostatix_spark import sampling


def test_hex_threshold_bounds():
    assert sampling.hex_threshold(0.0) == "00000000"
    assert sampling.hex_threshold(0.5) == "80000000"
    # full fraction must sort AFTER every md5 hex prefix ("100000000"
    # would sort before "2a..." and silently drop ~7/8 of rows)
    assert sampling.hex_threshold(1.0) == "g"
    assert "ffffffff" < sampling.hex_threshold(1.0)
    with pytest.raises(ValueError):
        sampling.hex_threshold(1.5)


class TestSampling:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.range(5000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 7).cast("string"))
            .alias("source"))

    def test_assign_split_disjoint_exhaustive_reproducible(self, docs):
        out = sampling.assign_split(docs, "doc_id",
                                    {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 5000  # exhaustive, disjoint
        assert abs(counts["train"] / 5000 - 0.8) < 0.03
        assert abs(counts["val"] / 5000 - 0.1) < 0.02
        assert abs(counts["test"] / 5000 - 0.1) < 0.02
        # reproducible: a second independent computation agrees row-wise
        again = sampling.assign_split(docs, "doc_id",
                                      {"train": 0.8, "val": 0.1,
                                       "test": 0.1})
        assert out.exceptAll(again).count() == 0

    def test_assign_split_requires_unit_sum(self, docs):
        with pytest.raises(ValueError):
            sampling.assign_split(docs, "doc_id", {"a": 0.5, "b": 0.1})

    def test_deterministic_sample_monotone_in_fraction(self, docs):
        """Same salt ⇒ smaller fraction is a SUBSET of a larger one
        (threshold monotonicity) — lets a pipeline grow a sample
        without redrawing it."""
        small = {r["doc_id"] for r in
                 sampling.deterministic_sample(docs, "doc_id", 0.1).collect()}
        big = {r["doc_id"] for r in
               sampling.deterministic_sample(docs, "doc_id", 0.4).collect()}
        assert small <= big
        assert abs(len(small) / 5000 - 0.1) < 0.02
        assert abs(len(big) / 5000 - 0.4) < 0.03
        # different salt ⇒ an independent draw
        other = {r["doc_id"] for r in
                 sampling.deterministic_sample(docs, "doc_id", 0.1,
                                               salt="x").collect()}
        assert other != small

    def test_full_and_empty_fractions(self, docs):
        assert sampling.deterministic_sample(docs, "doc_id", 1.0).count() \
            == 5000
        assert sampling.deterministic_sample(docs, "doc_id", 0.0).count() == 0

    def test_stratified_sample_rates(self, docs):
        out = sampling.stratified_sample(
            docs, "doc_id", "source",
            {"src0": 1.0, "src1": 0.5, "src2": 0.0}, default=0.1)
        got = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        per = 5000 / 7
        assert got["src0"] == pytest.approx(per, rel=0.01)  # keep all
        assert "src2" not in got                             # keep none
        assert got["src1"] / per == pytest.approx(0.5, abs=0.06)
        for s in ("src3", "src4", "src5", "src6"):
            assert got.get(s, 0) / per == pytest.approx(0.1, abs=0.05)

    def test_stratified_sample_null_stratum_gets_default(self, spark):
        """A NULL stratum must sample at the default rate, not vanish
        (NULL isin → NULL → silently filtered before the coalesce)."""
        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.lit("a")).alias("source"))
        out = sampling.stratified_sample(df, "doc_id", "source",
                                         {"a": 0.0}, default=0.5)
        rows = out.collect()
        assert all(r["source"] is None for r in rows)  # 'a' fully dropped
        assert len(rows) / 1000 == pytest.approx(0.5, abs=0.08)

    def test_token_shards_budget_and_determinism(self, spark):
        df = spark.range(600).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 50 + 10).cast("int").alias("n_tok"))
        out = sampling.token_shards(df, "doc_id", "n_tok", budget=500,
                                    part_hex_chars=1)
        rows = out.collect()
        assert len(rows) == 600
        # per (part, shard): total tokens ≤ budget + one doc's overhang,
        # and shards are contiguous 0..max within each part
        from collections import defaultdict
        tot = defaultdict(int)
        for r in rows:
            tot[(r["part"], r["shard"])] += r["n_tok"]
        max_tok = 59
        for (p, s), t in tot.items():
            assert t <= 500 + max_tok, (p, s, t)
        by_part = defaultdict(set)
        for p, s in tot:
            by_part[p].add(s)
        for p, shards in by_part.items():
            assert shards == set(range(max(shards) + 1)), (p, shards)
        # every shard except the last of its part is "full" (> budget -
        # max doc): the packing leaves no internal gaps
        for (p, s), t in tot.items():
            if s < max(by_part[p]):
                assert t > 500 - max_tok, (p, s, t)
        # deterministic: reshuffled input gives the identical assignment
        again = {(r["doc_id"]): (r["part"], r["shard"])
                 for r in sampling.token_shards(
                     df.orderBy(F.desc("doc_id")), "doc_id", "n_tok",
                     budget=500, part_hex_chars=1).collect()}
        for r in rows:
            assert again[r["doc_id"]] == (r["part"], r["shard"])

    def test_reservoir_sample_exact_k_and_stable(self, docs):
        got = {r["doc_id"] for r in
               sampling.reservoir_sample(docs, "doc_id", 50).collect()}
        assert len(got) == 50
        # stable under input reordering and repartitioning
        again = {r["doc_id"] for r in sampling.reservoir_sample(
            docs.orderBy(F.desc("doc_id")).repartition(7),
            "doc_id", 50).collect()}
        assert got == again
        # growing k keeps the smaller sample as a prefix
        bigger = {r["doc_id"] for r in
                  sampling.reservoir_sample(docs, "doc_id", 80).collect()}
        assert got <= bigger

    def test_deterministic_order_is_input_order_free(self, docs):
        a = [r["doc_id"] for r in
             sampling.deterministic_order(docs, "doc_id")
             .orderBy("shuffle_key").collect()]
        b = [r["doc_id"] for r in
             sampling.deterministic_order(
                 docs.orderBy(F.desc("doc_id")), "doc_id")
             .orderBy("shuffle_key").collect()]
        assert a == b            # same order regardless of input order
        assert a != sorted(a)    # and it's actually shuffled
