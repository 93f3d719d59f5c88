"""End-to-end run of the curation example pipeline (examples/
curate_corpus.py main(), driven in-process against a temp parquet
corpus with planted exact and near duplicates)."""

import sys

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def corpus_path(spark, tmp_path):
    # docs share ONLY a short stopword filler (keeps stopword_ratio in
    # range); the bulk of each doc is a per-doc vocabulary, so distinct
    # docs are far below any near-dup threshold
    filler = "the quick brown fox and the lazy dog in a field"
    rows = []
    for i in range(300):
        src = f"s{i % 3}"
        uniq = " ".join(f"w{i}x{j}" for j in range(30))
        rows.append((i, src, f"{filler} {uniq}"))
    # exact duplicates of doc 0 (normalize=True lowercases)
    rows.append((1000, "s0", rows[0][2]))
    rows.append((1001, "s0", rows[0][2].upper()))
    # a near duplicate of doc 1 (one word changed)
    rows.append((1002, "s1", rows[1][2].replace("w1x29", "changed")))
    # a junk doc the quality gate must drop (no stopwords, few words)
    rows.append((1003, "s2", "zzz qqq xxx"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    p = str(tmp_path / "raw")
    df.write.parquet(p)
    return p


def test_curate_corpus_end_to_end(spark, corpus_path, tmp_path, monkeypatch):
    from examples import curate_corpus

    out = str(tmp_path / "curated")
    monkeypatch.setattr(sys, "argv", [
        "curate_corpus.py", "--input", corpus_path, "--out", out,
        "--near-dup-threshold", "0.8", "--min-words", "5",
        "--min-stopword-ratio", "0.01", "--max-stopword-ratio", "0.9",
        "--splits", "train=0.8,val=0.1,test=0.1", "--budget", "2000",
    ])
    curate_corpus.main()

    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert 0 in ids and 1000 not in ids and 1001 not in ids  # exact dups gone
    assert 1002 not in ids and 1 in ids                      # near dup gone
    assert 1003 not in ids                                   # quality-gated
    # split partition dirs exist and are disjoint/exhaustive
    splits = {r["split"] for r in got.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    n = got.count()
    assert n == len(ids)
    # train rows are sharded under a token budget
    train = got.where(F.col("split") == "train") \
        .withColumn("n_tok", F.size(F.split("text", " ")))
    tot = {(r["part"], r["shard"]): r["t"] for r in
           train.groupBy("part", "shard")
           .agg(F.sum("n_tok").alias("t")).collect()}
    max_doc = train.agg(F.max("n_tok")).collect()[0][0]
    assert all(t <= 2000 + max_doc for t in tot.values())
    # determinism: a second run writes the identical document set
    out2 = str(tmp_path / "curated2")
    monkeypatch.setattr(sys, "argv", [
        "curate_corpus.py", "--input", corpus_path, "--out", out2,
        "--near-dup-threshold", "0.8", "--min-words", "5",
        "--min-stopword-ratio", "0.01", "--max-stopword-ratio", "0.9",
        "--splits", "train=0.8,val=0.1,test=0.1", "--budget", "2000",
    ])
    curate_corpus.main()
    again = spark.read.parquet(out2)
    assert again.select("doc_id", "split", "part", "shard") \
        .exceptAll(got.select("doc_id", "split", "part", "shard")) \
        .count() == 0
