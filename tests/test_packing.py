"""Vocabulary / encoding / sequence-packing operators vs pure-python
references (the DuckDB row-exact oracles live in __spark_entry__)."""

import hashlib

import pytest

from gostatix_spark import packing

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog sat"),
    ("d3", "a cat and a dog and a bird"),
    ("d4", "mat on mat"),
    ("d5", "zebra"),
]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _py_vocab(docs, vocab_size=None, min_count=1):
    from collections import Counter
    c = Counter(w for _, t in docs for w in t.split(" "))
    items = [(tok, n) for tok, n in c.items() if n >= min_count]
    items.sort(key=lambda x: (-x[1], x[0]))
    if vocab_size is not None:
        items = items[:vocab_size]
    return {tok: (i, n) for i, (tok, n) in enumerate(items)}


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestBuildVocab:
    def test_ranking_matches_python(self, spark):
        out = {r["token"]: (r["token_id"], r["count"])
               for r in packing.build_vocab(_df(spark), "text").collect()}
        assert out == _py_vocab(DOCS)

    def test_vocab_size_truncates_by_rank(self, spark):
        out = {r["token"]: (r["token_id"], r["count"])
               for r in packing.build_vocab(_df(spark), "text",
                                            vocab_size=4).collect()}
        assert out == _py_vocab(DOCS, vocab_size=4)
        assert len(out) == 4

    def test_min_count_filters(self, spark):
        out = {r["token"]: (r["token_id"], r["count"])
               for r in packing.build_vocab(_df(spark), "text",
                                            min_count=2).collect()}
        assert out == _py_vocab(DOCS, min_count=2)
        assert all(n >= 2 for _, n in out.values())


class TestEncodeTokens:
    def test_roundtrip_full_vocab(self, spark):
        df = _df(spark)
        vocab = packing.build_vocab(df, "text")
        inv = {r["token_id"]: r["token"] for r in vocab.collect()}
        enc = {r["doc_id"]: r for r in
               packing.encode_tokens(df, "doc_id", "text", vocab)
               .collect()}
        for doc_id, text in DOCS:
            row = enc[doc_id]
            words = text.split(" ")
            assert [inv[t] for t in row["token_ids"]] == words
            assert row["n_tok"] == len(words)
            assert row["n_unk"] == 0

    def test_oov_becomes_unk(self, spark):
        df = _df(spark)
        vocab = packing.build_vocab(df, "text", vocab_size=3)
        py = _py_vocab(DOCS, vocab_size=3)
        enc = {r["doc_id"]: r for r in
               packing.encode_tokens(df, "doc_id", "text", vocab,
                                     unk_id=-7).collect()}
        for doc_id, text in DOCS:
            words = text.split(" ")
            want = [py[w][0] if w in py else -7 for w in words]
            assert list(enc[doc_id]["token_ids"]) == want
            assert enc[doc_id]["n_unk"] == sum(w not in py for w in words)


class TestDecodeTokens:
    def test_roundtrip_identity_full_vocab(self, spark):
        df = _df(spark)
        vocab = packing.build_vocab(df, "text")
        enc = packing.encode_tokens(df, "doc_id", "text", vocab)
        dec = {r["doc_id"]: r for r in
               packing.decode_tokens(enc, "doc_id", "token_ids", vocab)
               .collect()}
        for doc_id, text in DOCS:
            assert dec[doc_id]["text"] == text
            assert dec[doc_id]["n_unk"] == 0
            assert dec[doc_id]["n_tok"] == len(text.split(" "))

    def test_oov_roundtrip_replaces_with_unk(self, spark):
        df = _df(spark)
        vocab = packing.build_vocab(df, "text", vocab_size=3)
        py = _py_vocab(DOCS, vocab_size=3)
        enc = packing.encode_tokens(df, "doc_id", "text", vocab)
        dec = {r["doc_id"]: r for r in
               packing.decode_tokens(enc, "doc_id", "token_ids", vocab,
                                     unk_token="@@")
               .collect()}
        for doc_id, text in DOCS:
            words = text.split(" ")
            want = " ".join(w if w in py else "@@" for w in words)
            assert dec[doc_id]["text"] == want
            assert dec[doc_id]["n_unk"] == sum(w not in py for w in words)

    def test_stale_id_decodes_to_unk(self, spark):
        # an id outside the vocab range (e.g. after a vocab rebuild)
        # must decode to unk_token, not drop or error
        vocab = packing.build_vocab(_df(spark), "text")
        n = vocab.count()
        enc = spark.createDataFrame([("dx", [0, n + 17, 1])],
                                    ["doc_id", "token_ids"])
        row = packing.decode_tokens(enc, "doc_id", "token_ids",
                                    vocab).collect()[0]
        assert row["n_unk"] == 1
        assert "<unk>" in row["text"].split(" ")


def _py_packs(docs, seq_len, salt="order", part_hex_chars=0):
    """Reference packing: md5 order, concat, chunk per part."""
    keyed = sorted(((_md5(d + salt), d, t.split(" ")) for d, t in docs))
    parts = {}
    for k, d, ws in keyed:
        part = k[:part_hex_chars] if part_hex_chars else ""
        parts.setdefault(part, []).append((d, ws))
    out = {}
    for part, rows in parts.items():
        stream = [(d, w) for d, ws in rows for w in ws]
        for i in range(0, len(stream), seq_len):
            chunk = stream[i:i + seq_len]
            words = [w for _, w in chunk]
            out[(part, i // seq_len)] = {
                "n_tok": len(chunk),
                "n_docs": len({d for d, _ in chunk}),
                "fingerprint": _md5(" ".join(words)),
                "tokens": words,
            }
    return out


class TestPackSequences:
    @pytest.mark.parametrize("seq_len", [4, 7, 100])
    def test_matches_python_reference(self, spark, seq_len):
        got = {(r["part"], r["pack"]): r for r in
               packing.pack_sequences(_df(spark), "doc_id", "text",
                                      seq_len, with_tokens=True).collect()}
        want = _py_packs(DOCS, seq_len)
        assert set(got) == set(want)
        for key, w in want.items():
            g = got[key]
            assert g["n_tok"] == w["n_tok"]
            assert g["n_docs"] == w["n_docs"]
            assert g["fingerprint"] == w["fingerprint"]
            assert list(g["tokens"]) == w["tokens"]

    def test_partitioned_stream_restarts_at_part_edges(self, spark):
        got = {(r["part"], r["pack"]): r for r in
               packing.pack_sequences(_df(spark), "doc_id", "text", 5,
                                      part_hex_chars=1).collect()}
        want = _py_packs(DOCS, 5, part_hex_chars=1)
        assert set(got) == set(want)
        for key, w in want.items():
            assert got[key]["fingerprint"] == w["fingerprint"]

    def test_packs_conserve_tokens(self, spark):
        rows = packing.pack_sequences(_df(spark), "doc_id", "text", 6,
                                      with_tokens=True).collect()
        n_total = sum(len(t.split(" ")) for _, t in DOCS)
        assert sum(r["n_tok"] for r in rows) == n_total
        # every pack except each part's last is exactly seq_len full
        by_part = {}
        for r in rows:
            by_part.setdefault(r["part"], []).append(r)
        for part_rows in by_part.values():
            last = max(r["pack"] for r in part_rows)
            for r in part_rows:
                assert len(r["tokens"]) == r["n_tok"]
                if r["pack"] != last:
                    assert r["n_tok"] == 6
                else:
                    assert 1 <= r["n_tok"] <= 6
