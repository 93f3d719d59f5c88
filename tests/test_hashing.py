"""Hash fidelity tests — everything downstream depends on these
(SURVEY.md §7.2 step 1)."""

import numpy as np
import pytest

from gostatix_spark import hashing as H

RNG = np.random.default_rng(1234)


@pytest.mark.parametrize("algo", ["murmur3", "metro"])
def test_scalar_vs_vectorized_all_lengths(algo):
    items = [RNG.integers(0, 256, size=n).astype(np.uint8).tobytes()
             for n in list(range(0, 70)) * 2]
    h1v, h2v = H.hash_bytes_batch(items, algo)
    for i, b in enumerate(items):
        s1, s2 = H._SCALAR[algo](b, H.DEFAULT_SEED[algo])
        assert int(h1v[i]) == s1 and int(h2v[i]) == s2, f"len={len(b)}"


def test_murmur3_public_vectors():
    # canonical public x64-128 digest: hex of the little-endian output bytes
    h1, h2 = H.murmur3_128(b"The quick brown fox jumps over the lazy dog", 0)
    digest = h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    assert digest.hex() == "6c1b07bc7bbc4be347939ac4a93c437a"
    assert H.murmur3_128(b"", 0) == (0, 0)


def test_golden_digests_stable():
    # regression goldens produced by the scalar implementations (committed
    # so any future kernel change that shifts hash values fails loudly)
    import json
    import pathlib
    gold_path = pathlib.Path(__file__).parent / "hash_goldens.json"
    inputs = {
        "John": b"John",
        "Jane": b"Jane",
        "u32be_100": (100).to_bytes(4, "big"),
        "u32be_101": (101).to_bytes(4, "big"),
        "tok_array_1_2_3": b"".join(t.to_bytes(4, "big") for t in (1, 2, 3)),
        "empty": b"",
    }
    got = {
        f"{algo}:{name}": list(H._SCALAR[algo](b, H.DEFAULT_SEED[algo]))
        for algo in ("murmur3", "metro")
        for name, b in inputs.items()
    }
    if not gold_path.exists():
        gold_path.write_text(json.dumps(got, indent=1))
    want = json.loads(gold_path.read_text())
    assert got == want


def test_token_encoding_canonical():
    toks = np.array([0, 1, 100, 2**31 - 1, -1], dtype=np.int32)
    mat = H.tokens_to_bytes_matrix(toks)
    assert mat.shape == (5, 4)
    # int32 -1 → uint32 big-endian 0xFFFFFFFF
    assert mat[4].tolist() == [255, 255, 255, 255]
    assert mat[2].tolist() == [0, 0, 0, 100]


def test_hash_token_arrays_matches_concat():
    vals = np.array([7, 8, 9, 10, 11, 12, 13], dtype=np.int32)
    offs = np.array([0, 3, 3, 7])
    ha, hb = H.hash_token_arrays(vals, offs)
    enc = [b"".join(int(t).to_bytes(4, "big") for t in vals[offs[i]:offs[i + 1]])
           for i in range(3)]
    sa, sb = H.hash_bytes_batch(enc)
    assert np.array_equal(ha, sa) and np.array_equal(hb, sb)


def test_int64_and_string_paths():
    h1, _ = H.hash_int64s(np.array([42, -42], dtype=np.int64))
    s1, _ = H.hash_bytes_batch([(42).to_bytes(8, "big"),
                                (-42).to_bytes(8, "big", signed=True)])
    assert np.array_equal(h1, s1)
    h1, _ = H.hash_strings(["héllo", ""])
    s1, _ = H.hash_bytes_batch(["héllo".encode(), b""])
    assert np.array_equal(h1, s1)
