"""Property-based tests (hypothesis): merge laws and hash fidelity on
randomized inputs — SURVEY.md §5.2 merge-law property tests."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gostatix_spark import hashing as H
from gostatix_spark.kernels import bloom, cms, hll

byte_strings = st.binary(min_size=0, max_size=64)


@settings(max_examples=60, deadline=None)
@given(st.lists(byte_strings, min_size=1, max_size=30))
def test_hash_scalar_equals_vectorized(items):
    for algo in ("murmur3", "metro"):
        h1, h2 = H.hash_bytes_batch(items, algo)
        for i, b in enumerate(items):
            s1, s2 = H._SCALAR[algo](b, H.DEFAULT_SEED[algo])
            assert (int(h1[i]), int(h2[i])) == (s1, s2)


token_streams = st.lists(
    st.integers(min_value=-2**31, max_value=2**31 - 1),
    min_size=0, max_size=400)


def _split3(seed, toks):
    rng = np.random.default_rng(seed)
    if not len(toks):
        return [np.zeros(0, np.int32)] * 3
    labels = rng.integers(0, 3, len(toks))
    arr = np.array(toks, dtype=np.int32)
    return [arr[labels == i] for i in range(3)]


@settings(max_examples=40, deadline=None)
@given(token_streams, st.integers(0, 2**31))
def test_hll_fold_invariant(toks, seed):
    m = 256
    parts = _split3(seed, toks)
    whole = hll.new_state(m)
    if len(toks):
        h1, _ = H.hash_tokens(np.array(toks, np.int32), "metro")
        hll.update_batch(whole, h1)
    acc = hll.new_state(m)
    for p in parts:
        s = hll.new_state(m)
        if len(p):
            h1, _ = H.hash_tokens(p, "metro")
            hll.update_batch(s, h1)
        acc = hll.merge(acc, s)
    assert np.array_equal(acc, whole)
    # idempotence + commutativity on the parts
    s0 = hll.new_state(m)
    if len(parts[0]):
        h1, _ = H.hash_tokens(parts[0], "metro")
        hll.update_batch(s0, h1)
    assert np.array_equal(hll.merge(s0, s0), s0)


@settings(max_examples=40, deadline=None)
@given(token_streams, st.integers(0, 2**31))
def test_cms_and_bloom_fold_invariant(toks, seed):
    d, w, m, k = 3, 97, 512, 4
    parts = _split3(seed, toks)

    whole_cms = cms.new_state(d, w)
    whole_bloom = bloom.new_state(m)
    if len(toks):
        h1, h2 = H.hash_tokens(np.array(toks, np.int32), "metro")
        cms.update_batch(whole_cms, h1, h2)
        bloom.insert_batch(whole_bloom, h1, h2, k, m)

    acc_cms = cms.new_state(d, w)
    acc_bloom = bloom.new_state(m)
    for p in parts:
        pc, pb = cms.new_state(d, w), bloom.new_state(m)
        if len(p):
            h1, h2 = H.hash_tokens(p, "metro")
            cms.update_batch(pc, h1, h2)
            bloom.insert_batch(pb, h1, h2, k, m)
        acc_cms = cms.merge(acc_cms, pc)
        acc_bloom = bloom.merge(acc_bloom, pb)
    assert np.array_equal(acc_cms, whole_cms)
    assert np.array_equal(acc_bloom, whole_bloom)


media_payloads = st.binary(min_size=0, max_size=1500)


@settings(max_examples=40, deadline=None)
@given(media_payloads)
def test_flac_roundtrip_property(payload):
    """Any byte payload survives the FLAC subset codec bit-exactly
    (covers CONSTANT runs, VERBATIM, multi-frame once > BLOCK via the
    sized examples in test_kernels; here the fuzz is over content)."""
    from gostatix_spark.kernels import flac
    arr = np.frombuffer(payload, dtype=np.uint8)
    assert np.array_equal(flac.decode_u8(flac.encode_u8(arr)), arr)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=1, max_size=800))
def test_mjpeg_avi_roundtrip_property(payload):
    """Any non-empty byte payload survives the chunked constant-block
    JPEG → AVI mux → demux → JPEG decode transport bit-exactly."""
    from gostatix_spark import multimodal as mm
    media = mm._mjpeg_bytes(payload)
    raw = mm._mjpeg_raw(media, {"n_samples": str(len(payload))})
    assert raw.tobytes() == payload


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=1, max_size=1200))
def test_h264_ipcm_roundtrip_property(payload):
    """Any non-empty byte payload survives the I_PCM macroblock
    transport bit-exactly, including emulation-prevention patterns."""
    from gostatix_spark.kernels import h264
    arr = np.frombuffer(payload, dtype=np.uint8)
    dec = h264.decode_ipcm(h264.encode_ipcm(arr))
    assert np.array_equal(dec[:len(arr)], arr)
    assert (dec[len(arr):] == 0).all()
