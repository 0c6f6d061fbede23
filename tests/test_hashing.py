"""Hash primitive semantics (SURVEY.md P5-P7; FIXTURES.md §3)."""

from __future__ import annotations

import numpy as np

from metacache_mpi_spark.functions.hashing import (
    fnv1a32_window,
    fnv1a64_tokens,
    mueller_hash32,
    shingle_hashes,
    splitmix64,
)
from metacache_mpi_spark.functions.sketch import (
    bottom_s_sketch,
    kperm_signature,
    simhash64,
    winnow_fingerprints,
)


def _mueller_scalar(x: int) -> int:
    """Literal transcription of the 32→32 mix spec (uint32 wraparound)."""
    M = 0xFFFFFFFF
    x = ((x >> 16) ^ x) * 0x45D9F3B & M
    x = ((x >> 16) ^ x) * 0x45D9F3B & M
    x = (x >> 16) ^ x
    return x


def test_mueller_hash32_matches_scalar_spec():
    xs = np.array([0, 1, 42, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = mueller_hash32(xs)
    want = [_mueller_scalar(int(x)) for x in xs]
    assert got.tolist() == want


def test_fnv_window_matches_slow_loop():
    data = np.frombuffer(b"the quick brown fox", dtype=np.uint8)
    k = 5
    got = fnv1a32_window(data, k)

    def slow(bs: bytes) -> int:
        h = 2166136261
        for b in bs:
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
        return h

    raw = bytes(data)
    want = [slow(raw[i : i + k]) for i in range(len(raw) - k + 1)]
    assert got.tolist() == want


def test_short_input_empty_hashes():
    # n < k → no shingles (ref src/hash_dna.h:122-124 rule)
    assert shingle_hashes("abc", 16).size == 0
    assert fnv1a32_window(np.frombuffer(b"ab", dtype=np.uint8), 3).size == 0


def test_bottom_s_unique_before_bottom_s():
    # repeat_doc fixture: duplicates rejected BEFORE taking bottom-s
    h = np.array([7, 7, 7, 3, 3, 9, 1], dtype=np.uint32)
    sk = bottom_s_sketch(h, 3)
    assert sk.tolist() == [1, 3, 7]
    # fewer uniques than s → shorter sketch, no sentinel padding
    assert bottom_s_sketch(np.array([5, 5], dtype=np.uint32), 4).tolist() == [5]


def test_kperm_signature_deterministic_and_order_invariant():
    h = shingle_hashes("hello world, this is a test document", 8)
    s1 = kperm_signature(h, 16, 1234)
    s2 = kperm_signature(h[::-1].copy(), 16, 1234)
    assert s1 is not None and (s1 == s2).all()
    assert kperm_signature(np.empty(0, dtype=np.uint32), 16, 1) is None


def test_splitmix64_known_vector():
    # splitmix64(0) first output with the standard finalizer on input 0+γ?
    # we only assert determinism + 64-bit range + bijectivity on a sample
    xs = np.arange(1000, dtype=np.uint64)
    ys = splitmix64(xs)
    assert len(np.unique(ys)) == 1000


def test_simhash_similar_texts_close():
    a = "the quick brown fox jumps over the lazy dog " * 20
    b = a.replace("lazy", "hazy")
    c = " ".join(f"tok{i}" for i in range(200))
    da = simhash64(a)
    db = simhash64(b)
    dc = simhash64(c)
    ham_ab = bin((da ^ db) & 0xFFFFFFFFFFFFFFFF).count("1")
    ham_ac = bin((da ^ dc) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham_ab < ham_ac
    assert simhash64("") == 0


def test_fnv64_tokens_deterministic():
    t1 = fnv1a64_tokens([b"alpha", b"beta"])
    t2 = fnv1a64_tokens([b"alpha", b"beta"])
    assert (t1 == t2).all() and t1[0] != t1[1]


def test_winnowing_shared_substring_guarantee():
    k, w = 16, 50
    import numpy.random as nr

    rng = nr.RandomState(7)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.randint(0, 26, size=n))

    block = rand_text(w + k - 1 + 10)  # just above the guarantee length
    a = rand_text(500) + block + rand_text(300)
    b = rand_text(400) + block + rand_text(444)
    fa = winnow_fingerprints(shingle_hashes(a, k), w)
    fb = winnow_fingerprints(shingle_hashes(b, k), w)
    assert np.intersect1d(fa, fb).size >= 1


def test_winnowing_short_doc_single_fingerprint():
    h = np.array([9, 4, 6], dtype=np.uint32)
    assert winnow_fingerprints(h, 50).tolist() == [4]
    assert winnow_fingerprints(np.empty(0, dtype=np.uint32), 50).size == 0


# ---- round-7 kernel vectorizations: bit-exactness vs the reference
# formulations (the chunked lane matrix and the unpackbits vote both
# replaced loop-form kernels; these pin the equivalence, including the
# chunk boundary) ----------------------------------------------------


def test_kperm_matrix_equals_lane_loop():
    from metacache_mpi_spark.functions.sketch import (
        kperm_signature,
        lane_seeds,
    )
    from metacache_mpi_spark.functions.hashing import mueller_hash32

    rng = np.random.RandomState(11)
    s, seed = 16, 0x9E3779B9
    seeds = lane_seeds(s, seed)
    for n in (1, 7, 400):
        h = rng.randint(0, 2**32, size=n).astype(np.uint32)
        loop = np.array(
            [mueller_hash32(h ^ seeds[i]).min() for i in range(s)],
            dtype=np.uint32,
        )
        assert np.array_equal(loop, kperm_signature(h, s, seed))


def test_kperm_chunk_boundary_exact():
    from metacache_mpi_spark.functions import sketch as sk

    rng = np.random.RandomState(12)
    # straddle the chunk boundary so the chunk-min fold is exercised
    n = sk._KPERM_CHUNK + 123
    h = rng.randint(0, 2**32, size=n).astype(np.uint32)
    whole = sk.kperm_signature(h, 16, 0x9E3779B9)
    # reference: shrink the chunk so MANY folds happen on the same data
    old_chunk = sk._KPERM_CHUNK
    try:
        sk._KPERM_CHUNK = 1000
        chunked = sk.kperm_signature(h, 16, 0x9E3779B9)
    finally:
        sk._KPERM_CHUNK = old_chunk
    assert np.array_equal(whole, chunked)


def test_simhash64_unpackbits_equals_shift_matrix():
    from metacache_mpi_spark.functions.hashing import token_poly_hashes

    rng = np.random.RandomState(13)
    for _ in range(50):
        n = int(rng.randint(0, 300))
        t = "".join(
            "abcdefg h"[c] for c in rng.randint(0, 9, size=n)
        )
        data = np.frombuffer(t.encode(), dtype=np.uint8)
        th = token_poly_hashes(data)
        if th.size == 0:
            expected = 0
        else:
            bits = (
                th[:, None] >> np.arange(64, dtype=np.uint64)
            ) & np.uint64(1)
            votes = bits.astype(np.int64).sum(axis=0) * 2 - th.size
            one = np.uint64(1)
            fp = np.bitwise_or.reduce(
                np.where(
                    votes > 0,
                    one << np.arange(64, dtype=np.uint64),
                    np.uint64(0),
                )
            )
            expected = int(fp.astype(np.int64))
        assert expected == simhash64(t)
