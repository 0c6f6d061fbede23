"""Property tests (hypothesis) for the sketch/hash layer — the
reference-semantics invariants from SURVEY.md §5.4, no Spark needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from metacache_mpi_spark.functions.hashing import (
    poly_window_hashes,
    shingle_hashes,
    token_poly_hashes,
)
from metacache_mpi_spark.functions.sketch import (
    bottom_s_sketch,
    kperm_signature,
    simhash64,
    sliding_min,
    winnow_fingerprints,
)

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=400,
)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_shingle_count_rule(t):
    # n-k+1 shingle hashes for byte length n ≥ k, else none (ref
    # src/hash_dna.h:122-124 rule)
    k = 16
    n = len(t.encode("utf-8"))
    h = shingle_hashes(t, k)
    assert h.shape[0] == max(0, n - k + 1)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_bottom_s_is_sorted_unique_prefix(t):
    h = shingle_hashes(t, 8)
    sk = bottom_s_sketch(h, 16)
    uniq = np.unique(h)
    assert (sk == uniq[:16]).all()
    assert (np.diff(sk.astype(np.int64)) > 0).all()  # strictly ascending


@given(texts, st.integers(min_value=1, max_value=2**31))
@settings(max_examples=100, deadline=None)
def test_kperm_signature_permutation_invariant(t, seed):
    h = shingle_hashes(t, 8)
    if h.size == 0:
        assert kperm_signature(h, 16, seed) is None
        return
    rng = np.random.RandomState(0)
    perm = h[rng.permutation(h.size)].copy()
    s1 = kperm_signature(h, 16, seed)
    s2 = kperm_signature(perm, 16, seed)
    assert (s1 == s2).all()
    # duplication invariance (set semantics)
    s3 = kperm_signature(np.concatenate([h, h]), 16, seed)
    assert (s1 == s3).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=150, deadline=None)
def test_sliding_min_matches_bruteforce(vals, w):
    h = np.array(vals, dtype=np.uint32)
    if h.size < w:
        assert winnow_fingerprints(h, w).tolist() == [int(h.min())]
        return
    got = sliding_min(h, w)
    want = np.array(
        [h[i : i + w].min() for i in range(h.size - w + 1)], dtype=np.uint32
    )
    assert (got == want).all()


@given(st.binary(min_size=0, max_size=300), st.integers(min_value=1, max_value=50))
@settings(max_examples=150, deadline=None)
def test_poly_window_hash_equal_windows_equal_hashes(data, L):
    arr = np.frombuffer(data, dtype=np.uint8)
    h = poly_window_hashes(arr, L)
    n = arr.shape[0] - L + 1
    if n <= 0:
        assert h.size == 0
        return
    # equal windows hash equal; as a spot-check compare a few pairs
    for i in range(0, n, max(1, n // 5)):
        for j in range(0, n, max(1, n // 5)):
            if data[i : i + L] == data[j : j + L]:
                assert h[i] == h[j]


@given(texts)
@settings(max_examples=100, deadline=None)
def test_token_hash_matches_python_split(t):
    # token count parity with str.split on ASCII whitespace
    th = token_poly_hashes(np.frombuffer(t.encode("utf-8"), dtype=np.uint8))
    assert th.size == len(t.split())
    # identical tokens hash identically
    toks = t.split()
    seen: dict[str, int] = {}
    for tok, h in zip(toks, th.tolist()):
        if tok in seen:
            assert seen[tok] == h
        seen[tok] = h


@given(texts)
@settings(max_examples=50, deadline=None)
def test_simhash_deterministic(t):
    assert simhash64(t) == simhash64(t)
