"""DNA encode/canonicalize/window unit semantics vs literal oracles
(SURVEY.md P1-P3, W1; FIXTURES.md tail_window fixture)."""

from __future__ import annotations

import numpy as np

from metacache_mpi_spark.functions.dna import (
    canonical_kmers,
    encode_kmers,
    revcomp_kmers,
    window_starts,
    window_sketches,
)

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _encode_oracle(seq: str, k: int) -> list[int]:
    out = []
    for i in range(len(seq) - k + 1):
        sub = seq[i : i + k].upper()
        if any(c not in "ACGT" for c in sub):
            continue
        v = 0
        for c in sub:
            v = (v << 2) | "ACGT".index(c)
        out.append(v)
    return out


def _revcomp_oracle(seq: str) -> str:
    return "".join(_COMP[c] for c in reversed(seq))


def test_encode_matches_oracle():
    seq = "ACGTACGTNNGGTTAACCACGT"
    for k in (3, 5, 11):
        assert encode_kmers(seq, k).tolist() == _encode_oracle(seq, k)


def test_encode_short_and_empty():
    assert encode_kmers("AC", 3).size == 0
    assert encode_kmers("", 5).size == 0
    assert encode_kmers("NNNNNNN", 3).size == 0


def test_revcomp_matches_string_oracle():
    seq = "ACGTTGCAAGGTC"
    k = 7
    kmers = encode_kmers(seq, k)
    rc = revcomp_kmers(kmers, k)
    for i in range(len(seq) - k + 1):
        sub = seq[i : i + k]
        want = _encode_oracle(_revcomp_oracle(sub), k)[0]
        assert rc[i] == want, sub


def test_revcomp_involution():
    rng = np.random.RandomState(5)
    for k in (4, 9, 16):
        kmers = rng.randint(0, 1 << (2 * k), size=200).astype(np.uint32)
        assert (revcomp_kmers(revcomp_kmers(kmers, k), k) == kmers).all()


def test_canonical_strand_invariant():
    seq = "ACGTTGCAAGGTCCATG"
    k = 6
    fwd = canonical_kmers(encode_kmers(seq, k), k)
    rev = canonical_kmers(encode_kmers(_revcomp_oracle(seq), k), k)
    assert sorted(fwd.tolist()) == sorted(rev.tolist())


def test_window_starts_tail_rule():
    # whole seq if n <= winlen
    assert window_starts(100, 16, 128, 113) == [0]
    assert window_starts(128, 16, 128, 113) == [0]
    # n=129: starts at 0 and 113 (tail window of 16 = exactly one kmer)
    assert window_starts(129, 16, 128, 113) == [0, 113]
    # a start past n-k+1 would hold no kmer -> excluded
    assert window_starts(241, 16, 128, 113) == [0, 113]
    assert window_starts(242, 16, 128, 113) == [0, 113, 226]


def test_window_sketches_shapes():
    rng = np.random.RandomState(1)
    seq = "".join("ACGT"[i] for i in rng.randint(0, 4, size=300))
    out = window_sketches(seq, 16, 16, 128, 113)
    assert [w for w, _ in out] == [0, 1, 2]
    for _, sk in out:
        assert sk.size <= 16
        assert (np.diff(sk.astype(np.int64)) > 0).all()
