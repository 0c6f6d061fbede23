"""DNA k-mer encoding, canonicalization, windowing, and per-window
bottom-s sketching — the reference's genomic sketch stack re-expressed
in vectorized NumPy (semantics from /root/reference/src/dna_encoding.h
and src/hash_dna.h; no code ported).

- 2-bit rolling encode (P1): A=0 C=1 G=2 T=3, one k-mer per position,
  k-mers containing any ambiguous letter are skipped
  (dna_encoding.h:305-348 semantics: parallel ambiguity mask).
- reverse complement (P2): per-2-bit-field complement is bitwise NOT;
  field order reversed by log-step swaps (dna_encoding.h:102-141).
- canonical k-mer (P3): min(kmer, revcomp) (dna_encoding.h:189-210).
- windowing (W1): fixed-length windows of ``winlen`` at ``stride``
  offsets; the short tail window is included; a sequence shorter than
  one window yields a single window (dna_encoding.h:261-289); default
  winlen=128, stride=winlen-k+1=113 (mode_build.cpp:67-68,111).
- per-window sketch: bottom-s unique Mueller-mixed canonical k-mers
  (hash_dna.h:104-152), empty when the window has no valid k-mer.
"""

from __future__ import annotations

import numpy as np

from .hashing import mueller_hash32
from .sketch import bottom_s_sketch

_CODE = np.full(256, 255, dtype=np.uint8)
for i, b in enumerate(b"ACGT"):
    _CODE[b] = i
for i, b in enumerate(b"acgt"):
    _CODE[b] = i


def encode_kmers(seq: str, k: int) -> np.ndarray:
    """All valid (ambiguity-free) 2-bit-packed k-mers, one per position.

    Returns uint32 array of length ≤ n-k+1 (invalid positions removed),
    empty if n < k.  k ≤ 16.
    """
    if k > 16:
        raise ValueError("k must be ≤ 16 for 32-bit packing")
    data = np.frombuffer(seq.encode("ascii", errors="replace"), dtype=np.uint8)
    n = data.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint32)
    codes = _CODE[data]
    valid = codes != 255
    # k-mer at i is valid iff all of codes[i:i+k] valid
    bad = (~valid).astype(np.int32)
    run = np.cumsum(bad)
    ok = (run[k - 1 :] - np.concatenate(([0], run[: n - 1]))) == 0
    v = np.zeros(n, dtype=np.uint32)
    c32 = codes.astype(np.uint32)
    for j in range(k):
        v = (v << np.uint32(2)) | c32[j : j + n]
    return v[ok]


def revcomp_kmers(kmers: np.ndarray, k: int) -> np.ndarray:
    """Reverse complement of 2-bit-packed k-mers (vectorized)."""
    x = (~kmers.astype(np.uint32)) & np.uint32(0xFFFFFFFF)  # per-field complement
    # reverse 2-bit fields across the 32-bit word (log-step swaps)
    x = ((x & np.uint32(0x33333333)) << np.uint32(2)) | (
        (x >> np.uint32(2)) & np.uint32(0x33333333)
    )
    x = ((x & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | (
        (x >> np.uint32(4)) & np.uint32(0x0F0F0F0F)
    )
    x = ((x & np.uint32(0x00FF00FF)) << np.uint32(8)) | (
        (x >> np.uint32(8)) & np.uint32(0x00FF00FF)
    )
    x = (x << np.uint32(16)) | (x >> np.uint32(16))
    return x >> np.uint32(32 - 2 * k)


def canonical_kmers(kmers: np.ndarray, k: int) -> np.ndarray:
    """min(kmer, revcomp(kmer)) per position."""
    return np.minimum(kmers, revcomp_kmers(kmers, k))


def window_starts(n: int, k: int, winlen: int, stride: int) -> list[int]:
    """Window start offsets: 0, stride, … while a window can still hold
    at least one k-mer; whole sequence if n ≤ winlen (tail included)."""
    if n <= winlen:
        return [0]
    starts = []
    s = 0
    while s < n - k + 1:
        starts.append(s)
        s += stride
    return starts


def window_sketches(
    seq: str, k: int, s: int, winlen: int, stride: int
) -> list[tuple[int, np.ndarray]]:
    """(window_id, bottom-s sketch of canonical k-mer hashes) per
    window; windows with no valid k-mer are omitted (their sketch is
    empty, hash_dna.h:122-124)."""
    out = []
    n = len(seq)
    for win_id, start in enumerate(window_starts(n, k, winlen, stride)):
        sub = seq[start : start + winlen]
        kmers = encode_kmers(sub, k)
        if kmers.size == 0:
            continue
        hashes = mueller_hash32(canonical_kmers(kmers, k))
        sk = bottom_s_sketch(hashes, s)
        if sk.size:
            out.append((win_id, sk))
    return out
