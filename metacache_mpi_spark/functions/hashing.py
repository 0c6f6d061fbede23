"""Deterministic, NumPy-vectorized hashing primitives.

These reproduce the reference's hashing *semantics* (not its code):

- ``mueller_hash32`` — the 32→32 integer mix the reference uses as its
  sketching hash h₁ (semantics of /root/reference/src/hash_int.h:39-45,
  a public-domain construction by Thomas Mueller).  All arithmetic is
  uint32 wraparound, which NumPy gives natively.
- ``splitmix64`` — 64→64 mix (same family as
  /root/reference/src/hash_int.h:126-141) used for SimHash lanes.
- ``shingle_hashes`` — k-byte shingles of UTF-8 text → uint32 via FNV-1a
  folding then the Mueller mix; the webtext analog of the reference's
  2-bit k-mer encode + hash (/root/reference/src/dna_encoding.h:305-348 →
  src/hash_dna.h:126-151).  The reference hashes fixed-width packed
  k-mers; text shingles are variable bytes, so FNV-1a folds them to 32
  bits first.  Everything stays bit-exact across partitionings — the
  determinism invariant the oracle tests rely on.

Pure NumPy so the same code runs inside Arrow-batched pandas UDFs and
inside the pytest oracles.
"""

from __future__ import annotations

import numpy as np

_FNV32_BASIS = np.uint32(2166136261)
_FNV32_PRIME = np.uint32(16777619)
_FNV64_BASIS = np.uint64(14695981039346656037)
_FNV64_PRIME = np.uint64(1099511628211)


def mueller_hash32(x: np.ndarray) -> np.ndarray:
    """32→32 mix, uint32 wraparound (ref h₁ semantics)."""
    x = x.astype(np.uint32, copy=True)
    with np.errstate(over="ignore"):
        x = ((x >> np.uint32(16)) ^ x) * np.uint32(0x45D9F3B)
        x = ((x >> np.uint32(16)) ^ x) * np.uint32(0x45D9F3B)
        x = (x >> np.uint32(16)) ^ x
    return x


def splitmix64(x: np.ndarray) -> np.ndarray:
    """64→64 mix (splitmix64 finalizer), uint64 wraparound."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def fnv1a32_window(data: np.ndarray, k: int) -> np.ndarray:
    """FNV-1a over every length-k byte window of ``data`` (uint8 array).

    Returns an array of ``len(data) - k + 1`` uint32 hashes (empty if the
    input is shorter than k — the reference's ``n < k → empty sketch``
    rule, /root/reference/src/hash_dna.h:122-124).
    """
    n = data.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint32)
    h = np.full(n, _FNV32_BASIS, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ data[j : j + n].astype(np.uint32)) * _FNV32_PRIME
    return h


def fnv1a64_window(data: np.ndarray, k: int) -> np.ndarray:
    """FNV-1a (64-bit) over every length-k byte window of ``data`` —
    the wide twin of :func:`fnv1a32_window`, same empty-input rule."""
    n = data.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.full(n, _FNV64_BASIS, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ data[j : j + n].astype(np.uint64)) * _FNV64_PRIME
    return h


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """All k-byte-shingle hashes of ``text`` (UTF-8), mixed with h₁.

    Webtext analog of: encode k-mer → canonicalize → hash
    (/root/reference/src/hash_dna.h:126-139).  No canonicalization step —
    the per-row invariant is byte-identical text, so no lossy
    normalization is applied (SURVEY.md P3).
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return mueller_hash32(fnv1a32_window(data, k))


def shingle_hashes64(text: str, k: int) -> np.ndarray:
    """64-bit k-byte-shingle hashes (FNV-1a64 fold → splitmix64 mix).

    The EXACTNESS lane's shingle identity: the verify kernel
    (verify._pair_jaccard) compares shingle sets through these, and at
    64 bits a collision flipping a set-intersection count is negligible
    up to ~10^9 shingles per side (vs ~10^4 for the 32-bit sketch
    hashes), so milli-scale Jaccard scores stay bit-equal to the
    exact-string DuckDB oracles at any realistic document length.  The
    32-bit :func:`shingle_hashes` remains the SKETCH identity (MinHash/
    SimHash lanes) — sketches tolerate collisions by design and their
    oracles share the same 32-bit lanes.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return splitmix64(fnv1a64_window(data, k))


_POLY_B = np.uint64(0x100000001B3)  # odd ⇒ invertible mod 2^64
_POLY_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def poly_window_hashes(data: np.ndarray, L: int) -> np.ndarray:
    """Polynomial rolling hash of every length-L byte window, O(n).

    h(i) = Σ_{j=i}^{i+L-1} data[j]·B^(i+L-1-j)  (mod 2^64), computed via
    prefix sums of data[j]·B^(-j): B is odd, hence invertible mod 2^64,
    and NumPy uint64 arithmetic wraps exactly.  Used by the LCS binary
    search where window length is large — FNV's O(L·n) folding would be
    quadratic there.
    """
    n = data.shape[0] - L + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    m = data.shape[0]
    binv_pows = _pow_table(_POLY_BINV, "binv", m)
    bpows = _pow_table(_POLY_B, "b", m)
    with np.errstate(over="ignore"):
        c = data.astype(np.uint64) * binv_pows
        s = np.cumsum(c, dtype=np.uint64)
        # window [i, i+L): (S[i+L-1] - S[i-1]) * B^(i+L-1)
        upper = s[L - 1 :]
        lower = np.concatenate(([np.uint64(0)], s[: n - 1]))
        return (upper - lower) * bpows[L - 1 : L - 1 + n]


def fnv1a64_tokens(tokens: list[bytes]) -> np.ndarray:
    """FNV-1a 64 of each token, then splitmix64 (SimHash lane hashes)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(tokens):
            h = _FNV64_BASIS
            for b in t:
                h = (h ^ np.uint64(b)) * _FNV64_PRIME
            out[i] = h
    return splitmix64(out)


_WS = np.array([9, 10, 13, 32], dtype=np.uint8)  # \t \n \r space
_WS_LUT = np.zeros(256, dtype=bool)
_WS_LUT[_WS] = True

# Power tables of B / B^-1 mod 2^64 are input-independent — cache and
# grow them on demand instead of re-running two length-m cumprods per
# call (they were ~half of token_poly_hashes at bench scale; the cache
# is read-only after growth, so reuse across pandas-UDF batches is
# race-free within a worker).
_POW_CACHE: dict[str, np.ndarray] = {}


def _pow_table(base: np.uint64, key: str, m: int) -> np.ndarray:
    tab = _POW_CACHE.get(key)
    if tab is None or tab.shape[0] < m:
        size = max(m, 4096, 0 if tab is None else 2 * tab.shape[0])
        new = np.empty(size, dtype=np.uint64)
        new[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            np.cumprod(np.full(size - 1, base, dtype=np.uint64), out=new[1:])
        _POW_CACHE[key] = tab = new
    return tab[:m]


def token_poly_hashes(data: np.ndarray) -> np.ndarray:
    """64-bit polynomial hash of every whitespace-delimited token of a
    UTF-8 byte array — fully vectorized (prefix sums with the invertible
    base B mod 2^64, same trick as :func:`poly_window_hashes`), then
    splitmix64-mixed.  Empty segments (runs of whitespace) are skipped.

    This is the vectorized SimHash token hasher: the per-byte Python
    FNV fold was the sketching stage's hotspot at bench scale.
    """
    m = data.shape[0]
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    is_ws = _WS_LUT[data]
    # segment boundaries: starts where non-ws follows ws/edge
    nonws = ~is_ws
    starts = np.flatnonzero(nonws & np.concatenate(([True], is_ws[:-1])))
    ends_all = np.flatnonzero(nonws & np.concatenate((is_ws[1:], [True]))) + 1
    if starts.size == 0:
        return np.empty(0, dtype=np.uint64)
    binv_pows = _pow_table(_POLY_BINV, "binv", m)
    bpows = _pow_table(_POLY_B, "b", m)
    with np.errstate(over="ignore"):
        # bias bytes by +1 so leading zero bytes can't alias lengths
        c = (data.astype(np.uint64) + np.uint64(1)) * binv_pows
        s = np.concatenate(([np.uint64(0)], np.cumsum(c, dtype=np.uint64)))
        seg = (s[ends_all] - s[starts]) * bpows[ends_all - 1]
        # mix in the token length to separate rotations
        seg ^= (ends_all - starts).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return splitmix64(seg)
