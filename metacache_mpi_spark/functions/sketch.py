"""Sketching: bottom-s sketches, k-permutation MinHash signatures, and
SimHash fingerprints — NumPy cores + Arrow-batched pandas UDF wrappers.

Reference semantics re-expressed (no code ported):

- **bottom-s sketch** — the s smallest *unique* hashed shingles, sorted
  ascending; uniqueness is applied BEFORE taking the bottom s, and a
  document shorter than k shingles yields an empty/short sketch
  (/root/reference/src/hash_dna.h:104-152: insertion-sorted vector,
  duplicate rejection at :133-137, `n < k → empty` at :122-124,
  sentinel trim at :144-149).
- **k-permutation MinHash** — s independent mixes of the same shingle
  hash set, one min per lane.  This is the graft's LSH-banding signature
  (the reference's `Sketcher` template parameter is exactly this swap
  point — /root/reference/src/config.h:92-95 names an alternative
  `single_function_min_hasher`).
- **SimHash** — 64-bit fingerprint from token hashes (majority vote per
  bit), the second fingerprint lane required by BASELINE.json.

UDFs are Series→Series pandas UDFs (Arrow batches, no per-row Python at
the DataFrame boundary; the per-row NumPy inside operates on vectorized
shingle windows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import (
    fnv1a64_tokens,
    mueller_hash32,
    shingle_hashes,
    splitmix64,
)

# --------------------------------------------------------------------------
# NumPy cores (shared by UDFs and pytest oracles)
# --------------------------------------------------------------------------


def bottom_s_sketch(hashes: np.ndarray, s: int) -> np.ndarray:
    """s smallest unique hashes, ascending (unique-before-bottom-s)."""
    return np.unique(hashes)[:s].astype(np.uint32)


def lane_seeds(s: int, seed: int) -> np.ndarray:
    """Deterministic uint32 seed per MinHash lane."""
    return splitmix64(np.arange(s, dtype=np.uint64) + np.uint64(seed)).astype(
        np.uint32
    )


def kperm_signature(hashes: np.ndarray, s: int, seed: int) -> np.ndarray | None:
    """s-lane MinHash signature of a shingle-hash set; None if empty."""
    if hashes.shape[0] == 0:
        return None
    seeds = lane_seeds(s, seed)
    sig = np.empty(s, dtype=np.uint32)
    # Loop over s lanes (s=16), vectorized over all shingles per lane —
    # avoids materializing the (n_shingles × s) matrix for long docs.
    for i in range(s):
        sig[i] = mueller_hash32(hashes ^ seeds[i]).min()
    return sig


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (majority vote per bit).

    Returned as a signed int64 bit-pattern (Spark LongType carrier).
    """
    tokens = [t.encode("utf-8") for t in text.split()]
    if not tokens:
        return 0
    th = fnv1a64_tokens(tokens)
    bits = (th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    votes = bits.astype(np.int64).sum(axis=0) * 2 - len(tokens)
    fp = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            fp |= np.uint64(1) << np.uint64(i)
    return int(fp.astype(np.int64))


def winnow_fingerprints(hashes: np.ndarray, w: int) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    in every window of ``w`` consecutive shingle hashes select the
    minimum (rightmost on ties); return the distinct selected values.

    Guarantee: two texts sharing a verbatim substring of length
    ≥ w + k - 1 chars share at least one fingerprint — the candidate
    generator for the substring-overlap verify lane (the reference's
    `-align` deep-verify slot, /root/reference/src/classification.cpp:437-477,
    needs candidates too; MetaCache gets them from the MinHash index,
    webtext substring dups need this coarser net).
    """
    n = hashes.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    if n <= w:
        return np.array([hashes.min()], dtype=np.uint32)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost-min: argmin of the reversed window is the first (i.e.
    # rightmost-in-original) occurrence of the minimum
    ridx = win[:, ::-1].argmin(axis=1)
    pos = np.arange(n - w + 1) + (w - 1 - ridx)
    return np.unique(hashes[np.unique(pos)])


def make_winnow_udf(k: int, w: int):
    """pandas UDF: text → array<long> winnowing fingerprints."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            fp = winnow_fingerprints(shingle_hashes(t, k), w)
            out.append(fp.astype(np.int64).tolist())
        return pd.Series(out, dtype=object)

    return _winnow


# --------------------------------------------------------------------------
# pandas UDF factories
# --------------------------------------------------------------------------


def make_minhash_udf(k: int, s: int, seed: int):
    """pandas UDF: text → array<long> MinHash signature (null if no
    shingles, i.e. len(text-bytes) < k)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            sig = kperm_signature(shingle_hashes(t, k), s, seed)
            out.append(None if sig is None else sig.astype(np.int64).tolist())
        return pd.Series(out, dtype=object)

    return _minhash


def make_bottom_sketch_udf(k: int, s: int):
    """pandas UDF: text → array<long> bottom-s sketch (reference-parity
    sketch; may be shorter than s, empty for short docs)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sketch(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            sk = bottom_s_sketch(shingle_hashes(t, k), s)
            out.append(sk.astype(np.int64).tolist())
        return pd.Series(out, dtype=object)

    return _sketch


def make_simhash_udf():
    """pandas UDF: text → long SimHash fingerprint."""

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [None if t is None else simhash64(t) for t in texts],
            dtype="Int64",
        )

    return _simhash
