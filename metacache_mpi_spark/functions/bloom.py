"""Broadcast Bloom-filter membership over JVM-pre-hashed keys.

The scale story: an exact decontamination join shuffles EVERY corpus
shingle to its hash partition even though ~all of them can't possibly
match the (small) eval set.  The production shape is the reference's
overpopulated-feature guard turned inside out — build a compact bitset
over the eval side once, broadcast it, and drop non-members MAP-SIDE so
the shuffle only ever sees the O(|eval|) survivors (plus a bounded
false-positive trickle that the exact join downstream removes — the
composition stays bit-identical to the exact lane, which is why the
bloom lane shares the exact lane's DuckDB oracle verbatim).

Hashing discipline: strings are hashed JVM-side with ``xxhash64``
(two derived hashes: ``xxhash64(col)`` and ``xxhash64(col, lit(1))`` —
the Python API exposes no seed, but appending a literal column changes
the hash), so the pandas UDF only ever sees int64 arrays and the probe
is pure vectorized NumPy — no Python string handling, no per-row loop.
Bit positions follow Kirsch–Mitzenmacher: g_i = h1 + i·h2 (mod 2^64),
pos_i = g_i mod m — two base hashes simulate n_hashes independent ones.

Defaults (bits_per_item=16, n_hashes=6) give a ~0.1 % false-positive
rate; FPs only cost a few extra rows in the downstream exact join,
never a wrong answer.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

# driver memory for the build collect is 16 B/row — 20 M rows = 320 MB.
# Decontamination eval sets are orders of magnitude smaller; anything
# bigger should use the exact shuffle join, not a driver-built bitset.
MAX_BLOOM_BUILD_ROWS = 20_000_000

BLOOM_BITS_PER_ITEM = 16
BLOOM_N_HASHES = 6

_U64 = np.uint64


def bloom_hash_cols(col: Column) -> tuple[Column, Column]:
    """The two JVM-side base hashes every bloom build/probe must share."""
    return F.xxhash64(col), F.xxhash64(col, F.lit(1))


def _positions(u1: np.ndarray, u2: np.ndarray, i: int, m: int) -> np.ndarray:
    # uint64 wraparound is the intended Kirsch–Mitzenmacher arithmetic
    return (u1 + _U64(i) * u2) % _U64(m)


def build_bloom(
    keys: DataFrame,
    col: str,
    bits_per_item: int = BLOOM_BITS_PER_ITEM,
    n_hashes: int = BLOOM_N_HASHES,
    max_build_rows: int = MAX_BLOOM_BUILD_ROWS,
) -> tuple[np.ndarray, int, int]:
    """Build the bitset from the DISTINCT values of ``keys[col]``.

    Returns ``(bits, m_bits, n_hashes)`` where ``bits`` is a
    ``uint64[ceil(m/64)]`` array.  Raises if the distinct-key count
    exceeds ``max_build_rows`` (driver memory ∝ rows; see module doc).
    """
    h1, h2 = bloom_hash_cols(F.col(col))
    hashed = keys.select(h1.alias("h1"), h2.alias("h2")).distinct()
    # the guard must bound the COLLECT itself, not fire after it: limit
    # to max+1 rows so an oversized build side costs one extra row on
    # the driver, never an unbounded toPandas
    pdf = hashed.limit(max_build_rows + 1).toPandas()
    n = len(pdf)
    if n > max_build_rows:
        raise ValueError(
            f"bloom build side has > {max_build_rows} distinct keys; "
            "driver memory is proportional to the build side — use the "
            "exact join lane for build sides this large"
        )
    m_bits = max(64, bits_per_item * n)
    bits = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    if n:
        u1 = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
        u2 = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
        for i in range(n_hashes):
            pos = _positions(u1, u2, i, m_bits)
            np.bitwise_or.at(
                bits,
                (pos >> _U64(6)).astype(np.int64),
                _U64(1) << (pos & _U64(63)),
            )
    return bits, m_bits, n_hashes


class BloomBroadcastHandle:
    """Release handle for a probe's bitset broadcast (mirrors
    ``IncrementalDedup.release_query_pins``): call :meth:`release` AFTER
    every DataFrame produced from the probe has been materialized — the
    probe UDF reads the broadcast at execution time, so an eager destroy
    would break still-lazy consumers.  Idempotent."""

    def __init__(self, bc) -> None:
        self._bc = bc

    def release(self) -> None:
        if self._bc is not None:
            self._bc.destroy()
            self._bc = None


def bloom_filter_df(
    df: DataFrame,
    col: str,
    bits: np.ndarray,
    m_bits: int,
    n_hashes: int = BLOOM_N_HASHES,
    handle_out: list | None = None,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` MIGHT be in the bloom set (no false
    negatives; FP rate per module doc).  Map-side: scan → two xxhash64
    columns → one ArrowEvalPython probe → Filter; no shuffle.

    The bitset is shipped as a SparkContext broadcast whose lifetime is
    the returned DataFrame's: it cannot be destroyed eagerly (the probe
    UDF reads it at execution time).  Batch jobs (one session per run,
    the deployment shape) never need to care; a long-lived session
    looping decontamination probes (REPL, repeated clean_job runs on a
    shared session, streaming) should pass ``handle_out=[]`` — a
    :class:`BloomBroadcastHandle` is appended to it, and calling
    ``handle.release()`` after materializing the consuming DataFrames
    destroys the pinned bitset on driver and executors.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bits)
    if handle_out is not None:
        handle_out.append(BloomBroadcastHandle(bc))
    m = int(m_bits)
    k = int(n_hashes)

    @F.pandas_udf("boolean")
    def _might_contain(h1, h2):
        import pandas as pd

        b = bc.value
        u1 = h1.to_numpy(dtype=np.int64).view(np.uint64)
        u2 = h2.to_numpy(dtype=np.int64).view(np.uint64)
        ok = np.ones(len(u1), dtype=bool)
        for i in range(k):
            pos = _positions(u1, u2, i, m)
            word = b[(pos >> _U64(6)).astype(np.int64)]
            ok &= ((word >> (pos & _U64(63))) & _U64(1)).astype(bool)
        return pd.Series(ok)

    h1, h2 = bloom_hash_cols(F.col(col))
    return (
        df.withColumn("__bh1", h1)
        .withColumn("__bh2", h2)
        .where(_might_contain(F.col("__bh1"), F.col("__bh2")))
        .drop("__bh1", "__bh2")
    )
