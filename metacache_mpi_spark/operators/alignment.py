"""Semi-global alignment verification — the reference's ``-align`` mode.

Restates /root/reference/src/alignment.h:185-298 (banded semi-global DP
with backtrace) and its driver /root/reference/src/classification.cpp:
437-477 (optional deep per-candidate verification): the QUERY aligns
end-to-end, the TARGET contributes a free-leading/free-trailing region
(semi-global: no penalty for the unaligned target flanks), and the
result carries the best score, the target start offset and a CIGAR
string from the backtrace.

Spark-first placement: alignment is per-candidate-pair work AFTER the
index probe has cut the corpus down to a small candidate set — exactly
where the reference gates it behind ``-align`` — so it runs as an
Arrow-batched ``mapInPandas`` over (pair, query_seq, target_seq) rows,
never on the corpus scan.  The inner DP is a plain NumPy/Python loop:
off the hot path by construction (swap in a SIMD/GPU aligner at scale;
the Spark plumbing — schema, batching, partition pinning — is the
contract).  The repo's rolling-hash LCS pass (operators/verify.py)
remains the fast default; this operator exists for reference-style
scores/CIGAR parity.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_MATCH = 2
DEFAULT_MISMATCH = -1
DEFAULT_GAP = -2
_SEED_LEN = 16


def _seed_diagonals(
    q: np.ndarray, t: np.ndarray, max_diags: int = 4
) -> list[int]:
    """Candidate band anchors: diagonal offsets (target_pos −
    query_pos) of common ``_SEED_LEN``-grams, most-voted first, capped
    at ``max_diags``.  A repeated seed (template text present at two
    target sites) yields several diagonals — the band must cover ALL
    of them or the DP silently misses the true site.  Empty when the
    sequences share no seed."""
    from ..functions.hashing import poly_window_hashes

    L = min(_SEED_LEN, q.size, t.size)
    if L == 0:
        return []
    hq = poly_window_hashes(q, L)
    ht = poly_window_hashes(t, L)
    if hq.size == 0 or ht.size == 0:
        return []
    t_pos: dict[int, list[int]] = {}
    for pos, h in enumerate(ht.tolist()):
        t_pos.setdefault(h, []).append(pos)
    votes: dict[int, int] = {}
    for iq, h in enumerate(hq.tolist()):
        for it_ in t_pos.get(h, ())[:8]:
            if np.array_equal(q[iq : iq + L], t[it_ : it_ + L]):
                d = it_ - iq
                votes[d] = votes.get(d, 0) + 1
    ranked = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
    return [d for d, _ in ranked[:max_diags]]


def align_semi_global(
    query: str,
    target: str,
    match: int = DEFAULT_MATCH,
    mismatch: int = DEFAULT_MISMATCH,
    gap: int = DEFAULT_GAP,
    band: int | None = None,
) -> tuple[int, int, str]:
    """Align ``query`` (global) against ``target`` (free end gaps).

    Returns (score, target_begin, cigar).  CIGAR is relative to the
    target: M consumes both, I consumes query only (insertion), D
    consumes target only (deletion); runs are length-collapsed
    (``12M1I3M``).  ``band``: optional half-width (scores outside the
    band are -inf), the reference's banded variant
    (alignment.h:185-221) — callers size it from the indel budget.
    Because the target's leading flank is FREE, bands are anchored on
    SEEDED diagonals (common 16-grams, most-voted first, up to 4 — a
    repeated seed needs a band over EVERY candidate site), and the
    best end considers a trailing query overhang from any computed
    cell (``h[i,j] + gap·(m−i)``), so a query hanging past the target
    end scores its I-run instead of falling off the band.  With no
    seed at all the DP falls back to the full matrix.  Banding remains
    an approximation beyond those cases (as in any banded aligner): an
    optimum using > ``band`` indels off every seeded diagonal is
    missed.  Deterministic tie-breaks: diagonal > up (I) > left (D);
    unbanded: leftmost best end in the last row; banded: lowest
    (row, column) best end.
    """
    m, n = len(query), len(target)
    if m == 0:
        return 0, 0, ""
    neg = -(10**9)
    # H[i][j] = best score of query[:i] vs target[..j] (j = target cols)
    h = np.full((m + 1, n + 1), neg, dtype=np.int64)
    move = np.zeros((m + 1, n + 1), dtype=np.uint8)  # 1=diag 2=up(I) 3=left(D)
    h[0, :] = 0          # free leading target gap
    for i in range(1, m + 1):
        h[i, 0] = i * gap
        move[i, 0] = 2
    q = np.frombuffer(query.encode("utf-8"), dtype=np.uint8)
    t = np.frombuffer(target.encode("utf-8"), dtype=np.uint8)
    diags: list[int] = []
    if band is not None:
        diags = _seed_diagonals(q, t)
        if not diags:
            band = None  # no anchor — full DP keeps correctness
    for i in range(1, m + 1):
        if band is None:
            intervals = [(1, n)]
        else:
            spans = sorted(
                (max(1, i + d - band), min(n, i + d + band))
                for d in diags
            )
            intervals = []
            for lo, hi in spans:
                if lo > hi:
                    continue
                if intervals and lo <= intervals[-1][1] + 1:
                    intervals[-1] = (
                        intervals[-1][0], max(intervals[-1][1], hi)
                    )
                else:
                    intervals.append((lo, hi))
        for lo, hi in intervals:
            for j in range(lo, hi + 1):
                sub = match if q[i - 1] == t[j - 1] else mismatch
                best, mv = h[i - 1, j - 1] + sub, 1
                up = h[i - 1, j] + gap
                if up > best:
                    best, mv = up, 2
                left = h[i, j - 1] + gap
                if left > best:
                    best, mv = left, 3
                h[i, j] = best
                move[i, j] = mv
    if band is None:
        # free trailing target gap: best over the last row, leftmost
        i_end, tail = m, 0
        j_end = int(np.argmax(h[m, :]))
        score = int(h[m, j_end])
    else:
        # any computed cell may end the aligned region, with the rest
        # of the query as a trailing I-run (gap each) — the run's cells
        # need not lie inside the band
        ext = h[1:, :] + gap * (m - np.arange(1, m + 1))[:, None]
        flat = int(np.argmax(ext))
        i_end = flat // (n + 1) + 1
        j_end = flat % (n + 1)
        score = int(ext[i_end - 1, j_end])
        tail = m - i_end
    # backtrace
    ops: list[str] = ["I"] * tail
    i, j = i_end, j_end
    while i > 0:
        mv = move[i, j]
        if mv == 1:
            ops.append("M")
            i, j = i - 1, j - 1
        elif mv == 2:
            ops.append("I")
            i -= 1
        else:
            ops.append("D")
            j -= 1
    ops.reverse()
    # run-length collapse
    cigar, run, cur = [], 0, ""
    for op in ops:
        if op == cur:
            run += 1
        else:
            if run:
                cigar.append(f"{run}{cur}")
            run, cur = 1, op
    if run:
        cigar.append(f"{run}{cur}")
    return score, j, "".join(cigar)


def align_pairs(
    pairs_with_seqs: DataFrame,
    query_col: str = "text_a",
    target_col: str = "text_b",
    match: int = DEFAULT_MATCH,
    mismatch: int = DEFAULT_MISMATCH,
    gap: int = DEFAULT_GAP,
    band: int | None = None,
) -> DataFrame:
    """Append (align_score, target_begin, cigar) per candidate pair.

    Input rows carry the two sequences (the shape
    ``verify.join_pair_texts`` / ``verify.gate_and_attach`` produce);
    the stage is pinned to full parallelism the same way the Jaccard
    verify is (AQE would coalesce this CPU-bound stage by bytes).
    """
    from pyspark.sql import types as T

    from .verify import _pin_udf_parallelism

    schema = T.StructType(
        list(pairs_with_seqs.schema.fields)
        + [
            T.StructField("align_score", T.LongType()),
            T.StructField("target_begin", T.LongType()),
            T.StructField("cigar", T.StringType()),
        ]
    )

    def _compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores, begins, cigars = [], [], []
            for qs, ts in zip(pdf[query_col], pdf[target_col]):
                s, b, c = align_semi_global(
                    qs or "", ts or "", match, mismatch, gap, band
                )
                scores.append(s)
                begins.append(b)
                cigars.append(c)
            pdf = pdf.copy()
            pdf["align_score"] = pd.Series(scores, index=pdf.index, dtype="int64")
            pdf["target_begin"] = pd.Series(begins, index=pdf.index, dtype="int64")
            pdf["cigar"] = pd.Series(cigars, index=pdf.index, dtype=object)
            yield pdf

    return _pin_udf_parallelism(pairs_with_seqs).mapInPandas(
        _compute, schema=schema
    )
