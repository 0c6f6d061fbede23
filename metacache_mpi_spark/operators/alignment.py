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
    q = np.frombuffer(query.encode("utf-8"), dtype=np.uint8)
    t = np.frombuffer(target.encode("utf-8"), dtype=np.uint8)
    diags: list[int] = []
    if band is not None:
        diags = _seed_diagonals(q, t)
        if not diags:
            band = None  # no anchor — full DP keeps correctness

    def _row_ops(prev_diag, prev_up, seed, sub, lo, hi):
        """One interval of one row, fully vectorized.  diag/up depend
        only on row i−1 (elementwise); the left-gap recurrence
        ``h[j] = max(best2[j], h[j−1] + gap)`` unrolls to
        ``h[j] = gap·j + max_{k≤j}(v[k] − gap·k)`` with
        v = [seed, best2…] — a prefix max (np.maximum.accumulate)
        after subtracting the gap ramp.  Tie-breaks match the scalar
        loop exactly: up beats diag only strictly (mv2), left beats
        both only strictly (row > best2)."""
        diag_v = prev_diag + sub
        up_v = prev_up + gap
        best2 = np.maximum(diag_v, up_v)
        mv2 = np.where(up_v > diag_v, 2, 1).astype(np.uint8)
        k = np.arange(lo - 1, hi + 1, dtype=np.int64)
        v = np.concatenate(([seed], best2))
        run = np.maximum.accumulate(v - gap * k)
        row = gap * k[1:] + run[1:]
        mv = np.where(row > best2, np.uint8(3), mv2)
        return row, mv

    if band is None:
        # dense full DP (fallback / oracle path): O(m·n) memory
        # H[i][j] = best of query[:i] vs target[..j] (j = target cols)
        h = np.full((m + 1, n + 1), neg, dtype=np.int64)
        move = np.zeros((m + 1, n + 1), dtype=np.uint8)  # 1=diag 2=up(I) 3=left(D)
        h[0, :] = 0          # free leading target gap
        h[1:, 0] = gap * np.arange(1, m + 1)
        move[1:, 0] = 2
        for i in range(1, m + 1):
            sub = np.where(t == q[i - 1], match, mismatch).astype(np.int64)
            h[i, 1:], move[i, 1:] = _row_ops(
                h[i - 1, :-1], h[i - 1, 1:], h[i, 0], sub, 1, n
            )
        # free trailing target gap: best over the last row, leftmost
        i_end, tail = m, 0
        j_end = int(np.argmax(h[m, :]))
        score = int(h[m, j_end])

        def get_move(i, j):
            return int(move[i, j])

    else:
        # banded: SPARSE per-row interval storage — O(m·band·|diags|)
        # cells and memory, never a dense (m×n) matrix (a 6 kb pair's
        # dense DP is ~300 MB of fill + scan; the band touches <3%
        # of it).  Semantics are identical to the dense loop over a
        # neg-initialized matrix: out-of-band reads see ``neg``.
        moves: list[list[tuple[int, np.ndarray]]] = [[] for _ in range(m + 1)]
        prev_ivs: list[tuple[int, int, np.ndarray]] = []
        # ending rule: any computed cell may end the aligned region,
        # with the rest of the query as a trailing I-run (gap each) —
        # the run's cells need not lie inside the band.  Column 0 of
        # row 1 (ext = gap·m) seeds the scan, replicating the dense
        # argmax's first-cell-wins tie-break.
        best_ext, i_end, j_end = gap * m, 1, 0

        def _span_prev(i, a, b, ivs):
            """h[i−1, a..b] materialized from the interval store."""
            if i == 1:
                return np.zeros(b - a + 1, dtype=np.int64)
            out = np.full(b - a + 1, neg, dtype=np.int64)
            if a == 0:
                out[0] = (i - 1) * gap
            for plo, phi, vals in ivs:
                s, e = max(a, plo), min(b, phi)
                if s <= e:
                    out[s - a : e - a + 1] = vals[s - plo : e - plo + 1]
            return out

        for i in range(1, m + 1):
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
            cur_ivs: list[tuple[int, int, np.ndarray]] = []
            for lo, hi in intervals:
                pspan = _span_prev(i, lo - 1, hi, prev_ivs)
                sub = np.where(
                    t[lo - 1 : hi] == q[i - 1], match, mismatch
                ).astype(np.int64)
                seed = i * gap if lo == 1 else neg
                row, mv = _row_ops(
                    pspan[:-1], pspan[1:], seed, sub, lo, hi
                )
                cur_ivs.append((lo, hi, row))
                moves[i].append((lo, mv))
                ext = row + gap * (m - i)
                jl = int(np.argmax(ext))
                if int(ext[jl]) > best_ext:
                    best_ext, i_end, j_end = int(ext[jl]), i, lo + jl
            prev_ivs = cur_ivs
        score, tail = best_ext, m - i_end

        def get_move(i, j):
            if j == 0:
                return 2
            for lo, mv in moves[i]:
                if lo <= j < lo + mv.size:
                    return int(mv[j - lo])
            return 0  # out-of-band (never on a winning path)

    # backtrace
    ops: list[str] = ["I"] * tail
    i, j = i_end, j_end
    while i > 0:
        mv = get_move(i, j)
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


def align_top_candidates(
    cands: DataFrame,
    queries: DataFrame,
    target_seqs: DataFrame,
    cfg,
    match: int = DEFAULT_MATCH,
    mismatch: int = DEFAULT_MISMATCH,
    gap: int = DEFAULT_GAP,
    band: int | None = None,
) -> DataFrame:
    """The ``-align`` query mode end-to-end: per query, align against
    the TOP candidate's window range on BOTH strands and keep the
    better one — transcribing
    /root/reference/src/classification.cpp:437-477 (``show_alignment``:
    subject = target view [stride·beg, stride·end + winlen) clamped to
    the target end) and :79-104 (``make_semi_global_alignment``: seq1
    aligned forward and reverse-complemented; a paired mate's scores
    are ADDED to each strand's total — seq2 forward to the forward
    total, seq2 revcomp to the reverse total; the reverse strand wins
    ties, matching the reference's strict ``score > scorer`` test).

    Inputs: ``cands`` (qid, tgt, hits, win_beg, rank — query_index
    output), ``queries`` (qid, seq1[, seq2]), ``target_seqs``
    (tgt, seq).  Output: (qid, tgt, strand, align_score [seq1's
    alignment on the winning strand], total_score [plus the mate],
    target_begin [GLOBAL char offset], cigar, win_char_beg,
    win_char_end).

    Scale shape: only rank-1 candidates join back to the target dim
    (J9 point lookup — one row per query), the window is sliced
    JVM-side BEFORE the Arrow stage so Python never sees whole
    genomes, and the revcomp is a JVM translate(reverse()) projection.
    The DP itself is per-pair work pinned to full parallelism like the
    Jaccard verify.
    """
    from pyspark.sql import functions as F, types as T

    from .verify import _pin_udf_parallelism

    paired = "seq2" in queries.columns
    length = (cfg.num_windows - 1) * cfg.winstride + cfg.winlen
    # case-preserving complement: sources/bio.py uppercases everything
    # today, but a direct caller with soft-masked (lowercase) bases must
    # not score ~0 on the reverse strand because the complement silently
    # uppercased while the window kept its case (ADVICE r6)
    rc = lambda c: F.translate(  # noqa: E731
        F.reverse(F.col(c)), "ACGTacgt", "TGCAtgca"
    )
    j = (
        cands.where(F.col("rank") == 1)
        .select("qid", "tgt", "win_beg")
        .join(queries, "qid")
        .join(target_seqs.select("tgt", F.col("seq").alias("__tseq")), "tgt")
        .withColumn(
            "win_char_beg", (F.col("win_beg") * cfg.winstride).cast("long")
        )
        .withColumn(
            "win_char_end",
            F.least(
                F.col("win_beg") * cfg.winstride + F.lit(length),
                F.length("__tseq").cast("long"),
            ).cast("long"),
        )
        .withColumn(
            "window",
            F.expr(
                f"substring(__tseq, CAST(win_char_beg + 1 AS INT), {length})"
            ),
        )
        .withColumn("rc1", rc("seq1"))
    )
    if paired:
        j = j.withColumn("rc2", rc("seq2"))
    cols = ["qid", "tgt", "win_char_beg", "win_char_end", "seq1", "rc1",
            "window"] + (["seq2", "rc2"] if paired else [])
    j = _pin_udf_parallelism(j.select(*cols))

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("tgt", T.LongType()),
            T.StructField("strand", T.StringType()),
            T.StructField("align_score", T.LongType()),
            T.StructField("total_score", T.LongType()),
            T.StructField("target_begin", T.LongType()),
            T.StructField("cigar", T.StringType()),
            T.StructField("win_char_beg", T.LongType()),
            T.StructField("win_char_end", T.LongType()),
        ]
    )

    def _compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("strand", "align_score", "total_score",
                    "target_begin", "cigar")}
            for row in pdf.itertuples(index=False):
                win = row.window or ""
                fs, fb, fc = align_semi_global(
                    row.seq1 or "", win, match, mismatch, gap, band
                )
                rs, rb, rcig = align_semi_global(
                    row.rc1 or "", win, match, mismatch, gap, band
                )
                tot_f, tot_r = fs, rs
                if paired:
                    tot_f += align_semi_global(
                        row.seq2 or "", win, match, mismatch, gap, band
                    )[0]
                    tot_r += align_semi_global(
                        row.rc2 or "", win, match, mismatch, gap, band
                    )[0]
                if tot_f > tot_r:  # reference: reverse wins ties
                    out["strand"].append("+")
                    out["align_score"].append(fs)
                    out["target_begin"].append(fb)
                    out["cigar"].append(fc)
                else:
                    out["strand"].append("-")
                    out["align_score"].append(rs)
                    out["target_begin"].append(rb)
                    out["cigar"].append(rcig)
                out["total_score"].append(tot_f if tot_f > tot_r else tot_r)
            res = pd.DataFrame(
                {
                    "qid": pdf["qid"],
                    "tgt": pdf["tgt"],
                    "strand": out["strand"],
                    "align_score": pd.Series(
                        out["align_score"], dtype="int64"
                    ),
                    "total_score": pd.Series(
                        out["total_score"], dtype="int64"
                    ),
                    "target_begin": pd.Series(
                        out["target_begin"], dtype="int64"
                    )
                    + pdf["win_char_beg"].to_numpy(dtype="int64"),
                    "cigar": out["cigar"],
                    "win_char_beg": pdf["win_char_beg"],
                    "win_char_end": pdf["win_char_end"],
                }
            )
            yield res

    return j.mapInPandas(_compute, schema=schema)
