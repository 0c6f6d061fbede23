"""Capture .explain("formatted") for the bench-timed queries.

Usage: python tools/capture_plans.py <suffix> [query ...]

Writes plans/r07/<query>_<suffix>.txt for each query (default: every
headline + extra bench query).  Explain only — no jobs run, so this is
safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry_mod
from metacache_mpi_spark.session import get_spark

QUERIES = [
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "simhash_fingerprints",
    "winnow_fingerprint_stats",
    "tpch_q1",
    "top_users_per_event_type",
    "contiguous_range_hits",
    "ann_cosine_topk",
    "pipeline_lsh_pairs",
    "exact_substring_dedup",
    "semantic_dedup",
    "contamination_pairs",
    "contamination_pairs_bloom",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(8, app_name="capture-plans")
    qs = entry_mod.queries()
    qs["pipeline_lsh_pairs"] = entry_mod._q_pipeline_lsh_pairs_kperm
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
