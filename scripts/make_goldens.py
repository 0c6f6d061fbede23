"""Regenerate the frozen golden outputs for the tiny corpus
(FIXTURES.md §4).  Run ONLY when sketch semantics intentionally change:

    PYTHONPATH=. python scripts/make_goldens.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.session import get_spark
from metacache_mpi_spark.sources.pages import load_pages, write_corpus

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main() -> None:
    spark = get_spark(8, app_name="make-goldens", shuffle_partitions=8)
    corpus = "/tmp/golden_corpus"
    write_corpus(corpus, n_pages=500, seed=42)
    res = dedup_pipeline(load_pages(spark, corpus))
    os.makedirs(OUT, exist_ok=True)
    # sketch columns ONLY: the signature table also carries the text
    # passthrough (round-3 verify fusion), but pinning corpus text in
    # the golden would bloat the fixture 17× with bytes write_corpus
    # already derives — the golden pins hashing/sketching semantics
    res.signatures.select(
        "doc_id", "signature", "simhash", "fps"
    ).orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(
        f"{OUT}/signatures.golden.parquet"
    )
    res.pairs.orderBy("a", "b").coalesce(1).write.mode("overwrite").parquet(
        f"{OUT}/pairs.golden.parquet"
    )
    res.clusters.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(
        f"{OUT}/clusters.golden.parquet"
    )
    print("goldens written to", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
