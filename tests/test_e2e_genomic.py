"""End-to-end reference lifecycle: FASTA targets → build index; FASTQ
reads → query → LCA classification → abundance.  This is the
reference's own build+query workflow (SURVEY.md §3.2-3.3) run entirely
through this engine's public API."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metacache_mpi_spark.operators.genomic import (
    GenomicConfig,
    build_index,
    query_index,
)
from metacache_mpi_spark.operators.taxonomy import (
    Taxonomy,
    classify_lca,
    taxon_counts,
)
from metacache_mpi_spark.sources.bio import read_fasta, read_fastq

CFG = GenomicConfig(k=8, sketch_size=8, winlen=64, winstride=57)

# two genera, two species each
TAX = Taxonomy(
    parent={1: 1, 2: 1, 3: 2, 4: 3, 8: 3, 5: 4, 6: 4, 9: 8, 10: 8},
    rank={1: "root", 2: "domain", 3: "phylum", 4: "genus", 8: "genus",
          5: "species", 6: "species", 9: "species", 10: "species"},
)


@pytest.fixture(scope="module")
def genome_files(tmp_path_factory):
    rng = np.random.RandomState(99)
    d = tmp_path_factory.mktemp("genomes")

    def dna(n):
        return "".join("ACGT"[i] for i in rng.randint(0, 4, size=n))

    genomes = {t: dna(800) for t in (5, 6, 9, 10)}  # taxid -> genome
    fa = d / "targets.fasta"
    fa.write_text(
        "".join(f">tgt{t}\n{g}\n" for t, g in sorted(genomes.items()))
    )
    # reads: fragments from each genome
    reads = []
    truth = {}
    qid = 0
    for t, g in sorted(genomes.items()):
        for _ in range(5):
            start = int(rng.randint(0, 600))
            reads.append((f"q{qid}", g[start : start + 120]))
            truth[qid] = t
            qid += 1
    fq = d / "reads.fastq"
    fq.write_text(
        "".join(f"@{h}\n{s}\n+\n{'!' * len(s)}\n" for h, s in reads)
    )
    return str(fa), str(fq), truth


def test_full_lifecycle(spark, genome_files):
    fa, fq, truth = genome_files
    targets = read_fasta(spark, fa).select(
        F.col("record_idx").alias("tgt"), "seq", "header"
    )
    # target id -> taxid from the header (P9-style extraction)
    tmap = {
        r["tgt"]: int(r["header"].removeprefix("tgt"))
        for r in targets.select("tgt", "header").collect()
    }
    index = build_index(targets, CFG)
    queries = read_fastq(spark, fq).select(
        F.col("record_idx").alias("qid"), "seq"
    )
    cands = query_index(queries, index, CFG)
    assigned = classify_lca(cands, TAX, tmap, hits_min=CFG.hits_min_effective)
    got = {r["qid"]: r["taxid"] for r in assigned.collect()}

    exact = sum(1 for q, t in got.items() if truth.get(q) == t)
    # reads from one species may also hit the sibling species -> genus LCA;
    # everything must at least land inside the right genus
    genus_ok = sum(
        1
        for q, t in got.items()
        if t is not None
        and TAX.ancestor_at_rank(t, "genus") == TAX.ancestor_at_rank(truth[q], "genus")
    )
    assert len(got) >= 18           # ≥90% of 20 reads classified
    assert genus_ok == len(got)     # no cross-genus misassignment
    assert exact >= len(got) * 0.6  # most resolve to the exact species

    counts = taxon_counts(assigned)
    assert counts.agg(F.sum("n_queries")).collect()[0][0] == len(
        [t for t in got.values() if t is not None]
    )
