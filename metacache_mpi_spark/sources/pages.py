"""Deterministic synthetic webtext corpus + pinned extractor.

Implements FIXTURES.md §1: a seeded ``pages(url, warc_ts, html, text,
lang)`` table with planted duplicate structure, plus the ground-truth
table ``pages_truth(url, cluster_id, kind)``.

The **pinned extractor** is the byte-identical ``html → text`` function
required by BASELINE.json's per-row invariant: ``extract_text(render_html
(site, text)) == text`` exactly, asserted in pytest.  It is a fixed pure
function (marker-delimited article body + bijective entity escaping) —
no external HTML library, so no library-version drift can break the
invariant.

Planted structure (cluster truth known at generation time):
- ``exact``   (~5%)  — verbatim copies under a new url;
- ``near``    (~10%) — seeded char-level substitutions at rates
  {0.2%, 0.5%, 0.8%}, chosen so exact shingle Jaccard at k=16 stays
  above the 0.6 verify threshold;
- ``substring`` (~2%) — pairs sharing a ≥2000-char verbatim block but
  differing elsewhere (exercises the winnowing + LCS lane);
- per-site boilerplate lines at the top/bottom of every page's text —
  shared shingles that must NOT cluster (precision guard; the
  overpopulated-bucket analog, /root/reference/src/sketch_database.h:381-395);
- ``unique``  — the rest (singletons).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Pinned extractor (the per-row byte-identical invariant)
# ---------------------------------------------------------------------------

_ARTICLE_OPEN = "<article>"
_ARTICLE_CLOSE = "</article>"


def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(text: str) -> str:
    return text.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def render_html(site: str, title: str, text: str) -> bytes:
    """Deterministic page template wrapping ``text``."""
    return (
        f"<html><head><title>{_escape(title)}</title></head><body>"
        f'<header class="site">{_escape(site)}</header>'
        f"{_ARTICLE_OPEN}{_escape(text)}{_ARTICLE_CLOSE}"
        f'<footer class="site">{_escape(site)}</footer></body></html>'
    ).encode("utf-8")


def extract_text(html: bytes) -> str:
    """Pinned pure extractor: html bytes → article text (byte-identical
    to what was rendered; round-trip golden-tested)."""
    s = html.decode("utf-8")
    i = s.index(_ARTICLE_OPEN) + len(_ARTICLE_OPEN)
    j = s.index(_ARTICLE_CLOSE, i)
    return _unescape(s[i:j])


# ---------------------------------------------------------------------------
# Corpus generation
# ---------------------------------------------------------------------------

_NEAR_RATES = (0.002, 0.005, 0.008)
_LETTERS = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)


def _vocab(rng: np.random.RandomState, n: int = 2000) -> list[str]:
    lens = rng.randint(3, 10, size=n)
    return [
        "".join(chr(c) for c in rng.choice(_LETTERS, size=ln)) for ln in lens
    ]


def _mutate(rng: np.random.RandomState, text: str, rate: float) -> str:
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).copy()
    n_mut = max(1, int(len(data) * rate))
    pos = rng.choice(len(data), size=n_mut, replace=False)
    data[pos] = rng.choice(_LETTERS, size=n_mut)
    return data.tobytes().decode("utf-8", errors="replace")


def generate_pages(
    n_pages: int = 500, seed: int = 42, hot_frac: float = 0.0
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build the corpus. Returns (pages, pages_truth) pandas frames.

    Scales: tiny=500 (unit/golden), small=5000 (recall gate),
    bench=50000+ (throughput) — FIXTURES.md §1.

    ``hot_frac`` > 0 carves that fraction of the corpus into ONE
    mega-cluster of near-identical pages (kind ``"hot"``): lightly
    mutated copies of a single template — the mirrored-page/spam skew
    case.  Its LSH band buckets hold ~all hot docs, far past
    ``max_docs_per_bucket``, so it exercises the oversize policy:
    "drop" loses the cluster entirely, "star" keeps it at linear cost.
    """
    rng = np.random.RandomState(seed)
    vocab = _vocab(rng)
    n_sites = max(2, n_pages // 50)
    site_boiler = [
        (
            " ".join(rng.choice(vocab, size=24)),
            " ".join(rng.choice(vocab, size=24)),
        )
        for _ in range(n_sites)
    ]

    n_hot = int(n_pages * hot_frac)
    n_pages = n_pages - n_hot
    n_exact = max(1, n_pages * 5 // 100)
    n_near = max(1, n_pages * 10 // 100)
    n_substr = max(1, n_pages * 2 // 100) // 2 * 2  # pairs
    n_base = n_pages - n_exact - n_near - n_substr

    texts: list[str] = []
    kinds: list[str] = []
    clusters: list[int] = []
    sites: list[int] = []

    def body(n_words: int) -> str:
        return " ".join(rng.choice(vocab, size=n_words))

    def page_text(site: int, body_text: str) -> str:
        head, foot = site_boiler[site]
        return f"{head}\n{body_text}\n{foot}"

    # base/unique pages
    for i in range(n_base):
        site = int(rng.randint(n_sites))
        texts.append(page_text(site, body(int(rng.randint(200, 600)))))
        kinds.append("unique")
        clusters.append(i)
        sites.append(site)

    # exact duplicates of random base pages
    for _ in range(n_exact):
        src = int(rng.randint(n_base))
        texts.append(texts[src])
        kinds.append("exact")
        clusters.append(clusters[src])
        sites.append(sites[src])

    # near duplicates (seeded char substitutions)
    for j in range(n_near):
        src = int(rng.randint(n_base))
        rate = _NEAR_RATES[j % len(_NEAR_RATES)]
        texts.append(_mutate(rng, texts[src], rate))
        kinds.append("near")
        clusters.append(clusters[src])
        sites.append(sites[src])

    # substring-overlap pairs: share a >=2000-char verbatim block,
    # differ elsewhere (low Jaccard — only the winnowing lane finds them)
    next_cluster = n_base
    for _ in range(n_substr // 2):
        block = body(420)  # ~2500+ chars
        for _ in range(2):
            site = int(rng.randint(n_sites))
            t = f"{body(int(rng.randint(300, 500)))} {block} {body(int(rng.randint(300, 500)))}"
            texts.append(page_text(site, t))
            kinds.append("substring")
            clusters.append(next_cluster)
            sites.append(site)
        next_cluster += 1

    # one mega-cluster of near-identical mirrors: mutation rate 0.003
    # keeps pairwise shingle Jaccard ≈ 0.7-0.8 (well above the 0.6
    # verify threshold) while making every copy byte-distinct, so the
    # exact lane can't catch them — only LSH can
    if n_hot:
        hot_site = int(rng.randint(n_sites))
        hot_template = page_text(hot_site, body(400))
        for _ in range(n_hot):
            texts.append(_mutate(rng, hot_template, 0.003))
            kinds.append("hot")
            clusters.append(next_cluster)
            sites.append(hot_site)
        next_cluster += 1

    n = len(texts)
    order = rng.permutation(n)
    ts0 = pd.Timestamp("2024-01-01")
    rows = []
    truth = []
    lang_pool = np.array(["en"] * 18 + ["de"] + ["es"])
    for new_id, old in enumerate(order):
        site = sites[old]
        path = "-".join(rng.choice(vocab, size=3)) + f"-{new_id}"
        url = f"https://site{site}.example/{path}"
        text = texts[old]
        rows.append(
            {
                "url": url,
                "warc_ts": ts0 + pd.Timedelta(seconds=new_id),
                "html": render_html(f"site{site}.example", path, text),
                "text": text,
                "lang": str(rng.choice(lang_pool)),
            }
        )
        truth.append(
            {"url": url, "cluster_id": int(clusters[old]), "kind": kinds[old]}
        )
    return pd.DataFrame(rows), pd.DataFrame(truth)


def write_corpus(
    out_dir: str, n_pages: int = 500, seed: int = 42, hot_frac: float = 0.0
) -> None:
    """Write pages.parquet + pages_truth.parquet under ``out_dir``."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pathlib import Path

    pages, truth = generate_pages(n_pages, seed, hot_frac=hot_frac)
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    # Write SPLITTABLE parquet: bounded row groups (~16-20 MB), the
    # shape a real crawl store has (Common Crawl ships thousands of
    # files).  pyarrow's default is one giant row group — a 926 MB
    # single-row-group file gives Spark exactly ONE scan task at any
    # core count, which shows up as a fake Amdahl term in the scaling
    # measurement (measured: full-job efficiency capped ≈ 0.5 because
    # ~30 s of single-threaded scan+decompress sat in every run).
    pq.write_table(
        pa.Table.from_pandas(pages, schema=schema, preserve_index=False),
        f"{out_dir}/pages.parquet",
        row_group_size=4096,
    )
    pq.write_table(
        pa.Table.from_pandas(truth, preserve_index=False),
        f"{out_dir}/pages_truth.parquet",
    )


def load_pages_iceberg(spark, table: str):
    """Read the pages corpus from an Iceberg TABLE (the deployment
    source named in BASELINE.json: ``spark.read.format("iceberg")``);
    adds the same content-stable ``doc_id``.  Snapshot isolation,
    partition pruning and metadata-only planning come from the Iceberg
    runtime — the DataFrame downstream is identical to the Parquet
    lane, so the whole pipeline is source-agnostic.

    The sandbox image ships no Iceberg runtime jar, so this raises a
    clear RuntimeError there (the Parquet lane :func:`load_pages` is
    the tested fallback); on a real cluster with
    ``iceberg-spark-runtime`` on the classpath it is one catalog read.
    """
    from pyspark.sql import functions as F

    try:
        df = spark.read.format("iceberg").load(table)
    except Exception as e:  # noqa: BLE001 — no runtime jar / no catalog
        raise RuntimeError(
            "Iceberg runtime not available in this Spark session; use "
            "load_pages(spark, dir) for the Parquet lane or add "
            "iceberg-spark-runtime to the cluster classpath"
        ) from e
    return df.withColumn("doc_id", F.xxhash64("url"))


def load_pages(spark, path: str):
    """Read a pages corpus written by :func:`write_corpus`, adding a
    stable numeric ``doc_id`` derived from the url (xxhash64) — at
    10^12-doc scale a 64-bit content-independent id beats monotonically
    increasing ids (no global ordering pass needed)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{path}/pages.parquet")
    # Fan out ONLY when the scan itself can't: a corpus with enough
    # byte-range splits (every real crawl store) reads wide already,
    # and an unconditional round-robin repartition is a full
    # corpus-sized exchange for nothing (measured: ~1 GB shuffled
    # before the first useful stage).  Tiny/legacy single-row-group
    # fixtures still get the fan-out so the sketch UDF uses every
    # core.  Split count is estimated from input bytes (no RDD probe):
    # Spark assigns one scan task per maxPartitionBytes byte range.
    import os
    import re

    par = spark.sparkContext.defaultParallelism
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    mm = re.fullmatch(r"(\d+)([kmg]?)b?", raw.strip().lower())
    mpb = int(mm.group(1)) * {"": 1, "k": 2**10, "m": 2**20, "g": 2**30}[
        mm.group(2)
    ] if mm else 134217728
    files = df.inputFiles()
    local = [
        f.removeprefix("file://") for f in files if f.startswith("file:")
    ]
    if len(local) < len(files):
        # remote store (s3a/hdfs/...): a real crawl store is pre-split
        # into many objects — NEVER pay a corpus-sized exchange here
        est_splits = par
    else:
        est_splits = sum(-(-os.path.getsize(f) // mpb) for f in local)
    if est_splits < par:
        df = df.repartition(par)
    return df.withColumn("doc_id", F.xxhash64("url"))
