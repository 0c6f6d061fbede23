"""metacache_mpi_spark — a from-scratch PySpark-native near-duplicate
detection and clustering engine with the query / data-processing
capabilities of jmabuin/metacache-mpi (reference at /root/reference,
studied for SEMANTICS only — no code is ported).

The reference is a distributed bottom-s MinHash similarity search engine
(build an inverted ``feature -> (target, window)`` index, probe it with
query sketches, aggregate contiguous-window hit counts, pick top-k
candidates, resolve by LCA voting).  This package re-expresses that
pipeline Spark-first for Common-Crawl-style webtext:

- shingle + MinHash / SimHash sketching in Arrow-vectorized pandas UDFs
  (``functions/sketch.py``; semantics of /root/reference/src/hash_dna.h),
- the inverted index / MPI hash-table exchange becomes an LSH band-bucket
  DataFrame self-join with salted keys and bucket caps; over-cap buckets
  can drop (reference rule), sample, or emit linear star hub edges so
  mirror/spam mega-clusters stay clusterable
  (``operators/lsh.py``; /root/reference/src/sketch_database.h semantics),
- candidate verification by exact Jaccard (``operators/verify.py``;
  /root/reference/src/dna_encoding.h:574-600 analog),
- LCA-style assignment becomes connected components over verified pair
  edges (``operators/cc.py``),
- per-rank DB shard files become checkpointed Parquet snapshots with a
  manifest (``plans/checkpoint.py``; Iceberg-shaped, Parquet fallback).
"""

__version__ = "0.1.0"
