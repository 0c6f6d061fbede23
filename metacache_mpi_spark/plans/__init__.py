"""Logical plans: the end-to-end dedup pipeline and snapshot
checkpointing (Iceberg-shaped, Parquet+manifest fallback)."""
