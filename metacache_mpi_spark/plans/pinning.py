"""Pinning a multiply-consumed DataFrame subtree: the persist-vs-
localCheckpoint decision rule, measured once, applied everywhere.

The engine pins subtrees that several downstream consumers share (band
tables, sketch+text corpus state, verified-pair edges) so the scheduler
never re-runs an expensive lineage per consumer.  Two mechanisms exist
and they fail in OPPOSITE ways:

- ``persist()`` — lazy, populated at the first materialization,
  recomputable after executor loss, and schedules no extra driver work.
  This is the default.
- ``localCheckpoint(eager=False)`` — truncates lineage by converting to
  RDD.  Under AQE the ``.rdd`` conversion eagerly executes every
  upstream shuffle stage on the driver's calling thread (measured 17 s
  of SERIALIZED stage execution at 50k docs — round 1 paid this per
  pipeline stage and capped full-job scaling at ~0.4,
  plans/pipeline.py), and its data is LOST on executor failure.  But
  for a WIDE, cheap-to-recompute, pure-JVM subtree the persist cache
  write itself can dominate: caching the corpus×shingles explode of
  ``textops.discriminative_shingles`` cost 2× the whole query it serves
  (6.6 s vs 3.6 s at sf0.1, steady-state A/B, commit ``3b33b2e``).

Rule of thumb encoded in :func:`pin`:

- default → ``persist()``;
- ``storage_dominated=True`` → ``localCheckpoint(eager=False)``, legal
  ONLY when all three hold: (1) the subtree is storage-bound (cache
  write ≥ recompute — measure it, don't guess), (2) its lineage is
  pure JVM with no UDF stage (the AQE eager-shuffle trap), and (3) no
  durability contract covers it (resumable state goes through
  ``plans/checkpoint.CheckpointManager`` snapshots instead — e.g. the
  CC loop's ``snapshots=`` mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame, storage_dominated: bool = False) -> DataFrame:
    """Pin a multiply-consumed subtree (see module docstring for the
    decision rule and the measurements behind it)."""
    if storage_dominated:
        return df.localCheckpoint(eager=False)
    return df.persist()
