"""Snapshot checkpointing with a manifest — the resumability contract.

The reference persists one DB shard per MPI rank (``dbfile_<rank>``,
/root/reference/src/mode_build.cpp:1079-1096) and re-opens shard-locally
on query start (/root/reference/src/mode_query.cpp:421-426).  Here each
pipeline stage's output is a **snapshot**: a partitioned Parquet dataset
plus an entry in a JSON manifest recording name, path, row count, schema
and creation order — the same snapshot/lineage contract an Iceberg
catalog provides.  When an Iceberg runtime jar is on the classpath the
``format`` knob switches the writes to ``writeTo`` on a catalog table;
the sandbox has no Iceberg jar, so the Parquet+manifest fallback is the
tested path (SURVEY.md §7.3).

Resume semantics: a stage whose snapshot is COMMITTED in the manifest is
loaded instead of recomputed; a crash mid-write leaves no manifest entry
(manifest writes are atomic via rename), so a restarted job recomputes
exactly the unfinished stages — kill-and-resume equals single-run
(pytest ``test_resume``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    name: str
    path: str
    rows: int
    schema: str
    seq: int
    created_unix: float
    # per-partition lineage + metrics (north rule): row count per output
    # partition of the snapshot — skew is visible per stage per snapshot
    partition_rows: list[int] | None = None


class CheckpointManager:
    """Parquet + atomic-manifest snapshot store."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")
        # staged-but-uncommitted snapshots: name -> (path, schema, rows/part)
        self._staged: dict[str, tuple[str, str, list[int]]] = {}

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot(**s) for s in self._read_manifest()["snapshots"]]

    def has(self, name: str) -> bool:
        return any(s.name == name for s in self.snapshots())

    # -- save / load -------------------------------------------------------
    def stage_write(self, df: DataFrame, name: str) -> DataFrame:
        """Phase 1 of a (possibly multi-snapshot) commit: write the
        Parquet data and return the re-read DataFrame, WITHOUT touching
        the manifest.  Until :meth:`commit` runs, the snapshot does not
        exist as far as resume is concerned — a crash between writes of
        a multi-snapshot batch leaves no partial batch behind (the
        Iceberg multi-table-transaction analog)."""
        from pyspark.sql import functions as F

        path = os.path.join(self.root, name)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # one pass collects total + per-partition rows (skew telemetry)
        per_part = {
            r["p"]: r["n"]
            for r in out.groupBy(
                F.spark_partition_id().alias("p")
            ).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        n_parts = out.rdd.getNumPartitions()
        partition_rows = [per_part.get(i, 0) for i in range(n_parts)]
        self._staged[name] = (path, out.schema.simpleString(), partition_rows)
        return out

    def commit(self, names: list[str]) -> None:
        """Phase 2: commit previously staged snapshots in ONE atomic
        manifest update (all-or-nothing across ``names``)."""
        missing = [n for n in names if n not in self._staged]
        if missing:
            # validate BEFORE popping anything — a partial pop would
            # discard staged metadata while committing nothing
            raise KeyError(f"snapshots never staged: {missing}")
        manifest = self._read_manifest()
        manifest["snapshots"] = [
            s for s in manifest["snapshots"] if s["name"] not in names
        ]
        # seq is a unique monotonic id (creation order), NOT a list
        # index: after remove() reclaims old snapshots, len() would
        # re-issue seqs that surviving entries still hold
        next_seq = 1 + max(
            (s["seq"] for s in manifest["snapshots"]), default=-1
        )
        for name in names:
            path, schema, partition_rows = self._staged.pop(name)
            manifest["snapshots"].append(
                Snapshot(
                    name=name,
                    path=path,
                    rows=sum(partition_rows),
                    schema=schema,
                    seq=next_seq,
                    created_unix=time.time(),
                    partition_rows=partition_rows,
                ).__dict__
            )
            next_seq += 1
        self._write_manifest(manifest)

    def save(self, df: DataFrame, name: str) -> DataFrame:
        """Materialize ``df`` as snapshot ``name`` (overwrites any
        uncommitted leftovers) and return the re-read DataFrame —
        callers continue from the materialized data, cutting lineage."""
        out = self.stage_write(df, name)
        self.commit([name])
        return out

    def lineage_report(self) -> list[dict]:
        """Per-snapshot lineage + skew metrics from the manifest (the
        north rule's per-partition metrics surface, made consumable):
        one dict per committed snapshot in creation order, with
        ``skew_milli`` = max/mean partition rows in milli (1000 =
        perfectly balanced; 8000 = the hottest partition carries 8× its
        fair share — the signal that a key needs salting).  Pure
        manifest read — no Spark jobs, safe to call from any driver.
        """
        out = []
        for s in sorted(self.snapshots(), key=lambda s: s.seq):
            pr = s.partition_rows or []
            tot = sum(pr)
            out.append(
                {
                    "name": s.name,
                    "seq": s.seq,
                    "rows": s.rows,
                    "n_partitions": len(pr),
                    "max_partition_rows": max(pr) if pr else 0,
                    "empty_partitions": sum(1 for x in pr if x == 0),
                    "skew_milli": (
                        (max(pr) * 1000 * len(pr)) // tot if tot else 0
                    ),
                }
            )
        return out

    def remove(self, names: list[str]) -> None:
        """Drop snapshots from the manifest and reclaim their storage.

        Order matters for crash safety: the manifest forgets the
        snapshots FIRST (one atomic update), then the data dirs go — a
        crash in between leaves orphan dirs (invisible to the manifest
        but reclaimed by the next :meth:`sweep_orphans`), never a
        manifest entry pointing at deleted data.  Unknown names raise
        before anything is touched."""
        import shutil

        manifest = self._read_manifest()
        known = {s["name"]: s["path"] for s in manifest["snapshots"]}
        missing = [n for n in names if n not in known]
        if missing:
            raise KeyError(f"snapshots not in manifest: {missing}")
        manifest["snapshots"] = [
            s for s in manifest["snapshots"] if s["name"] not in names
        ]
        self._write_manifest(manifest)
        for n in names:
            shutil.rmtree(known[n], ignore_errors=True)

    def sweep_orphans(self) -> list[str]:
        """Reclaim data dirs under the root that no manifest entry and
        no staged write references — the leftovers of a crash between
        :meth:`remove`'s manifest update and its dir deletion (or of a
        crash mid-:meth:`stage_write`).  Returns the removed dir names.
        Do not call concurrently with in-flight writes to this root."""
        import shutil

        live = {s.name for s in self.snapshots()} | set(self._staged)
        removed = []
        for entry in sorted(os.listdir(self.root)):
            full = os.path.join(self.root, entry)
            if os.path.isdir(full) and entry not in live:
                shutil.rmtree(full, ignore_errors=True)
                removed.append(entry)
        return removed

    def load(self, name: str) -> DataFrame:
        snap = next(s for s in self.snapshots() if s.name == name)
        return self.spark.read.parquet(snap.path)

    def get_or_compute(self, name: str, compute) -> DataFrame:
        """Resume point: load the committed snapshot or compute+commit."""
        if self.has(name):
            return self.load(name)
        return self.save(compute(), name)
