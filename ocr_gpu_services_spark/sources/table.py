"""IcebergLikeTable: partitioned Parquet + per-partition JSON manifests +
exact resume (SURVEY.md §7.0, §7.5 — explicit substitution for the Iceberg
runtime jar, which this container lacks; the layout is Hive-partitioned so
Spark partition discovery gives real partition pruning).

Commit protocol per partition value (e.g. ``warc_day=2024-03-04``):
1. Spark writes the partition directory (dynamic partition overwrite)
2. the driver fsyncs a manifest ``_manifests/<part>.json`` with the file
   list, byte sizes, and row count, via tmp-file + atomic ``os.replace``

The manifest is the commit point: a killed run leaves either no manifest
(partition will be rewritten on resume — idempotent overwrite) or a complete
one (partition is skipped).  This is the batch analogue of the reference's
stateless retry-per-request model (supervisord autorestart / startretries=3)
and satisfies the north rule's "killed run resumes exactly".
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IcebergLikeTable:
    def __init__(self, path: str, partition_col: str = "warc_day"):
        self.path = path
        self.partition_col = partition_col
        self.manifest_dir = os.path.join(path, "_manifests")

    # -- manifest bookkeeping ------------------------------------------------
    def committed_partitions(self) -> set[str]:
        if not os.path.isdir(self.manifest_dir):
            return set()
        return {f[:-5] for f in os.listdir(self.manifest_dir)
                if f.endswith(".json")}

    def _write_manifest(self, part_value: str, rows: int, run_id: str):
        part_dir = os.path.join(self.path, f"{self.partition_col}={part_value}")
        files = sorted(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        manifest = {
            "partition": f"{self.partition_col}={part_value}",
            "files": [{"name": f,
                       "bytes": os.path.getsize(os.path.join(part_dir, f))}
                      for f in files],
            "row_count": rows,
            "run_id": run_id,
            "committed_at_unix": time.time(),
        }
        os.makedirs(self.manifest_dir, exist_ok=True)
        tmp = os.path.join(self.manifest_dir, f".{part_value}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.manifest_dir, f"{part_value}.json"))

    # -- write with resume -----------------------------------------------------
    def write(self, df: DataFrame, run_id: str) -> dict:
        """Write df partitioned by ``partition_col`` and commit manifests for
        every partition directory that lacks one.  The caller prunes
        already-committed partitions from ``df``'s SOURCE (below the kernel)
        so resume skips the expensive work, not just the write.

        The single .write is the only materialization of the lineage; row
        counts for the manifests come from a read-back count over the
        freshly written parquet (column-pruned scan: row-group counts only
        — far cheaper than running the extraction lineage twice).
        Returns {partition_value: row_count} committed now."""
        pc = self.partition_col
        spark = df.sparkSession
        done = self.committed_partitions()
        (df.write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy(pc).parquet(self.path))
        on_disk = {d.split("=", 1)[1] for d in os.listdir(self.path)
                   if d.startswith(pc + "=")}
        new_parts = sorted(on_disk - done)
        if not new_parts:
            return {}
        counts = {str(r[pc]): r["cnt"]
                  for r in (spark.read.parquet(self.path)
                            .filter(F.col(pc).cast("string").isin(new_parts))
                            .groupBy(pc).agg(F.count("*").alias("cnt"))
                            .collect())}
        for part_value in new_parts:
            self._write_manifest(part_value, counts.get(part_value, 0), run_id)
        return counts

    # -- read ---------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def manifests(self) -> list[dict]:
        """All committed partition manifests, sorted by commit time."""
        out = []
        for part in self.committed_partitions():
            with open(os.path.join(self.manifest_dir, part + ".json")) as f:
                out.append(json.load(f))
        return sorted(out, key=lambda m: m["committed_at_unix"])

    def read_as_of(self, spark: SparkSession, as_of_unix: float = None,
                   run_id: str = None) -> DataFrame:
        """Snapshot read (the Iceberg time-travel analogue over the
        manifest layer): only partitions committed at-or-before
        ``as_of_unix`` — or by the given ``run_id`` — are scanned, and
        ONLY through the exact file lists their manifests recorded.

        Scope matches the manifest design honestly: partitions this
        table model has since REWRITTEN (dynamic overwrite replaces the
        directory) no longer hold their old files, and the read fails
        loudly on the missing file instead of silently returning the
        newer data — time travel is exact for the append-mostly crawl
        pattern the engine targets, never approximate."""
        sel = [m for m in self.manifests()
               if (as_of_unix is None or m["committed_at_unix"] <= as_of_unix)
               and (run_id is None or m["run_id"] == run_id)]
        if not sel:
            raise ValueError("no committed partitions match the snapshot")
        paths, missing = [], []
        for m in sel:
            for f in m["files"]:
                p = os.path.join(self.path, m["partition"], f["name"])
                (paths if os.path.exists(p) else missing).append(p)
        if missing:
            raise FileNotFoundError(
                f"snapshot files rewritten since commit: {missing[:3]}"
                f"{' ...' if len(missing) > 3 else ''}")
        # basePath keeps the Hive partition column in the projected schema
        return spark.read.option("basePath", self.path).parquet(*paths)

    def total_committed_rows(self) -> int:
        return sum(m["row_count"] for m in self.manifests())
