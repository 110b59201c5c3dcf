"""Table maintenance: small-file compaction + snapshot expiry must keep
the manifest contract exact — identical data, unchanged committed row
counts, pre-compaction snapshots readable until vacuumed, loud failure
after."""

import os

import pytest
from pyspark.sql import functions as F

from ocr_gpu_services_spark.sources.table import IcebergLikeTable


def _rows(df):
    return sorted(tuple(r) for r in df.select(
        "doc_id", "v", F.col("warc_day").cast("string")).collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = IcebergLikeTable(str(tmp_path / "tbl"))
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 13).alias("v"),
        F.concat(F.lit("2024-03-0"),
                 (F.col("id") % 3 + 1).cast("string")).alias("warc_day"))
    # many tiny files per partition: repartition high before write
    t.write(df.repartition(16), run_id="run1")
    return t, _rows(df)


def test_compaction_preserves_data_and_snapshots(spark, table):
    t, want = table
    man0 = {m["partition"]: m for m in t.manifests()}
    n_files_before = sum(len(m["files"]) for m in man0.values())
    assert n_files_before > 6                       # genuinely fragmented

    stats = t.compact_partition(spark, "2024-03-01", run_id="compact1")
    assert stats and stats["files_after"] < stats["files_before"]

    # current read: identical data, row counts unchanged
    assert _rows(t.read(spark)) == want
    assert t.total_committed_rows() == 300

    # the compacted partition's current manifest lists ONLY compact files
    cur = {m["partition"]: m for m in t.manifests()}
    names = [f["name"] for f in cur["warc_day=2024-03-01"]["files"]]
    assert names and all(n.startswith("compact-compact1-") for n in names)

    # pre-compaction snapshot still byte-exactly readable (old files kept)
    old = t.read_as_of(spark, run_id="run1")
    assert _rows(old) == want
    # post-compaction snapshot too
    assert _rows(t.read_as_of(spark)) == want


def test_expire_vacuums_and_old_snapshot_fails_loudly(spark, table):
    t, want = table
    t.compact_partition(spark, "2024-03-01", run_id="compact1")
    t.compact_partition(spark, "2024-03-02", run_id="compact1")
    res = t.expire_snapshots(before_unix=float("inf"))
    assert res["dropped_manifests"] == 2
    assert res["removed_files"] > 0

    # current table intact
    assert _rows(t.read(spark)) == want
    assert t.total_committed_rows() == 300

    # the expired snapshot now fails loudly, never silently re-resolves
    with pytest.raises((FileNotFoundError, ValueError)):
        t.read_as_of(spark, run_id="run1").collect()


def test_vacuum_without_compaction_is_a_noop_on_data(spark, table):
    t, want = table
    res = t.expire_snapshots(before_unix=float("inf"))
    assert res["dropped_manifests"] == 0 and res["removed_files"] == 0
    assert _rows(t.read(spark)) == want
