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


def test_read_never_double_counts_mid_compaction(spark, table):
    """Crash between 'new files in' and 'manifest swap' (the old
    ordering's double-count window): read() plans from the current
    manifest, so stray uncommitted compact-* files in the live dir are
    invisible — row counts stay exact."""
    t, want = table
    pdir = os.path.join(t.path, "warc_day=2024-03-01")
    # simulate the crashed run's orphan: an uncommitted compact file
    # that duplicates the whole partition
    src = [os.path.join(pdir, f["name"])
           for m in t.manifests() if m["partition"] == "warc_day=2024-03-01"
           for f in m["files"]]
    (spark.read.parquet(*src).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(t.path, "_tmp_orphan")))
    tmpdir = os.path.join(t.path, "_tmp_orphan")
    part_file = next(f for f in os.listdir(tmpdir) if f.endswith(".parquet"))
    os.replace(os.path.join(tmpdir, part_file),
               os.path.join(pdir, "compact-crashed-00000.parquet"))
    assert _rows(t.read(spark)) == want          # no double count
    assert t.read(spark).count() == 300
    # and the vacuum reclaims the orphan from the LIVE dir
    res = t.expire_snapshots(before_unix=float("inf"))
    assert res["removed_files"] == 1
    assert not os.path.exists(
        os.path.join(pdir, "compact-crashed-00000.parquet"))
    assert _rows(t.read(spark)) == want


def test_read_fails_loudly_when_committed_file_missing(spark, table):
    """Crash between 'old files out' and 'new files in': the partition
    is resolvable only through the _archive fallback; the plain read()
    must raise, never silently narrow the table."""
    t, want = table
    man = next(m for m in t.manifests()
               if m["partition"] == "warc_day=2024-03-02")
    pdir = os.path.join(t.path, man["partition"])
    arch = os.path.join(t.path, "_archive", man["partition"])
    os.makedirs(arch, exist_ok=True)
    victim = man["files"][0]["name"]
    os.replace(os.path.join(pdir, victim), os.path.join(arch, victim))
    with pytest.raises(FileNotFoundError):
        t.read(spark)
    # the archived generation is still exactly readable by snapshot
    assert _rows(t.read_as_of(spark, run_id="run1")) == want


def test_expire_sweeps_crashed_compaction_tmp_dir(spark, table):
    """A _tmp_compact_* dir from a compaction that died before its move
    step holds a full duplicate of the partition's data and is
    referenced by no manifest — expire_snapshots must reclaim it."""
    import os
    import time
    t, expected = table
    dead = os.path.join(t.path, "_tmp_compact_d1_runX")
    os.makedirs(dead)
    with open(os.path.join(dead, "part-0.parquet"), "wb") as f:
        f.write(b"dead")
    # a FRESH tmp dir may belong to a compaction in flight in another
    # process — the sweep must leave it alone (age-guarded delete)
    stats = t.expire_snapshots(before_unix=0)
    assert stats["dropped_tmp_dirs"] == 0
    assert os.path.isdir(dead)
    # backdate it past the liveness window: genuinely dead, reclaimed
    old = time.time() - 3600
    os.utime(dead, (old, old))
    stats = t.expire_snapshots(before_unix=0)
    assert stats["dropped_tmp_dirs"] == 1
    assert not os.path.isdir(dead)
    assert _rows(t.read(spark)) == expected      # data untouched
