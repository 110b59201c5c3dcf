"""The end-to-end extraction job (Spark rebuild of the reference's primary
path, SURVEY.md §3.1):

pages scan -> byte-size/salt rebalance -> mapInArrow extraction kernel
-> JVM-side classification exprs (A1) + n_spans (A9) -> partitioned write
with per-partition manifests + resume, metrics via df.observe.

Usage:
  python -m ocr_gpu_services_spark.plans.extract_job \
      [--scale tiny|small|bench | --input <pages parquet>] \
      --out <table dir> [--resume] [--run-id r1] [--cores N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Observation

from ..functions.classify import with_classification
from ..operators.extract_kernel import extract_arrow
from ..operators.rebalance import rebalance_by_size
from ..session import get_spark
from ..sources.pages import read_pages, synthetic_pages
from ..sources.table import IcebergLikeTable


def extract_pipeline(pages: DataFrame, rebalance: bool = True) -> DataFrame:
    """Logical plan: pages -> extracted (FIXTURES.md §3 schema)."""
    df = rebalance_by_size(pages) if rebalance else pages
    df = extract_arrow(df)
    df = with_classification(df)
    df = df.withColumn("n_spans", F.size("spans").cast("int"))
    return df.select("url", "warc_ts", "content_type", "extracted_text",
                     "spans", "doc_type", "doc_type_conf", "n_spans", "error")


def run_job(spark: SparkSession, pages: DataFrame, out: str, run_id: str,
            resume: bool = False, layout_templates: str | None = None) -> dict:
    table = IcebergLikeTable(out, partition_col="warc_day")

    # resume pruning happens on the SOURCE side, below the kernel.  If the
    # input table is hive/Iceberg-style day-partitioned it already carries
    # a warc_day PARTITION column and the isin-filter below becomes real
    # partition pruning at the scan (PartitionFilters — a resumed run
    # never re-reads committed days' bytes; asserted by
    # tests/test_spark_e2e.py::test_resume_uses_partition_pruning).  For a
    # flat table the column is derived and the filter still prevents
    # re-extraction, just not the re-scan.
    if "warc_day" not in pages.columns:
        pages = pages.withColumn(
            "warc_day", F.date_format("warc_ts", "yyyy-MM-dd"))
    if resume:
        done = sorted(table.committed_partitions())
        if done:
            pages = pages.filter(~F.col("warc_day").isin(done))
    elif os.path.isdir(out):
        shutil.rmtree(out)  # fresh run owns the whole table

    obs = Observation("extract_metrics")
    extracted = extract_pipeline(
        pages.select("url", "warc_ts", "html", "text"))
    if layout_templates:
        # optional enrichment (the reference's classification route,
        # SURVEY §3.2): match word spans against the template set and
        # carry (layout_template, layout_cost) columns through the write
        import pandas as pd

        from ..operators.layout_match import classify_extracted
        tpl = pd.read_parquet(layout_templates)
        extracted = classify_extracted(extracted, tpl)
    extracted = (extracted
                 .observe(
                     obs,
                     F.count(F.lit(1)).alias("rows_out"),
                     F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
                         .alias("rows_err"),
                     F.sum(F.length("extracted_text")).alias("chars_out"),
                     F.sum("n_spans").alias("spans_out"))
                 .withColumn("warc_day",
                             F.date_format("warc_ts", "yyyy-MM-dd")))

    t0 = time.time()
    written = table.write(extracted, run_id=run_id)
    wall = time.time() - t0
    metrics = {"run_id": run_id, "wall_s": round(wall, 3),
               "partitions_written": len(written),
               "rows_written": int(sum(written.values())),
               "total_committed_rows": table.total_committed_rows()}
    if written:
        metrics.update({k: (int(v) if v is not None else 0)
                        for k, v in obs.get.items()})
        metrics["docs_per_sec"] = round(metrics["rows_out"] / wall, 2)

    # S6 metrics sink (SURVEY §2.1): one durable row per run under the
    # table's _metrics dir — the batch analogue of the reference's
    # rotating per-request latency log (src/main.py:47-53); manifests
    # carry per-partition lineage, this carries per-run totals
    mdir = os.path.join(out, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".run-{run_id}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(mdir, f"run-{run_id}.json"))
    return metrics


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default=None, choices=["tiny", "small", "bench"])
    ap.add_argument("--input", default=None, help="pages parquet dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--layout-templates", default=None,
                    help="template-words parquet (template_id, word, x, y, "
                         "w, h); adds layout_template/layout_cost columns")
    args = ap.parse_args(argv)
    if not args.scale and not args.input:
        ap.error("one of --scale / --input required")

    spark = get_spark(cores=args.cores)
    if args.input:
        # auto-detect hive/Iceberg-layout day partitioning so resume gets
        # real partition pruning (see run_job) without an extra flag
        # --input may also be a glob pattern or a single parquet file,
        # both of which spark.read.parquet accepts; only probe the layout
        # when it is actually a directory.
        partitioned = os.path.isdir(args.input) and any(
            d.startswith("warc_day=")
            for d in os.listdir(args.input)
            if os.path.isdir(os.path.join(args.input, d)))
        if partitioned:
            from ..sources.pages import read_pages_partitioned
            pages = read_pages_partitioned(spark, args.input)
        else:
            pages = read_pages(spark, args.input)
    else:
        pages = synthetic_pages(spark, args.scale)
    metrics = run_job(spark, pages, args.out, args.run_id, args.resume,
                      layout_templates=args.layout_templates)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
