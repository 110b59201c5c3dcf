"""Structured Streaming ingest: continuous-crawl arrival of pages.

The reference is strictly request/response and has NO streaming operators
(SURVEY.md §2.8) — batch + manifest resume is the primary model.  This
module exists for the continuous-ingestion deployment shape: new crawl
files land in a directory (the streaming stand-in for a message bus /
Iceberg incremental scan) and the SAME extraction lineage runs per
micro-batch with exactly-once file-sink semantics from the Spark
checkpoint — no re-extraction of already-processed files after a kill,
which is the streaming twin of IcebergLikeTable's per-partition manifests.

Kernel reuse is the point: ``extract_pipeline`` (mapInArrow kernel +
JVM classification) is applied to the streaming DataFrame unchanged, so
batch goldens pin streaming correctness too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.extract_job import extract_pipeline
from ..sources.pages import PAGES_SCHEMA


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str, available_now: bool = True,
                   max_files_per_trigger: int = 16):
    """Build and start the streaming extraction query.

    ``available_now=True`` drains everything currently in ``input_dir``
    and stops (used by tests and backfills); ``False`` keeps following
    the directory.  The salted rebalance shuffle is skipped: streaming
    micro-batches are already bounded by ``maxFilesPerTrigger``, so skew
    defense happens at file granularity."""
    pages = (spark.readStream.schema(PAGES_SCHEMA)
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .parquet(input_dir))
    extracted = extract_pipeline(pages, rebalance=False)
    writer = (extracted.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
