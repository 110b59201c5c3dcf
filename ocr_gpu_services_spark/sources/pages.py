"""Pages-table source (operator S1): Parquet/Iceberg-like scan or the
deterministic synthetic generator (tests/bench; FIXTURES.md §1).

The scan root of every job — the batch replacement for the reference's
one-file-per-HTTP-request source (/root/reference/src/api/v1/routers/ocr.py:48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def synthetic_pages(spark: SparkSession, scale: str = "tiny",
                    seed: int = 7) -> DataFrame:
    """Deterministic seeded pages table (no external data)."""
    from ..fixtures.gen import gen_pandas
    pdf = gen_pandas(scale, seed)
    return spark.createDataFrame(pdf, schema=PAGES_SCHEMA)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def write_synthetic_pages(spark: SparkSession, scale: str, path: str,
                          seed: int = 7, partitions: int | None = None):
    """Materialize the synthetic table as parquet (bench input)."""
    df = synthetic_pages(spark, scale, seed)
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").parquet(path)
    return path


def write_pages_sharded(scale: str, path: str, files: int = 128,
                        procs: int = 16, seed: int = 7) -> str:
    """Materialize a large synthetic pages corpus as MANY parquet files
    (multiprocess generation, no Spark session needed).

    The sharded layout is the point: 128 files = 128 scan splits, which is
    what a real crawl table gives every executor to chew on — no
    repartition crutch required to get parallelism at the scan."""
    import multiprocessing as mp
    import os

    from ..fixtures.gen import SCALES

    os.makedirs(path, exist_ok=True)
    n = SCALES[scale]
    bounds = [(scale, seed, n * k // files, n * (k + 1) // files,
               os.path.join(path, f"part-{k:05d}.parquet"))
              for k in range(files)]
    with mp.Pool(procs) as pool:
        pool.map(_write_shard, bounds)
    open(os.path.join(path, "_SUCCESS"), "w").close()
    return path


def _write_shard(args) -> None:
    scale, seed, start, stop, out = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..fixtures.gen import gen_rows

    cols = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for r in gen_rows(scale, seed, start, stop):
        for k in cols:
            cols[k].append(r[k])
    table = pa.table({
        "url": pa.array(cols["url"], pa.string()),
        "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
        "html": pa.array(cols["html"], pa.binary()),
        "text": pa.array(cols["text"], pa.string()),
        "lang": pa.array(cols["lang"], pa.string()),
    })
    pq.write_table(table, out, compression="zstd")


def read_pages_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan a day-partitioned (hive/Iceberg-layout) pages table: the
    warc_day partition column comes from the directory structure, so
    resume's NOT-IN filter on it is partition pruning at the scan."""
    return spark.read.parquet(path)


def write_pages_partitioned(df: DataFrame, path: str) -> str:
    """Materialize a pages DataFrame day-partitioned (test/demo helper)."""
    from pyspark.sql import functions as F
    (df.withColumn("warc_day", F.date_format("warc_ts", "yyyy-MM-dd"))
       .write.mode("overwrite").partitionBy("warc_day").parquet(path))
    return path
