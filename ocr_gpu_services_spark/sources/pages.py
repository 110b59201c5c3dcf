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
