"""Stateful streaming exact-dedup: drop re-crawled duplicates across
micro-batches.

Continuous-ingestion twin of the batch ``operators/dedup.exact_dup_groups``:
as crawl files arrive, only the FIRST document with a given content
fingerprint passes through; any later arrival (same batch or any later
micro-batch) is dropped.  State = one boolean per fingerprint, kept in the
Spark state store and restored from the checkpoint, so a killed stream
resumes with its dedup memory intact (tested with a restart in
tests/test_spark_e2e.py).

This is the engine's ``applyInPandasWithState`` surface: a custom stateful
operator the built-in streaming aggregations cannot express (dropDuplicates
in streaming keys on exact column equality but cannot bound or inspect its
state shape; here the state is explicit and minimal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("fingerprint", T.StringType()),
])

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _keep_first(key, pdf_iter, state: GroupState):
    import pandas as pd

    first = None
    if not state.exists:
        # A fingerprint group may span several Arrow chunks within one
        # micro-batch; the survivor must be the GLOBAL (warc_ts, url)
        # minimum, so fold each chunk's head into a running minimum
        # instead of stopping at the first non-empty chunk.
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            head = pdf.sort_values(["warc_ts", "url"]).iloc[:1]
            if first is None:
                first = head
            else:
                both = pd.concat([first, head], ignore_index=True)
                first = both.sort_values(["warc_ts", "url"]).iloc[:1]
        state.update((True,))
    else:
        for _ in pdf_iter:   # drain: all rows are known duplicates
            pass
    if first is not None:
        yield pd.DataFrame({
            "url": first["url"].values,
            "warc_ts": first["warc_ts"].values,
            "fingerprint": [key[0]] * len(first),
        })


def stream_dedup_exact(pages: DataFrame,
                       payload_col: str = "html") -> DataFrame:
    """pages stream -> first-seen rows only, keyed by payload md5.

    The explicit narrow projection before the stateful groupBy matters
    at scale: ``applyInPandasWithState`` is opaque to column pruning, so
    without it the fingerprint exchange and the Python boundary carry
    the FULL page payload (html/text bytes) per row when the state
    function only ever reads (url, warc_ts, fingerprint) — ~60 bytes.
    Shuffle the decision keys, never the payload (the dedup output is a
    survivor list; the payload is re-attached downstream by doc key)."""
    fp = pages.withColumn("fingerprint", F.md5(F.col(payload_col)))
    return (fp.select("fingerprint", "url", "warc_ts")
            .groupBy("fingerprint")
            .applyInPandasWithState(
                _keep_first, OUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
