"""Streaming training-data filter: the batch ``corpus_filter`` decision
record produced continuously as documents arrive.

Composition (one streaming plan):
* stateless enrichment — content fingerprint, language ID, quality and
  Gopher rule flags — is the SAME JVM expression set the batch query uses
  (operators/textstats.py), so batch and stream cannot drift;
* the only stateful step is first-seen dedup, one boolean of state per
  fingerprint in the state store (``applyInPandasWithState``), restored
  from the checkpoint on restart;
* every arriving document gets a decision row (keep + first failing
  reason); duplicates are marked, not dropped, because a training-data
  pipeline wants the audit record either way.

Within a micro-batch the survivor is the minimum doc_id of the group
(folded across Arrow chunks); across micro-batches it is first arrival —
the streaming notion of "first occurrence".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators import textstats

_OUT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("quality_ok", T.IntegerType()),
    T.StructField("gopher_ok", T.IntegerType()),
    T.StructField("is_first", T.BooleanType()),
])

_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _mark_first(key, pdf_iter, state: GroupState):
    import pandas as pd

    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 \
        else chunks[0]
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    first = [False] * len(pdf)
    if not state.exists:
        first[0] = True          # group's minimum doc_id this micro-batch
        state.update((True,))
    yield pd.DataFrame({
        "doc_id": pdf["doc_id"], "lang": pdf["lang"],
        "quality_ok": pdf["quality_ok"], "gopher_ok": pdf["gopher_ok"],
        "is_first": first,
    })


def stream_corpus_filter(docs: DataFrame) -> DataFrame:
    """docs stream (doc_id, text) -> decision records
    (doc_id, lang, reason, keep)."""
    d, cols = textstats.bind_stats(docs, quality=True, gopher=True,
                                   lang=True, fp=True)
    enriched = d.select(
        "doc_id",
        cols["fingerprint"].alias("fp"),
        cols["lang_pred"].alias("lang"),
        cols["quality_ok"].alias("quality_ok"),
        cols["gopher_keep"].cast("int").alias("gopher_ok"))
    marked = (enriched.groupBy("fp")
              .applyInPandasWithState(_mark_first, _OUT, _STATE,
                                      "append", GroupStateTimeout.NoTimeout))
    reason = (F.when(~F.col("is_first"), "duplicate")
              .when(F.col("quality_ok") == 0, "low_quality")
              .when(F.col("gopher_ok") == 0, "gopher_reject")
              .otherwise("kept"))
    keep = F.when(F.col("is_first") & (F.col("quality_ok") == 1)
                  & (F.col("gopher_ok") == 1), 1).otherwise(0)
    return marked.select("doc_id", "lang", reason.alias("reason"),
                         keep.alias("keep"))
