"""The Arrow-batched extraction kernel (operators S3/S4/U1/U2 analogues).

``mapInArrow`` over (url, warc_ts, html, text) -> extraction output columns.
Architecture mirrors what the north rule demands of the reference's GPU
inner loop (/root/reference/src/infrastructure/services/ocr_service.py:13-43):

* per-partition model load: the glyph atlas ('model weights') is built once
  per Python worker in the generator prologue, and
  ``spark.python.worker.reuse`` keeps it warm across tasks — the Spark
  analogue of the reference's process-level singletons
  (/root/reference/src/api/v1/dependencies.py:8-20)
* micro-batching by BYTES, not rows: an input Arrow batch is re-chunked so
  no output batch holds more than ~MAX_BATCH_BYTES of payload — a mega-page
  can never blow up worker memory (SURVEY.md §7.3 item 4)
* no per-row Python *control flow* outside the kernel: Spark sees one
  vectorized Arrow exchange; inside, image rows are matched as one tensor
  op per page (core/glyph_ocr.py), html/pdf rows are inherently
  per-document parses (same as any real extraction engine's inner loop)
* per-row errors degrade to the ``error`` column (never a task failure),
  mirroring the reference's catch-and-degrade services
  (optional_services.py:78-80)

The kernel runs the exact same ``core.extract.extract_document`` the golden
oracle runs — byte-identity across parallelism levels is structural.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from ..core.extract import extract_document, get_atlas

MAX_BATCH_BYTES = 32 * 1024 * 1024

SPAN_TYPE = pa.struct([
    ("text", pa.string()), ("conf", pa.float64()),
    ("x0", pa.float64()), ("y0", pa.float64()),
    ("x1", pa.float64()), ("y1", pa.float64()),
    ("kind", pa.string()),
])

OUT_SCHEMA_ARROW = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("content_type", pa.string()),
    ("extracted_text", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
    ("error", pa.string()),
])

OUT_SCHEMA_DDL = (
    "url string, warc_ts timestamp, content_type string, "
    "extracted_text string, "
    "spans array<struct<text:string,conf:double,x0:double,y0:double,"
    "x1:double,y1:double,kind:string>>, "
    "error string"
)


def _chunks_by_bytes(batch: pa.RecordBatch) -> Iterator[pa.RecordBatch]:
    """Split an input batch so each chunk carries <= MAX_BATCH_BYTES of
    payload (always >= 1 row)."""
    html = batch.column(batch.schema.get_field_index("html"))
    sizes = [len(v) if (v := html[i].as_py()) is not None else 0
             for i in range(batch.num_rows)]
    start, acc = 0, 0
    for i, s in enumerate(sizes):
        if acc + s > MAX_BATCH_BYTES and i > start:
            yield batch.slice(start, i - start)
            start, acc = i, 0
        acc += s
    if start < batch.num_rows:
        yield batch.slice(start, batch.num_rows - start)


def _extract_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    get_atlas()  # model load: once per worker, before the first batch
    for batch in it:
        for chunk in _chunks_by_bytes(batch):
            cols = {n: chunk.column(chunk.schema.get_field_index(n))
                    for n in ("url", "warc_ts", "html", "text")}
            urls, tss = [], []
            cts, texts, spans_col, errs = [], [], [], []
            for i in range(chunk.num_rows):
                payload = cols["html"][i].as_py()
                pre_text = cols["text"][i].as_py()
                # doc-type classification is NOT done here: it is a pure
                # relational expression (operator A1) applied JVM-side in
                # the pipeline — the kernel only does what needs Python
                ct, text, spans, _dt, _conf, error = extract_document(
                    payload, pre_text)
                urls.append(cols["url"][i].as_py())
                tss.append(cols["warc_ts"][i].as_py())
                cts.append(ct)
                texts.append(text)
                spans_col.append([s.as_dict() for s in spans])
                errs.append(error)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(tss, pa.timestamp("us")),
                 pa.array(cts, pa.string()),
                 pa.array(texts, pa.string()),
                 pa.array(spans_col, pa.list_(SPAN_TYPE)),
                 pa.array(errs, pa.string())],
                schema=OUT_SCHEMA_ARROW)


def extract_arrow(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, ...) -> extracted columns."""
    return (pages.select("url", "warc_ts", "html", "text")
                 .mapInArrow(_extract_batches, OUT_SCHEMA_DDL))
