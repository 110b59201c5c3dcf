"""Benchmark harness: headline extraction throughput + operator queries.

Prints ONE JSON line:
  {"metric": "docs_per_sec_extraction", "value": N, "unit": "sec", ...,
   "queries": {name: sec, ...}, "sf": ...}

Input: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) for the operator
queries; the extraction corpus is the deterministic synthetic pages table
at bench scale (50k docs), materialized as parquet once and reused.
Cores: $SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ocr_gpu_services_spark.plans.extract_job import extract_pipeline  # noqa
from ocr_gpu_services_spark.plans.queries import QUERIES  # noqa
from ocr_gpu_services_spark.session import get_spark  # noqa
from ocr_gpu_services_spark.sources.pages import (  # noqa
    read_pages, write_synthetic_pages)

BENCH_QUERIES = [
    "keyword_classify", "text_clean", "quality_score", "langid",
    "token_count", "nfc_canon",
    "dedup_exact", "simhash16", "minhash_lsh", "ngram_jaccard",
    "dedup_embedding", "ann_cosine_topk", "ann_lsh_topk",
    "signature_filter_p7", "detect_threshold", "iou_pairs", "nms_greedy",
    "multimodal_meta",
    "pricing_summary", "top_orders", "join_5way_volume",
    "window_topk", "events_sessionize",
]

PAGES_CACHE = os.environ.get("SPARK_GRAFT_PAGES_DIR",
                             "/tmp/spark_graft_pages_bench")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "bench")
    spark = get_spark(app="bench", cores=cpus)

    if not os.path.exists(os.path.join(PAGES_CACHE, "_SUCCESS")):
        write_synthetic_pages(spark, scale, PAGES_CACHE, partitions=cpus * 4)

    # headline: extraction docs/sec (kernel + classification, count sink)
    pages = read_pages(spark, PAGES_CACHE)
    n_docs = pages.count()
    # untimed warmup: spawn python workers + JIT so the headline reports
    # steady-state throughput (the regime a multi-hour 100 TB job runs in)
    (extract_pipeline(pages.sample(0.08, seed=1))
     .select(F.count("*")).collect())
    t0 = time.time()
    extracted = extract_pipeline(pages)
    # force full materialization of every column incl. text/spans
    out = extracted.select(
        F.count("*").alias("n"),
        F.sum(F.length("extracted_text")).alias("chars"),
        F.sum("n_spans").alias("spans")).collect()[0]
    t_extract = time.time() - t0
    assert out["n"] == n_docs
    docs_per_sec = round(n_docs / t_extract, 2)

    qtimes = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)

    print(json.dumps({
        "metric": "docs_per_sec_extraction",
        "value": docs_per_sec,
        "unit": "sec",
        "extract_wall_s": round(t_extract, 3),
        "extract_docs": n_docs,
        "extract_chars": int(out["chars"]),
        "queries": qtimes,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cores": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
