"""Physical-plan regression guards for the round-2 operators: the scale
properties we claim (column pruning, pushdown, no driver collect, bounded
shuffle count) must be visible in the plan, not just asserted in prose."""

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def test_url_canonicalize_prunes_to_one_column(spark, sf_dir):
    from ocr_gpu_services_spark.plans.queries import QUERIES
    plan = _plan(QUERIES["url_canonicalize"](spark, sf_dir))
    assert "ReadSchema: struct<doc_id:bigint>" in plan   # text never read
    assert plan.count("Exchange (") == 1                 # the groupBy only


def test_para_dedup_pushes_the_id_filter(spark, sf_dir):
    from ocr_gpu_services_spark.plans.queries import QUERIES
    plan = _plan(QUERIES["para_dedup"](spark, sf_dir))
    assert "LessThan(doc_id,150)" in plan                # reaches the scan


def test_dedup_embedding_lsh_has_no_driver_collect(spark, sf_dir):
    from ocr_gpu_services_spark.operators import ann
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(ann.embedding_dup_pairs_lsh(e, dim=64))
    # distributed end to end: signature MapInPandas -> bucket groupBy ->
    # grouped-map matmul -> pair distinct; nothing is collected/broadcast
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "CollectLimit" not in plan and "Broadcast" not in plan
    assert plan.count("Exchange (") <= 2


def test_minhash_signature_computed_once(spark, sf_dir):
    from ocr_gpu_services_spark.operators import dedup
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").filter(F.col("doc_id") < 60)
    plan = _plan(dedup.minhash_lsh_pairs(docs))
    # round-6 guard shape: the band table (signature stage) is
    # materialized ONCE via localCheckpoint — the former rely-on-
    # ReusedExchange shape silently recomputed the signatures up to 3x
    # because the self-join pushed isnotnull predicates into its scan
    # subtrees while the guard-count subtree had none, breaking canonical
    # exchange equality.  Downstream (guard count, anti-join, self-join)
    # must read the checkpointed RDD, never the parquet corpus.
    assert "Window" not in plan           # no full-row window sort
    assert "LeftAnti" in plan             # broadcast anti-join guard
    assert "Scan ExistingRDD" in plan     # checkpointed band table
    assert "Scan parquet" not in plan     # signature never recomputed


def test_extraction_pipeline_single_python_crossing(spark):
    from ocr_gpu_services_spark.plans.extract_job import extract_pipeline
    from ocr_gpu_services_spark.sources.pages import synthetic_pages
    plan = _plan(extract_pipeline(synthetic_pages(spark, "tiny")))
    assert plan.count("MapInArrow (") == 1     # ONE JVM->Python crossing
    assert "BatchEvalPython" not in plan       # no row-at-a-time Python


def test_bucketed_tables_join_with_zero_exchange(spark, sf_dir, tmp_path):
    """Co-located joins via bucketing (the PLANS.md big-join strategy):
    two tables bucketed+sorted on the join key join with NO exchange in
    the executed plan — the shuffle was paid once at write time, which
    is the 100 TB recipe for repeatedly-joined tables."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .withColumnRenamed("vec_id", "doc_id")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (docs.write.mode("overwrite")
         .option("path", str(tmp_path / "docs_b"))
         .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("docs_b"))
        (emb.write.mode("overwrite")
         .option("path", str(tmp_path / "emb_b"))
         .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("emb_b"))
        j = spark.table("docs_b").join(spark.table("emb_b"), "doc_id") \
            .select("doc_id", F.length("text").alias("n"))
        n = j.count()
        assert n == 500
        s = j._jdf.queryExecution().executedPlan().toString()
        final = s.split("== Initial")[0]
        assert "Exchange" not in final
        assert "SortMergeJoin" in final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS docs_b")
        spark.sql("DROP TABLE IF EXISTS emb_b")


def test_round3_operators_plan_shapes(spark, sf_dir):
    """Plan guards for the round-3 operators: the n-gram model joins in
    perplexity_filter broadcast (the model is bounded by charset^3);
    substring_dedup builds windows with HOFs — no self-join anywhere;
    tfidf_topterms' per-doc top-k goes through WindowGroupLimit; none of
    them fall back to row-at-a-time Python."""
    from ocr_gpu_services_spark.plans.queries import QUERIES

    perp = _plan(QUERIES["perplexity_filter"](spark, sf_dir))
    assert perp.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in perp

    sub = _plan(QUERIES["substring_dedup"](spark, sf_dir))
    assert "Join" not in sub            # windows + aggregates only
    assert "BatchEvalPython" not in sub

    # the strided corpus-scale variant keeps the identical no-join shape
    subs = _plan(QUERIES["substring_dedup_strided"](spark, sf_dir))
    assert "Join" not in subs
    assert "BatchEvalPython" not in subs

    tf = _plan(QUERIES["tfidf_topterms"](spark, sf_dir))
    assert "WindowGroupLimit" in tf
    assert "BatchEvalPython" not in tf
    # the df(term) join must be a broadcast: a shuffled equi-join on
    # `term` skews on exactly the hottest keys (stopwords)
    assert "BroadcastHashJoin" in tf
    assert "SortMergeJoin" not in tf


def test_dedup_exact_single_corpus_pass(spark, sf_dir):
    """Round-6 shape: the duplicated-corpus construction explodes each
    base row into 1-or-2 (doc_id, fingerprint) rows instead of a
    two-branch union — the union re-evaluated its scan + tokenize + md5
    subtree per branch (1.33x fingerprint work, two corpus scans), the
    explode scans and fingerprints exactly once and stays codegen."""
    from ocr_gpu_services_spark.plans.queries import QUERIES
    plan = _plan(QUERIES["dedup_exact"](spark, sf_dir))
    # one corpus pass: a single scan node in the plan tree (each tree
    # node also reappears once in the numbered details section)
    assert plan.count("Scan parquet  (") == 1
    assert "Union" not in plan
    assert "Generate" in plan                # the 1-or-2-row explode
    assert "BatchEvalPython" not in plan
