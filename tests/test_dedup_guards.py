"""Degenerate-key guards for the dedup joins: a corpus where every document
shares one universal boilerplate line must not blow the shingle / band
joins up quadratically, must keep finding the planted near-dup pairs, and
must stay value-identical to the DuckDB oracle running the same cap."""

import duckdb
import pandas as pd
import pytest

from ocr_gpu_services_spark.operators import dedup


@pytest.fixture(scope="module")
def boiler_docs(spark):
    # 60 docs, ONE universal boilerplate sentence (hot shingles with df=60)
    # + unique tails; docs 50-59 are exact near-dup twins of docs 0-9
    boiler = ("subscribe to our newsletter accept all cookies all rights "
              "reserved terms of service apply contact us today")
    rows = []
    for i in range(60):
        tail_seed = i if i < 50 else i - 50
        tail = " ".join(f"tail{tail_seed} token{tail_seed * 7 + k} unique"
                        for k in range(6))
        rows.append((i, f"{boiler} {tail}"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf), pdf


def _duck(pdf, sql):
    con = duckdb.connect()
    con.register("documents", pdf)
    return {tuple(r) for r in con.sql(sql).fetchall()}


def test_ngram_jaccard_df_cap_bounds_join_and_matches_oracle(
        spark, boiler_docs):
    sdf, pdf = boiler_docs
    got = {tuple(r) for r in
           dedup.ngram_jaccard_pairs(sdf, max_df=10).collect()}
    want = _duck(pdf, dedup.ngram_jaccard_pairs_sql(max_df=10))
    assert got == want
    # the planted twins survive the cap (their unique tails still join) …
    twin_pairs = {(a, b) for (a, b, *_rest) in got if b == a + 50}
    assert len(twin_pairs) == 10
    # … and the universal boilerplate no longer pairs everything with
    # everything: without the cap every one of the 60*59/2 pairs appears
    assert len(got) < 60 * 59 / 2 / 2
    uncapped = {tuple(r) for r in
                dedup.ngram_jaccard_pairs(sdf, max_df=None).collect()}
    assert len(uncapped) == 60 * 59 / 2


def test_minhash_band_bucket_cap_bounds_join_and_matches_oracle(
        spark, boiler_docs):
    sdf, pdf = boiler_docs
    got = {tuple(r) for r in
           dedup.minhash_lsh_pairs(sdf, max_bucket=10).collect()}
    want = _duck(pdf, dedup.minhash_lsh_pairs_sql(max_bucket=10))
    assert got == want
    # exact twins share every band; they must survive any sane cap
    assert {(a, a + 50) for a in range(10)} <= got


def test_default_caps_do_not_change_gate_corpus_results(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .filter("doc_id < 40")
    capped = {tuple(r) for r in dedup.ngram_jaccard_pairs(docs).collect()}
    uncapped = {tuple(r) for r in
                dedup.ngram_jaccard_pairs(docs, max_df=None).collect()}
    assert capped == uncapped


def test_dup_clusters_resolves_components(spark):
    """Min-label propagation == ground-truth connected components on a
    hand-built graph: a chain, a triangle, an isolated pair."""
    from ocr_gpu_services_spark.operators.dedup import dup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain -> cluster 1 (size 4)
         (10, 11), (11, 12), (10, 12),    # triangle -> cluster 10 (size 3)
         (20, 21)],                       # pair -> cluster 20 (size 2)
        "doc_a long, doc_b long")
    got = {(r.doc_id, r.cluster_id, r.n_members)
           for r in dup_clusters(pairs).collect()}
    want = {(1, 1, 4), (2, 1, 4), (3, 1, 4), (4, 1, 4),
            (10, 10, 3), (11, 10, 3), (12, 10, 3),
            (20, 20, 2), (21, 20, 2)}
    assert got == want


def test_dup_clusters_long_chain_converges_or_raises(spark):
    """High-diameter component: a 60-node path has diameter 59 — far past
    the old silent 20-round cap under plain propagation; pointer jumping
    must resolve it in ~7 rounds.  The operator must (a) reach the true
    fixed point with the default safety valve, and (b) RAISE (never
    silently mislabel) when the valve is set below what the component
    needs."""
    import pytest

    from ocr_gpu_services_spark.operators.dedup import dup_clusters
    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long")
    got = {(r.doc_id, r.cluster_id, r.n_members)
           for r in dup_clusters(pairs).collect()}
    assert got == {(i, 1, n) for i in range(1, n + 1)}
    with pytest.raises(RuntimeError, match="no fixed point"):
        dup_clusters(pairs, max_iters=3).collect()


def test_semdedup_matches_numpy_twin_and_drop_semantics(spark):
    """Engine semdedup == single-machine twin on a crafted corpus with
    planted near-duplicate groups; the kept set keeps exactly the
    highest-priority member of each eps-ball."""
    import numpy as np

    from ocr_gpu_services_spark.operators import ann

    rng = np.random.RandomState(3)
    base = rng.randn(12, 16)
    vecs, ids = [], []
    vid = 0
    for b in base:
        for _copy in range(rng.randint(1, 4)):
            # tiny perturbation: stays within the 0.96 eps-ball
            vecs.append(b + rng.randn(16) * 0.01)
            ids.append(vid)
            vid += 1
    mat = np.array(vecs)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)],
        "vec_id long, embedding array<float>")
    # the engine consumes float32 embeddings — replay that cast in the twin
    mat32 = mat.astype(np.float32).astype(np.float64)
    want = set(ann.semdedup_numpy(np.array(ids), mat32, nlist=4))
    got = {(r.vec_id, r.cluster_id, r.centroid_cos, r.kept)
           for r in ann.semdedup(df, dim=16, nlist=4).collect()}
    assert got == want
    # every dropped row has a kept higher-priority eps-neighbor
    rows = {r[0]: r for r in want}
    norms = np.linalg.norm(mat32, axis=1)
    for vid_, cl, cc, kept in want:
        if kept:
            continue
        found = False
        for vid2, cl2, cc2, _k2 in want:
            if vid2 == vid_ or cl2 != cl:
                continue
            cos = round(float(mat32[vid2] @ mat32[vid_]
                              / (norms[vid2] * norms[vid_])), 4)
            if cos >= 0.96 and ((cc2, -vid2) > (cc, -vid_)):
                found = True
                break
        assert found, vid_


def test_distributed_trainer_matches_inmemory_lloyd(spark):
    """The retained full-corpus distributed trainer (quantized integer
    partial sums across partitions) must produce the same centroids as
    the shared in-memory Lloyd kernel fed the whole corpus — the
    documented equivalence that lets the serving queries use the sampled
    path while the exact-trainer alternative stays correct."""
    import numpy as np
    from ocr_gpu_services_spark.operators import ann

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = ann.train_ivf_centroids(e, dim=64, nlist=8, iters=3)
    rows = e.select("vec_id", "embedding").collect()
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    want = ann.lloyd_centroids(mat, nlist=8, iters=3)
    # assignment dots differ in ulps (sequential vs BLAS) but the update
    # itself is exact integer — centroids agree to float noise unless an
    # argmax tie flips, which the md5-seeded corpus does not produce
    assert np.allclose(got, want, atol=1e-9)


def test_sampled_trainer_matches_twin_selection(spark):
    """Engine-side sample selection (filter stride + orderBy + limit)
    must equal the numpy twin's selection rule, so sampled centroids are
    bit-identical engine-vs-oracle by construction."""
    import numpy as np
    from ocr_gpu_services_spark.operators import ann

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = ann.train_ivf_centroids_sampled(e, dim=64, nlist=8, iters=3)
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    want = ann.lloyd_centroids(ann.train_sample_numpy(ids, mat),
                               nlist=8, iters=3)
    assert np.array_equal(got, want)
