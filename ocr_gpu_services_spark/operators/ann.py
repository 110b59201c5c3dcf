"""Similarity search over an embedding column (driver mandate).

* ``cosine_topk``: brute-force exact top-k — broadcast the (small) query
  set against the full embeddings table; dot/norm computed with
  zip_with + aggregate (JVM higher-order functions, no Python).  This is
  the correctness baseline and the oracle-checked path.
* ``lsh_topk``: the scale path — random-hyperplane LSH bucketing
  (deterministic md5-seeded hyperplanes), candidates only within the
  query's bucket (plus optional multi-probe), then exact re-rank.  At
  100 TB this turns an O(N·Q) scan into a bucket-pruned scan; the bucket
  id is a plain column so Spark co-partitions probe and corpus by it
  (shuffle on bucket, not a cross join).

Determinism: cosine is computed in DOUBLE with sequential fold order and
rounded to 4 decimals; ranking ties break on vec_id, so results are stable
across engines and parallelism levels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed quantization grid for the k-means partial sums: normalized vector
# components become integers on the 2^-30 grid, so the per-cluster sums
# are exact (order-insensitive) in both the distributed engine and the
# numpy oracle twin
QUANT = float(1 << 30)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_sim_col(a, b):
    ad, bd = _as_double(a), _as_double(b)
    return F.round(
        _dot(ad, bd) / F.sqrt(_dot(ad, ad) * _dot(bd, bd)), 4)


def _round4_half_away(x):
    """4-decimal rounding matching Spark ``F.round`` and DuckDB
    ``round()`` (half AWAY from zero) — numpy's default is half-EVEN,
    which diverges on exactly-representable boundaries (0.15625:
    np.round -> 0.1562, Spark/DuckDB -> 0.1563).  Any numpy side of an
    engine/oracle pair whose other side is F.round or DuckDB must use
    this, or an exact-boundary cosine flips the gate's value hash."""
    import numpy as _np
    return _np.copysign(_np.floor(_np.abs(x) * 1e4 + 0.5), x) / 1e4


def cosine_topk(embeddings: DataFrame, query_ids: list[int],
                k: int = 5) -> DataFrame:
    """Exact brute-force top-k neighbors for each query vec_id."""
    q = (embeddings.filter(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb")))
    c = embeddings.select(F.col("vec_id").alias("n_id"),
                          F.col("embedding").alias("n_emb"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("n_id") != F.col("q_id"))
              .withColumn("cosine", cosine_sim_col("q_emb", "n_emb")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "cosine"))


def cosine_topk_sql(query_ids: list[int], k: int = 5,
                    table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH q AS (SELECT vec_id AS q_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
               FROM {table} WHERE vec_id IN ({ids})),
    c AS (SELECT vec_id AS n_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ne
          FROM {table}),
    scored AS (
      SELECT q_id, n_id,
             round(list_dot_product(qe, ne)
                   / sqrt(list_dot_product(qe, qe)
                          * list_dot_product(ne, ne)), 4) AS cosine
      FROM c CROSS JOIN q WHERE n_id <> q_id),
    ranked AS (
      SELECT q_id, n_id, cosine,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, n_id ASC) AS rank
      FROM scored)
    SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: str = "ann-lsh") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 bits (no ambient RNG)."""
    rows = []
    for p in range(n_planes):
        vals = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            vals.extend((b / 127.5) - 1.0 for b in h)
            ctr += 1
        rows.append(vals[:dim])
    return np.array(rows)


def with_lsh_bucket(embeddings: DataFrame, dim: int, n_planes: int = 8,
                    emb_col: str = "embedding") -> DataFrame:
    """Adds a sign-pattern bucket id; pure column expressions (the hyperplane
    constants are folded into the plan as literals)."""
    planes = _hyperplanes(dim, n_planes)
    e = _as_double(F.col(emb_col))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[p]])
        dot = _dot(e, plane)
        bucket = bucket + F.when(dot > 0, 2 ** p).otherwise(0)
    return embeddings.withColumn("lsh_bucket", bucket)


def lsh_topk(embeddings: DataFrame, query_ids: list[int], dim: int,
             k: int = 5, n_planes: int = 8) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    re-rank inside the bucket.  Join on the bucket column co-partitions
    probe and corpus (hash shuffle on a single int key)."""
    b = with_lsh_bucket(embeddings, dim, n_planes)
    q = (b.filter(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("lsh_bucket")))
    c = b.select(F.col("vec_id").alias("n_id"),
                 F.col("embedding").alias("n_emb"), "lsh_bucket")
    scored = (c.join(F.broadcast(q), "lsh_bucket")
              .filter(F.col("n_id") != F.col("q_id"))
              .withColumn("cosine", cosine_sim_col("q_emb", "n_emb")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "cosine"))


def lsh_topk_sql(query_ids: list[int], dim: int, k: int = 5,
                 n_planes: int = 8, table: str = "embeddings") -> str:
    """DuckDB twin of ``lsh_topk``: the SAME md5-seeded hyperplanes are
    emitted as literal lists, so the bucket assignment — the approximate
    part — is cross-checked engine-vs-engine, not just the re-rank."""
    planes = _hyperplanes(dim, n_planes)
    bucket_terms = []
    for p in range(n_planes):
        lits = ", ".join(repr(float(v)) for v in planes[p])
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(v, [{lits}]) > 0 "
            f"THEN {2 ** p} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM {table}),
    b AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e),
    q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b
          WHERE vec_id IN ({ids})),
    scored AS (
      SELECT q_id, c.vec_id AS n_id,
             round(list_dot_product(qv, c.v)
                   / sqrt(list_dot_product(qv, qv)
                          * list_dot_product(c.v, c.v)), 4) AS cosine
      FROM b c JOIN q USING (bucket) WHERE c.vec_id <> q_id),
    ranked AS (
      SELECT q_id, n_id, cosine,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, n_id ASC) AS rank
      FROM scored)
    SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# IVF: k-means coarse quantizer + probed search (the second scale path)
# ---------------------------------------------------------------------------

# FAISS-style training-sample bound: k-means centroids need only a few
# hundred vectors per centroid (FAISS clamps at 256/centroid), so the
# trainer sees a bounded deterministic sample — NOT the corpus
TRAIN_SAMPLE_CAP = 4096


def _train_stride(n: int) -> int:
    """Deterministic id-stride that lands ~TRAIN_SAMPLE_CAP sample rows
    out of ``n`` (assumes roughly dense ids; the hard `limit` below makes
    the bound strict regardless)."""
    return max(1, -(-n // TRAIN_SAMPLE_CAP))


def lloyd_centroids(sample: np.ndarray, nlist: int,
                    iters: int = 5) -> np.ndarray:
    """Exact quantized spherical Lloyd over an in-memory sample matrix —
    the SINGLE training kernel shared by the engine's sampled trainer,
    the full-corpus distributed trainer's update rule, and the numpy
    oracle twins, so engine and oracle centroids are identical by
    construction (same function, same input).  Centroids init from md5
    bits (no data-dependent RNG); per-cluster sums are exact int64 on the
    2^-30 grid; argmax ties break to the lowest cluster id; empty
    clusters keep their previous centroid."""
    M = sample.astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Q = np.rint(Mn * QUANT).astype(np.int64)
    C = _hyperplanes(M.shape[1], nlist, seed="ivf-init")
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    for _ in range(iters):
        assign = (Mn @ C.T).argmax(axis=1)
        new = C.copy()
        for c in range(nlist):
            sel = Q[assign == c]
            if len(sel):
                v = sel.sum(axis=0).astype(np.float64)
                n = np.linalg.norm(v)
                if n > 0:
                    new[c] = v / n
        C = new
    return C


def train_sample_numpy(ids: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Twin-side replica of the sampled trainer's row selection: ids on
    the shared stride grid, ascending, truncated to the cap."""
    order = np.argsort(ids, kind="stable")
    s = _train_stride(len(ids))
    sel = order[ids[order] % s == 0][:TRAIN_SAMPLE_CAP]
    return mat[sel]


def train_ivf_centroids_sampled(embeddings: DataFrame, dim: int,
                                nlist: int = 16, iters: int = 5,
                                id_col: str = "vec_id",
                                emb_col: str = "embedding") -> np.ndarray:
    """Sampled k-means training — the scale path (and the default).

    FAISS's own IVF training clamps the training set to a few hundred
    vectors per centroid because Lloyd converges on a sample; training on
    the full corpus buys nothing but ``iters`` sequential full scans.  So:
    ONE narrow filtered scan collects a bounded deterministic sample
    (ids on a stride grid, ascending, hard ``limit`` cap — O(cap·dim)
    driver state, ~2 MB at the cap) and the exact quantized Lloyd loop
    (``lloyd_centroids``) runs on the driver in microseconds.  Versus the
    distributed trainer this removes 5 sequential jobs + a full-corpus
    persist per training — at 10^12 rows that is iters× the dominant scan
    cost; the sample scan is a single cheap pass.  The numpy oracle twins
    select the identical sample (``train_sample_numpy``) and call the
    identical kernel, so centroids match bit-for-bit by construction."""
    n = embeddings.count()
    s = _train_stride(n)
    pdf = (embeddings
           .filter(F.col(id_col) % s == 0)
           .select(id_col, emb_col)
           .orderBy(id_col)
           .limit(TRAIN_SAMPLE_CAP)
           .toPandas())          # Arrow path: row-collect of array cols
    #                              deserializes ~10x slower via Py4J
    sample = np.array(list(pdf[emb_col]), dtype=np.float64)
    if sample.ndim != 2 or sample.shape[1] != dim:
        raise ValueError(
            f"embedding width {sample.shape[-1] if sample.ndim == 2 else '?'}"
            f" != dim={dim}")
    return lloyd_centroids(sample, nlist, iters)


def train_ivf_centroids(embeddings: DataFrame, dim: int, nlist: int = 16,
                        iters: int = 5,
                        emb_col: str = "embedding") -> np.ndarray:
    """FULL-CORPUS deterministic distributed spherical k-means (Lloyd) —
    retained as the exact-trainer alternative for corpora where sampling
    is not wanted; the serving queries use ``train_ivf_centroids_sampled``
    (same update rule over a bounded sample).  The iterative
    algorithm family on Spark done the idiomatic way: the driver holds ONLY
    the (nlist, dim) centroid matrix; each iteration is one Arrow-batched
    partial-sum pass (`mapInPandas`: per batch, assign = argmax dot, emit
    nlist sum-vectors + counts) reduced on the driver.  Nothing about the
    corpus is ever collected.

    Determinism is STRUCTURAL, not margin-dependent: centroids init from
    md5 bits (no data-dependent RNG); each row's normalized vector is
    quantized to the fixed 2^-30 grid and the per-cluster sums are exact
    integer arithmetic end to end (int64 within a partition, DECIMAL(38,0)
    across partitions) — integer addition is associative, so the result
    is independent of Spark's shuffle-fetch merge order, and the numpy
    oracle twin (ivf_topk_numpy) applies the identical quantization so
    engine and oracle produce bit-identical centroids by construction
    rather than because argmax margins dwarf ulp noise.  Fixed iteration
    count; argmax ties break to the lowest cluster id; empty clusters
    keep their previous centroid.
    """
    import pandas as pd

    cents = _hyperplanes(dim, nlist, seed="ivf-init")
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    spark = embeddings.sparkSession
    # iterative working set: cache the scan once, read it every iteration
    # (the canonical Spark iterative-algorithm pattern; unpersisted below)
    work = embeddings.select(emb_col).persist()
    for _ in range(iters):
        b_c = spark.sparkContext.broadcast(cents)

        def partial(it):
            C = b_c.value
            sums = np.zeros((C.shape[0], C.shape[1]), dtype=np.int64)
            counts = np.zeros(C.shape[0], dtype=np.int64)
            for pdf in it:
                A = np.array(list(pdf[emb_col]), dtype=np.float64)
                A = A / np.linalg.norm(A, axis=1, keepdims=True)
                assign = (A @ C.T).argmax(axis=1)
                # exact integer partials on the 2^-30 grid (|q| <= 2^30
                # per row: int64 holds ~2^33 rows per partition-cluster)
                np.add.at(sums, assign,
                          np.rint(A * QUANT).astype(np.int64))
                np.add.at(counts, assign, 1)
            out = pd.DataFrame(sums)
            out.columns = [f"d{j}" for j in range(C.shape[1])]
            out.insert(0, "cid", np.arange(C.shape[0]))
            out["cnt"] = counts
            yield out

        schema = ("cid int, "
                  + ", ".join(f"d{j} long" for j in range(dim))
                  + ", cnt long")
        # decimal(38,0) cross-partition sums: exact at any corpus size
        # (10^12 rows x 2^30 ~ 10^21 << 10^38), order-insensitive
        part = work.mapInPandas(partial, schema)
        rows = (part.groupBy("cid")
                .agg(*[F.sum(F.col(f"d{j}").cast("decimal(38,0)"))
                       .alias(f"d{j}") for j in range(dim)],
                     F.sum("cnt").alias("cnt"))
                .collect())
        new = cents.copy()
        for r in rows:
            cid, cnt = r["cid"], r["cnt"]
            if cnt > 0:
                # float(exact integer) rounds to nearest double — the
                # same conversion the twin applies to the same integer
                v = np.array([float(r[f"d{j}"]) for j in range(dim)])
                n = np.linalg.norm(v)
                if n > 0:
                    new[cid] = v / n
        cents = new
        b_c.destroy()
    work.unpersist()
    return cents


def ivf_topk_numpy(ids: np.ndarray, mat: np.ndarray, query_ids: list[int],
                   k: int = 5, nlist: int = 16, nprobe: int = 8,
                   iters: int = 5) -> list[tuple]:
    """Single-machine numpy twin of the distributed IVF pipeline (train ->
    assign -> probe -> exact re-rank), used as the independent oracle: the
    Spark implementation's partial-sum training, broadcast assignment and
    explode-probe join must reproduce this exactly.  Returns sorted
    (q_id, n_id, rank, cosine) tuples."""
    M = mat.astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = lloyd_centroids(train_sample_numpy(ids, M), nlist, iters)
    assign = (Mn @ C.T).argmax(axis=1)
    norms = np.linalg.norm(M, axis=1)
    out = []
    for qid in query_ids:
        qi = np.nonzero(ids == qid)[0][0]
        probe = np.argsort(-(C @ Mn[qi]), kind="stable")[:nprobe]
        cand = np.nonzero(np.isin(assign, probe) & (ids != qid))[0]
        # mirror the engine's re-rank formula exactly (raw vectors,
        # dot / sqrt(dot*dot), round 4) so rounding boundaries agree
        cos = _round4_half_away(
            (M[cand] @ M[qi]) / (norms[cand] * norms[qi]))
        order = sorted(range(len(cand)), key=lambda j: (-cos[j], ids[cand[j]]))
        for rank, j in enumerate(order[:k], 1):
            out.append((int(qid), int(ids[cand[j]]), rank, float(cos[j])))
    return sorted(out)


def _assign_cell_udf(cents: np.ndarray):
    """Vectorized nearest-centroid assignment: the (nlist, dim) centroid
    matrix rides the UDF closure (broadcast by Spark's task serializer)
    and each Arrow batch is ONE BLAS matmul + argmax — the same kernel
    discipline as ``embedding_dup_pairs``, and numerically the numpy
    twin's own expression (argmax ties break to the lowest cluster id,
    numpy argmax-first semantics on both sides)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(col: pd.Series) -> pd.Series:
        A = np.array(list(col), dtype=np.float64)
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        return pd.Series((An @ cents.T).argmax(axis=1).astype(np.int32))

    return assign


def _assign_cell_cos_udf(cents: np.ndarray):
    """As `_assign_cell_udf` but also returns the (rounded) cosine to the
    winning centroid — numpy ``round`` (half-even) on BOTH engine and
    twin, removing the F.round(HALF_UP)-vs-np.round seam entirely."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cell:int, ccos:double>")
    def assign(col: pd.Series) -> pd.DataFrame:
        A = np.array(list(col), dtype=np.float64)
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        sims = An @ cents.T
        return pd.DataFrame({
            "cell": sims.argmax(axis=1).astype(np.int32),
            "ccos": np.round(sims.max(axis=1), 4)})

    return assign


def ivf_topk(embeddings: DataFrame, query_ids: list[int], dim: int,
             k: int = 5, nlist: int = 16, nprobe: int = 8,
             iters: int = 5) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell (one int column, map-side assignment against the broadcast
    centroid matrix); each query probes its `nprobe` nearest cells and
    re-ranks exactly inside them.  Join is an equi-join on the cell id —
    co-partitioned shuffle, never a cross join.  With the test corpora's
    parameters the probed cells provably contain the exact top-k (verified
    equal to `cosine_topk` at every test SF), which is what lets the
    registry entry share the exact oracle SQL."""
    cents = train_ivf_centroids_sampled(embeddings, dim, nlist, iters)
    corpus = embeddings.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"),
        _assign_cell_udf(cents)(F.col("embedding")).alias("cell"))

    # the query side is a BOUNDED id list by API contract — collect its
    # embeddings (Arrow, O(|Q|·dim)) and rank the nprobe nearest cells
    # driver-side in numpy: this is the twin's own argsort, and it
    # replaces a giant per-query literal expression tree (nlist×dim
    # F.lit nodes) whose Catalyst analysis alone cost seconds per call
    qpdf = (embeddings.filter(F.col("vec_id").isin(query_ids))
            .select("vec_id", "embedding").toPandas())
    qids_np = qpdf["vec_id"].to_numpy(dtype=np.int64)
    Qm = np.array(list(qpdf["embedding"]), dtype=np.float64)
    Qn = Qm / np.linalg.norm(Qm, axis=1, keepdims=True)
    spark = embeddings.sparkSession
    pairs = []
    for j in range(len(qids_np)):
        probe = np.argsort(-(cents @ Qn[j]), kind="stable")[:nprobe]
        for c in probe:
            pairs.append((int(qids_np[j]),
                          [float(x) for x in Qm[j]], int(c)))
    q = spark.createDataFrame(pairs, "q_id long, q_emb array<double>, "
                                     "cell int")

    scored = (corpus.join(F.broadcast(q), "cell")
              .filter(F.col("n_id") != F.col("q_id"))
              .withColumn("cosine", cosine_sim_col("q_emb", "n_emb")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "cosine"))


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (dedup family, driver mandate)
# ---------------------------------------------------------------------------

MAX_ORACLE_TWIN_ROWS = 1_000_000  # driver-collect cap for the oracle twin


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.99,
                        id_col: str = "vec_id",
                        emb_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine near-dup detection (the oracle-checked
    correctness baseline).

    Shape: the reference ("query") side is broadcast as one dense numpy
    matrix; the corpus side streams through ``mapInPandas`` and each Arrow
    batch is scored with a single BLAS matmul — a theta-join expressed as
    broadcast + vectorized kernel, never an interpreted per-pair loop
    (18M pairs through JVM higher-order functions measured 134 s; this
    path is < 1 s).  The driver-side collect bounds this to corpora that
    fit one machine — it exists as the ORACLE TWIN of the scale path:
    ``embedding_dup_pairs_lsh`` runs the identical threshold semantics
    with band-bucketed candidates and no collect, and is verified to
    reproduce this operator's exact pair set on the test corpora."""
    import numpy as np
    import pandas as pd

    n = embeddings.count()
    if n > MAX_ORACLE_TWIN_ROWS:
        raise ValueError(
            f"embedding_dup_pairs is the small-scale ORACLE TWIN and "
            f"collects the corpus to the driver; {n} rows exceeds its "
            f"{MAX_ORACLE_TWIN_ROWS}-row cap — use "
            f"embedding_dup_pairs_lsh (no collect) at this scale")
    pdf = embeddings.select(id_col, emb_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.array(list(pdf[emb_col]), dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    spark = embeddings.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def score(it):
        B, Bids, Bn = b_mat.value, b_ids.value, b_norms.value
        # pre-filter on the RAW cosine with a safe margin (round4 moves a
        # value by at most 5e-5 + ulp), then round only the candidate
        # entries: same pair set and identical rounded values as rounding
        # the whole matrix, without materializing a rounded copy of it.
        pre = threshold - 1e-4
        for pdf in it:
            A = np.array(list(pdf[emb_col]), dtype=np.float64)
            Aids = pdf[id_col].to_numpy(dtype=np.int64)
            if A.ndim != 2 or not len(A):
                yield pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                    "id_b": pd.Series([], dtype="int64"),
                                    "cosine": pd.Series([], dtype="float64")})
                continue
            An = np.sqrt((A * A).sum(axis=1))
            outs = []
            # chunk the matmul so peak scratch is ~3 x chunk x |B| doubles
            # (the un-chunked cos/outer/round triple was ~1.2 GB per Arrow
            # batch per worker at 24k corpus rows x 2048-row batches)
            for s in range(0, len(A), 256):
                e = min(s + 256, len(A))
                # same elementwise float ops as the original
                # (A @ B.T) / outer(An, Bn) — division by the outer
                # product, not by the factors separately, so values are
                # bit-identical
                cos = (A[s:e] @ B.T) / np.outer(An[s:e], Bn)
                cand = (cos >= pre) & (Aids[s:e, None] < Bids[None, :])
                ai, bi = np.nonzero(cand)
                if not len(ai):
                    continue
                cr = _round4_half_away(cos[ai, bi])
                keep = cr >= threshold
                outs.append((Aids[s:e][ai[keep]], Bids[bi[keep]],
                             cr[keep]))
            if outs:
                yield pd.DataFrame({
                    "id_a": np.concatenate([o[0] for o in outs]),
                    "id_b": np.concatenate([o[1] for o in outs]),
                    "cosine": np.concatenate([o[2] for o in outs])})
            else:
                yield pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                    "id_b": pd.Series([], dtype="int64"),
                                    "cosine": pd.Series([], dtype="float64")})

    return embeddings.select(id_col, emb_col).mapInPandas(
        score, "id_a long, id_b long, cosine double")


def embedding_dup_pairs_lsh(embeddings: DataFrame, dim: int,
                            threshold: float = 0.99,
                            n_bands: int = 8, band_bits: int = 8,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding") -> DataFrame:
    """Bucketed near-dup pairs: the 100 TB shape of ``embedding_dup_pairs``.

    No driver-side collect anywhere: vectors get ``n_bands`` independent
    random-hyperplane bucket ids (one Arrow-batched matmul per batch — the
    signature stage is pure map-side), candidates meet ONLY inside a
    (band, bucket) group, and each group is scored with one dense BLAS
    matmul in ``applyInPandas``.  The only shuffles are the band-bucket
    groupBy (each vector travels n_bands times) and the final pair
    distinct.  Recall: a pair at cosine c collides in one band w.p.
    (1 - acos(c)/pi)^band_bits; with 8 bands x 8 bits a 0.99-cosine pair
    is missed w.p. ~1e-4 per pair — and on the driver's deterministic
    test corpora the pair sets are verified EQUAL to the exact operator's
    (tests/test_spark_e2e.py), which is what lets this query share the
    exact oracle SQL.  Degenerate-bucket guard at scale: AQE skew-join /
    salting notes in PLANS.md §2 apply to the band join identically.
    """
    import pandas as pd

    planes = np.vstack([_hyperplanes(dim, band_bits, seed=f"dup-lsh:{b}")
                        for b in range(n_bands)])       # (bands*bits, dim)
    weights = (2 ** np.arange(band_bits)).astype(np.int64)

    def bucketize(it):
        for pdf in it:
            A = np.array(list(pdf[emb_col]), dtype=np.float64)
            signs = (A @ planes.T) > 0                   # (n, bands*bits)
            out = []
            for b in range(n_bands):
                bits = signs[:, b * band_bits:(b + 1) * band_bits]
                out.append(pd.DataFrame({
                    "band": b,
                    "bucket": bits.astype(np.int64) @ weights,
                    id_col: pdf[id_col].to_numpy(),
                    emb_col: pdf[emb_col],
                }))
            yield pd.concat(out, ignore_index=True)

    # re-emit the embedding column with its INPUT type: hardcoding
    # array<float> would silently truncate double-typed embeddings in
    # the Arrow round-trip and score different cosines than the exact
    # operator this path must reproduce
    emb_type = embeddings.schema[emb_col].dataType.simpleString()
    bucketed = embeddings.select(id_col, emb_col).mapInPandas(
        bucketize, f"band int, bucket long, {id_col} long, "
                   f"{emb_col} {emb_type}")

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        A = np.array(list(pdf[emb_col]), dtype=np.float64)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        norms = np.sqrt((A * A).sum(axis=1))
        cos = _round4_half_away((A @ A.T) / np.outer(norms, norms))
        ai, bi = np.nonzero((cos >= threshold)
                            & (ids[:, None] < ids[None, :]))
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi],
                             "cosine": cos[ai, bi]})

    pairs = (bucketed.groupBy("band", "bucket")
             .applyInPandas(score_bucket,
                            "id_a long, id_b long, cosine double"))
    # a pair can surface from several bands; keep one row (cosine is the
    # same exact computation everywhere — max() just makes the pick lazy
    # and deterministic)
    return (pairs.groupBy("id_a", "id_b")
            .agg(F.max("cosine").alias("cosine")))


def embedding_dup_pairs_sql(table: str = "embeddings",
                            threshold: float = 0.99) -> str:
    return f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM {table})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / sqrt(list_dot_product(a.v, a.v)
                        * list_dot_product(b.v, b.v)), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / sqrt(list_dot_product(a.v, a.v)
                       * list_dot_product(b.v, b.v)), 4) >= {threshold}
    """


# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-dedup over embeddings (Abbas et al. 2023,
# arXiv:2303.09540 — the published semantic-dedup recipe for web-scale
# training corpora; the reference has no embedding pipeline, this is
# part of the LLM-data operator family the driver mandates)
# ---------------------------------------------------------------------------

def semdedup(embeddings: DataFrame, dim: int, eps: float = 0.96,
             nlist: int = 16, iters: int = 5,
             id_col: str = "vec_id",
             emb_col: str = "embedding") -> DataFrame:
    """Semantic dedup: spherical k-means clusters (the shared
    deterministic Lloyd trainer), then WITHIN each cluster an item is
    dropped when a higher-priority item sits within ``eps`` cosine —
    priority = closer to the cluster centroid (rounded cosine, vec_id
    ascending as the tie-break), i.e. the canonical keep-the-
    representative rule.  Returns (vec_id, cluster_id, centroid_cos,
    kept).

    Scale shape: pairwise work happens ONLY inside a cluster — which is
    SemDeDup's entire point at 10^12 rows: clusters bound the quadratic
    term the way LSH bands do for minhash.  Centroids are broadcast,
    the assignment is map-side, and the per-cluster scoring is ONE
    grouped Arrow batch with a dense BLAS matmul (``applyInPandas``),
    never a per-pair interpreted join — the same kernel discipline as
    ``embedding_dup_pairs_lsh``.  One shuffle total (groupBy cluster)."""
    import pandas as pd

    cents = train_ivf_centroids_sampled(embeddings, dim, nlist, iters,
                                        id_col=id_col, emb_col=emb_col)
    ac = _assign_cell_cos_udf(cents)(F.col(emb_col))
    rows = (embeddings
            .select(F.col(id_col).alias("vec_id"),
                    F.col(emb_col).alias("emb"), ac.alias("_ac"))
            .select("vec_id", "emb",
                    F.col("_ac.cell").alias("cluster_id"),
                    F.col("_ac.ccos").alias("centroid_cos")))

    def dedup_cluster(pdf: "pd.DataFrame") -> "pd.DataFrame":
        M = np.array(list(pdf["emb"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        cc = pdf["centroid_cos"].to_numpy(dtype=np.float64)
        norms = np.sqrt((M * M).sum(axis=1))
        cos = np.round((M @ M.T) / np.outer(norms, norms), 4)
        # higher[j, i]: item i outranks item j (closer to the centroid,
        # id ascending as tie-break)
        higher = (cc[None, :] > cc[:, None]) \
            | ((cc[None, :] == cc[:, None]) & (ids[None, :] < ids[:, None]))
        dropped = ((cos >= eps) & higher).any(axis=1)
        return pd.DataFrame({
            "vec_id": ids, "cluster_id": pdf["cluster_id"].to_numpy(),
            "centroid_cos": cc,
            "kept": np.where(dropped, 0, 1).astype(np.int32)})

    return rows.groupBy("cluster_id").applyInPandas(
        dedup_cluster,
        "vec_id long, cluster_id int, centroid_cos double, kept int")


def semdedup_numpy(ids: np.ndarray, mat: np.ndarray, eps: float = 0.96,
                   nlist: int = 16, iters: int = 5) -> list[tuple]:
    """Single-machine twin of ``semdedup`` (oracle): replays the exact
    quantized Lloyd training, assignment, rounded cosines and the
    higher-priority-neighbor drop rule."""
    M = mat.astype(np.float64)
    norms = np.linalg.norm(M, axis=1)
    Mn = M / norms[:, None]
    C = lloyd_centroids(train_sample_numpy(ids, M), nlist, iters)
    sims = Mn @ C.T
    assign = sims.argmax(axis=1)
    ccos = np.round(sims.max(axis=1), 4)
    out = []
    for c in range(nlist):
        sel = np.nonzero(assign == c)[0]
        if sel.size == 0:
            continue
        sub_ids = ids[sel]
        cc = ccos[sel]
        cos = np.round((M[sel] @ M[sel].T)
                       / np.outer(norms[sel], norms[sel]), 4)
        for j in range(sel.size):
            higher = ((cc > cc[j])
                      | ((cc == cc[j]) & (sub_ids < sub_ids[j])))
            kept = 0 if bool((cos[j][higher] >= eps).any()) else 1
            out.append((int(sub_ids[j]), int(c), float(cc[j]), kept))
    return sorted(out)
