"""Layout-matching document classifier (reference operators J1-J4, A5, A6,
U7): match a sample document's word boxes against a small set of reference
templates and pick the min-cost template.

Reference pipeline (/root/reference/src/ml/classifier/model.py:168-306,
utils/pairing.py, utils/filters.py):
1. shared-vocab filter: keep words whose cleaned text both docs share
   (multiset semantics, Counter & — filters.py:83-86)            -> equi-join
2. word-equality cross match (np.equal.outer, model.py:238-244)  -> same join
3. Hungarian assignment on the distance cost matrix (model.py:282)
4. z-score outlier trim of matched costs (filters.py:113-139)
5. normalized total cost (pairing.py:14-40); argmin over templates
   with a cost threshold (model.py:180-191)                      -> min_by

Spark shape: templates are tiny -> broadcast; the per-(doc, template) cost
is computed in a grouped ``applyInPandas`` kernel (the cost matrix is
n_words² per pair — it never leaves one task).  The Hungarian solver is a
from-scratch O(n³) implementation (public algorithm; scipy is not in this
container).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Hungarian algorithm (Jonker-style potentials; O(n^3)); public knowledge
# ---------------------------------------------------------------------------

def hungarian(cost: np.ndarray) -> tuple[list[int], list[int]]:
    """Min-cost assignment on a rectangular matrix; returns (row_ind, col_ind)
    like scipy.optimize.linear_sum_assignment."""
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)      # p[j] = row matched to column j (1-based)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [math.inf] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], math.inf, 0
            for j in range(1, m + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            p[j0] = p[way[j0]]
            j0 = way[j0]
    rows, cols = [], []
    for j in range(1, m + 1):
        if p[j]:
            rows.append(p[j] - 1)
            cols.append(j - 1)
    order = np.argsort(rows)
    rows = [rows[k] for k in order]
    cols = [cols[k] for k in order]
    if transposed:
        rows, cols = cols, rows
    return rows, cols


# ---------------------------------------------------------------------------
# per-(doc, template) cost — the grouped kernel body
# ---------------------------------------------------------------------------

def _pair_cost(sample: pd.DataFrame, template: pd.DataFrame,
               z_thresh: float = 2.0) -> float:
    """Normalized layout cost between one sample doc and one template,
    following the reference's steps (see module docstring)."""
    # 1-2. shared-vocab multiset filter via word-equality merge
    merged = sample.merge(template, on="word", suffixes=("_s", "_t"))
    if merged.empty:
        return float("inf")
    # distance cost between matched bbox centers (normalized coords)
    sx = (merged.x_s + merged.w_s / 2.0)
    sy = (merged.y_s + merged.h_s / 2.0)
    tx = (merged.x_t + merged.w_t / 2.0)
    ty = (merged.y_t + merged.h_t / 2.0)
    # build cost matrix over distinct sample-words x template-words of the
    # shared vocab (equality pairs only get finite cost, like equal.outer)
    s_idx = {k: i for i, k in enumerate(
        merged[["word", "x_s", "y_s"]].drop_duplicates().itertuples(index=False))}
    t_idx = {k: i for i, k in enumerate(
        merged[["word", "x_t", "y_t"]].drop_duplicates().itertuples(index=False))}
    big = 1e6
    cost = np.full((len(s_idx), len(t_idx)), big)
    for r in range(len(merged)):
        srow = (merged.word.iat[r], merged.x_s.iat[r], merged.y_s.iat[r])
        trow = (merged.word.iat[r], merged.x_t.iat[r], merged.y_t.iat[r])
        i = s_idx[tuple(srow)]
        j = t_idx[tuple(trow)]
        d = math.hypot(sx.iat[r] - tx.iat[r], sy.iat[r] - ty.iat[r])
        cost[i, j] = min(cost[i, j], d)
    # 3. Hungarian assignment
    rows, cols = hungarian(cost)
    selected = np.array([cost[i, j] for i, j in zip(rows, cols)
                         if cost[i, j] < big])
    if selected.size == 0:
        return float("inf")
    # 4. z-score outlier trim (filters.py:113-139; sigma=0 keeps all)
    if selected.size > 1:
        sd = selected.std(ddof=0)
        if sd > 0:
            z = (selected - selected.mean()) / sd
            selected = selected[np.abs(z) <= z_thresh]
    if selected.size == 0:
        return float("inf")
    # 5. normalized cost (pairing.py:14-40 shape: mean cost, log-damped)
    mean_cost = selected.mean()
    return float(np.log1p(mean_cost))


def classify_against_templates(words: DataFrame, template_words: pd.DataFrame,
                               cost_threshold: float = 2.0,
                               id_type: str = "long") -> DataFrame:
    """words: (doc_id, word, x, y, w, h) one row per sample word.
    template_words: small pandas df (template_id, word, x, y, w, h) —
    broadcast to every task.  Returns (doc_id, template_id, cost) argmin
    per doc with the reference's threshold-reject (model.py:180-191).
    ``id_type`` lets callers key docs by url (string) instead of a long."""
    spark = words.sparkSession
    tpl_b = spark.sparkContext.broadcast(template_words)

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf.doc_id.iat[0]
        tpls = tpl_b.value
        best_t, best_c = None, float("inf")
        for tid, tdf in tpls.groupby("template_id"):
            c = _pair_cost(pdf, tdf)
            if c < best_c:
                best_t, best_c = int(tid), c
        if best_t is None or best_c > cost_threshold:
            return pd.DataFrame({"doc_id": [doc_id], "template_id": [-1],
                                 "cost": [float("inf")]})
        return pd.DataFrame({"doc_id": [doc_id], "template_id": [best_t],
                             "cost": [round(best_c, 6)]})

    return (words.groupBy("doc_id")
            .applyInPandas(per_doc,
                           f"doc_id {id_type}, template_id int, cost double"))


def classify_extracted(extracted: DataFrame, template_words: pd.DataFrame,
                       cost_threshold: float = 2.0) -> DataFrame:
    """U7 wired into the flagship (the reference's classification route
    initializes the layout classifier at src/ml/__init__.py:24-30 and runs
    it over OCR output): match each document's kernel-produced WORD spans
    against the template set and left-join (layout_template, layout_cost)
    back onto the extraction output.  Docs without word spans (plain html
    text, empty pages) keep NULLs — the classifier is an optional
    enrichment, exactly like the reference's optional route."""
    words = (extracted.select("url", F.explode("spans").alias("s"))
             .filter(F.col("s.kind") == "word")
             .select(F.col("url").alias("doc_id"),
                     F.lower(F.col("s.text")).alias("word"),
                     F.col("s.x0").alias("x"), F.col("s.y0").alias("y"),
                     (F.col("s.x1") - F.col("s.x0")).alias("w"),
                     (F.col("s.y1") - F.col("s.y0")).alias("h")))
    cls = classify_against_templates(words, template_words,
                                     cost_threshold, id_type="string")
    cls = cls.select(F.col("doc_id").alias("url"),
                     F.col("template_id").alias("layout_template"),
                     F.col("cost").alias("layout_cost"))
    return extracted.join(cls, "url", "left")
