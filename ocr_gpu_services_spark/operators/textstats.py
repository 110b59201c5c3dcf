"""Text-analysis operators over a documents table: token counting, quality
scoring, language ID, fingerprinting.

These are the training-data-pipeline operators the engine needs beyond the
reference's surface (driver mandate), built in the same style as the
reference's scalar text ops (§2.7): pure built-in expressions, no UDFs.
Every operator has a DuckDB SQL twin generated from the SAME constants so
the correctness gate cross-checks engine vs oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.stopwords import ENGLISH_STOPWORDS, SPANISH_STOPWORDS

# ---------------------------------------------------------------------------
# shared tokenization: lowercase, strip non-alphanumerics, whitespace split
# ---------------------------------------------------------------------------

def tokens_col(col: Column) -> Column:
    # Extracting maximal token-char runs is equivalent to the oracle's
    # replace-then-split-on-\s+ (tokens are exactly the maximal runs of
    # allowed chars; delimiters never survive), but stays entirely in
    # codegen: the former split + filter(HOF) pair paid an interpreted
    # lambda per array element — measured 2.9 s vs 0.4 s per corpus pass
    # at sf1.0 for this one expression.
    t = F.lower(col.cast("string"))
    return F.regexp_extract_all(t, F.lit(r"[a-z0-9áéíóúüñ]+"), F.lit(0))


def tokens_sql(expr: str) -> str:
    t = f"lower(CAST({expr} AS VARCHAR))"
    t = f"regexp_replace({t}, '[^a-z0-9áéíóúüñ\\s]', ' ', 'g')"
    return (f"list_filter(string_split_regex(trim({t}), '\\s+'), "
            f"w -> w <> '')")


# ---------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword ratios
# ---------------------------------------------------------------------------

def quality_cols(text_col: str = "text") -> dict[str, Column]:
    t = F.col(text_col).cast("string")
    toks = tokens_col(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    # isin over >10 literals becomes an InSet hash probe (O(1) per token)
    # vs array_contains' linear scan over the stopword array
    n_stop = F.size(F.filter(toks, lambda w: w.isin(ENGLISH_STOPWORDS)))
    avg_wlen = F.when(n_tokens > 0,
                      F.round(F.aggregate(toks, F.lit(0),
                                          lambda a, w: a + F.length(w))
                              .cast("double") / n_tokens, 4)).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0,
                        F.round(n_stop.cast("double") / n_tokens, 4)) \
                  .otherwise(0.0)
    punct_ratio = F.when(n_chars > 0,
                         F.round(n_punct.cast("double") / n_chars, 4)) \
                   .otherwise(0.0)
    quality_ok = ((n_tokens >= 10) & (avg_wlen >= 2.0) & (avg_wlen <= 12.0)
                  & (punct_ratio <= 0.2)).cast("int")
    return {"n_tokens": n_tokens.cast("int"), "n_chars": n_chars.cast("int"),
            "avg_word_len": avg_wlen, "stopword_ratio": stop_ratio,
            "punct_ratio": punct_ratio, "quality_ok": quality_ok}


def quality_sql(text_expr: str) -> dict[str, str]:
    t = f"CAST({text_expr} AS VARCHAR)"
    toks = tokens_sql(t)
    stop_list = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    n_tokens = f"len({toks})"
    n_chars = f"length({t})"
    n_punct = f"({n_chars} - length(regexp_replace({t}, '[^\\w\\s]', '', 'g')))"
    n_stop = f"len(list_filter({toks}, w -> list_contains([{stop_list}], w)))"
    avg_wlen = (f"(CASE WHEN {n_tokens} > 0 THEN round(CAST(list_sum("
                f"list_transform({toks}, w -> length(w))) AS DOUBLE) "
                f"/ {n_tokens}, 4) ELSE 0.0 END)")
    stop_ratio = (f"(CASE WHEN {n_tokens} > 0 THEN "
                  f"round(CAST({n_stop} AS DOUBLE) / {n_tokens}, 4) "
                  f"ELSE 0.0 END)")
    punct_ratio = (f"(CASE WHEN {n_chars} > 0 THEN "
                   f"round(CAST({n_punct} AS DOUBLE) / {n_chars}, 4) "
                   f"ELSE 0.0 END)")
    quality_ok = (f"(CASE WHEN {n_tokens} >= 10 AND {avg_wlen} >= 2.0 AND "
                  f"{avg_wlen} <= 12.0 AND {punct_ratio} <= 0.2 "
                  f"THEN 1 ELSE 0 END)")
    return {"n_tokens": f"CAST({n_tokens} AS INTEGER)",
            "n_chars": f"CAST({n_chars} AS INTEGER)",
            "avg_word_len": avg_wlen, "stopword_ratio": stop_ratio,
            "punct_ratio": punct_ratio, "quality_ok": quality_ok}


# ---------------------------------------------------------------------------
# language ID: stopword-hit heuristic (n-gram-free, deterministic)
# ---------------------------------------------------------------------------

def langid_col(text_col: str = "text") -> Column:
    toks = tokens_col(F.col(text_col))
    n_en = F.size(F.filter(toks, lambda w: w.isin(ENGLISH_STOPWORDS)))
    n_es = F.size(F.filter(toks, lambda w: w.isin(SPANISH_STOPWORDS)))
    return (F.when(n_en > n_es, F.lit("en"))
             .when(n_es > n_en, F.lit("es"))
             .otherwise(F.lit("und")))


def langid_sql(text_expr: str) -> str:
    toks = tokens_sql(text_expr)
    en_list = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    es_list = ", ".join("'" + w.replace("'", "''") + "'"
                        for w in SPANISH_STOPWORDS)
    n_en = f"len(list_filter({toks}, w -> list_contains([{en_list}], w)))"
    n_es = f"len(list_filter({toks}, w -> list_contains([{es_list}], w)))"
    return (f"(CASE WHEN {n_en} > {n_es} THEN 'en' "
            f"WHEN {n_es} > {n_en} THEN 'es' ELSE 'und' END)")


# ---------------------------------------------------------------------------
# fingerprint: md5 over canonicalized token stream (exact-dedup key)
# ---------------------------------------------------------------------------

def fingerprint_col(text_col: str = "text") -> Column:
    return F.md5(F.array_join(tokens_col(F.col(text_col)), " "))


def fingerprint_sql(text_expr: str) -> str:
    return f"md5(array_to_string({tokens_sql(text_expr)}, ' '))"


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, published filter
# thresholds, the subset expressible identically in Spark and the DuckDB
# oracle): word-count bounds, mean word length bounds, alphabetic-word
# ratio, minimum stopword hits, and duplicate-token fraction.
# ---------------------------------------------------------------------------

GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_cols(text_col: str = "text") -> dict:
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    total_chars = F.aggregate(toks, F.lit(0),
                              lambda a, w: a + F.length(w))
    mean_len = F.when(n > 0, total_chars.cast("double") / n).otherwise(0.0)
    alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-záéíóúüñ]")))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n).otherwise(0.0)
    stop_hits = F.size(F.filter(
        toks, lambda w: w.isin(*[F.lit(s) for s in GOPHER_STOPS])))
    dup_frac = F.when(
        n > 0, 1.0 - F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(0.0)
    keep = ((n >= 20) & (n <= 100000)
            & (mean_len >= 3.0) & (mean_len <= 10.0)
            & (alpha_ratio >= 0.8) & (stop_hits >= 2) & (dup_frac <= 0.5))
    return {
        "n_words": n.cast("int"),
        "mean_word_len": F.round(mean_len, 4),
        "alpha_ratio": F.round(alpha_ratio, 4),
        "stop_hits": stop_hits.cast("int"),
        "dup_frac": F.round(dup_frac, 4),
        "gopher_keep": keep,
    }


# ---------------------------------------------------------------------------
# bound (single-tokenization) DataFrame-level stats
#
# The expression-level helpers above embed the tokenizer in EVERY derived
# column; Catalyst cannot share them (subexpression elimination skips any
# tree containing lambda variables, SPARK-35410), so e.g. gopher_cols
# re-tokenizes each row ~17x (once per reference across the output columns
# and the combined keep flag).  bind_stats evaluates the tokenizer ONCE by
# binding it to a real column in its own Project: CollapseProject keeps a
# non-cheap alias that is referenced more than once, so the producer/
# consumer Project pair survives optimization and every stat reads the
# materialized array.  Values are expression-for-expression identical to
# the *_cols/*_sql versions (same rounding, same unrounded keep guards).
# ---------------------------------------------------------------------------

def bind_stats(df, text_col: str = "text", *, quality: bool = False,
               gopher: bool = False, lang: bool = False,
               fp: bool = False) -> tuple:
    """Append hidden bound columns to ``df`` and return (df, cols) where
    ``cols`` maps output stat name -> Column.  Callers select what they
    need; unused intermediates are pruned by the optimizer."""
    t = F.col(text_col).cast("string")
    df = df.withColumn("_ts_toks", tokens_col(t))
    toks = F.col("_ts_toks")
    need_n = quality or gopher
    need_total = quality or gopher
    if need_n:
        df = df.withColumn("_ts_n", F.size(toks))
    n = F.col("_ts_n")
    if need_total:
        df = df.withColumn(
            "_ts_total",
            F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)))
    total = F.col("_ts_total")
    cols: dict = {}
    if fp:
        cols["fingerprint"] = F.md5(F.array_join(toks, " "))
    if lang:
        df = (df.withColumn("_ts_nen", F.size(F.filter(
                    toks, lambda w: w.isin(ENGLISH_STOPWORDS))))
                .withColumn("_ts_nes", F.size(F.filter(
                    toks, lambda w: w.isin(SPANISH_STOPWORDS)))))
        cols["lang_pred"] = (
            F.when(F.col("_ts_nen") > F.col("_ts_nes"), F.lit("en"))
             .when(F.col("_ts_nes") > F.col("_ts_nen"), F.lit("es"))
             .otherwise(F.lit("und")))
    if quality:
        df = (df.withColumn("_ts_chars", F.length(t))
                .withColumn("_ts_punct",
                            F.col("_ts_chars") - F.length(
                                F.regexp_replace(t, r"[^\w\s]", "")))
                .withColumn("_ts_nstop", F.size(F.filter(
                    toks, lambda w: w.isin(ENGLISH_STOPWORDS)))))
        df = (df.withColumn("_ts_avg",
                            F.when(n > 0, F.round(
                                total.cast("double") / n, 4))
                             .otherwise(0.0))
                .withColumn("_ts_pr",
                            F.when(F.col("_ts_chars") > 0, F.round(
                                F.col("_ts_punct").cast("double")
                                / F.col("_ts_chars"), 4)).otherwise(0.0)))
        cols["n_tokens"] = n.cast("int")
        cols["n_chars"] = F.col("_ts_chars").cast("int")
        cols["avg_word_len"] = F.col("_ts_avg")
        cols["stopword_ratio"] = (
            F.when(n > 0, F.round(
                F.col("_ts_nstop").cast("double") / n, 4)).otherwise(0.0))
        cols["punct_ratio"] = F.col("_ts_pr")
        cols["quality_ok"] = (
            (n >= 10) & (F.col("_ts_avg") >= 2.0)
            & (F.col("_ts_avg") <= 12.0)
            & (F.col("_ts_pr") <= 0.2)).cast("int")
    if gopher:
        # keep guards use the UNROUNDED mean/dup ratios, exactly like
        # gopher_cols / gopher_sql
        df = (df.withColumn("_ts_mean",
                            F.when(n > 0, total.cast("double") / n)
                             .otherwise(0.0))
                .withColumn("_ts_alpha", F.size(F.filter(
                    toks, lambda w: w.rlike("[a-záéíóúüñ]"))))
                .withColumn("_ts_ghits", F.size(F.filter(
                    toks, lambda w: w.isin(
                        *[F.lit(s) for s in GOPHER_STOPS]))))
                .withColumn("_ts_dup",
                            F.when(n > 0, 1.0 - F.size(
                                F.array_distinct(toks)).cast("double") / n)
                             .otherwise(0.0)))
        df = df.withColumn(
            "_ts_aratio",
            F.when(n > 0, F.col("_ts_alpha").cast("double") / n)
             .otherwise(0.0))
        cols["n_words"] = n.cast("int")
        cols["mean_word_len"] = F.round(F.col("_ts_mean"), 4)
        cols["alpha_ratio"] = F.round(F.col("_ts_aratio"), 4)
        cols["stop_hits"] = F.col("_ts_ghits").cast("int")
        cols["dup_frac"] = F.round(F.col("_ts_dup"), 4)
        cols["gopher_keep"] = (
            (n >= 20) & (n <= 100000)
            & (F.col("_ts_mean") >= 3.0) & (F.col("_ts_mean") <= 10.0)
            & (F.col("_ts_aratio") >= 0.8)
            & (F.col("_ts_ghits") >= 2) & (F.col("_ts_dup") <= 0.5))
    return df, cols


def gopher_sql(text_expr: str) -> dict:
    toks = tokens_sql(text_expr)
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    n = f"len({toks})"
    total = f"list_sum(list_transform({toks}, w -> length(w)))"
    mean_len = (f"(CASE WHEN {n} > 0 THEN CAST({total} AS DOUBLE) / {n} "
                f"ELSE 0.0 END)")
    alpha = (f"len(list_filter({toks}, "
             f"w -> regexp_matches(w, '[a-záéíóúüñ]')))")
    alpha_ratio = (f"(CASE WHEN {n} > 0 THEN CAST({alpha} AS DOUBLE) / {n} "
                   f"ELSE 0.0 END)")
    stop_hits = f"len(list_filter({toks}, w -> w IN ({stops})))"
    dup = (f"(CASE WHEN {n} > 0 THEN 1.0 - "
           f"CAST(len(list_distinct({toks})) AS DOUBLE) / {n} "
           f"ELSE 0.0 END)")
    keep = (f"({n} >= 20 AND {n} <= 100000 AND {mean_len} >= 3.0 "
            f"AND {mean_len} <= 10.0 AND {alpha_ratio} >= 0.8 "
            f"AND {stop_hits} >= 2 AND {dup} <= 0.5)")
    return {"n_words": f"CAST({n} AS INTEGER)",
            "mean_word_len": f"round({mean_len}, 4)",
            "alpha_ratio": f"round({alpha_ratio}, 4)",
            "stop_hits": f"CAST({stop_hits} AS INTEGER)",
            "dup_frac": f"round({dup}, 4)",
            "gopher_keep": keep}
