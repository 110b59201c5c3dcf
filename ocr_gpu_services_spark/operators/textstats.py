"""Text-analysis operators over a documents table: token counting, quality
scoring, language ID, fingerprinting.

These are the training-data-pipeline operators the engine needs beyond the
reference's surface (driver mandate), built in the same style as the
reference's scalar text ops (§2.7): pure built-in expressions, no UDFs.
Every operator has a DuckDB SQL twin generated from the SAME constants so
the correctness gate cross-checks engine vs oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.stopwords import ENGLISH_STOPWORDS, SPANISH_STOPWORDS

# ---------------------------------------------------------------------------
# shared tokenization: lowercase, strip non-alphanumerics, whitespace split
# ---------------------------------------------------------------------------

def tokens_col(col: Column) -> Column:
    t = F.lower(col.cast("string"))
    t = F.regexp_replace(t, r"[^a-z0-9áéíóúüñ\s]", " ")
    return F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")


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
    stop = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
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
    en = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    es = F.array(*[F.lit(w) for w in SPANISH_STOPWORDS])
    n_en = F.size(F.filter(toks, lambda w: F.array_contains(en, w)))
    n_es = F.size(F.filter(toks, lambda w: F.array_contains(es, w)))
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
