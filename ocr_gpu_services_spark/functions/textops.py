"""Text-cleanup / scalar string operators as built-in expressions
(operators P11, P12-lite, §2.7 scalar inventory).

``clean_text_col`` is the exact Spark twin of the reference's
``_filter_text`` (/root/reference/src/ml/classifier/utils/filters.py:13-44),
step for step:

1. remove digits                      regexp_replace(\\d+)
2. drop punctuation + lowercase       translate + lower (char-level, same set
                                      as string.punctuation)
3. collapse whitespace + strip        regexp_replace(\\s+) + trim
4. remove urls                        regexp_replace(http\\S+)
5. remove Spanish stopwords           filter() higher-order fn — NOT
                                      array_except, which would dedup and
                                      break multiset semantics (SURVEY §2.3 J2)

Each step stays in whole-stage codegen.  ``clean_text_sql`` emits the DuckDB
oracle twin generated from the same constants.
"""

from __future__ import annotations

import string

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.stopwords import SPANISH_STOPWORDS

PUNCT = string.punctuation  # !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~


def clean_text_col(col: Column) -> Column:
    t = col.cast("string")
    t = F.regexp_replace(t, r"\d+", "")
    t = F.lower(F.translate(t, PUNCT, ""))
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    t = F.regexp_replace(t, r"http\S+", "")
    words = F.split(t, " ")
    stop = F.array(*[F.lit(w) for w in SPANISH_STOPWORDS])
    kept = F.filter(words, lambda w: (w != "") & ~F.array_contains(stop, w))
    return F.array_join(kept, " ")


def clean_text_sql(expr: str) -> str:
    """DuckDB twin of clean_text_col (same step order, same constants)."""
    punct_escaped = PUNCT.replace("'", "''")
    stop_list = ", ".join("'" + w.replace("'", "''") + "'"
                          for w in SPANISH_STOPWORDS)
    t = f"CAST({expr} AS VARCHAR)"
    t = f"regexp_replace({t}, '\\d+', '', 'g')"
    t = f"lower(translate({t}, '{punct_escaped}', ''))"
    t = f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"
    t = f"regexp_replace({t}, 'http\\S+', '', 'g')"
    return (f"array_to_string(list_filter(string_split({t}, ' '), "
            f"w -> w <> '' AND NOT list_contains([{stop_list}], w)), ' ')")


def token_count_col(col: Column) -> Column:
    """Whitespace token count (text-analysis operator)."""
    t = F.trim(col.cast("string"))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("int")


# ---------------------------------------------------------------------------
# BPE-ish token counting (text-analysis operator for the training-data
# pipeline: letter runs | single digits | single punctuation, the
# GPT-2-style pre-tokenizer shape, minus lookaheads so the same pattern is
# valid in both Java regex (Spark) and RE2 (DuckDB oracle)
# ---------------------------------------------------------------------------

# explicit ASCII whitespace class: Java's \s and RE2's \s disagree on \x0b
BPE_PATTERN = "[a-záéíóúüñ]+|[0-9]|[^a-záéíóúüñ0-9 \\t\\n\\r\\f]"


def bpe_token_count_col(col: Column) -> Column:
    t = F.lower(col.cast("string"))
    return F.size(F.regexp_extract_all(t, F.lit(BPE_PATTERN), 0)).cast("int")


def bpe_token_count_sql(expr: str) -> str:
    # DuckDB string literals keep backslashes verbatim, so the Python
    # pattern (which holds real backslash+t sequences) is passed as-is
    # and RE2 interprets \t itself — do NOT re-escape
    return (f"CAST(len(regexp_extract_all(lower(CAST({expr} AS VARCHAR)), "
            f"'{BPE_PATTERN}')) AS INTEGER)")


def ws_token_count_sql(expr: str) -> str:
    """DuckDB twin of token_count_col (whitespace tokens)."""
    t = f"trim(CAST({expr} AS VARCHAR))"
    return (f"CAST(CASE WHEN {t} = '' THEN 0 ELSE "
            f"len(string_split_regex({t}, '\\s+')) END AS INTEGER)")


# ---------------------------------------------------------------------------
# P12: explicit NFC + whitespace canonicalization (north-star requirement).
# Spark has no NFC built-in, so this is the one deliberately-Python scalar
# op — an Arrow-batched pandas_udf, never row-at-a-time.  DuckDB oracle:
# nfc_normalize(trim(regexp_replace(..))).
# ---------------------------------------------------------------------------

_CANON_WS = "[ \\t\\n\\r\\f]+"  # ASCII class: RE2 \s has no \x0b either


def nfc_canon_udf():
    import re as _re
    import unicodedata as _ud

    from pyspark.sql.functions import pandas_udf

    ws = _re.compile(_CANON_WS)

    def _canon(s):  # no annotations: resolved via the explicit return type
        return s.map(lambda x: None if x is None else
                     _ud.normalize("NFC", ws.sub(" ", x).strip()))

    return pandas_udf(_canon, "string")


def nfc_canon_sql(expr: str) -> str:
    return (f"nfc_normalize(trim(regexp_replace(CAST({expr} AS VARCHAR), "
            f"'{_CANON_WS}', ' ', 'g')))")
