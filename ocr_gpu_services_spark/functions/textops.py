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
