"""Local replica of the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle at sf0.01, compare row count + column names +
order-insensitive values.

Usage: python tools/check_queries.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from ocr_gpu_services_spark.plans.queries import (  # noqa: E402
    QUERIES, resolve_oracles)
from ocr_gpu_services_spark.session import get_spark  # noqa: E402

ORACLE = resolve_oracles()

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# Value-representation CLASS of a column type.  The driver's typed value
# hash tolerates width/flavor differences inside a class (int vs bigint,
# timestamp_ntz vs timestamp, double vs decimal — all were green in r2) but
# breaks when the pandas-side value representation changes class: DuckDB
# HUGEINT (an uncast integer sum()) converts to float64 (3 -> 3.0) while
# Spark emits BIGINT — the exact round-2 para_dedup red row, which this
# replica's stringify compare was blind to.  HUGEINT gets its own class so
# it mismatches EVERYTHING: an oracle should never emit it.
_INT = {"tinyint", "smallint", "int", "integer", "bigint", "ubigint",
        "utinyint", "usmallint", "uinteger"}
_FLOAT = {"float", "double", "real"}
_TS = {"timestamp", "timestamp_ntz", "timestamp_ltz",
       "timestamp with time zone"}


def type_class(t) -> str:
    s = str(t).lower().replace(" ", "")
    if s.endswith("[]"):
        return f"array<{type_class(s[:-2])}>"
    if s.startswith("array<") and s.endswith(">"):
        return f"array<{type_class(s[6:-1])}>"
    if s in _INT:
        return "int"
    if s in _FLOAT or s.startswith("decimal"):
        return "float"
    if s in _TS:
        return "timestamp"
    if s == "varchar":
        return "string"
    if s == "blob":
        return "binary"
    return s  # hugeint, string, boolean, date, binary, structs, ...


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main(names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    spark = get_spark(app="check-queries", cores=8, shuffle_partitions=16)
    failed = []
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            stypes = dict(sdf.dtypes)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in ORACLE:
            print(f"ok?  {name}: rows-only ({len(srows)} rows) [no oracle]")
            if len(srows) == 0 and name != "anti_join_parts":
                print(f"     WARNING: zero rows")
            continue
        try:
            rel = con.sql(ORACLE[name])
            dcols = [c for c in rel.columns]
            dtypes = dict(zip(dcols, rel.types))
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            failed.append(name)
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        type_mism = [
            (c, stypes[c], str(dtypes[c]))
            for c in scols if c in dtypes
            and type_class(stypes[c]) != type_class(dtypes[c])]
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            failed.append(name)
        elif type_mism:
            print(f"FAIL {name}: column TYPE mismatch (driver's typed hash "
                  f"would differ): "
                  + ", ".join(f"{c}: spark={s} duck={d}"
                              for c, s, d in type_mism))
            failed.append(name)
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
            failed.append(name)
        elif sr != dr:
            bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            print(f"FAIL {name}: {len(bad)} differing rows of {len(sr)}; "
                  f"first: spark={sr[bad[0]]} duck={dr[bad[0]]}")
            failed.append(name)
        else:
            print(f"PASS {name}: {len(sr)} rows")
    spark.stop()
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nALL PASS")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
