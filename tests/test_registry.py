"""Registry invariants: every query has a DuckDB oracle except the two
whose correctness gate is golden byte-identity (extract_e2e, spans_flatten);
lazy oracles resolve to valid SQL strings."""

from ocr_gpu_services_spark.plans.queries import QUERIES, resolve_oracles

GOLDEN_GATED = {"extract_e2e", "spans_flatten"}


def test_every_query_is_oracled_or_golden_gated():
    oracles = resolve_oracles()
    missing = set(QUERIES) - set(oracles) - GOLDEN_GATED
    assert not missing, f"queries without any value-level gate: {missing}"
    assert GOLDEN_GATED <= set(QUERIES)
    assert not (GOLDEN_GATED & set(oracles))


def test_lazy_oracles_resolve_to_sql_strings():
    for name, sql in resolve_oracles().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_spark_entry_contract_shape():
    import __spark_entry__ as e
    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert set(qs) - set(os_) == GOLDEN_GATED
