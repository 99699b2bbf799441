"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

from .conftest import SF_SMOKE, assert_parity


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "mes" in df.columns and "taxa_variacao_media" in df.columns


def test_every_query_has_callable_and_runs(spark):
    import __spark_entry__ as e

    qs = e.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name


def test_all_queries_match_oracle_sf0001(spark, duck):
    """Every SQL-expressible query hash-matches DuckDB at sf0.001
    (the driver repeats this at sf0.01)."""
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    for name, fn in e.queries().items():
        if name not in oracles:
            continue
        assert_parity(fn(spark, SF_SMOKE), duck, oracles[name])
