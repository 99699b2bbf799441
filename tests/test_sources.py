"""Source-layer tests: manifest filtering (op01/02), header inference +
wide normalization (op04/05/09/10), bootstrap + health check (op07/08)."""

from __future__ import annotations

import pandas as pd
import pytest

from .conftest import SF_SMOKE


def test_filter_resources(spark):
    from ida_dataengineerproject_spark.sources.manifest import (
        Resource,
        filter_resources,
        manifest_df,
    )

    res = [
        Resource("IDA SMP 2018 dados", "http://x/1.ods", "ODS"),
        Resource("IDA STFC 2017", "http://x/2.ods", "ods"),
        Resource("IDA SCM 2016", "http://x/3.ods", "ods"),  # year out of range
        Resource("Relatório anual 2018", "http://x/4.pdf", "pdf"),  # no service
        Resource("IDA SMP 2019", "http://x/5.ods", "ods"),
    ]
    out = filter_resources(manifest_df(spark, res)).collect()
    got = {(r.servico, r.ano) for r in out}
    assert got == {("SMP", 2018), ("STFC", 2017), ("SMP", 2019)}


def test_detect_header_row():
    from ida_dataengineerproject_spark.sources.converters import detect_header_row

    raw = pd.DataFrame(
        [["Relatório IDA", None, None, None]] * 8
        + [["GRUPO ECONOMICO", "VARIAVEL", "2017-01", "2017-02"]]
        + [["CLARO S.A.", "Taxa", "1", "2"]] * 3
    )
    assert detect_header_row(raw) == 8
    junk = pd.DataFrame([["a", "b", "c", "d"]] * 25)
    assert detect_header_row(junk) == 8  # fallback default


def test_normalize_wide_and_ingest_end_to_end(spark):
    from ida_dataengineerproject_spark.plans.etl import ingest
    from ida_dataengineerproject_spark.sources.converters import (
        normalize_wide,
        wide_to_spark,
    )

    sheet = pd.DataFrame(
        {
            "Grupo Econômico": ["CLARO S.A.", None],
            "Variável": ["Taxa de Respondidas em 5 dias Úteis"] * 2,
            "2017-01 ": ["1,5", "2,5"],
            pd.Timestamp("2017-02-01"): ["3", "4"],
        }
    )
    wide = normalize_wide(sheet, "SMP", "SMP_2017.ods")
    assert list(wide.columns[:2]) == ["GRUPO_ECONOMICO", "VARIAVEL"]
    assert "2017-01" in wide.columns and "2017-02" in wide.columns
    sdf = wide_to_spark(spark, wide)
    star = ingest(spark, sdf)
    fact = star["fact_ida"]
    assert fact.count() == 4  # 2 rows × 2 months, ffill fills row 2


def test_bootstrap_and_health(spark):
    from ida_dataengineerproject_spark.plans.bootstrap import (
        bootstrap_views,
        health_check,
    )

    names = bootstrap_views(spark, SF_SMOKE)
    assert "lineitem" in names
    status = health_check(spark, ["lineitem", "orders", "no_such_table"])
    assert status["lineitem"] and status["orders"]
    assert not status["no_such_table"]
