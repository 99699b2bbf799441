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


def test_csv_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    """CSV/JSONL scan wrappers: explicit schema, malformed rows
    quarantined (not failures), parquet normalization round-trips."""
    from pyspark.sql import types as T

    from ida_dataengineerproject_spark.sources.text_formats import (
        read_csv,
        read_jsonl,
        split_quarantine,
        write_parquet_normalized,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    csv_path = str(tmp_path / "in.csv")
    with open(csv_path, "w") as f:
        f.write("id,name,score\n1,alice,0.5\n2,bob,0.75\nnot_a_long,x,oops\n")
    clean, bad = split_quarantine(read_csv(spark, csv_path, schema))
    assert {(r.id, r.name) for r in clean.collect()} == {(1, "alice"), (2, "bob")}
    assert bad.count() == 1

    jsonl_path = str(tmp_path / "in.jsonl")
    with open(jsonl_path, "w") as f:
        f.write('{"id": 1, "name": "alice", "score": 0.5}\n')
        f.write("this is not json\n")
        f.write('{"id": 3, "name": "carol", "score": 1.0}\n')
    clean_j, bad_j = split_quarantine(read_jsonl(spark, jsonl_path, schema))
    assert {r.id for r in clean_j.collect()} == {1, 3}
    assert bad_j.count() == 1

    out = str(tmp_path / "out_parquet")
    write_parquet_normalized(clean_j, out, partition_by=["name"])
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert set(back.columns) == {"id", "name", "score"}


def test_fetch_catalog_file_scheme(tmp_path):
    """op01/op03 live path: fetch_catalog + fetch_to_memory run the real
    urllib code against a file:// fixture shaped like the dados.gov.br
    payload (the sandbox has no network; the code path is identical)."""
    import json

    from ida_dataengineerproject_spark.sources.manifest import (
        fetch_catalog,
        fetch_to_memory,
    )

    ds = tmp_path / "ida-dataset"
    ds.write_text(
        json.dumps(
            {
                "recursos": [
                    {"titulo": "IDA SMP 2017", "link": "http://x/smp.ods",
                     "formato": "ODS"},
                    {"titulo": "IDA STFC 2018", "link": "http://x/stfc.ods",
                     "formato": "ods"},
                ]
            }
        )
    )
    res = fetch_catalog("ida-dataset", api_base=f"file://{tmp_path}")
    assert [r.titulo for r in res] == ["IDA SMP 2017", "IDA STFC 2018"]
    assert res[0].formato == "ods"

    blob = tmp_path / "payload.bin"
    blob.write_bytes(b"\x00\x01spreadsheet-bytes")
    assert fetch_to_memory(f"file://{blob}") == b"\x00\x01spreadsheet-bytes"
