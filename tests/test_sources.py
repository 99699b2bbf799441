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
    res = fetch_catalog(
        "ida-dataset", api_base=f"file://{tmp_path}", allow_file=True
    )
    assert [r.titulo for r in res] == ["IDA SMP 2017", "IDA STFC 2018"]
    assert res[0].formato == "ods"

    blob = tmp_path / "payload.bin"
    blob.write_bytes(b"\x00\x01spreadsheet-bytes")
    assert (
        fetch_to_memory(f"file://{blob}", allow_file=True)
        == b"\x00\x01spreadsheet-bytes"
    )


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_events_ts_normalized_per_sfdir(spark, sf_dir):
    """Invariant: whatever encoding the testdata generator ships, table()
    must hand every consumer a plain (session-TZ) `timestamp` ts column.
    This regressed once (round 3: timestamp[us]-NTZ broke sessionize); the
    testdata WILL change under us again."""
    import os

    from ida_dataengineerproject_spark.sources.tables import table

    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    df = table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_events_ts_all_three_encodings(spark, tmp_path):
    """table() normalizes every ts encoding the testdata has ever shipped —
    int64 TIMESTAMP(NANOS), timestamp[us] without TZ (Spark TIMESTAMP_NTZ),
    timestamp[us] UTC — to identical `timestamp` instants, so sessionize &
    co. never see encoding drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ida_dataengineerproject_spark.operators.sessionize import sessionize
    from ida_dataengineerproject_spark.sources.tables import table

    base_us = [1_500_000_000_000_000, 1_500_000_000_123_456, 1_500_003_700_000_000]
    cols = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["a", "b", "c"]),
        "value": pa.array([1.0, 2.0, 3.0]),
        "props": pa.array(["{}", "{}", "{}"]),
    }
    encodings = {
        "nanos": pa.array([u * 1000 for u in base_us], pa.timestamp("ns")),
        "ntz_us": pa.array(base_us, pa.timestamp("us")),
        "utc_us": pa.array(base_us, pa.timestamp("us", tz="UTC")),
    }
    results = {}
    for enc, ts_arr in encodings.items():
        d = tmp_path / enc
        d.mkdir()
        pq.write_table(
            pa.table({**cols, "ts": ts_arr}), d / "events.parquet"
        )
        df = table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", enc
        rows = sessionize(df).select("event_id", "ts", "session_seq").collect()
        results[enc] = sorted((r.event_id, r.ts, r.session_seq) for r in rows)
    assert results["nanos"] == results["ntz_us"] == results["utc_us"]
    # 3rd event is >30 min after the 2nd -> new session
    assert [s for _, _, s in results["ntz_us"]] == [1, 1, 2]


def test_events_stream_reader_matches_batch(spark, tmp_path):
    """Streaming reader peeks at the footer and normalizes ts exactly like
    the batch path, for both current encodings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ida_dataengineerproject_spark.streaming.events import read_events_stream

    base_us = [1_500_000_000_000_000, 1_500_000_600_000_000]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 8], pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["{}", "{}"]),
    }
    for enc, ts_arr in {
        "nanos": pa.array([u * 1000 for u in base_us], pa.timestamp("ns")),
        "ntz_us": pa.array(base_us, pa.timestamp("us")),
    }.items():
        d = tmp_path / enc
        d.mkdir()
        pq.write_table(pa.table({**cols, "ts": ts_arr}), d / "events.parquet")
        stream = read_events_stream(spark, str(d))
        assert dict(stream.dtypes)["ts"] == "timestamp", enc
        q = (
            stream.writeStream.format("memory")
            .queryName(f"ts_enc_{enc}")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql(
                f"SELECT ts FROM ts_enc_{enc} ORDER BY ts"
            ).collect()
        finally:
            q.stop()
        assert [r.ts.isoformat() for r in got] == [
            "2017-07-14T02:40:00",
            "2017-07-14T02:50:00",
        ], enc


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC format breadth: lossless round-trip from parquet-sourced data,
    and filter pushdown reaching the ORC scan (stripe statistics are the
    data-skipping mechanism, like parquet row groups)."""
    from pyspark.sql import functions as F

    from ida_dataengineerproject_spark.sources.tables import table
    from ida_dataengineerproject_spark.sources.text_formats import (
        read_orc,
        write_orc,
    )

    src = table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)

    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # value-level: aggregate fingerprint matches
    agg = lambda df: df.agg(  # noqa: E731
        F.sum("o_orderkey").alias("sk"),
        F.sum(F.crc32(F.col("o_orderstatus"))).alias("ss"),
    ).collect()[0]
    assert agg(back) == agg(src)

    plan = (
        back.filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>" in plan


def test_incremental_ingest_ledger(spark, tmp_path):
    """Ledger-driven ingest: first run processes everything, a rerun with
    no new files processes nothing, adding files processes ONLY them, and
    the accumulated sink equals one full read (exactly-once per file)."""
    from pyspark.sql import functions as F

    from ida_dataengineerproject_spark.sources.ingest_ledger import (
        ingest_new_files,
        read_ledger,
    )

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ledger = str(tmp_path / "ledger")

    def write_src_file(name, lo, hi):
        spark.range(lo, hi).toDF("id").coalesce(1).write.parquet(
            str(src / name)
        )
        # flatten: move the part file up as <name>.parquet
        import glob
        import shutil

        part = glob.glob(str(src / name / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))
        shutil.rmtree(str(src / name))

    def process(df):
        df.write.mode("append").parquet(sink)

    write_src_file("a", 0, 100)
    write_src_file("b", 100, 250)

    s1 = ingest_new_files(spark, str(src), ledger, process)
    assert s1 == {"files_new": 2, "files_seen_total": 2}

    s2 = ingest_new_files(spark, str(src), ledger, process)
    assert s2 == {"files_new": 0, "files_seen_total": 2}  # idempotent rerun

    write_src_file("c", 250, 300)
    s3 = ingest_new_files(spark, str(src), ledger, process)
    assert s3 == {"files_new": 1, "files_seen_total": 3}

    out = spark.read.parquet(sink)
    assert out.count() == 300  # each row ingested exactly once
    assert out.agg(F.sum("id")).collect()[0][0] == 299 * 300 // 2
    assert read_ledger(spark, ledger).count() == 3


def test_ingest_ledger_detects_rewritten_file(spark, tmp_path):
    """A source file rewritten in place (same name, different size) must
    count as new — silently skipping changed files is data loss."""
    from ida_dataengineerproject_spark.sources.ingest_ledger import (
        ingest_new_files,
    )

    src = tmp_path / "src2"
    src.mkdir()
    sink = str(tmp_path / "sink2")

    def write_file(lo, hi):
        import glob
        import shutil

        tmp = str(src / "_stage")
        spark.range(lo, hi).toDF("id").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(tmp + "/part-*.parquet")[0]
        shutil.move(part, str(src / "data.parquet"))
        shutil.rmtree(tmp)

    def process(df):
        df.write.mode("append").parquet(sink)

    write_file(0, 10)
    s1 = ingest_new_files(spark, str(src), str(tmp_path / "ledger2"), process)
    assert s1["files_new"] == 1
    write_file(0, 500)  # rewritten in place, different size
    s2 = ingest_new_files(spark, str(src), str(tmp_path / "ledger2"), process)
    assert s2["files_new"] == 1  # re-ingested, not silently skipped


def test_ingest_ledger_detects_same_size_rewrite(spark, tmp_path):
    """A file rewritten in place with the SAME byte size (regenerated
    same-shape data) must also count as new: the identity includes the
    modification time, not just (path, size)."""
    import os
    import time

    from ida_dataengineerproject_spark.sources.ingest_ledger import (
        ingest_new_files,
    )

    src = tmp_path / "src3"
    src.mkdir()
    sink = str(tmp_path / "sink3")
    f = src / "data.parquet"

    def process(df):
        df.write.mode("append").parquet(sink)

    import glob
    import shutil

    tmp = str(src / "_stage")
    spark.range(0, 7).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(tmp + "/part-*.parquet")[0]
    shutil.copy(part, str(f))
    shutil.rmtree(tmp)
    size1 = os.path.getsize(f)

    s1 = ingest_new_files(spark, str(src), str(tmp_path / "ledger3"), process)
    assert s1["files_new"] == 1

    # same-byte rewrite with a bumped mtime (the in-place regeneration)
    payload = f.read_bytes()
    time.sleep(0.01)
    f.write_bytes(payload)
    os.utime(f, ns=(time.time_ns(), time.time_ns()))
    assert os.path.getsize(f) == size1  # same size — the old blind spot

    s2 = ingest_new_files(spark, str(src), str(tmp_path / "ledger3"), process)
    assert s2["files_new"] == 1  # re-ingested via mtime in the identity


def test_io_roundtrip_queries_are_session_idempotent(spark):
    """Running xio1/xio2 twice in ONE session must give identical results:
    the first run leaves a path cache (split_quarantine), and the second
    run's overwrite triggers recache-by-path BEFORE the garbage file is
    injected — without the explicit refreshByPath the second run loses
    its quarantine rows (caught by the round-5 gate)."""
    import __spark_entry__ as e

    from tests.conftest import SF_SMOKE

    for name in ("xio1_jsonl_roundtrip", "xio2_csv_roundtrip"):
        q = e.queries()[name]
        first = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
        second = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
        assert first == second, name
        quarantined = [r for r in second if r[0] == "__quarantined__"]
        assert quarantined and quarantined[0][1] == 2, name


def test_auth_header_injected_into_request(tmp_path):
    """op01 auth surface (etl_ida.py:667,677): the catalog request must
    carry the ``chave-api-dados-abertos`` header when an API key is
    configured — asserted on the constructed Request (offline), then the
    same code path is driven end-to-end over file:// where the header is
    legitimately ignored."""
    import json as _json

    from ida_dataengineerproject_spark.sources.manifest import (
        API_KEY_HEADER,
        build_request,
        fetch_catalog,
    )

    req = build_request("https://example.invalid/x", api_key="sekret-123")
    assert req.get_header(API_KEY_HEADER.capitalize()) == "sekret-123"
    # extra headers survive alongside the key
    req2 = build_request(
        "https://example.invalid/x",
        api_key="k",
        headers={"Accept": "application/json"},
    )
    assert req2.get_header("Accept") == "application/json"
    assert req2.get_header(API_KEY_HEADER.capitalize()) == "k"
    # no key → no auth header
    assert build_request("file:///x").get_header(
        API_KEY_HEADER.capitalize()
    ) is None

    (tmp_path / "ida-key").write_text(
        _json.dumps({"recursos": [
            {"titulo": "SMP 2018", "link": "file:///r", "formato": "ODS"}
        ]})
    )
    res = fetch_catalog(
        "ida-key",
        api_base=f"file://{tmp_path}",
        api_key="sekret-123",
        allow_file=True,
    )
    assert [r.titulo for r in res] == ["SMP 2018"]
