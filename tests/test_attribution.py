"""Golden TTL semantics for xq6 last-touch attribution.

The subtle rule: a purchase whose most recent touch is expired goes to
'direct' — it does NOT fall back to an even older (also expired) touch,
and an expired touch does not mask a newer valid one.
"""

from __future__ import annotations

import duckdb

from ida_dataengineerproject_spark.queries.analytics_ops import q_xq6


def _run(spark, tmp_path, rows):
    import pandas as pd

    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    df["props"] = "{}"
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM df) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)"
    )
    return {
        r["channel"]: (r["n_purchases"], r["attributed_revenue"])
        for r in q_xq6(spark, str(tmp_path)).collect()
    }


def test_expired_touch_goes_direct_not_older(spark, tmp_path):
    rows = [
        # user 1: click 10 days before purchase -> direct
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-11 00:00:00", 1, "purchase", 100.0),
        # user 2: view 2 days before purchase -> view
        (3, "2024-02-01 00:00:00", 2, "view", 0.0),
        (4, "2024-02-03 00:00:00", 2, "purchase", 50.0),
        # user 3: old click (expired) then recent view -> view
        (5, "2024-03-01 00:00:00", 3, "click", 0.0),
        (6, "2024-03-20 00:00:00", 3, "view", 0.0),
        (7, "2024-03-21 00:00:00", 3, "purchase", 25.0),
        # user 4: no touch at all -> direct
        (8, "2024-04-01 00:00:00", 4, "purchase", 10.0),
        # user 5: touch exactly at the purchase instant -> attributed
        (9, "2024-05-01 00:00:00", 5, "click", 0.0),
        (10, "2024-05-01 00:00:00", 5, "purchase", 7.0),
        # user 6: touch exactly 7 days before -> still inside TTL
        (11, "2024-06-01 00:00:00", 6, "click", 0.0),
        (12, "2024-06-08 00:00:00", 6, "purchase", 3.0),
    ]
    got = _run(spark, tmp_path, rows)
    assert got["direct"] == (2, 110.0)
    assert got["view"] == (2, 75.0)
    assert got["click"] == (2, 10.0)
