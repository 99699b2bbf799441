"""Bitwise-equality contracts for the integer-units aggregation fast path
(functions/aggs.py r9): on exact-2-decimal double inputs, each *_2dp /
*_exact units helper must emit the IDENTICAL double as its decimal twin —
that is the whole contract that lets TPC-H queries swap buffers freely.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ida_dataengineerproject_spark.functions.aggs import (
    avg_exact,
    avg_exact_2dp,
    sum_charge_exact,
    sum_disc_price_exact,
    sum_exact,
    sum_exact_2dp,
)


def _money(rng, lo=-10_000_00, hi=50_000_00):
    return rng.randint(lo, hi) / 100.0  # exact 2-decimal double


def test_units_sums_bitwise_equal_decimal_twins(spark):
    rng = random.Random(9)
    rows = [
        (
            rng.choice("abc"),
            _money(rng),
            rng.randint(0, 10) / 100.0,  # discount 0.00-0.10
            rng.randint(0, 8) / 100.0,  # tax 0.00-0.08
        )
        for _ in range(5000)
    ]
    # include null money values: both arms must skip them identically
    rows += [("a", None, 0.05, 0.02), ("b", None, 0.0, 0.0)]
    df = spark.createDataFrame(rows, ["g", "p", "d", "t"])
    disc = F.col("p") * (1 - F.col("d"))
    charge = disc * (1 + F.col("t"))
    got = df.groupBy("g").agg(
        sum_exact("p").alias("s_dec"),
        sum_exact_2dp("p").alias("s_u"),
        avg_exact("p").alias("a_dec"),
        avg_exact_2dp("p").alias("a_u"),
        sum_exact(disc, scale=6).alias("dp_dec"),
        sum_disc_price_exact("p", "d").alias("dp_u"),
        sum_exact(charge, scale=6).alias("ch_dec"),
        sum_charge_exact("p", "d", "t").alias("ch_u"),
    ).collect()
    assert len(got) == 3
    for r in got:
        for dec, units in (("s_dec", "s_u"), ("a_dec", "a_u"),
                           ("dp_dec", "dp_u"), ("ch_dec", "ch_u")):
            assert r[dec] == r[units], (r["g"], dec, r[dec], r[units])
            # bitwise, not approximate:
            import struct
            assert struct.pack("d", r[dec]) == struct.pack("d", r[units])
