"""x16 PageRank: bit-equality against a pure-Python reference that uses
the same scaled-integer summation, on a small synthetic bipartite graph
— pins BOTH the algorithm and the exactness scheme independently of the
DuckDB oracle (same philosophy as the Morton-key reference tests)."""

from __future__ import annotations

import math


def _pagerank_ref(pairs: list[tuple[int, int]], iters: int = 3):
    edges = []
    for p, s in set(pairs):
        edges.append((p * 2, s * 2 + 1))
        edges.append((s * 2 + 1, p * 2))
    deg: dict[int, int] = {}
    for src, _dst in edges:
        deg[src] = deg.get(src, 0) + 1
    n = len(deg)
    ranks = {node: 1.0 / n for node in deg}
    for _ in range(iters):
        sums: dict[int, int] = {}
        for src, dst in edges:
            c = int(math.floor((ranks[src] / deg[src]) * 1e18))
            sums[dst] = sums.get(dst, 0) + c
        ranks = {
            node: 0.15 / n + 0.85 * (float(s) / 1e18)
            for node, s in sums.items()
        }
    return ranks, deg


def test_pagerank_matches_python_reference_bitwise(spark, tmp_path):
    from ida_dataengineerproject_spark.queries.graph_ops import (
        pagerank_bipartite,
    )

    pairs = [
        (1, 1), (1, 2), (2, 1), (3, 1), (3, 2), (3, 3), (4, 3), (5, 3),
        (2, 2), (2, 1),  # duplicate pair must collapse
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        pairs, "l_partkey long, l_suppkey long"
    ).write.parquet(sf + "/lineitem.parquet")

    got = {r["node"]: r for r in pagerank_bipartite(spark, sf).collect()}
    ref_ranks, ref_deg = _pagerank_ref(pairs)
    assert len(got) == len(ref_ranks) <= 20
    for node, r in got.items():
        assert r["rank"] == ref_ranks[node], node  # bit-exact
        assert r["degree"] == ref_deg[node]
        assert r["node_type"] == ("part" if node % 2 == 0 else "supplier")
    # mass conservation up to the documented floor truncation
    total = sum(ref_ranks.values())
    assert 0.999 < total <= 1.0000001
