"""Connected components over an edge list — the clustering step that
turns near-dup *pairs* (MinHash-LSH / SimHash / Jaccard output) into
dedup *groups*, so a pipeline can keep one canonical document per
component.

The reference deduplicates only by exact hash identity (ON CONFLICT DO
NOTHING, etl/etl_ida.py:534); component-level dedup is the scale
generalization the driver's north star asks for.

Algorithm: iterative min-label propagation (the dataframe form of
large-star/small-star, Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14).  Each round every node adopts the
minimum label among itself and its neighbors; rounds = O(component
diameter), which for dedup graphs (dense clusters of mutated copies) is
tiny (2-4).  Each round is one shuffle keyed on node id; labels are
checkpointed per round so the plan/lineage stays O(1) instead of
O(rounds)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is undirected (each pair once is fine).  Driver loop with a
    per-round convergence action — acceptable because rounds are bounded
    by graph diameter, not data size; every per-round job is fully
    distributed (no collect of nodes/edges)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min neighbor label per node, via one hash-shuffle on node id
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("nmin"))
        )
        new_comp = F.least(
            F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
        )
        # the change flag rides along in the SAME select (old comp is
        # already in scope), so convergence costs one scan of the
        # checkpoint — not a second labels-vs-labels join job per round
        staged = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                new_comp.alias("comp"),
                (new_comp < F.col("comp")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = staged.filter("chg").limit(1).count()
        labels = staged.drop("chg")
        if changed == 0:
            break
    return labels


def count_triangles(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    edges_unique: bool = True,
    with_graph_stats: bool = False,
    broadcast_limit_bytes: int = 256 << 20,
) -> DataFrame:
    """Exact triangle count of an undirected simple graph — one row,
    column ``n_triangles`` (plus ``n_nodes``/``n_edges`` when
    ``with_graph_stats``).  No self-loops; with ``edges_unique`` each
    undirected edge appears once (either direction), with
    ``edges_unique=False`` duplicate pairs are allowed and dedup is
    folded into the adjacency build (a ``collect_set`` in the shuffle
    that builds it anyway) — one full distinct pass saved.

    Degree-ordered orientation (Cohen's MapReduce scheme): orient every
    edge from its lower-(degree, id) endpoint to the higher, making the
    orientation acyclic with out-degrees bounded by ~sqrt(2m) regardless
    of degree skew — a celebrity node no longer contributes deg^2 work.
    With duplicate input pairs the rank key is the MULTIGRAPH degree
    (consistent total order, so counts stay exact; the out-degree bound
    becomes ~sqrt(2m') for m' = multi-edge count, which degrades only as
    far as the data's pair-duplication factor).

    Counting uses the edge-adjacency-intersection form rather than wedge
    enumeration: for each oriented edge (u→v), triangles whose lowest-
    ranked vertex is u close through |N+(u) ∩ N+(v)| (the third vertex
    is out-of u AND out-of v; the other two edges of the triangle point
    rank-upward so they count it nowhere else).  Total work is the same
    Σ outdeg² <= m^1.5, but it flows through m rows carrying bounded
    (<= ~sqrt(2m)-entry) adjacency arrays with a codegen array_intersect
    per row, instead of materializing Σ outdeg² wedge ROWS into a
    shuffle join.

    Join strategy is size-adaptive on MEASURED numbers computed BEFORE
    the adjacency materializes (exact, not Catalyst estimates: each
    undirected edge orients to exactly one adjacency entry, so
    |und| + |deg| counts give the bytes).  The adjacency is then
    checkpointed once (m + n longs, spread over defaultParallelism
    partitions so the intersect compute keeps full core count —
    byte-based AQE coalesce would squash these compute-heavy,
    byte-light array rows onto ~3 tasks), and

    - adjacency under ``broadcast_limit_bytes``: broadcast-hash-join the
      v-side adjacency.  The Σ outdeg² array duplication then never
      crosses a shuffle — explode, probe and intersect pipeline in ONE
      stage.  Measured at sf0.1 (m=1.2M, Σoutdeg²=83M): 0.4 s vs 3.4 s
      for the sort-merge form.
    - larger graphs: plain shuffle equi-join on v (Cohen's Σ outdeg²
      shuffle bound — the 100 TB path; nothing data-sized is broadcast),
      AND the collect_list build runs as a SORT-based aggregate
      (scoped ``useObjectHashAggregateExec=false``): the hash form
      holds every open group's array per task — the whole graph in
      heap across concurrent tasks, the r8 x100 16 g OOM — while the
      sort form keeps one group (≤ ~sqrt(2m) entries) at a time and
      its shuffle sort spills.

    An Arrow ``mapInPandas`` batch-intersection (row-offset keys +
    ``np.intersect1d``) was measured SLOWER than codegen array_intersect
    in both regimes (broadcast: 1.7-1.9 s vs 0.4 s; shuffle: 2.4 s vs
    2.0 s at sf0.1) — the per-batch flatten/sort outweighs the hash-set
    probes it replaces; probe committed in ROUND_NOTES round 7.
    """
    from pyspark.storagelevel import StorageLevel

    spark = edges.sparkSession
    und = edges.select(F.col(src).alias("p1"), F.col(dst).alias("p2"))
    # two consumers (degree pass, orientation join) — materialize once.
    # DISK_ONLY, not the MEMORY_AND_DISK(deserialized) default: at x100
    # the edge snapshot is 10⁸ rows, and deserialized block storage pins
    # gigabytes of the unified pool (storageFraction-protected from
    # eviction), starving the very hash aggregates that read it —
    # the r9 16 g AGGREGATE_OUT_OF_MEMORY landed in the degree/distinct
    # stage, not the adjacency build.  Serialized long-pairs are compact
    # and the OS page cache keeps re-reads memory-speed without touching
    # the JVM heap.
    und = und.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    deg = (
        und.select(F.col("p1").alias("node"))
        .unionByName(und.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        # node-bounded; consumed by BOTH orientation joins (and the
        # n_nodes arm) — without this the aggregation runs per consumer
        .localCheckpoint()
    )
    d1 = deg.withColumnRenamed("node", "p1").withColumnRenamed("deg", "deg1")
    d2 = deg.withColumnRenamed("node", "p2").withColumnRenamed("deg", "deg2")
    ed = und.join(d1, "p1").join(d2, "p2")
    lower_first = (F.col("deg1") < F.col("deg2")) | (
        (F.col("deg1") == F.col("deg2")) & (F.col("p1") < F.col("p2"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("p1")).otherwise(F.col("p2")).alias("u"),
        F.when(lower_first, F.col("p2")).otherwise(F.col("p1")).alias("v"),
    )
    # Gate on a MEASURED size, not Catalyst stats — and measure it BEFORE
    # building the adjacency (r8 probe: at x100 the 220 M-entry
    # collect_list ObjectHashAggregate OOMed a 16 g JVM while
    # materializing the frame the old gate measured — the handoff
    # decision arrived after the memory hazard).  Exact pre-build
    # numbers from two cheap counts over already-checkpointed frames:
    # every undirected edge orients to exactly ONE adjacency entry, so
    # entries == |und| (collect_set can only shrink it), and adjacency
    # rows <= |deg|.  Bytes: 8 B/long id ×2 for the
    # BroadcastHashedRelation's boxing/hash overhead, plus per-row
    # array+key overhead.
    # one tiny job over the checkpointed degree table gives BOTH gate
    # numbers: every und row contributes 2 to Σdeg, so |und| = Σdeg/2 —
    # the und.count() full-snapshot scan this replaces measured ~0.3 s
    # of pure job overhead at sf0.1 (r12)
    _gate = deg.agg(
        F.count("*").alias("n"), F.sum("deg").alias("sd")
    ).first()
    n_nodes_m = int(_gate["n"])
    n_edges_m = int(_gate["sd"] or 0) // 2
    adj_bytes = n_edges_m * 16 + n_nodes_m * 64
    gather = F.collect_list if edges_unique else F.collect_set

    def build_adj():
        # fresh frame per call: a DataFrame memoizes its physical plan,
        # so the sort-aggregate conf below must be live when the plan
        # is FIRST materialized.  Two consumer arms below — materialize
        # once; round-robin spread keeps the intersect stage at full
        # parallelism (see docstring)
        return (
            oriented.groupBy("u")
            .agg(gather("v").alias("nbrs"))
            .repartition(spark.sparkContext.defaultParallelism)
        )

    if adj_bytes <= broadcast_limit_bytes:
        adj = build_adj().localCheckpoint()
    else:
        # Huge regime: the hash aggregate holds EVERY open group's
        # ArrayBuffer per task — Σ entries ~ the whole graph in heap
        # across concurrent tasks.  A sort-based aggregate keeps ONE
        # group's array at a time (the shuffle sort itself spills), so
        # the build is memory-bounded by the max out-degree ~ sqrt(2m).
        # scoped_conf + eager checkpoint: the conf is live only while
        # THIS aggregate executes.
        from ..session import scoped_conf

        with scoped_conf(
            spark, {"spark.sql.execution.useObjectHashAggregateExec": "false"}
        ):
            # DISK_ONLY for the same storage-squeeze reason as `und`:
            # the huge-regime adjacency is the largest object in the job
            adj = build_adj().localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
    # recover each oriented edge (u→v) WITH u's adjacency attached by
    # exploding the adjacency itself — one join saved vs joining the
    # edge list back to adj on u
    per_edge = adj.select(
        F.col("nbrs").alias("nbrs_u"), F.explode("nbrs").alias("v")
    )
    a_v = adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nbrs_v"))
    if int(adj_bytes) <= broadcast_limit_bytes:
        a_v = F.broadcast(a_v)
    counted = (
        per_edge.join(a_v, "v")  # inner: v without out-edges closes nothing
        .select(F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("c"))
    )
    tri = counted.agg(F.sum("c").cast("long").alias("n_triangles"))
    if not with_graph_stats:
        return tri
    # free-riding stats: every node touches an edge, so n_nodes = |deg|;
    # n_edges = Σ out-degrees of the deduped oriented adjacency
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = adj.agg(F.sum(F.size("nbrs")).cast("long").alias("n_edges"))
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )
