"""Graph closure operators — the ontology-hierarchy pattern, distributed.

The reference computes MP/MA/EMAPA term closures (every ancestor /
top-level / intermediate term per node) on the DRIVER with pronto
(jobs/extract/ontology_hierarchy_extractor.py:193-367) — fine for a
50k-term ontology, not for a general engine. Here the closure is an
iterative DataFrame join (doubling reachability each round, so depth-d
DAGs converge in ceil(log2 d) + 1 rounds), with the same outputs the
reference materializes: the (node, ancestor) pair table and per-node
ancestor arrays.

Scale: state is the reachability pair set, shuffled on the frontier key
each round; localCheckpoint per round keeps lineage flat. Cyclic inputs
converge too (reachability is a fixpoint) — max_iterations bounds the
damage of an unexpectedly deep graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iterations: int = 12,
) -> DataFrame:
    """All (node, ancestor) pairs reachable via ``child → parent`` edges.

    Path-doubling: each round joins the current closure with itself, so
    reachable depth doubles per round (12 rounds covers depth 4096).
    """
    closure = edges.select(
        F.col(child_col).alias("node"), F.col(parent_col).alias("anc")
    ).distinct().localCheckpoint(eager=True)
    for _ in range(max_iterations):
        hop = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.anc") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.anc").alias("anc"))
        )
        new_closure = closure.union(hop).distinct().localCheckpoint(eager=True)
        if new_closure.count() == closure.count():
            closure = new_closure
            break
        closure = new_closure
    return closure


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count → (node, rank).

    ``r_{t+1}(v) = (1-d)/N + d · Σ_{u→v} r_t(u) · w(u,v) / outw(u)``,
    with dangling nodes (no out-edges) redistributing their mass
    uniformly. The fixed iteration count (vs an epsilon test) makes the
    result exactly replayable by an iterative SQL oracle, and is how
    production runs schedule the job anyway (convergence tests add a
    per-round aggregate barrier).

    Scale shape per round: ONE shuffle joining ranks to the
    out-normalized edge list on ``src`` + ONE groupBy ``dst`` with
    map-side partial sums; the dangling-mass total and N ride 1-row
    broadcasts. Rank state is (node, rank) — never materialized on the
    driver — and each round checkpoints it (``checkpoint_dir`` switches
    executor-local to reliable, same contract as
    `dedup.connected_components`). The normalized edge list is
    checkpointed ONCE before the loop; iteration cost is independent of
    how expensive the edge-building plan was.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ck(frame: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return frame.checkpoint(eager=True)
        return frame.localCheckpoint(eager=True)

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    # Materialize the (possibly expensive) edge-building plan ONCE: nodes,
    # out-weights, normalized edges, and the dangling set all derive from
    # it — without this cut the upstream join/agg subtree re-executes for
    # each derived frame (measured 3× on the trade-graph query).
    e = _ck(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
        )
    )
    # nodes = union of endpoints; out-weight per src for normalization
    nodes = _ck(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # a src whose weights sum to 0 has no usable out-edges: keep it OUT
    # of outw so it lands in the dangling set below — dividing by its 0
    # total would crash under ANSI mode (DIVIDE_BY_ZERO) or silently
    # leak its rank mass as NULL contributions with ANSI off
    outw = (
        e.groupBy("src").agg(F.sum("w").alias("outw"))
        .where(F.col("outw") > 0)
    )
    norm_edges = _ck(
        e.join(outw, "src").select(
            "src", "dst", (F.col("w") / F.col("outw")).alias("p")
        )
    )
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    ranks = _ck(
        nodes.crossJoin(n_row).select(
            "node", (F.lit(1.0) / F.col("__n")).alias("rank")
        )
    )
    dangling = _ck(nodes.join(outw, nodes.node == outw.src, "left_anti"))
    for _ in range(iterations):
        contrib = (
            norm_edges.join(ranks, norm_edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("__in"))
        )
        dmass = F.broadcast(
            dangling.join(ranks, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = _ck(
            nodes.join(contrib, nodes.node == contrib.dst, "left_outer")
            .crossJoin(n_row)
            .crossJoin(dmass)
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dm") / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
    return ranks


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) with a FIXED iteration
    count → (node, hub, authority). The directed-graph complement of
    `pagerank`: authorities are pointed AT by good hubs, hubs point AT
    good authorities —

        a_{t+1}(v) = Σ_{u→v} h_t(u) · w(u,v)     then L1-normalize
        h_{t+1}(u) = Σ_{u→v} a_{t+1}(v) · w(u,v) then L1-normalize

    L1 normalization (divide by the Σ|·| over nodes) instead of the
    textbook L2: the normalizer is ONE broadcast scalar either way, but
    L1 keeps every replayed double a plain sum/divide so an unrolled SQL
    oracle reproduces the exact expression tree (no sqrt into the
    divisor). Fixed iterations, same rationale as pagerank: exactly
    replayable, and how production schedules the job anyway.

    Scale shape per round: TWO shuffles (join scores to edges on one
    endpoint + groupBy the other), each with map-side partial sums; the
    normalizer rides a 1-row broadcast. Score state is (node, score),
    checkpointed per round (`checkpoint_dir` switches executor-local to
    reliable). Nodes nobody points at keep authority 0; nodes with no
    out-edges keep hub 0 (an isolated side contributes nothing — by
    construction, not by special-casing).
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ck(frame: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return frame.checkpoint(eager=True)
        return frame.localCheckpoint(eager=True)

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = _ck(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
        )
    )
    nodes = _ck(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    hubs = _ck(
        nodes.crossJoin(n_row).select(
            "node", (F.lit(1.0) / F.col("__n")).alias("h")
        )
    )
    auths = None
    for _ in range(iterations):
        raw_a = (
            e.join(hubs, e.src == hubs.node)
            .groupBy("dst")
            .agg(F.sum(F.col("h") * F.col("w")).alias("__a"))
        )
        anorm = F.broadcast(raw_a.agg(F.sum(F.abs(F.col("__a"))).alias("__z")))
        auths = _ck(
            nodes.join(raw_a, nodes.node == raw_a.dst, "left_outer")
            .crossJoin(anorm)
            .select(
                "node",
                F.coalesce(
                    F.try_divide(F.col("__a"), F.col("__z")), F.lit(0.0)
                ).alias("a"),
            )
        )
        raw_h = (
            e.join(auths, e.dst == auths.node)
            .groupBy("src")
            .agg(F.sum(F.col("a") * F.col("w")).alias("__h"))
        )
        hnorm = F.broadcast(raw_h.agg(F.sum(F.abs(F.col("__h"))).alias("__z")))
        hubs = _ck(
            nodes.join(raw_h, nodes.node == raw_h.src, "left_outer")
            .crossJoin(hnorm)
            .select(
                "node",
                F.coalesce(
                    F.try_divide(F.col("__h"), F.col("__z")), F.lit(0.0)
                ).alias("h"),
            )
        )
    return (
        hubs.join(auths.withColumnRenamed("node", "__n2"),
                  hubs.node == F.col("__n2"))
        .select("node", F.col("h").alias("hub"), F.col("a").alias("authority"))
    )


def ancestor_arrays(closure: DataFrame) -> DataFrame:
    """Per-node sorted ancestor id array (the reference's
    *_term_id list columns) from the closure pair table."""
    return closure.groupBy("node").agg(
        F.sort_array(F.collect_set("anc")).alias("ancestors")
    )


def triangle_count(
    edges: DataFrame,
    a_col: str = "src",
    b_col: str = "dst",
    checkpoint_dir: str | None = None,
    edges_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation — the
    classic distributed algorithm (node-iterator++ / Cohen's MapReduce
    form): orient every undirected edge from its (degree, id)-smaller
    endpoint to the larger, build wedges by self-joining oriented edges on
    their source, then close each wedge against the canonical edge list.

    Why this shape at scale: orientation makes every triangle countable
    exactly ONCE (no /6 correction and no duplicate wedges), and bounds
    the wedge fan-out per source node by O(√m) — the degree-ordered
    out-degree bound — so a celebrity node with 10⁷ neighbors generates
    wedges from its LOW-degree endpoints instead of 10¹⁴ pairs. All data
    movement is three equi joins + two groupBys (shuffle keys: node ids);
    hot nodes beyond that are ordinary join skew → AQE.

    Returns (node, n_triangles) for every node in at least one triangle.

    ``edges_canonical=True`` skips the canonicalize+distinct pass (one
    full shuffle of the edge list) when the caller GUARANTEES the input
    is already distinct with ``a_col < b_col`` row-wise — true for
    ``co_occurrence_pairs`` output and most dedup'd pair tables.
    """
    if edges_canonical:
        e = edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    else:
        e = (
            edges.select(
                F.least(F.col(a_col), F.col(b_col)).alias("u"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
    # the canonical edge set feeds THREE consumers (degree agg, the
    # oriented-edge build, the wedge-closing join): materialize it once
    # instead of re-executing the upstream edge-building subtree per
    # consumer (same cut pagerank applies to its edge frame)
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        e = e.checkpoint(eager=True)
    else:
        e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # deg feeds TWO joins (du, dv) and Catalyst clones the whole
    # union+aggregate per consumer (no cross-tree CSE — the r11 plan audit
    # found the deg subtree FOUR times in this plan). Materialize the
    # node-sized (node, d) frame once; it is the narrowest frame in the
    # operator, far cheaper to pin than the edge-sized oriented list.
    if checkpoint_dir is not None:
        deg = deg.checkpoint(eager=True)
    else:
        deg = deg.localCheckpoint(eager=True)
    with_deg = (
        e.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    # Wedge build stays the o⋈o self-join: both endpoints are the same
    # canonical subplan (now just two cheap joins over the CHECKPOINTED
    # e/deg frames), so at runtime ReuseExchange ships the oriented list
    # through one exchange. The alternative — groupBy(s).collect_list +
    # row-local pair expansion (the _bucket_pairs trick) — was built and
    # measured THIS round: 6.63 s vs 6.20 s min (same session, alternating
    # reps at sf0.1); the ObjectHashAggregate's per-group object overhead
    # costs more than the join it saves, locally and with no byte
    # advantage at scale (same edge list through one exchange either way).
    # Recorded as a measured dead end (r11, guide §1.2).
    o1 = o.select(F.col("s"), F.col("t").alias("t1"))
    o2 = o.select(F.col("s"), F.col("t").alias("t2"))
    wedges = o1.join(o2, "s").where(F.col("t1") < F.col("t2"))
    tri = wedges.join(
        e, (wedges.t1 == e.u) & (wedges.t2 == e.v)
    ).select("s", "t1", "t2")
    return (
        tri.select(
            F.explode(F.array(F.col("s"), F.col("t1"), F.col("t2"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_iterations: int = 16,
) -> DataFrame:
    """Single-source/multi-source BFS hop distances by frontier
    expansion: round i joins the frontier to the edge list, anti-joins
    already-settled nodes, and settles the survivors at distance i.
    O(diameter) rounds — the right shape for the low-diameter graphs
    co-purchase/link networks actually are (for deep DAG reachability
    use `transitive_closure`'s path doubling instead). Each round is one
    key join + one anti join over the FRONTIER (not the settled set);
    localCheckpoint keeps lineage flat, and the per-round isEmpty action
    is bounded by ``max_iterations`` — the same iterative-algorithm
    contract as `connected_components`. Pass a symmetrized edge list for
    undirected graphs. Reference analog: the ontology closure walk
    (jobs/extract/ontology_hierarchy_extractor.py:193-367), generalized
    from ancestor reachability to hop distance."""
    dist = sources.select(
        F.col(node_col).alias("node"), F.lit(0).alias("dist")
    ).distinct().localCheckpoint(eager=True)
    frontier = dist
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    for i in range(1, max_iterations + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"), F.lit(i).alias("dist"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) with a FIXED iteration count → (node, community). Each
    round every node adopts the most frequent label among its NEIGHBORS,
    ties broken by the smallest label — fully deterministic, so a SQL
    oracle can replay the rounds as chained CTEs (the same
    fixed-iterations-over-epsilon contract as `pagerank` / `hits`;
    synchronous sweeps can oscillate on bipartite structures, which a
    fixed count renders harmless AND replayable). Labels start as the
    node ids — which must be NUMERIC (the min-label tie-break rides a
    negated struct field under max()) — so communities come out keyed
    by their smallest-reachable member in practice.

    Scale shape per round: ONE shuffle joining labels to the edge list
    on ``src`` + one (node, label) counting groupBy with map-side
    combine + an argmax window PARTITIONED BY node whose input is the
    per-node DISTINCT NEIGHBOR LABEL list (bounded by degree — never a
    global or per-community task). Label state is (node, label),
    localCheckpoint-ed each round to keep lineage flat. Pass a
    symmetrized edge list for undirected graphs — this function uses
    edges as directed 'src informs dst' messages.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        msgs = (
            e.join(labels, e["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        # argmax by (count desc, label asc) as a map-side-combining
        # max_by over a struct ordering — one aggregate exchange instead
        # of a row_number window's shuffle+sort (K=300: the window sort
        # was the round's spill source). -label encodes 'smallest label
        # wins ties' under max(); labels here are the numeric node ids.
        winner = msgs.groupBy("node").agg(
            F.max(
                F.struct(
                    F.col("__c"), (-F.col("label")).alias("__nl")
                )
            ).alias("__best")
        ).select("node", (-F.col("__best.__nl")).alias("label"))
        # nodes with no in-edges keep their current label
        labels = (
            labels.select("node", F.col("label").alias("__old"))
            .join(winner, "node", "left")
            .select(
                "node", F.coalesce("label", "__old").alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def bellman_ford(
    edges: DataFrame,
    source: object,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iterations: int = 4,
) -> DataFrame:
    """Single-source WEIGHTED shortest paths by ``iterations`` rounds of
    Bellman-Ford relaxation → (node, dist) for every node reached within
    that many hops — the weighted companion of `bfs_distances` (hop
    counts) for cost/latency/transit graphs. Fixed round count, so a SQL
    oracle replays it as unrolled min-aggregation CTEs (the
    `pagerank`/`label_propagation` contract; ``iterations`` >= the
    longest useful hop count gives the exact fixed point on a graph
    with no negative cycles).

    Determinism: relaxation is min over {d(u) + w(u,v)} — additions of
    IDENTICAL doubles in identical per-candidate order and an exact min,
    so by induction every distance is bit-equal on any engine (unlike
    float running sums, no evaluation-order freedom exists). Per round:
    one src-keyed join + one min-groupBy over the FRONTIER-adjacent
    edge set + one coalescing min with the settled table;
    localCheckpoint keeps lineage flat. Unreached nodes are absent.
    NULL/NaN weights drop their edge.
    """
    w = F.col(weight_col).cast("double")
    e = edges.where(w.isNotNull() & ~F.isnan(w)).select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    ).localCheckpoint(eager=True)
    dist = e.sparkSession.createDataFrame(
        [(source, 0.0)], ["node", "dist"]
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        relaxed = (
            dist.join(e, dist["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist
