"""Distributed connected components — near-dup cluster resolution.

Pair-finding (MinHash-LSH, SimHash, exact Jaccard) yields *edges*;
actually deduplicating a corpus needs the transitive closure of those
edges — if A~B and B~C, then A, B, C are one duplicate cluster and one
survivor is kept. This module closes that gap with the alternating
large-star/small-star algorithm (Kiveris et al., *Connected Components
in MapReduce and Beyond*, SoCC 2014): each round is two
shuffle-bounded DataFrame passes, and the edge set converges to stars
(every node → its component minimum) in O(log² n) rounds — in practice
a handful, since near-dup clusters are small and dense.

Why not label propagation? Propagating min labels along edges needs
O(diameter) rounds; a pathological chain of near-dups (common in
boilerplate-heavy crawls) makes that linear. Star operations contract
paths exponentially instead, which is the published bound this
implementation inherits.

Scale shape: each round is `groupBy(node) → min` expressed as a
min-over-window on the edge list plus a distinct — shuffle keyed by
node id, never materializing neighborhoods as arrays (a hub node's
neighbor list would not fit in one task otherwise). Lineage across
iterations is truncated with localCheckpoint every few rounds (on a
cluster, set a checkpoint dir and swap for checkpoint() if executor
loss during the loop must be survivable).

Reference stake: the reference engine has no graph stage (its dedup is
key-equality only — SyncService change detection); this operator is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "label_propagation",
    "near_dup_clusters",
    "containment_dedup",
    "pagerank",
    "k_core",
    "triangle_counts",
]


def _large_star(e: DataFrame, width: int) -> DataFrame:
    """Connect every neighbor larger than u to min(N(u) ∪ {u}).

    ``width`` pins every shuffle in the pass via explicit
    ``repartition(width, keys)``: HashPartitioning on the window /
    distinct keys satisfies their required ClusteredDistribution, so
    EnsureRequirements inserts no second exchange — the repartition
    IS the shuffle the operator needed, just at a chosen width,
    without touching session-global ``spark.sql.shuffle.partitions``
    (which would race concurrent queries under the orchestrator's
    FAIR-scheduler worker pool)."""
    bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    with_min = bidir.repartition(width, "u").withColumn(
        "m", F.least(F.min("v").over(w), F.col("u"))
    )
    return (
        with_min.filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .repartition(width, "u", "v")
        .dropDuplicates()
    )


def _small_star(e: DataFrame, width: int) -> DataFrame:
    """Direct edges large→small, connect all small neighbors (and u
    itself) to the minimum small neighbor. Shuffle widths pinned the
    same way as :func:`_large_star`."""
    directed = (
        e.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .repartition(width, "u", "v")
        .dropDuplicates()
    )
    w = Window.partitionBy("u")
    with_min = directed.repartition(width, "u").withColumn(
        "m", F.min("v").over(w)
    )
    return (
        with_min.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("n"), "m")
        .union(with_min.select(F.col("u").alias("n"), "m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .repartition(width, "u", "v")
        .dropDuplicates()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from it.

    Iterates large-star/small-star until the canonical edge set is
    stable. Convergence is detected with an order-insensitive
    signature (count + XOR of per-edge xxhash64; XOR, not SUM, because
    summing hashes overflows under ANSI mode) — one tiny aggregate per
    round instead of a full set-difference join; a signature collision
    would need two distinct edge sets with equal count and equal
    64-bit hash XOR in the same run (negligible, and the fixed point
    is verified by construction: a stable signature on stars stays
    stable).

    Pass ``stats={}`` to receive ``stats["rounds"]`` — the number of
    star rounds executed; the convergence property test pins this ≪
    ``max_iter`` on the worst-case (long-path) topology.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    # Adapt the per-round shuffle width to the OBSERVED edge count
    # (the materializing count here, then each round's convergence
    # signature): star rounds are several exchanges over a frame that
    # shrinks toward star-forest size, and on a default session
    # (shuffle.partitions=200) they otherwise degenerate into hundreds
    # of near-empty tasks per round. ~1M edge rows (two longs) per
    # partition; capped at the session's configured width, so at
    # corpus scale the early rounds keep full parallelism.
    # The width is applied via explicit repartition(width, keys) on
    # the per-round frames — session conf is READ as a ceiling but
    # never written, so concurrent queries in the same session (the
    # orchestrator's FAIR-scheduler pool is the in-repo example) are
    # unaffected.
    spark = edges.sparkSession
    try:
        conf_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # some platforms report a non-numeric value (e.g. "auto");
        # fall back to Spark's default ceiling
        conf_n = 200
    rows_per_partition = 1_000_000

    def _width(n_rows: int) -> int:
        return min(conf_n, max(1, -(-n_rows // rows_per_partition)))

    width = _width(e.count())  # materializes cache
    # Materialize the node set EAGERLY while `e` is cached: the
    # final roots anti-join reads it, and e's cache is released
    # inside the loop — without this checkpoint the whole upstream
    # pipeline (e.g. the MinHash/Jaccard pair generation)
    # re-executes a second time at the caller's first action
    # (measured: ~2x the query).
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for i in range(max_iter):
        nxt = _small_star(_large_star(e, width), width)
        # Each star pass references `e` twice, so the LOGICAL plan
        # doubles per round even though persist caches the data —
        # without eager lineage truncation the plan tree grows 4^k
        # and analysis itself OOMs (seen stacking update_components
        # on a prior result). Eager localCheckpoint rewrites the
        # plan to a LogicalRDD, bounding plan size to ~4x the
        # checkpointed base.
        if (i + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()
        else:
            nxt = nxt.persist()
        sig = nxt.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        cur_sig = (sig["n"], sig["h"])
        e.unpersist()
        e = nxt
        if stats is not None:
            stats["rounds"] = i + 1
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig
        width = _width(sig["n"])
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds"
        )
    # At the fixpoint, edges are stars: (member, component_min) for
    # every non-root member. Roots label themselves.
    # The final star frame stays persisted: the returned plan reads it
    # twice (labels + the anti-join), and unpersisting here would force
    # a full recompute at the caller's first action. The caller (or the
    # session's cache lifecycle) owns the release.
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = nodes.join(labels, on="node", how="left_anti").select(
        "node", F.col("node").alias("component")
    )
    return labels.union(roots)


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Resolve near-dup ``pairs`` into clusters over the full corpus:
    (id, cluster_id, is_survivor). Documents in no pair are their own
    singleton cluster; in each multi-doc cluster the minimum id
    survives — the deterministic keep-first policy (same tiebreak as
    :func:`dedup.exact_dedup`). `docs.filter(is_survivor)` IS the
    deduplicated corpus.

    The component map is only as large as the paired-node set (tiny
    next to the corpus), so the label join broadcasts in practice and
    the corpus itself is never shuffled.
    """
    comp = connected_components(pairs, src=a_col, dst=b_col).withColumnRenamed(
        "node", id_col
    )
    return (
        docs.select(id_col)
        .join(comp, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_survivor", F.col(id_col) == F.col("cluster_id"))
    )


def containment_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "__size",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Resolve asymmetric containment ``pairs`` (dedup.containment_pairs)
    into clusters with a KEEP-LONGEST survivor: (id, cluster_id,
    is_survivor). The containment relation is directed (A quoted whole
    inside B), so the natural survivor is the CONTAINER — the largest
    ``size_col`` in each transitive cluster, min id on ties — unlike
    :func:`near_dup_clusters`' keep-min-id, which for containment would
    routinely keep the contained fragment and drop the superset
    document. ``docs.filter(is_survivor)`` is the deduplicated corpus.

    Same scale discipline as :func:`near_dup_clusters`: components are
    computed only over the paired-node set (tiny next to the corpus),
    the argmax-by-size runs on that same tiny set, and the corpus is
    labeled via broadcast-sized joins — never shuffled.
    """
    comp = connected_components(
        pairs.select(a_col, b_col), src=a_col, dst=b_col
    ).withColumnRenamed("node", id_col)
    # NULL sizes coalesce to -inf so an all-NULL cluster still elects a
    # winner (min id) instead of a NULL __winner that would make
    # is_survivor NULL for every member and filter() drop the cluster
    paired = docs.select(
        id_col,
        F.coalesce(F.col(size_col).cast("long"), F.lit(-(1 << 62))).alias("__sz"),
    ).join(F.broadcast(comp), on=id_col)
    best = paired.groupBy("component").agg(F.max("__sz").alias("__best_sz"))
    winners = (
        paired.join(best, on="component")
        .filter(F.col("__sz") == F.col("__best_sz"))
        .groupBy("component")
        .agg(F.min(id_col).alias("__winner"))
    )
    return (
        docs.select(id_col)
        .join(F.broadcast(comp), on=id_col, how="left")
        .join(F.broadcast(winners), on="component", how="left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
            (
                F.col("component").isNull()
                | F.col(id_col).eqNullSafe(F.col("__winner"))
            ).alias("is_survivor"),
        )
    )


def update_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Incrementally fold ``new_edges`` into an existing component map.

    ``labels`` is a previous :func:`connected_components` result
    (node, component) — a star forest, i.e. an edge list already
    contracted to depth 1. Running the star algorithm over
    star-edges ∪ new-edges therefore converges in O(log new-cluster
    diameter) rounds regardless of how much history the labels
    summarize: the incremental cost is driven by the BATCH, not the
    corpus. This pairs with `dedup.ingest_batch_near_dup` (persisted
    band-bucket index) to keep a continuously-ingested corpus's
    cluster assignment current without an O(corpus) recompute.

    Component ids stay stable across updates unless a new edge merges
    two old clusters (the surviving id is the smaller minimum — the
    same keep-min policy as everywhere else).
    """
    star_edges = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("u"), F.col("component").alias("v")
    )
    fresh = new_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    merged = connected_components(star_edges.union(fresh), src="u", dst="v")
    # isolated nodes (self-labeled, in no old star and no new edge)
    # drop out of the edge union — restore them as their own component
    singles = labels.join(merged, on="node", how="left_anti").select(
        "node", F.col("node").alias("component")
    )
    return merged.union(singles)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    checkpoint_every: int = 4,
    out_prec: int = 12,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)`` for a FIXED
    number of power iterations (pass both directions for an undirected
    graph). Returns ``(node, pagerank)`` for every node with at least
    one out-edge, scores rounded to ``out_prec``.

    Cross-engine exactness (the property that lets a SQL oracle check
    an iterative algorithm): each iteration's edge contribution
    ``score/out_deg · damping`` quantizes to DECIMAL(38,18) BEFORE the
    per-destination sum, so the one order-dependent step — summing a
    node's inflow — becomes an order-independent decimal aggregate,
    and every remaining operation is a fixed double expression tree.
    A fixed ``iters`` unrolls into chained CTEs on the oracle side;
    no recursive SQL needed.

    Scale shape per iteration: one hash exchange for the
    contributions groupBy(dst) and a key-reusing left join back onto
    the (node, out_deg) frame; degrees are computed once. Lineage is
    truncated with localCheckpoint every ``checkpoint_every``
    iterations, the same discipline as connected_components. Dangling
    nodes (no out-edges) are out of scope by contract — an undirected
    projection never has them; a directed caller handles sinks
    upstream (standard teleport-mass correction).

    Cited reference scope: the reference engine has no graph stage;
    PageRank joins connected_components on the pipeline extension
    surface (SURVEY §2 scale extensions)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # materialized (r16 sweep): the edge frame is read by the degree
    # aggregate AND by every iteration's contribution join — without
    # this, the caller's edge lineage (often a self-join + distinct)
    # re-ran once per iteration (graph_pagerank_bipartite: 12 scans
    # for 3 iterations). Two longs per edge.
    e = edges.select(
        F.col("src").alias("s"), F.col("dst").alias("t")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("s").agg(F.count("*").alias("d"))
    n_frame = deg.agg(F.count("*").alias("n"))
    p = (
        deg.join(F.broadcast(n_frame), F.lit(True))
        .select(
            F.col("s").alias("node"),
            "d",
            "n",
            (F.lit(1.0) / F.col("n").cast("double")).alias("score"),
        )
        .localCheckpoint()
    )
    for i in range(iters):
        contrib = (
            e.join(p, e["s"] == p["node"])
            .select(
                F.col("t"),
                (F.col("score") / F.col("d").cast("double") * F.lit(damping))
                .cast("decimal(38,18)")
                .alias("c"),
            )
            .groupBy("t")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        p = p.join(contrib, p["node"] == contrib["t"], "left").select(
            "node",
            "d",
            "n",
            (
                F.lit(1.0 - damping) / F.col("n").cast("double")
                + F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("score"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            p = p.localCheckpoint()
    return p.select("node", F.round("score", out_prec).alias("pagerank"))


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    orient: str = "id",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    — the clustering/cohesion readout (a part that triangulates with
    many co-purchased parts is a bundle anchor; a document whose
    near-dup edges triangulate is inside a dense duplicate clique, not
    a chain of borderline pairs).

    ``orient="id"`` is the canonical ordered form: edges normalize to
    ``a < b`` and dedupe, wedges come from ONE self-join on the shared
    middle vertex (``(a<b) ⋈ (b<c)`` → ordered candidate ``a<b<c``),
    and a left-semi probe against the edge set closes each wedge.
    Every triangle is generated exactly once (only from its ordered
    form), then exploded to its three corners for the per-node count.

    ``orient="degree"`` produces the SAME counts with each edge
    oriented toward its higher-``(degree, id)`` endpoint and wedges
    enumerated at their lowest-rank corner — the classic hub fix: a
    node's wedge fan-out is C(out-degree, 2), and degree orientation
    caps out-degree at O(sqrt(m)), giving the provable O(m^1.5) wedge
    bound. Under id ordering one low-id hub with degree d emits
    C(d, 2) wedges regardless of m; on power-law co-occurrence graphs
    (every token edge touching a stopword) that single skew key is
    the job. Costs one extra degree aggregate + two rank joins, so
    the id form stays the default for benign graphs.

    Scale shape: two shuffles (wedge join on the shared corner, semi
    probe on the closing pair) plus the counting aggregate.
    Self-loops are dropped; parallel edges collapse in the distinct.
    """
    if orient not in ("id", "degree"):
        raise ValueError(f"orient must be id|degree, got {orient!r}")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # materialized (r16 sweep): three differently-keyed consumers
        # (both wedge sides + the closing semi probe) each re-ran the
        # caller's edge lineage; two longs per edge
        .localCheckpoint(eager=True)
    )
    if orient == "id":
        wedges = e.join(
            e.select(F.col("a").alias("b"), F.col("b").alias("c")), on="b"
        ).select("a", "b", "c")
        tri = wedges.join(
            e.select(F.col("a"), F.col("b").alias("c")),
            on=["a", "c"],
            how="left_semi",
        )
    else:
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        # rank every endpoint by (degree, id); orient low -> high
        ranked = (
            e.join(deg.withColumnRenamed("node", "a"), on="a")
            .withColumnRenamed("deg", "da")
            .join(deg.withColumnRenamed("node", "b"), on="b")
            .withColumnRenamed("deg", "db")
        )
        a_lower = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        d = ranked.select(
            F.when(a_lower, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_lower, F.struct("db", "b"))
            .otherwise(F.struct(F.col("da").alias("db"), F.col("a").alias("b")))
            .alias("hi"),
        ).select("u", F.col("hi.b").alias("v"), F.col("hi.db").alias("dv"))
        # wedges at the lowest-rank corner: each unordered out-pair once
        d2 = d.select(
            F.col("u"), F.col("v").alias("w"), F.col("dv").alias("dw")
        )
        v_lower = (F.col("dv") < F.col("dw")) | (
            (F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w"))
        )
        wedges = d.join(d2, on="u").filter(v_lower).select("u", "v", "w")
        # the closing edge between v and w is oriented v -> w (v is the
        # lower rank), so ONE semi probe against the directed set closes
        tri = wedges.join(
            d.select(F.col("u").alias("v"), F.col("v").alias("w")),
            on=["v", "w"],
            how="left_semi",
        ).select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("w").alias("c"))
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Members of the k-core — the maximal subgraph in which every
    node keeps degree >= k — by simultaneous peeling: each round drops
    ALL nodes currently under degree k (and their edges), repeating
    until no node is under the bar. The dedup read: a near-dup
    component can be a dense clique (one boilerplate template — safe
    to keep one survivor) or a thin chain of borderline pairs
    (transitive drift — survivors may not resemble each other); the
    k-core separates the two where triangle counts only hint.

    Returns ``(node, degree)`` for surviving nodes (degree measured
    inside the core). Empty when nothing survives. Peeling is the
    standard degeneracy algorithm; simultaneous rounds converge in
    the graph's peel depth (small for real corpora — each round
    removes every currently-unsupported node at once), with
    ``max_iter`` as the runaway guard and ``RuntimeError`` rather
    than a silently-partial core if it trips.

    Scale shape per round: one degree aggregate (groupBy node over
    the bidirected edge list) and two broadcast-friendly left-anti
    joins against the (small, shrinking) low-degree node set; lineage
    truncates with an eager localCheckpoint EVERY round (the loop
    takes several actions per round, so uncheckpointed lineage
    re-executes the whole cascade each time). The driver sees only a
    per-round emptiness flag — never node or edge data. Worst case is
    O(n) rounds (k=2 on a bare path peels two endpoints per round —
    a 2·max_iter-node chain therefore trips ``max_iter`` by design,
    raising rather than returning a silently-partial core); real
    near-dup corpora peel in single-digit rounds — the sf0.1
    documents trigram-Jaccard graph (suite query
    ``graph_kcore_members``) converges in 2 rounds (measured; see
    tests/test_graph.py chain test for the max_iter guard).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        bidir = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        deg = bidir.groupBy("a").agg(F.count("*").alias("deg"))
        low = deg.filter(F.col("deg") < k).select("a").persist()
        try:
            if low.isEmpty():
                return deg.select(
                    F.col("a").alias("node"), F.col("deg").alias("degree")
                )
            # normalize column ORDER after the joins: join(on="b") puts
            # the key first ([b, a]) and the next round's positional
            # union would silently cross the endpoints. Eager
            # localCheckpoint EVERY round: the loop takes multiple
            # actions per round (the two emptiness probes, the next
            # round's aggregate), and without truncation each
            # re-executes the whole anti-join cascade from scratch —
            # a deep-cascade graph measured 3x the wall before this.
            e = (
                e.join(low, on="a", how="left_anti")
                .join(low.select(F.col("a").alias("b")), on="b", how="left_anti")
                .select("a", "b")
                .localCheckpoint()
            )
        finally:
            low.unpersist()
        if e.isEmpty():
            # nothing survives: an empty, correctly-typed result
            return e.select(
                F.col("a").alias("node"), F.lit(0).cast("long").alias("degree")
            )
    raise RuntimeError(f"k_core did not converge in {max_iter} rounds")


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al.
    2007), made DETERMINISTIC: every node starts with its own id as
    label; each round every node simultaneously adopts the MOST
    FREQUENT label among its neighbors, ties broken toward the
    SMALLEST label (the published algorithm leaves tie-breaks and
    update order random — fixing both makes the result a pure function
    of the edge set, replayable by an oracle and stable across
    reruns). The node universe is the endpoints of the bidirected
    edge list AFTER self-loops are dropped: a node appearing only in
    self-loop edges (or not at all) has no neighbors to vote, is never
    reachable by a label, and is EXCLUDED from the output entirely —
    callers wanting isolated nodes as singleton communities union them
    back from their node spine (pinned in
    test_graph.py::test_isolated_and_validation). Returns
    ``(node, community)`` after exactly ``rounds`` rounds.

    Where :func:`connected_components` answers reachability (one
    bridge edge glues two boilerplate families into one component),
    mode-propagation answers DENSITY: a label only takes over a node
    when it owns a plurality of its edges, so thin bridges between
    dense near-dup communities do not merge them in few rounds — the
    community read of the same k-core intuition. Labels move one hop
    per round: choose ``rounds`` ~ the community diameter you care
    about (near-dup communities are shallow; 3-5 covers them).

    Scale shape per round — TWO exchanges of edge-sized data, the
    standard synchronous-LPA cost: the neighbor join keys on the
    DESTINATION endpoint ``b`` (labels shuffle node-sized alongside),
    then the vote groupBy re-keys the joined rows on the SOURCE
    ``(a, lbl)`` — a different key, so the second exchange cannot
    reuse the first (measured at sf1 in SCALE.md; an earlier
    docstring claimed one stable exchange, which was wrong). After
    the votes it is node-sized work: one ``min_by`` argmax per node
    and a left join back onto the node spine; lineage truncates with
    an eager localCheckpoint each round (the k_core discipline), so
    round N never replays rounds 1..N-1. The driver never sees node
    data."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    bidir = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).filter(F.col("a") != F.col("b")).distinct()
    nodes = bidir.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("community"))
    for r in range(rounds):
        nbr = (
            bidir.join(
                labels.select(
                    F.col("node").alias("b"), F.col("community").alias("lbl")
                ),
                on="b",
            )
            .groupBy(F.col("a").alias("node"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        # plurality with smallest-label ties: minimize (-count, label)
        pick = nbr.groupBy("node").agg(
            F.min_by(
                "lbl", F.struct((-F.col("c")).alias("nc"), F.col("lbl").alias("l"))
            ).alias("new_lbl")
        )
        labels = (
            labels.join(pick, on="node", how="left")
            .select(
                "node",
                F.coalesce("new_lbl", "community").alias("community"),
            )
            .localCheckpoint(eager=True)
        )
    return labels
