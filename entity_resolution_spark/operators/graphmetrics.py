"""Similarity-graph structure metrics: triangle counts + local clustering
coefficient.

Transitive closure (clustering.py) tells you WHICH records glue into an
entity; triangle density tells you HOW WELL-SUPPORTED that gluing is — a
chain A-B-C with no closing A-C edge is exactly the over-merge signal
cluster_edge_density flags, and the per-node clustering coefficient is its
graph-theoretic form (used the same way in Neo4j/GraphFrames ER audits).

Algorithm: the degree-oriented wedge join (Suri & Vassilvitskii, WWW 2011
"Counting triangles and the curse of the last reducer"). Every undirected
edge is oriented from its lower-(degree, id) endpoint to the higher one,
making the out-degree of ANY node O(sqrt(m)) — so the wedge self-join on
the source never explodes on hub nodes (the skew story a naive
neighbor-intersection join lacks), and each triangle materializes exactly
once. All JVM joins/aggregates, no UDF, ~3 shuffles on edge keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def triangle_stats(
    edges: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Per-node (id, degree, triangles, clustering_coefficient round-6)
    over an undirected simple graph given as edge rows (any orientation,
    duplicates and self-loops tolerated — canonicalized first)."""
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient each edge from its lower (degree, id) endpoint: out-degree is
    # then bounded by O(sqrt(m)) for every node, so the wedge join below
    # cannot blow up on hubs
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("__db"))
    ed = e.join(da.hint("shuffle_hash"), "a").join(db.hint("shuffle_hash"), "b")
    fwd = F.struct("__da", "a") < F.struct("__db", "b")
    oriented = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("d"),
        F.when(fwd, F.col("__da")).otherwise(F.col("__db")).alias("__ds"),
        F.when(fwd, F.col("__db")).otherwise(F.col("__da")).alias("__dd"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select("s", F.col("d").alias("u"), F.col("__dd").alias("__du"))
    o2 = oriented.select("s", F.col("d").alias("v"), F.col("__dd").alias("__dv"))
    wedges = o1.join(o2, "s").where(
        F.struct("__du", "u") < F.struct("__dv", "v")
    )
    closing = oriented.select(F.col("s").alias("u"), F.col("d").alias("v"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["u", "v"]).select("s", "u", "v")
    per_node = (
        tri.select(F.explode(F.array("s", "u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    d = F.col("degree").cast("double")
    return (
        deg.join(per_node, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0 * F.coalesce("triangles", F.lit(0)) / (d * (d - 1.0)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering_coefficient"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Power-iteration PageRank over the undirected simple graph ->
    (id, rank round-6) after a FIXED number of iterations (deterministic —
    a convergence test would make the result depend on FP epsilons).

    On a similarity graph, rank concentrates on the records most broadly
    connected inside their entity — the standard centrality rule for
    picking a cluster representative when survivorship has no better
    field rule. Undirected edges become two directed edges; every node
    then has out-degree >= 1, so there are no dangling-mass corrections.

    Scale shape: the edge list is the only large frame and is hashed once
    (persisted across iterations); each iteration is one shuffle-hash
    join edge->rank plus one aggregate, with localCheckpoint per round to
    keep the plan linear (the clustering.py CC convention — without it,
    Catalyst re-derives an exponentially deep tree).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    directed = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    deg = directed.groupBy("a").agg(F.count(F.lit(1)).alias("__deg"))
    out_edges = directed.join(deg.hint("shuffle_hash"), "a").localCheckpoint(
        eager=True
    )
    nodes = deg.select(F.col("a").alias("id")).localCheckpoint(eager=True)
    n = nodes.count()
    base = (1.0 - damping) / n
    rank = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            out_edges.join(
                rank.withColumnRenamed("id", "a").hint("shuffle_hash"), "a"
            )
            .groupBy(F.col("b").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__in"))
        )
        rank = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce("__in", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return rank.select("id", F.round("rank", 6).alias("rank"))


def hits(
    edges: DataFrame,
    iterations: int = 10,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the undirected
    simple graph -> (id, hub round-6, authority round-6) after a FIXED
    number of iterations with L1 normalization each round (L1, not the
    textbook L2, keeps the oracle free of cross-engine sqrt-sum drift;
    the ranking is identical). On an undirected graph hub == authority
    at convergence, but the per-iteration trajectories already agree, so
    both columns are reported from the same vector for API parity with
    directed callers.

    Same scale/plan conventions as pagerank: edge list hashed once,
    one join + aggregate per iteration, localCheckpoint per round.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    directed = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    nodes = directed.select(F.col("a").alias("id")).distinct().localCheckpoint(
        eager=True
    )
    n = nodes.count()
    score = nodes.select("id", F.lit(1.0 / n).alias("s"))
    for _ in range(iterations):
        nxt = (
            directed.join(score.withColumnRenamed("id", "a").hint("shuffle_hash"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.sum("s").alias("__raw"))
        )
        tot = nxt.agg(F.sum("__raw").alias("__tot"))
        score = (
            nxt.crossJoin(F.broadcast(tot))
            .select("id", (F.col("__raw") / F.col("__tot")).alias("s"))
            .localCheckpoint(eager=True)
        )
    return score.select(
        "id", F.round("s", 6).alias("hub"), F.round("s", 6).alias("authority")
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    left_col: str = "left_id",
    right_col: str = "right_id",
    max_rounds: int = 200,
) -> DataFrame:
    """(id, degree) — the k-core of the undirected simple graph: the
    maximal subgraph where every node keeps >= k neighbors (Seidman
    1983). On a similarity graph the 2-core separates densely-supported
    duplicate groups from pendant chains — the structural complement of
    the triangle audit. Computed by the standard parallel peeling loop:
    drop all nodes of degree < k simultaneously, recompute, repeat to a
    fixpoint (the result is unique, so peeling order cannot matter);
    per round one census + two anti-joins, driver sees one empty-check
    scalar (the CC/canopy control-plane convention).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cur = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("id"))
            .unionAll(cur.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        weak = deg.where(F.col("degree") < k).select("id").localCheckpoint(eager=True)
        if weak.isEmpty():
            return deg
        cur = (
            cur.join(weak.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(weak.withColumnRenamed("id", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k-core peeling did not converge in {max_rounds} rounds")


def bfs_distance(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 10,
    left_col: str = "left_id",
    right_col: str = "right_id",
    id_col: str = "id",
) -> DataFrame:
    """(id, hops, root) — multi-source BFS over the undirected simple
    graph: every node reachable within ``max_hops`` of any source gets
    its minimum hop count and a deterministic ``root`` (the smallest
    source id among those at minimum distance). The label-spreading /
    nearest-labeled-record primitive: seed the sources with reviewed
    records and every neighbor learns who vouches for it.

    Frontier expansion, one join per hop: the frontier joins the edge
    list, discovered nodes drop via anti-join against the settled set,
    per-node min-(root) resolves simultaneous discoveries;
    localCheckpoint per round (the CC convention). Work per hop is
    O(edges touching the frontier)."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    directed = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    settled = (
        sources.select(F.col(id_col).alias("id"))
        .distinct()
        .select("id", F.lit(0).alias("hops"), F.col("id").alias("root"))
        .localCheckpoint(eager=True)
    )
    frontier = settled
    for hop in range(1, max_hops + 1):
        if frontier.isEmpty():
            break
        discovered = (
            directed.join(
                frontier.withColumnRenamed("id", "a").hint("shuffle_hash"), "a"
            )
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("root").alias("root"))
            .join(settled.select("id"), "id", "left_anti")
            .select("id", F.lit(hop).alias("hops"), "root")
            .localCheckpoint(eager=True)
        )
        settled = settled.unionAll(discovered).localCheckpoint(eager=True)
        frontier = discovered
    return settled


def label_propagation(
    edges: DataFrame,
    iterations: int = 5,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007, deterministic variant) -> (id, community) after a FIXED number
    of rounds.

    Every node starts labeled with its own id; each round it adopts the
    most frequent label among its neighbors, ties broken by the SMALLEST
    label — the synchronous min-tiebreak schedule, fully deterministic
    (the paper's random asynchronous order is not reproducible across
    cluster runs). On a similarity graph this yields coarser,
    density-driven groupings than connected components: bridges of one
    edge don't merge two dense communities the way CC's transitive
    closure does, which is the standard diagnostic for over-merged
    entity clusters.

    Scale shape: same as pagerank — the directed edge list is built once
    and persisted; each round is one shuffle-hash join (edge -> label),
    one (node,label) count aggregate, and one per-node arg-max aggregate
    (max over struct(count, -label) — a hash agg with map-side partials,
    no window sort), with localCheckpoint per round keeping lineage flat.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    directed = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = directed.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("lab")
    )
    for _ in range(iterations):
        counts = (
            directed.join(
                labels.withColumnRenamed("id", "a").hint("shuffle_hash"), "a"
            )
            .groupBy(F.col("b").alias("id"), "lab")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        # arg-max by (count desc, label asc), type-agnostic: min over
        # (-count, label) picks max count then smallest label for any
        # orderable label type (negating the label itself would NULL out
        # string ids and break the deterministic min-label schedule)
        labels = (
            counts.groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__c")).alias("__nc"), F.col("lab")
                    )
                ).alias("__m")
            )
            .select("id", F.col("__m.lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
    return labels.select("id", F.col("lab").alias("community"))


def link_prediction(
    edges: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    min_common: int = 1,
    max_middle_degree: int | None = None,
) -> DataFrame:
    """Missing-link scoring over an undirected graph (Liben-Nowell &
    Kleinberg 2003): for every non-adjacent pair sharing >= ``min_common``
    neighbors, (left_id, right_id, common_neighbors, adamic_adar,
    nbr_jaccard) — AA = sum over shared neighbors m of 1/ln(deg(m)),
    nbr_jaccard = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|. In the dedup pipeline this
    ranks pairs the similarity join MISSED (candidate recall repair) and
    flags near-merges for review.

    Scale shape: a wedge join on the middle node — each middle m emits
    C(deg(m), 2) wedges, so hub middles dominate the cost. A hub's AA
    contribution is the SMALLEST (1/ln deg), so ``max_middle_degree``
    drops super-node middles from the wedge role (the metablocking-style
    guard; pass None to keep all). Degrees come from one census; the
    existing-edge exclusion is a key-only anti join on the canonical
    (min, max) pair.
    """
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("dg"))
    mid = sym.join(
        deg.hint("shuffle_hash"), sym["a"] == deg["id"]
    ).select(F.col("a").alias("m"), F.col("b").alias("x"), F.col("dg").alias("dm"))
    if max_middle_degree is not None:
        mid = mid.where(F.col("dm") <= max_middle_degree)
    w1 = mid.select("m", F.col("x").alias("u"), "dm")
    w2 = mid.select("m", F.col("x").alias("v"))
    wedges = w1.join(w2, "m").where(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("dm").cast("double"))).alias("_aa"),
    )
    non_edges = scored.join(
        e.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    ).where(F.col("common_neighbors") >= min_common)
    du = deg.select(F.col("id").alias("u"), F.col("dg").alias("_du"))
    dv = deg.select(F.col("id").alias("v"), F.col("dg").alias("_dv"))
    out = non_edges.join(du.hint("shuffle_hash"), "u").join(
        dv.hint("shuffle_hash"), "v"
    )
    return out.select(
        F.col("u").alias("left_id"),
        F.col("v").alias("right_id"),
        "common_neighbors",
        F.round("_aa", 6).alias("adamic_adar"),
        F.round(
            F.col("common_neighbors")
            / (F.col("_du") + F.col("_dv") - F.col("common_neighbors")).cast(
                "double"
            ),
            6,
        ).alias("nbr_jaccard"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Newman-Girvan modularity of a node partition: one row (n_edges,
    n_communities, modularity) with Q = sum over communities of
    (e_c/m - (deg_c/2m)^2) — the standard audit of whether a community
    assignment (LPA labels, cluster ids, or an external attribute) beats
    the degree-preserving null model. Nodes missing from ``labels`` form
    their own singleton community per node (left join, label = own id).

    Scale shape: edge canonicalization + two shuffle-hash label joins +
    census aggregates; the final sum runs over community-count rows.
    """
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lab = labels.select(
        F.col(id_col).alias("_id"), F.col(label_col).cast("string").alias("_lab")
    )
    la = lab.select(F.col("_id").alias("a"), F.col("_lab").alias("_la"))
    lb = lab.select(F.col("_id").alias("b"), F.col("_lab").alias("_lb"))
    tagged = (
        e.join(la.hint("shuffle_hash"), "a", "left")
        .join(lb.hint("shuffle_hash"), "b", "left")
        .select(
            F.coalesce("_la", F.col("a").cast("string")).alias("_la"),
            F.coalesce("_lb", F.col("b").cast("string")).alias("_lb"),
        )
    )
    m_row = e.agg(F.count(F.lit(1)).alias("_m"))
    intra = tagged.where(F.col("_la") == F.col("_lb")).groupBy(
        F.col("_la").alias("_c")
    ).agg(F.count(F.lit(1)).alias("_ec"))
    # community degree mass: every edge endpoint contributes 1 to its
    # community's degree sum
    ends = tagged.select(F.col("_la").alias("_c")).unionAll(
        tagged.select(F.col("_lb").alias("_c"))
    )
    degc = ends.groupBy("_c").agg(F.count(F.lit(1)).alias("_dc"))
    per_c = degc.join(intra.hint("shuffle_hash"), "_c", "left").select(
        "_c",
        F.coalesce("_ec", F.lit(0)).alias("_ec"),
        "_dc",
    )
    return (
        per_c.crossJoin(F.broadcast(m_row))
        .agg(
            F.max("_m").alias("n_edges"),
            F.count(F.lit(1)).alias("n_communities"),
            F.round(
                F.sum(
                    F.col("_ec") / F.col("_m")
                    - (F.col("_dc") / (F.lit(2.0) * F.col("_m")))
                    * (F.col("_dc") / (F.lit(2.0) * F.col("_m")))
                ),
                6,
            ).alias("modularity"),
        )
    )


def assortativity(
    edges: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): one row (n_edges,
    assortativity) — the Pearson correlation of endpoint degrees over the
    symmetrized edge list (each undirected edge counted in both
    directions, the standard convention). Positive: hubs link to hubs;
    negative: hub-and-spoke. NULL when degrees are constant.

    One degree census + two shuffle-hash joins + a single moment
    aggregate — the same closed-form identity as `stats.correlation_report`.
    """
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("dg"))
    du = deg.select(F.col("id").alias("a"), F.col("dg").alias("_du"))
    dv = deg.select(F.col("id").alias("b"), F.col("dg").alias("_dv"))
    pairs = sym.join(du.hint("shuffle_hash"), "a").join(
        dv.hint("shuffle_hash"), "b"
    )
    x = F.col("_du").cast("double")
    y = F.col("_dv").cast("double")
    mrow = pairs.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    den = F.sqrt(
        (n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        * (n * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    )
    return mrow.select(
        (F.col("_n") / 2).cast("long").alias("n_edges"),
        F.when(
            den > 0,
            F.round(
                (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den, 6
            ),
        ).alias("assortativity"),
    )


def degree_profile(
    edges: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Degree distribution of the undirected simple graph: one row per
    observed degree — (degree, n_nodes, frac_nodes, cum_frac) with the
    cumulative fraction over ascending degree. The first graph-shape
    diagnostic before any quadratic work: a heavy tail here is the
    hub-explosion warning for wedge joins (`link_prediction`) and
    block-based candidate generation, and the basis for choosing
    `max_middle_degree` / stop-key budgets.

    Scale shape: canonical-edge dedup, one degree hash aggregate, then a
    census-sized histogram — the window for cum_frac runs over rows ==
    distinct degrees, never nodes or edges.
    """
    e = (
        edges.select(
            F.least(left_col, right_col).alias("a"),
            F.greatest(left_col, right_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    directed = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = directed.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    w_all = Window.partitionBy()
    w_cum = Window.partitionBy().orderBy("degree").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("n_nodes").over(w_all)
    return hist.select(
        "degree",
        "n_nodes",
        F.round(F.col("n_nodes") / total, 6).alias("frac_nodes"),
        F.round(F.sum("n_nodes").over(w_cum) / total, 6).alias("cum_frac"),
    )
