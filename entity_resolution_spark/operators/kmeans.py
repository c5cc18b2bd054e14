"""Distributed Lloyd k-means over an embedding column, bit-exactly
reproducible across engines (engine-added training-data operator: topic
bucketing / domain discovery over document embeddings, the clustering step
of cluster-balanced sampling).

Why this is oracle-able when textbook k-means is not: float centroid
means depend on partition summation order, so two engines (or two runs at
different parallelism) flip borderline assignments. Here every vector is
first quantized to FIXED-POINT LONGS (round(x * scale)), so

- centroid state is an exact integer sum vector + count — addition is
  associative/commutative over longs, so the state is independent of
  partition order, and
- cosine(x, centroid) is scale-invariant, so assignment uses the raw sum
  vector (no division), computed as a SEQUENTIAL index-order dot product
  (`F.aggregate`/`zip_with`) — the identical op order DuckDB's
  list_cosine_similarity uses, giving bit-identical doubles even where
  the dot exceeds 2^53.

Initialization is content-addressed (the k smallest ids seed cells
0..k-1), never sampled — no RNG anywhere. Ties in assignment break to the
smallest cell id; cells that lose all members drop out (k shrinks), same
on both engines.

Scale shape: per iteration, one broadcast of the k-row centroid table
against the corpus; the per-id best cell is a max(struct) hash aggregate,
so map-side combine collapses the n x k scored rows back to n before any
shuffle. New sums are one (cell, pos)-keyed hash aggregate — uniform
keys, fan-out = k x dim, never skewed by cluster size.
`localCheckpoint` between iterations cuts the growing lineage (the
connected-components convention). Overflow headroom: |csum_i| <=
scale x max|x| x n_members — int64 holds ~9.2e18, so ~1e10 members per
cell at scale=1e6 and |x|<=1; shrink `scale` for bigger clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantized(emb: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    xq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(float(scale))).cast("long"),
    )
    return emb.select(F.col(id_col).alias("__id"), xq.alias("__xq"))


def _cos_int(a, b):
    """Sequential-order cosine of two array<long> columns, math in double;
    -1.0 when either side is the zero vector (same convention as
    similarity_search._cosine_cols)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, x: s + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(-1.0))


# per-id argmax over the k scored cells as a max(struct) aggregate —
# map-side partial-aggregated (the n x k intermediate collapses to n
# rows before the shuffle), unlike a row_number window which shuffles
# and sorts all n x k rows. Tie on cosine -> smallest cell, encoded as
# max of (cos, -cell): lexicographic struct order.
def _label(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(__id, cell, __cos) — each row's best cell against `cents`."""
    scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "__cos", _cos_int(F.col("__xq"), F.col("__csum"))
    )
    best = F.max(F.struct(F.col("__cos"), (-F.col("cell")).alias("__negcell"))).alias("__b")
    return (
        scored.groupBy("__id")
        .agg(best)
        .select(
            "__id",
            (-F.col("__b.__negcell")).cast("int").alias("cell"),
            F.col("__b.__cos").alias("__cos"),
        )
    )


def _lloyd(q: DataFrame, k: int, iters: int) -> DataFrame:
    """(cell, __csum) — centroid sum vectors after ``iters`` Lloyd rounds
    from the content-addressed init (k smallest ids)."""
    w_init = Window.orderBy("__id")
    cents = (
        q.orderBy("__id")
        .limit(k)
        .select(
            (F.row_number().over(w_init) - 1).cast("int").alias("cell"),
            F.col("__xq").alias("__csum"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        sums = (
            _label(q, cents).join(q, "__id")
            .select("cell", F.posexplode("__xq").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("val"))
        )
        # checkpoint only the k-row centroid table per round — it both cuts
        # the growing lineage and is the only state the next round reads
        cents = (
            sums.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "val"))),
                    lambda s: s["val"],
                ).alias("__csum")
            )
            .localCheckpoint(eager=True)
        )
    return cents


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """(id_col, cell, cosine) — each vector's cluster after ``iters`` Lloyd
    rounds from the content-addressed init, with its cosine to the final
    centroid sum (round-6). Deterministic for any partitioning."""
    q = _quantized(emb, id_col, vec_col, scale).localCheckpoint(eager=True)
    final = _label(q, _lloyd(q, k, iters))
    return final.select(
        F.col("__id").alias(id_col),
        "cell",
        F.round("__cos", 6).alias("cosine"),
    )


def embedding_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """(cell, n_a, n_b, share_a, share_b, delta) — embedding-distribution
    drift between two corpus snapshots: fit k-means on snapshot A (the
    standing corpus), label BOTH snapshots with A's final centroids, and
    report each cell's population share on each side plus the share shift
    ``delta = share_b - share_a`` (round-6). The embedding-space
    counterpart of `stats.token_drift` — a new crawl whose mass moves into
    different semantic cells than the standing corpus gets caught before
    it trains.

    Deterministic: the fit is `_lloyd`'s fixed-point integer state, labels
    are exact-argmax, and shares are single double divisions of exact
    longs. Cells that end empty on one side report share 0. Scale shape:
    same as `kmeans_assign` (broadcast k-row centroids, partial-agg
    argmax), plus two |cells|-row aggregates and a 1-row count broadcast
    per side."""
    qa = _quantized(emb_a, id_col, vec_col, scale).localCheckpoint(eager=True)
    qb = _quantized(emb_b, id_col, vec_col, scale).localCheckpoint(eager=True)
    cents = _lloyd(qa, k, iters)
    ca = _label(qa, cents).groupBy("cell").agg(F.count("*").alias("n_a"))
    cb = _label(qb, cents).groupBy("cell").agg(F.count("*").alias("n_b"))
    tot_a = F.lit(qa.count()).cast("double")
    tot_b = F.lit(qb.count()).cast("double")
    joined = ca.join(cb, "cell", "full_outer").select(
        "cell",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    share_a = F.when(tot_a > 0, F.col("n_a") / tot_a).otherwise(F.lit(0.0))
    share_b = F.when(tot_b > 0, F.col("n_b") / tot_b).otherwise(F.lit(0.0))
    return joined.select(
        "cell",
        "n_a",
        "n_b",
        F.round(share_a, 6).alias("share_a"),
        F.round(share_b, 6).alias("share_b"),
        F.round(share_b - share_a, 6).alias("delta"),
    )


def cluster_balanced_sample(
    emb: DataFrame,
    per_cell: int,
    k: int = 8,
    iters: int = 3,
    keep: str = "prototypical",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    n_salts: int = 32,
) -> DataFrame:
    """(id_col, cell, cosine, rank) — up to ``per_cell`` vectors from each
    k-means cell, i.e. a topic-balanced subsample of the embedding table.

    ``keep`` picks which end of each cell survives, the two data-pruning
    policies of Sorscher et al. 2022 ("Beyond neural scaling laws"):

    - ``"prototypical"``: highest cosine to the cell centroid first —
      cluster exemplars (labeling/inspection sets, cluster-balanced eval).
    - ``"hard"``: lowest cosine first — the examples far from every
      prototype, the ones worth keeping when data is abundant.

    Ranking uses the round-6 cosine with the id as tiebreak, so the chosen
    set is identical on any engine and partitioning. Scale shape: rides
    `kmeans_assign` (broadcast centroids), then distributed top-m per cell
    in two phases — a salted local window (each task sorts ~n/(k·salts)
    rows and keeps per_cell) followed by a final window over at most
    k·salts·per_cell survivors. The global top-m of a cell is contained in
    the union of its salted local top-ms, so the result is independent of
    ``n_salts``; no task ever sorts a whole cell."""
    if keep not in ("prototypical", "hard"):
        raise ValueError(f"keep must be 'prototypical' or 'hard', got {keep!r}")
    assigned = kmeans_assign(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)
    order = F.desc("cosine") if keep == "prototypical" else F.asc("cosine")
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(n_salts)))
    w_local = Window.partitionBy("cell", "__salt").orderBy(order, F.asc(id_col))
    survivors = (
        assigned.withColumn("__salt", salt)
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= per_cell)
    )
    w = Window.partitionBy("cell").orderBy(order, F.asc(id_col))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_cell)
        .select(id_col, "cell", "cosine", "rank")
    )
