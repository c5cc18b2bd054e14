"""Cluster-quality metrics — the north-rule acceptance metric (pairwise
F1 on labeled/reference pairs) as a first-class distributed operator.

``pairwise_cluster_metrics(pred, truth)`` compares two clusterings over
their common id universe WITHOUT materializing pairs: all three pair
counts come from the contingency table via C(n,2) sums —

    tp_pairs    = Σ_ij C(n_ij, 2)   (pairs co-clustered in BOTH)
    pred_pairs  = Σ_i  C(n_i·, 2)   (pairs co-clustered in pred)
    truth_pairs = Σ_j  C(n_·j, 2)   (pairs co-clustered in truth)

so a 10^8-member cluster costs one aggregate row, not 10^16 pair rows.
One shuffle on id for the join, one narrow shuffle for the contingency
groupBy; everything after is arithmetic on cluster-count-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    # n*(n-1) fits long for any realistic cluster (overflow at n ~ 3e9,
    # where ANSI mode would fail loudly, not silently wrap). Integer DIV —
    # n*(n-1) is always even — keeps C(n,2) exact past the 2^53 double
    # mantissa (clusters >= ~1.3e8 members would lose low bits under `/`).
    n = col.cast("long")
    return F.shiftright(n * (n - F.lit(1)), 1)


def pairwise_cluster_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "file_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One row: (tp_pairs, pred_pairs, truth_pairs, pair_precision,
    pair_recall, pair_f1), round-6, over ids present in both inputs."""
    j = pred.select(F.col(id_col), F.col(cluster_col).alias("__p")).join(
        truth.select(F.col(id_col), F.col(cluster_col).alias("__t")), id_col
    )
    cont = j.groupBy("__p", "__t").agg(F.count("*").alias("n")).persist()
    tp = cont.agg(F.coalesce(F.sum(_c2(F.col("n"))), F.lit(0)).alias("tp_pairs"))
    pp = (
        cont.groupBy("__p")
        .agg(F.sum("n").alias("n"))
        .agg(F.coalesce(F.sum(_c2(F.col("n"))), F.lit(0)).alias("pred_pairs"))
    )
    tt = (
        cont.groupBy("__t")
        .agg(F.sum("n").alias("n"))
        .agg(F.coalesce(F.sum(_c2(F.col("n"))), F.lit(0)).alias("truth_pairs"))
    )
    out = tp.crossJoin(pp).crossJoin(tt)
    p = F.when(F.col("pred_pairs") > 0, F.col("tp_pairs") / F.col("pred_pairs")).otherwise(
        F.lit(0.0)
    )
    r = F.when(F.col("truth_pairs") > 0, F.col("tp_pairs") / F.col("truth_pairs")).otherwise(
        F.lit(0.0)
    )
    f1 = F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    result = out.select(
        "tp_pairs",
        "pred_pairs",
        "truth_pairs",
        F.round(p, 6).alias("pair_precision"),
        F.round(r, 6).alias("pair_recall"),
        F.round(f1, 6).alias("pair_f1"),
    )
    result = result.localCheckpoint(eager=True)
    cont.unpersist()
    return result


def blocking_quality(
    blocks: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    block_col: str = "block_key",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One row of blocking-scheme evaluation metrics (Christen 2012,
    "Data Matching" ch. 7): how much work a blocking key saves and how
    many true matches it keeps reachable.

      comparisons        = sum_b C(n_b, 2)   (candidate comparisons the
                           scheme generates; multi-block pairs count once
                           per shared block — the COST metric)
      total_pairs        = C(N, 2) over the labeled records
      reduction_ratio    = 1 - comparisons / total_pairs
      truth_pairs        = sum_t C(n_t, 2)
      covered_true_pairs = DISTINCT same-truth pairs sharing >= 1 block
      pair_completeness  = covered / truth_pairs     (blocking recall)
      pair_quality       = covered / comparisons     (blocking precision)

    Scale shape: comparisons / total_pairs / truth_pairs are C(n,2) sums
    over hash-aggregated censuses — no pair materialization (quality.py's
    `_c2` integer arithmetic). Only covered_true_pairs joins pairs out,
    and only WITHIN (block, truth-cluster) intersections — bounded by the
    labeled ground truth, which is eval-set-sized in practice; corpus-scale
    blocks with no shared truth label never pair. Ratios round-6.
    """
    e = blocks.select(F.col(id_col).alias("id"), F.col(block_col).alias("b")).distinct()
    t = truth.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("t"))

    comparisons = (
        e.groupBy("b")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(_c2(F.col("n"))), F.lit(0)).alias("comparisons"))
    )
    n_records = t.select("id").distinct().agg(F.count("*").alias("n_records"))
    truth_pairs = (
        t.groupBy("t")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(_c2(F.col("n"))), F.lit(0)).alias("truth_pairs"))
    )
    et = e.join(t.hint("shuffle_hash"), "id")
    l = et.select(F.col("b"), F.col("t"), F.col("id").alias("i"))
    r = et.select(F.col("b"), F.col("t"), F.col("id").alias("j"))
    covered = (
        l.join(r.hint("shuffle_hash"), ["b", "t"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j")
        .distinct()
        .agg(F.count("*").alias("covered_true_pairs"))
    )
    out = n_records.crossJoin(comparisons).crossJoin(truth_pairs).crossJoin(covered)
    total = _c2(F.col("n_records"))
    rr = F.when(total > 0, 1.0 - F.col("comparisons") / total).otherwise(F.lit(0.0))
    pc = F.when(
        F.col("truth_pairs") > 0, F.col("covered_true_pairs") / F.col("truth_pairs")
    ).otherwise(F.lit(0.0))
    pq = F.when(
        F.col("comparisons") > 0, F.col("covered_true_pairs") / F.col("comparisons")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("n_records").cast("long").alias("n_records"),
        total.cast("long").alias("total_pairs"),
        F.col("comparisons").cast("long").alias("comparisons"),
        F.col("truth_pairs").cast("long").alias("truth_pairs"),
        F.col("covered_true_pairs").cast("long").alias("covered_true_pairs"),
        F.round(rr, 6).alias("reduction_ratio"),
        F.round(pc, 6).alias("pair_completeness"),
        F.round(pq, 6).alias("pair_quality"),
    )


def cluster_edge_density(
    assignments: DataFrame,
    scored_edges: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
    left_col: str = "left_id",
    right_col: str = "right_id",
    score_col: str = "posterior",
) -> DataFrame:
    """Per-cluster consistency audit -> (cluster_id, n_members, n_edges,
    possible_pairs, density, min_score, mean_score).

    Transitive closure can chain A~B~C into one entity even when A-C never
    scored confidently; low density or a low min-score flags exactly the
    clusters a reviewer should open first (the standard ER cluster-review
    signal).  Sizes come from one hash aggregate; within-cluster edges
    from two assignment joins; possible_pairs = n*(n-1) DIV 2 in exact
    integer arithmetic (the quality.py C(n,2) convention).  Clusters with
    no surviving in-cluster edge (shouldn't happen for CC output, but
    callers may audit FILTERED edge sets) surface with zero edges and
    NULL scores via the left join.
    """
    sizes = assignments.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    asg = assignments.select(F.col(id_col).alias("__id"), F.col(cluster_col))
    inside = (
        scored_edges.join(
            asg.withColumnRenamed("__id", left_col).withColumnRenamed(
                cluster_col, "__cl"
            ).hint("shuffle_hash"),
            left_col,
        )
        .join(
            asg.withColumnRenamed("__id", right_col).withColumnRenamed(
                cluster_col, "__cr"
            ).hint("shuffle_hash"),
            right_col,
        )
        .where(F.col("__cl") == F.col("__cr"))
        .groupBy(F.col("__cl").alias(cluster_col))
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.round(F.min(score_col), 6).alias("min_score"),
            F.round(F.avg(score_col), 6).alias("mean_score"),
        )
    )
    # integer div, not double division: n*(n-1) is always even and count()
    # is already BIGINT, so C(n,2) stays exact in long (the ADVICE.md
    # quality.py finding — double division loses exactness past 2^53)
    possible = F.expr("(n_members * (n_members - 1)) div 2")
    return (
        sizes.join(inside, cluster_col, "left")
        .select(
            cluster_col,
            "n_members",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            possible.alias("possible_pairs"),
            F.round(
                F.coalesce("n_edges", F.lit(0))
                / F.greatest(possible, F.lit(1)).cast("double"),
                6,
            ).alias("density"),
            "min_score",
            "mean_score",
        )
    )


def extended_cluster_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "file_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One row of contingency-table clustering-agreement metrics beyond the
    pairwise family: B-cubed precision/recall/F1 (Bagga & Baldwin 1998 —
    the standard coreference/ER metric that, unlike pairwise F1, does not
    let one mega-cluster dominate), NMI (sqrt normalization), and adjusted
    Rand index (Hubert & Arabie 1985).

    Everything reduces over the (pred, truth) contingency table — per-item
    B-cubed precision is n_ij / a_i for each of the n_ij items in cell
    (i, j), so the mean is sum(n_ij^2 / a_i) / N; MI/entropy/ARI likewise.
    A 10^8-member cluster costs one aggregate row (the
    pairwise_cluster_metrics scale shape); no pairs are materialized.
    ARI's expected-index product a*b can exceed long, so that single term
    is computed in double; counts stay exact long integers.
    """
    j = pred.select(F.col(id_col), F.col(cluster_col).alias("__p")).join(
        truth.select(F.col(id_col), F.col(cluster_col).alias("__t")), id_col
    )
    cont = j.groupBy("__p", "__t").agg(F.count(F.lit(1)).alias("n")).persist()
    rows = cont.groupBy("__p").agg(F.sum("n").alias("a"))
    cols = cont.groupBy("__t").agg(F.sum("n").alias("b"))
    n_tot = cont.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_items"))

    cell = (
        cont.join(rows.hint("shuffle_hash"), "__p")
        .join(cols.hint("shuffle_hash"), "__t")
        .agg(
            F.sum(F.col("n") * F.col("n") / F.col("a")).alias("__bp_num"),
            F.sum(F.col("n") * F.col("n") / F.col("b")).alias("__br_num"),
            F.coalesce(F.sum(_c2(F.col("n"))), F.lit(0)).alias("__s_cells"),
            # MI needs N inside the log; defer by summing n*ln(n/(a*b)) and
            # correcting with ln(N) later: MI = sum(n/N * ln(N*n/(a*b)))
            #                                 = (1/N) sum(n*ln(n/(a*b))) + ln(N)
            F.sum(F.col("n") * F.log(F.col("n") / (F.col("a") * F.col("b")))).alias(
                "__mi_raw"
            ),
        )
    )
    hp = rows.agg(
        F.sum(F.col("a") * F.log(F.col("a"))).alias("__hp_raw"),
        F.coalesce(F.sum(_c2(F.col("a"))), F.lit(0)).alias("__s_pred"),
    )
    ht = cols.agg(
        F.sum(F.col("b") * F.log(F.col("b"))).alias("__ht_raw"),
        F.coalesce(F.sum(_c2(F.col("b"))), F.lit(0)).alias("__s_truth"),
    )
    out = n_tot.crossJoin(cell).crossJoin(hp).crossJoin(ht)

    n = F.col("n_items").cast("double")
    bp = F.col("__bp_num") / n
    br = F.col("__br_num") / n
    bf = F.when((bp + br) > 0, 2 * bp * br / (bp + br)).otherwise(F.lit(0.0))
    # H(P) = ln(N) - (1/N) sum(a*ln(a)); MI = ln(N) + (1/N) sum(n*ln(n/(a*b)))
    h_pred = F.log(n) - F.col("__hp_raw") / n
    h_truth = F.log(n) - F.col("__ht_raw") / n
    mi = F.log(n) + F.col("__mi_raw") / n
    nmi = F.when(
        (h_pred > 0) & (h_truth > 0), mi / F.sqrt(h_pred * h_truth)
    ).otherwise(F.lit(0.0))
    total_pairs = _c2(F.col("n_items"))
    expected = F.col("__s_pred") * 1.0 * F.col("__s_truth") / total_pairs
    max_idx = (F.col("__s_pred") + F.col("__s_truth")) / F.lit(2.0)
    ari = F.when(
        (total_pairs > 0) & (max_idx != expected),
        (F.col("__s_cells") - expected) / (max_idx - expected),
    ).otherwise(F.lit(1.0))

    result = out.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.round(bp, 6).alias("bcubed_precision"),
        F.round(br, 6).alias("bcubed_recall"),
        F.round(bf, 6).alias("bcubed_f1"),
        F.round(nmi, 6).alias("nmi"),
        F.round(ari, 6).alias("ari"),
    ).localCheckpoint(eager=True)
    cont.unpersist()
    return result
