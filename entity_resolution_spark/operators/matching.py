"""One-to-one match assignment over scored candidate pairs.

Record linkage between two files (or dedup within one) often carries a
UNIQUE-MAPPING constraint: each record may link to at most one partner
(census linkage's classic rule; Splink's `unique` linkage type; the
reference engine's consolidation decision keeps one best mapping per
column, entity_resolution ``consolidation.py`` — this is the record-level
analogue).  Two operators:

* ``mutual_best_matches`` — one round of symmetric best match: keep
  (x, y) iff y is x's best-scored partner AND x is y's, with a total
  deterministic order (score DESC, partner id ASC).  Two window passes +
  one self-join, all JVM; SQL-expressible, so it carries a full DuckDB
  oracle (`one_to_one_matches` contract row).

* ``greedy_one_to_one`` — iterated mutual-best: match, remove matched
  nodes, repeat.  With distinct scores this equals the SEQUENTIAL greedy
  algorithm (repeatedly take the globally best remaining pair): the
  globally best pair is always mutually-best, so it is taken in round 1,
  and induction over score order covers the rest; under ties the
  per-node smaller-partner-id rule arbitrates deterministically.
  Greedy 1-1 matching is a 1/2-approximation
  to the maximum-weight matching; the iterated formulation runs it in
  O(log n) expected rounds of joins instead of a sequential scan —
  the distributed "local dominance" trick (Manne/Bisseling style).
  Each round localCheckpoints the shrinking frontier like the CC loop.

Pairs may be given as an undirected edge list (left_id, right_id, score);
both directions are considered.  Ties: higher score wins, then the
SMALLER partner id, making the result independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _symmetrize(pairs: DataFrame, left: str, right: str, score: str) -> DataFrame:
    a = pairs.select(
        F.col(left).alias("src"), F.col(right).alias("dst"), F.col(score).alias("s")
    )
    b = pairs.select(
        F.col(right).alias("src"), F.col(left).alias("dst"), F.col(score).alias("s")
    )
    return a.unionByName(b)


def _mutual(sym: DataFrame) -> DataFrame:
    """(src<dst) pairs where each side is the other's rank-1 partner."""
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    best = sym.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    fwd = best.select("src", "dst", "s")
    rev = best.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        fwd.join(rev, ["src", "dst"])
        .where(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("left_id"),
            F.col("dst").alias("right_id"),
            F.col("s").alias("score"),
        )
    )


def mutual_best_matches(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    score_col: str = "score",
) -> DataFrame:
    """One symmetric-best-match round -> (left_id, right_id, score)."""
    return _mutual(_symmetrize(pairs, left_col, right_col, score_col))


def greedy_one_to_one(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    score_col: str = "score",
    max_rounds: int = 50,
) -> DataFrame:
    """Deterministic greedy maximum-weight 1-1 matching (iterated mutual-best).

    With distinct scores this equals the sequential greedy (repeatedly take
    the globally best remaining pair); under score ties the per-node
    smaller-partner-id rule arbitrates instead of a global pair order —
    still deterministic and partition-invariant.  Terminates when no pairs
    remain (expected O(log n) rounds).
    """
    sym = _symmetrize(pairs, left_col, right_col, score_col).localCheckpoint(
        eager=True
    )
    out: DataFrame | None = None
    for _ in range(max_rounds):
        if sym.isEmpty():
            break
        m = _mutual(sym).localCheckpoint(eager=True)
        out = m if out is None else out.unionByName(m)
        matched = F.broadcast(
            m.select(F.col("left_id").alias("id"))
            .unionByName(m.select(F.col("right_id").alias("id")))
            .distinct()
        )
        sym = sym.join(matched, F.col("src") == F.col("id"), "left_anti")
        sym = sym.join(matched, F.col("dst") == F.col("id"), "left_anti").localCheckpoint(
            eager=True
        )
    else:
        if not sym.isEmpty():
            raise RuntimeError(f"greedy_one_to_one did not converge in {max_rounds} rounds")
    if out is None:
        return _mutual(sym).limit(0)
    return out


def banded_duplicate_pairs(
    df: DataFrame,
    key: str,
    id_col: str,
    amount_col: str,
    time_col: str,
    amount_eps: float,
    max_days: int,
) -> DataFrame:
    """Fuzzy duplicate-transaction candidates: same ``key``, amounts within
    ``amount_eps``, event dates within ``max_days``. Returns one row per
    unordered pair (``left_id < right_id``) with the amount gap and day gap.

    Scale shape: |Δamount| <= eps is NOT a theta join here — each row gets
    the integer band floor(amount/eps) and the right side replicates into
    its band ± 1 (any qualifying pair differs by at most one band), so the
    candidate join is a plain equi-join on (key, band) with 3x replication
    of one side, then the exact amount/time predicates filter survivors.
    Each qualifying pair matches on exactly one band equality and one id
    orientation, so no dedup pass is needed.
    """
    if amount_eps <= 0 or max_days < 0:
        raise ValueError("amount_eps must be > 0 and max_days >= 0")
    base = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_id"),
        F.col(amount_col).alias("_amt"),
        F.to_date(F.col(time_col)).alias("_d"),
        F.floor(F.col(amount_col) / F.lit(float(amount_eps))).alias("_band"),
    )
    right = base.select(
        F.col("_k"),
        F.col("_id").alias("_rid"),
        F.col("_amt").alias("_ramt"),
        F.col("_d").alias("_rd"),
        F.explode(
            F.array(F.col("_band") - 1, F.col("_band"), F.col("_band") + 1)
        ).alias("_band"),
    )
    return (
        base.join(right, ["_k", "_band"])
        .where(
            (F.col("_id") < F.col("_rid"))
            & (F.abs(F.col("_amt") - F.col("_ramt")) <= F.lit(float(amount_eps)))
            & (F.abs(F.datediff(F.col("_rd"), F.col("_d"))) <= F.lit(max_days))
        )
        .select(
            F.col("_k").alias(key),
            F.col("_id").alias("left_id"),
            F.col("_rid").alias("right_id"),
            F.round(F.abs(F.col("_amt") - F.col("_ramt")), 2).alias("amount_diff"),
            F.abs(F.datediff(F.col("_rd"), F.col("_d"))).cast("long").alias("day_gap"),
        )
    )
