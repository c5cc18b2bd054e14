"""Fellegi-Sunter probabilistic record linkage with EM-trained weights.

The reference scores candidate pairs with fixed hand-set weights
(/root/reference/file_matcher.py:24-31: 0.40/0.35/0.25 blend); the classic
generalization — and what production linkage engines (Splink, fastLink)
actually run at scale — is the Fellegi-Sunter model (JASA 1969): each
candidate pair is reduced to a vector of binary field agreements gamma,
and unsupervised EM fits, per field, the probability of agreement among
true matches (m) and among non-matches (u), plus the match prevalence
lambda.  Pairs are then scored by the log2 likelihood ratio
(the "match weight") and the posterior match probability.

The distributed shape is what makes FS the right fit for Spark:

* **comparison vectors** — one projection over the candidate-pair frame
  joined to both record sides (shuffle_hash on the id: records scale with
  the corpus, no broadcast assumption).
* **pattern census** — ``groupBy(*gamma).count()``: the agreement vectors
  take at most 2^k distinct values, so the census is a BOUNDED frame
  (k=4 -> <=16 rows) no matter whether the input is 10^4 or 10^12 pairs.
  Collecting it is control-plane, like the quality-metrics scalars.
* **EM** — runs over the census, not the pairs: O(2^k * iters) scalar
  arithmetic.  No parameter server, no per-pair iteration.
* **scoring** — the fitted m/u/lambda are baked into a pure column
  expression (CASE chains of literals); scoring is map-side only, no
  shuffle, no UDF, whole-stage-codegen friendly.

Determinism / oracle parity: EM sums run over the census sorted by gamma
tuple, every M-step scalar is rounded half-away-from-zero at ``round_at``
decimals (replicating DuckDB's ``round(x, n)`` = ``std::round(x*10^n)/10^n``;
exact for our (0,1) domain since x*10^10 < 2^35 keeps ``+0.5`` exact) and
clamped to [1e-6, 0.999999].  With identical per-iteration inputs the only
cross-engine drift is FP summation order over <=2^k census rows (~1 ulp),
absorbed by the rounding — the same pinning strategy the NB classifier
(operators/classifier.py) uses for ln().
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_CLAMP_LO = 1e-6
_CLAMP_HI = 0.999999


def round_half_away(x: float, decimals: int) -> float:
    """DuckDB-compatible round for non-negative doubles below ~2^35/10^d."""
    p = float(10**decimals)
    return math.floor(x * p + 0.5) / p


FieldSpec = str | tuple[str, Callable[[Column, Column], Column]]


def comparison_vectors(
    pairs: DataFrame,
    records: DataFrame,
    fields: dict[str, FieldSpec],
    id_col: str = "doc_id",
    left_col: str = "left_id",
    right_col: str = "right_id",
    keep_values: bool = False,
) -> DataFrame:
    """pairs + per-field binary agreement columns (the gamma vector).

    ``fields``: gamma name -> record column name (null-safe equality), or
    ``(column, fn)`` where ``fn(left_col, right_col) -> BooleanColumn``
    expresses a custom comparator (band equality, threshold, ...).

    ``keep_values=True`` additionally carries ``v_<gamma>`` — the shared
    value for plain-equality fields when the pair AGREES (NULL otherwise)
    — which is what term-frequency adjustment (fs_score_tf) joins on.

    Two shuffle_hash joins on the pair ids; records are projected to the
    compared columns only before joining (column pruning survives at the
    source scan).
    """
    need = sorted({s if isinstance(s, str) else s[0] for s in fields.values()})
    rec = records.select(F.col(id_col).alias("__id"), *need)
    lhs = rec.select(
        F.col("__id").alias(left_col), *[F.col(c).alias(f"__l_{c}") for c in need]
    )
    rhs = rec.select(
        F.col("__id").alias(right_col), *[F.col(c).alias(f"__r_{c}") for c in need]
    )
    out = pairs.join(lhs.hint("shuffle_hash"), left_col).join(
        rhs.hint("shuffle_hash"), right_col
    )
    for name, spec in fields.items():
        if isinstance(spec, str):
            cond = F.col(f"__l_{spec}").eqNullSafe(F.col(f"__r_{spec}"))
        else:
            col, fn = spec
            cond = fn(F.col(f"__l_{col}"), F.col(f"__r_{col}"))
        out = out.withColumn(name, cond.cast("int"))
        if keep_values and isinstance(spec, str):
            # NULL==NULL counts as agreement but carries no value to
            # frequency-adjust, so v_<gamma> stays NULL there.
            out = out.withColumn(f"v_{name}", F.when(cond, F.col(f"__l_{spec}")))
    return out.drop(*[f"__l_{c}" for c in need], *[f"__r_{c}" for c in need])


@dataclass
class FSModel:
    gamma_cols: list[str]
    lam: float
    m: list[float]  # P(agree | match) per field
    u: list[float]  # P(agree | non-match) per field
    iters: int
    round_at: int


def fs_em(
    census: list[tuple],
    k: int,
    iters: int = 8,
    round_at: int = 10,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
) -> tuple[float, list[float], list[float]]:
    """EM over a pattern census [(g_1..g_k, count), ...] — pure function.

    Census rows are sorted by gamma tuple so the FP sums have a fixed
    order; every M-step scalar is rounded (DuckDB-round semantics) and
    clamped, which is what lets the unrolled-CTE SQL replica track this
    bit-for-bit.
    """
    rows = sorted((tuple(r[:k]), int(r[k])) for r in census)
    if not rows:
        raise ValueError("empty pattern census: no candidate pairs to fit on")
    lam, m, u = lam0, [m0] * k, [u0] * k

    def _mstep(x: float) -> float:
        return min(max(round_half_away(x, round_at), _CLAMP_LO), _CLAMP_HI)

    for _ in range(iters):
        weighted = []
        for g, c in rows:
            wm, wu = lam, 1.0 - lam
            for i in range(k):
                wm *= m[i] if g[i] else 1.0 - m[i]
                wu *= u[i] if g[i] else 1.0 - u[i]
            weighted.append((g, c, wm / (wm + wu)))
        sw = sum(w * c for _, c, w in weighted)
        swn = sum((1.0 - w) * c for _, c, w in weighted)
        sc = sum(c for _, c, _ in weighted)
        lam = round_half_away(sw / sc, round_at)
        m = [_mstep(sum(w * c * g[i] for g, c, w in weighted) / max(sw, 1e-300)) for i in range(k)]
        u = [
            _mstep(sum((1.0 - w) * c * g[i] for g, c, w in weighted) / max(swn, 1e-300))
            for i in range(k)
        ]
    return lam, m, u


def fs_train(
    vectors: DataFrame,
    gamma_cols: list[str],
    iters: int = 8,
    round_at: int = 10,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
) -> FSModel:
    """Fit FS parameters from the comparison-vector frame.

    One shuffle (the census groupBy); the collect is bounded at 2^k rows
    by construction — control-plane, like quality.py's scalar aggregates.
    """
    census = [
        tuple(r)
        for r in vectors.groupBy(*gamma_cols).agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    lam, m, u = fs_em(
        census, len(gamma_cols), iters=iters, round_at=round_at, lam0=lam0, m0=m0, u0=u0
    )
    return FSModel(
        gamma_cols=list(gamma_cols), lam=lam, m=m, u=u, iters=iters, round_at=round_at
    )


def fs_score(vectors: DataFrame, model: FSModel, round_out: int = 6) -> DataFrame:
    """Attach match_weight (log2 likelihood ratio) and posterior.

    Pure map-side column expression over literals — no join, no shuffle,
    no Python: CASE chains multiply left-to-right in gamma_cols order,
    mirroring both fs_em's arithmetic and the SQL replica's expression
    shape exactly.
    """

    def _prob(params: list[float]) -> Column:
        terms = [
            F.when(F.col(g) == 1, F.lit(params[i])).otherwise(F.lit(1.0 - params[i]))
            for i, g in enumerate(model.gamma_cols)
        ]
        return reduce(lambda a, b: a * b, terms)

    num, den = _prob(model.m), _prob(model.u)
    lam = F.lit(model.lam)
    posterior = (lam * num) / (lam * num + (F.lit(1.0) - lam) * den)
    return vectors.withColumn(
        "match_weight", F.round(F.log2(num / den), round_out)
    ).withColumn("posterior", F.round(posterior, round_out))


def tf_share_table(
    records: DataFrame, field: str, round_at: int = 10
) -> DataFrame:
    """(value, share) — each value's share of the non-null records.

    The collision probability of an exact agreement ON THAT VALUE among
    non-matches: the value-specific replacement for the field's generic u.
    One hash aggregate + one control-plane scalar (the non-null count).
    """
    nn = records.where(F.col(field).isNotNull())
    tot = float(nn.count())
    return nn.groupBy(F.col(field).alias("value")).agg(
        F.round(F.count(F.lit(1)) / F.lit(tot), round_at).alias("share")
    )


def fs_score_tf(
    vectors: DataFrame,
    model: FSModel,
    tf_shares: dict[str, DataFrame],
    round_out: int = 6,
) -> DataFrame:
    """fs_score + Splink/fastLink-style term-frequency adjustment.

    Agreement on a RARE value is stronger evidence than agreement on a
    common one, but the base model only knows the field-level u.  For each
    gamma in ``tf_shares`` (vectors must carry ``v_<gamma>`` from
    ``comparison_vectors(keep_values=True)``), an agreeing pair's weight
    gains ``log2(u_i / share(v))`` — positive when the shared value is
    rarer than the field's average collision rate, negative when it is a
    stop-value.  Output adds ``tf_match_weight``.

    Each share table joins once (shuffle_hash — value vocabularies scale
    with the corpus; Catalyst/AQE may still broadcast small ones); deltas
    and the final sum are rounded at ``round_out`` for oracle parity.
    """
    out = fs_score(vectors, model, round_out=round_out)
    deltas = []
    for g, shares in tf_shares.items():
        if g not in model.gamma_cols:
            raise ValueError(f"{g!r} is not a model gamma column")
        u_i = model.u[model.gamma_cols.index(g)]
        s = shares.select(
            F.col("value").alias(f"v_{g}"), F.col("share").alias(f"__sh_{g}")
        )
        out = out.join(s.hint("shuffle_hash"), f"v_{g}", "left")
        deltas.append(
            F.when(
                (F.col(g) == 1) & F.col(f"__sh_{g}").isNotNull(),
                F.round(F.log2(F.lit(u_i) / F.col(f"__sh_{g}")), round_out),
            ).otherwise(F.lit(0.0))
        )
    total = reduce(lambda a, b: a + b, deltas)
    return out.withColumn(
        "tf_match_weight", F.round(F.col("match_weight") + total, round_out)
    ).drop(*[f"__sh_{g}" for g in tf_shares])


@dataclass
class LinkageResult:
    """link_entities output bundle (mirrors plans/pipeline.ResolveResult)."""

    model: FSModel
    scored: DataFrame  # candidates + gammas + match_weight + posterior
    assignments: DataFrame  # (id_col, cluster_id) for every linked record
    golden: DataFrame  # one survivorship-merged record per cluster


def link_entities(
    records: DataFrame,
    candidates: DataFrame,
    fields: dict[str, FieldSpec],
    rules: dict[str, str],
    id_col: str = "doc_id",
    threshold: float = 0.9,
    extra_gammas: dict[str, Column] | None = None,
    iters: int = 8,
    round_at: int = 10,
) -> LinkageResult:
    """The whole probabilistic-linkage pipeline as one call:
    comparison vectors -> EM fit -> posterior scoring -> connected
    components over confident edges -> field-level golden records.

    ``candidates`` come from any blocking scheme (sorted-neighborhood,
    meta-blocking WNP, LSH bands); ``extra_gammas`` adds pair-level
    agreement columns (e.g. a jaccard threshold carried by the candidate
    generator) that comparison_vectors can't derive from the records.
    Each stage is the already-oracled operator; this composes them.
    """
    from .clustering import connected_components
    from .survivorship import golden_records

    vec = comparison_vectors(candidates, records, fields, id_col=id_col)
    for name, col in (extra_gammas or {}).items():
        vec = vec.withColumn(name, col)
    # read twice — once by the census collect, once by scoring — so the
    # candidate-join lineage must not re-run (it dominates the pipeline)
    vec = vec.persist()
    gammas = [*fields, *(extra_gammas or {})]
    model = fs_train(vec, gammas, iters=iters, round_at=round_at)
    scored = fs_score(vec, model)
    edges = scored.where(F.col("posterior") >= threshold)
    assignments = connected_components(
        edges.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    ).select(F.col("file_id").alias(id_col), "cluster_id")
    golden = golden_records(assignments, records, rules, id_col=id_col)
    return LinkageResult(model=model, scored=scored, assignments=assignments, golden=golden)


def review_queue(scored: DataFrame, k: int) -> DataFrame:
    """Uncertainty sampling for human review (the active-learning loop
    linkage UIs run): the k pairs whose posterior sits closest to 0.5 —
    exactly the labels that sharpen the EM fit fastest.  Deterministic
    total order (margin, then ids); global sort + limit compiles to
    TakeOrdered, so no full-sort materialization at corpus scale.
    Adds ``margin`` = round(abs(posterior - 0.5), 6).
    """
    return (
        scored.withColumn(
            "margin", F.round(F.abs(F.col("posterior") - F.lit(0.5)), 6)
        )
        .orderBy("margin", "left_id", "right_id")
        .limit(int(k))
    )


def save_fs_model(model: FSModel, path: str) -> None:
    """Persist the fitted parameters as one parquet row (exact doubles)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    spark.createDataFrame(
        [
            (
                model.gamma_cols,
                float(model.lam),
                [float(x) for x in model.m],
                [float(x) for x in model.u],
                int(model.iters),
                int(model.round_at),
            )
        ],
        "gamma_cols array<string>, lam double, m array<double>, u array<double>,"
        " iters int, round_at int",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_fs_model(spark, path: str) -> FSModel:
    r = spark.read.parquet(path).collect()[0]
    return FSModel(
        gamma_cols=list(r["gamma_cols"]),
        lam=r["lam"],
        m=list(r["m"]),
        u=list(r["u"]),
        iters=r["iters"],
        round_at=r["round_at"],
    )


def fs_explain(vectors: DataFrame, model: FSModel, round_out: int = 6) -> DataFrame:
    """Per-field weight breakdown (the Splink waterfall): for every pair,
    ``wt_<gamma>`` = log2(m_i/u_i) when the field agrees else
    log2((1-m_i)/(1-u_i)), plus ``wt_prior`` = log2(lam/(1-lam)) — the
    additive decomposition reviewers read to see WHY a pair matched.
    Pure literal expressions, map-side like fs_score; each term rounded at
    ``round_out`` (total may differ from fs_score's match_weight by
    <=k*5e-7 rounding slack — terms are rounded independently).
    """
    out = vectors
    for i, g in enumerate(model.gamma_cols):
        agree = math.log2(model.m[i] / model.u[i])
        disagree = math.log2((1.0 - model.m[i]) / (1.0 - model.u[i]))
        out = out.withColumn(
            f"wt_{g}",
            F.round(
                F.when(F.col(g) == 1, F.lit(agree)).otherwise(F.lit(disagree)),
                round_out,
            ),
        )
    prior = math.log2(model.lam / (1.0 - model.lam))
    out = out.withColumn("wt_prior", F.round(F.lit(prior), round_out))
    total = reduce(
        lambda a, b: a + b, [F.col(f"wt_{g}") for g in model.gamma_cols]
    ) + F.col("wt_prior")
    return out.withColumn("wt_total", F.round(total, round_out))


def fs_pr_curve(
    scored: DataFrame,
    truth_pairs: DataFrame,
    score_col: str = "posterior",
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Precision/recall at every distinct score threshold ->
    (threshold, tp, fp, fn, precision, recall, f1) — the operating-point
    table a reviewer picks the cutoff from.

    ``truth_pairs`` carries the labeled matches (left_col, right_col).
    Because FS scores are per-PATTERN, the curve has at most 2^k distinct
    thresholds regardless of pair count: the per-level census is one hash
    aggregate and the cumulative window runs over a bounded frame (the
    pattern-census argument from fs_train, applied to evaluation).
    """
    truth = truth_pairs.select(left_col, right_col).withColumn(
        "__is_match", F.lit(1)
    )
    lab = scored.select(left_col, right_col, score_col).join(
        truth, [left_col, right_col], "left"
    )
    total_truth = truth.count()  # control-plane scalar
    lvl = lab.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(F.coalesce("__is_match", F.lit(0))).alias("__tp_here"),
        F.count(F.lit(1)).alias("__n_here"),
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        lvl.withColumn("tp", F.sum("__tp_here").over(w))
        .withColumn("predicted", F.sum("__n_here").over(w))
        .select(
            "threshold",
            "tp",
            (F.col("predicted") - F.col("tp")).alias("fp"),
            (F.lit(total_truth) - F.col("tp")).alias("fn"),
            F.round(F.col("tp") / F.col("predicted"), 6).alias("precision"),
            F.round(F.col("tp") / F.lit(float(max(total_truth, 1))), 6).alias("recall"),
            F.round(
                2 * F.col("tp")
                / (F.col("predicted") + F.lit(float(total_truth))),
                6,
            ).alias("f1"),
        )
    )
