"""Driver-contract batch: warehouse-maintenance + graph/mining operators
added in the round-3 closing sessions. Every query carries a full DuckDB
value-hash oracle.

Covers: CDC changelog application / MERGE semantics (operators/cdc.py),
incremental view maintenance for distributive aggregates
(operators/ivm.py), last-touch conversion attribution
(operators/funnel.py), synchronous label-propagation communities
(operators/graphmetrics.py), margin-based bitext-style pair mining
over two embedding collections (operators/bitext.py), modified-z-score
MAD outliers (operators/stats.py), temperature-scaled source mixture
weights (operators/sampling.py), and Smith-Waterman local-alignment
similarity (operators/setjoin.py + functions/alignment.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..queries import _t, query
from .dedup_ops import _NGRAM_PAIR_CTES


# --- CDC changelog apply (MERGE INTO semantics) ----------------------------
# Base snapshot = each user's first event; changelog = every later event,
# 'error' rows as delete tombstones, everything else as upserts, ordered
# by (ts, event_id). The maintained snapshot must equal a sequential
# MERGE replay — which the oracle states directly with window functions.
@query(
    "cdc_apply_user_state",
    """
    WITH r AS (
      SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    base AS (SELECT user_id, event_type, value FROM r WHERE rn = 1),
    chg AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             event_type, value
      FROM r WHERE rn > 1),
    last AS (
      SELECT user_id, op, event_type, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn2
        FROM chg) WHERE rn2 = 1)
    SELECT b.user_id, b.event_type, round(b.value, 6) AS value
    FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM last l WHERE l.user_id = b.user_id)
    UNION ALL
    SELECT user_id, event_type, round(value, 6) AS value
    FROM last WHERE op <> 'D'
    """,
)
def cdc_apply_user_state(spark, sf_dir):
    """Fold a CDC changelog into a base snapshot (operators/cdc.py
    apply_changelog): last change per key wins, delete ops tombstone the
    key, untouched keys pass through — the Iceberg MERGE INTO shape with
    the base never shuffled (delta-sized hash agg + anti join)."""
    from ..operators.cdc import apply_changelog

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("__rn", F.row_number().over(w))
    base = r.filter("__rn = 1").select("user_id", "event_type", "value")
    chg = r.filter("__rn > 1").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "event_type",
        "value",
    )
    out = apply_changelog(base, chg, ["user_id"], ["ts", "event_id"], op_col="op")
    return out.select("user_id", "event_type", F.round("value", 6).alias("value"))


# --- incremental view maintenance ------------------------------------------
# Base facts = events with event_id % 5 != 0; the delta INSERTS the
# remaining fifth and RETRACTS the base's error rows. The maintained
# per-type (count, decimal sum) view must equal a from-scratch recompute
# over the post-delta fact set — exactly, because the sums run in decimal
# (addition associative), which is the point of the operator's contract.
@query(
    "ivm_event_type_totals",
    """
    WITH kept AS (
      SELECT event_type, CAST(value AS DECIMAL(28,6)) AS v
      FROM events
      WHERE event_id % 5 = 0
         OR event_type IS DISTINCT FROM 'error')
    SELECT event_type, count(*) AS n_rows,
           round(CAST(sum(v) AS DOUBLE), 6) AS total_value
    FROM kept GROUP BY 1
    """,
)
def ivm_event_type_totals(spark, sf_dir):
    """Delta-maintained distributive aggregate (operators/ivm.py): two
    delta-sized hash aggs + a group-domain merge reproduce the full
    recompute bit-for-bit (decimal sums), with the base facts never
    rescanned."""
    from ..operators.ivm import aggregate_partials, maintain_aggregate

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("decimal(28,6)").alias("v")
    )
    base_facts = ev.filter(F.col("event_id") % 5 != 0)
    inserts = ev.filter(F.col("event_id") % 5 == 0)
    deletes = base_facts.filter(F.col("event_type") == "error")
    base_partials = aggregate_partials(base_facts, ["event_type"], ["v"])
    out = maintain_aggregate(base_partials, inserts, deletes, ["event_type"], ["v"])
    return out.select(
        "event_type",
        F.col("__cnt").alias("n_rows"),
        F.round(F.col("sum_v").cast("double"), 6).alias("total_value"),
    )


# --- last-touch attribution -------------------------------------------------
@query(
    "attribution_last_touch",
    """
    WITH w AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('view', 'click')
                 THEN {'t_ts': ts, 't_id': event_id, 't_type': event_type}
               END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t
      FROM events),
    c AS (
      SELECT event_id AS conversion_id, user_id, ts, t,
             (epoch_us(ts) - epoch_us(t.t_ts)) / 1000000.0 AS lag
      FROM w WHERE event_type = 'purchase')
    SELECT conversion_id, user_id, ts,
           CASE WHEN t IS NOT NULL AND lag <= 86400.0 THEN t.t_id END
             AS attributed_event_id,
           CASE WHEN t IS NOT NULL AND lag <= 86400.0 THEN t.t_type
                ELSE 'direct' END AS attributed_type,
           CASE WHEN t IS NOT NULL AND lag <= 86400.0 THEN round(lag, 6) END
             AS lag_seconds
    FROM c
    """,
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch attribution with a 1-day lookback (operators/funnel.py
    attribute_conversions): one per-user carry-forward window pass — no
    self-join — credits each purchase to the latest preceding view/click
    or to 'direct'."""
    from ..operators.funnel import attribute_conversions

    ev = _t(spark, sf_dir, "events")
    return attribute_conversions(
        ev,
        conversion_type="purchase",
        touch_types=("view", "click"),
        window_seconds=86400.0,
    )


# --- label-propagation communities ------------------------------------------
def _lpa_sql(iters: int = 5) -> str:
    """Unrolled DuckDB replica of graphmetrics.label_propagation over the
    0.2 trigram-jaccard graph: per round, a neighbor-label census and the
    (max count, min label) arg-max."""
    parts = [
        """e0 AS (SELECT l AS a, r AS b FROM p
                 WHERE c * 1.0 / (ln + rn - c) >= 0.2),
    e1 AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
    l0 AS (SELECT DISTINCT a AS id, a AS lab FROM e1)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""c{i} AS (
      SELECT e1.b AS id, l{i - 1}.lab AS lab, count(*) AS cnt
      FROM e1 JOIN l{i - 1} ON l{i - 1}.id = e1.a
      GROUP BY 1, 2),
    l{i} AS (
      SELECT id, min(lab) AS lab FROM (
        SELECT id, lab, cnt, max(cnt) OVER (PARTITION BY id) AS mc
        FROM c{i})
      WHERE cnt = mc GROUP BY 1)""")
    body = ",\n    ".join(parts)
    return (
        f"WITH {_NGRAM_PAIR_CTES}, {body}\n"
        f"    SELECT id, lab AS community FROM l{iters}"
    )


@query("lpa_communities_ngram", _lpa_sql(5))
def lpa_communities_ngram(spark, sf_dir):
    """5-round synchronous label propagation (min-tiebreak) over the
    trigram-jaccard similarity graph (operators/graphmetrics.py
    label_propagation) — the density-driven community view that
    diagnoses over-merged CC entity clusters; the oracle unrolls every
    round as census + arg-max CTE pairs."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.graphmetrics import label_propagation

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_doc_freq=1_000_000_000
    )
    return label_propagation(edges, iterations=5)


# --- margin-based bitext-style pair mining ----------------------------------
# Left = even vec_ids, right = odd; k = 4, ratio margin, mutual argmax.
# The oracle replays the full definition: per-side top-4 by raw cosine,
# round-6 cosines into the margin, argmax by (margin desc, partner asc),
# mutual join, threshold 1.0.
@query(
    "bitext_margin_pairs",
    """
    WITH a AS (SELECT vec_id AS x, embedding::DOUBLE[] AS e
               FROM embeddings WHERE vec_id % 2 = 0),
    b AS (SELECT vec_id AS y, embedding::DOUBLE[] AS e
          FROM embeddings WHERE vec_id % 2 = 1),
    s AS (SELECT x, y, list_cosine_similarity(a.e, b.e) AS cr,
                 round(list_cosine_similarity(a.e, b.e) + 1e-9, 6) AS c
          FROM a CROSS JOIN b),
    rab AS (SELECT x, y, c,
                   row_number() OVER (PARTITION BY x ORDER BY cr DESC, y) AS r
            FROM s),
    rba AS (SELECT x, y, c,
                   row_number() OVER (PARTITION BY y ORDER BY cr DESC, x) AS r
            FROM s),
    ka AS (SELECT x, avg(c) AS ax FROM rab WHERE r <= 4 GROUP BY 1),
    kb AS (SELECT y, avg(c) AS ay FROM rba WHERE r <= 4 GROUP BY 1),
    mab AS (SELECT rab.x, rab.y, rab.c / ((ka.ax + kb.ay) / 2) AS m
            FROM rab JOIN ka USING (x) JOIN kb USING (y) WHERE rab.r <= 4),
    mba AS (SELECT rba.x, rba.y, rba.c / ((ka.ax + kb.ay) / 2) AS m
            FROM rba JOIN ka USING (x) JOIN kb USING (y) WHERE rba.r <= 4),
    bx AS (SELECT x, y, m FROM (
             SELECT *, row_number() OVER (PARTITION BY x
                                          ORDER BY m DESC, y) AS r
             FROM mab) WHERE r = 1),
    byy AS (SELECT x, y FROM (
             SELECT *, row_number() OVER (PARTITION BY y
                                          ORDER BY m DESC, x) AS r
             FROM mba) WHERE r = 1)
    SELECT bx.x AS left_id, bx.y AS right_id, round(bx.m, 6) AS margin
    FROM bx JOIN byy ON bx.x = byy.x AND bx.y = byy.y
    WHERE bx.m >= 1.0
    """,
)
def bitext_margin_pairs(spark, sf_dir):
    """Ratio-margin mutual-argmax pair mining (Artetxe & Schwenk 2019)
    between the even- and odd-id halves of the embedding table
    (operators/bitext.py margin_mine, k=4, threshold 1.0) — both kNN
    sweeps run the distributed bucket-matmul knn_join."""
    from ..operators.bitext import margin_mine
    from ..session import ensure_py_files

    ensure_py_files(spark)
    emb = _t(spark, sf_dir, "embeddings")
    left = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    right = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    return margin_mine(left, right, k=4, threshold=1.0)


# --- modified-z-score (MAD) outliers -----------------------------------------
@query(
    "mad_outliers_orders",
    """
    WITH m AS (SELECT o_orderpriority AS g, median(o_totalprice) AS med
               FROM orders GROUP BY 1),
    d AS (SELECT o.o_orderkey, o.o_orderpriority AS g, o.o_totalprice AS v,
                 m.med
          FROM orders o JOIN m ON m.g = o.o_orderpriority),
    md AS (SELECT g, median(abs(v - med)) AS mad FROM d GROUP BY 1)
    SELECT d.o_orderkey, d.g AS o_orderpriority, d.v AS o_totalprice,
           round(d.med, 6) AS med, round(md.mad, 6) AS mad,
           CASE WHEN md.mad > 0 AND d.v IS NOT NULL
                THEN round(0.6745 * (d.v - d.med) / md.mad, 6) END AS robust_z,
           coalesce(md.mad > 0 AND d.v IS NOT NULL
                    AND abs(0.6745 * (d.v - d.med) / md.mad) > 3.5,
                    FALSE) AS is_outlier
    FROM d JOIN md ON md.g = d.g
    """,
)
def mad_outliers_orders(spark, sf_dir):
    """Modified-z-score outliers over order totals per priority class
    (operators/stats.py mad_outliers) — exact medians, robust to the
    outliers themselves; the MAD companion to iqr_outlier_orders."""
    from ..operators.stats import mad_outliers

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return mad_outliers(
        orders, "o_totalprice", group_cols=["o_orderpriority"], threshold=3.5
    )


# --- temperature-scaled mixture weights --------------------------------------
@query(
    "mixture_temperature_report",
    """
    WITH s AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS n
               FROM documents GROUP BY 1),
    t AS (SELECT sum(n) AS tot, sum(pow(n, 0.7)) AS z FROM s)
    SELECT source, n AS n_tokens,
           round(n / tot, 6) AS natural_frac,
           round(pow(n, 0.7) / z, 6) AS weight,
           round(pow(n, 0.7) / z * 1000000.0, 6) AS expected_tokens,
           round(pow(n, 0.7) / z * 1000000.0 / n, 6) AS epochs
    FROM s CROSS JOIN t
    """,
)
def mixture_temperature_report(spark, sf_dir):
    """Temperature-0.7 mixture weights over document sources sized by
    character mass (operators/sampling.py mixture_weights) — the
    GPT-3/PaLM sampling-rate rule with per-source expected tokens and
    implied epochs under a 1M-token budget."""
    from ..operators.sampling import mixture_weights

    docs = _t(spark, sf_dir, "documents")
    return mixture_weights(
        docs, "n_chars", source_col="source", alpha=0.7, token_budget=1_000_000.0
    )


# --- Smith-Waterman local alignment ------------------------------------------
# Integer scoring (match +2, mismatch -1, gap -1) makes the DP exactly
# replayable: the oracle runs the same anti-diagonal recurrence as a
# recursive CTE (the sql_kernels.py LCS-DP pattern), taking the max cell
# over every diagonal.
@query(
    "smith_waterman_part_names",
    """
    WITH RECURSIVE
    pr AS (SELECT a.p_partkey AS l, a.p_partkey + 1 AS rr,
                  lower(trim(coalesce(a.p_name, ''))) AS sa,
                  lower(trim(coalesce(b.p_name, ''))) AS sb
           FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1),
    sv AS (SELECT l, rr, length(sa) AS la, length(sb) AS lb,
                  [sa[i] FOR i IN range(1, length(sa) + 1)] AS ca,
                  [sb[i] FOR i IN range(1, length(sb) + 1)] AS cb
           FROM pr WHERE length(sa) > 0 AND length(sb) > 0),
    dp(l, rr, d, prev, cur) AS (
      SELECT l, rr, 1,
             [0 FOR p IN range(1, la + 1)],
             [0 FOR p IN range(1, la + 1)]
      FROM sv
      UNION ALL
      SELECT dp.l, dp.rr, dp.d + 1, dp.cur,
             [ CASE WHEN dp.d + 1 - p < 1 OR dp.d + 1 - p > sv.lb THEN 0
                    ELSE greatest(0,
                         coalesce(dp.prev[p - 1], 0)
                           + CASE WHEN sv.ca[p] = sv.cb[dp.d + 1 - p]
                                  THEN 2 ELSE -1 END,
                         coalesce(dp.cur[p - 1], 0) - 1,
                         dp.cur[p] - 1)
               END
               FOR p IN range(1, sv.la + 1) ]
      FROM dp JOIN sv ON sv.l = dp.l AND sv.rr = dp.rr
      WHERE dp.d < sv.la + sv.lb
    ),
    bst AS (SELECT l, rr, max(coalesce(list_max(cur), 0)) AS best
            FROM dp GROUP BY 1, 2)
    SELECT pr.l AS left_id, pr.rr AS right_id,
           CAST(coalesce(b.best, 0) AS BIGINT) AS sw_score,
           CASE WHEN least(length(pr.sa), length(pr.sb)) > 0
                THEN round(coalesce(b.best, 0)
                           / (2.0 * least(length(pr.sa), length(pr.sb))), 6)
                ELSE 0.0 END AS sw_sim
    FROM pr LEFT JOIN bst b ON b.l = pr.l AND b.rr = pr.rr
    """,
)
def smith_waterman_part_names(spark, sf_dir):
    """Smith-Waterman local-alignment similarity over adjacent part-name
    pairs (operators/setjoin.py smith_waterman_score; Smith & Waterman
    1981) — the best-local-region companion to the engine's global
    measures; the oracle replays the integer DP as an anti-diagonal
    recursive CTE and takes the max over every diagonal."""
    from ..operators.setjoin import smith_waterman_score
    from ..session import ensure_py_files

    ensure_py_files(spark)
    part = _t(spark, sf_dir, "part")
    pairs = (
        part.alias("a")
        .join(part.alias("b"), F.col("b.p_partkey") == F.col("a.p_partkey") + 1)
        .select(
            F.col("a.p_partkey").alias("left_id"),
            F.col("b.p_partkey").alias("right_id"),
        )
    )
    return smith_waterman_score(part, pairs, id_col="p_partkey", text_col="p_name")


# --- min-max data-skipping effectiveness --------------------------------------
# Two layouts of the same event rows into ~400-row files: insertion order
# (file = event_id div 400) vs value-clustered (file = value-rank div
# 400). The report shows what clustering buys a zone-map planner on three
# value-range predicates. Fully metadata-shaped: per-file min/max/count,
# then a tiny broadcast interval join.
_SKIP_INTERVALS = [(0.0, 10.0), (200.0, 220.0), (480.0, 500.0)]


@query(
    "skipping_report_events",
    """
    WITH ins AS (
      SELECT event_id // 400 AS file_id, value FROM events),
    clu AS (
      SELECT (row_number() OVER (ORDER BY value, event_id) - 1) // 400
               AS file_id, value
      FROM events),
    iv(lo, hi) AS (VALUES (0.0, 10.0), (200.0, 220.0), (480.0, 500.0)),
    rep AS (
      SELECT 'insertion' AS layout, file_id, min(value) AS mn,
             max(value) AS mx, count(*) AS n
      FROM ins GROUP BY 2
      UNION ALL
      SELECT 'clustered', file_id, min(value), max(value), count(*)
      FROM clu GROUP BY 2)
    SELECT layout, lo, hi, count(*) AS n_files,
           CAST(sum(CASE WHEN mn IS NULL OR NOT (mx < lo OR mn > hi)
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
           CAST(count(*) - sum(CASE WHEN mn IS NULL OR NOT (mx < lo OR mn > hi)
                               THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
           CAST(sum(CASE WHEN mn IS NULL OR NOT (mx < lo OR mn > hi)
                    THEN n ELSE 0 END) AS BIGINT) AS rows_read_upper,
           round((count(*) - sum(CASE WHEN mn IS NULL
                                           OR NOT (mx < lo OR mn > hi)
                                      THEN 1 ELSE 0 END)) * 1.0 / count(*), 6)
             AS skip_ratio
    FROM rep CROSS JOIN iv
    GROUP BY 1, 2, 3
    """,
)
def skipping_report_events(spark, sf_dir):
    """Zone-map skipping effectiveness under insertion-order vs
    value-clustered file layouts (operators/layout.py file_minmax_stats +
    skipping_report) — the manifest-level arithmetic that justifies
    Z-order/sort-on-write at 100 TB."""
    from pyspark.sql import Window

    from ..operators.layout import file_minmax_stats, skipping_report

    ev = _t(spark, sf_dir, "events")
    ins = ev.select(
        (F.col("event_id") / 400).cast("long").alias("f"), "value"
    )
    w = Window.orderBy("value", "event_id")
    clu = ev.select(
        ((F.row_number().over(w) - 1) / 400).cast("long").alias("f"), "value"
    )
    rep_i = skipping_report(
        file_minmax_stats(ins, "f", "value"), _SKIP_INTERVALS, "insertion"
    )
    rep_c = skipping_report(
        file_minmax_stats(clu, "f", "value"), _SKIP_INTERVALS, "clustered"
    )
    return rep_i.unionByName(rep_c)


# --- trailing-window rolling aggregates ---------------------------------------
@query(
    "rolling_daily_user_value",
    """
    WITH a AS (
      SELECT user_id AS key, date_trunc('day', ts) AS bucket,
             count(*) AS n_events, round(sum(value), 6) AS sum_value
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT *,
             date_diff('day', DATE '1970-01-01', bucket) AS di
      FROM a)
    SELECT key, bucket, n_events, sum_value,
           CAST(sum(n_events) OVER w AS BIGINT) AS roll_n,
           round(sum(sum_value) OVER w, 6) AS roll_sum,
           round(sum(sum_value) OVER w / sum(n_events) OVER w, 6) AS roll_avg
    FROM r
    WINDOW w AS (PARTITION BY key ORDER BY di
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_daily_user_value(spark, sf_dir):
    """Trailing 7-day rolling count/sum/avg of event value per user
    (operators/timeseries.py rolling_stats) — RANGE frame over the day
    index, so calendar gaps thin the window; per-day partials first, so
    window state is O(7) per user."""
    from ..operators.timeseries import rolling_stats

    ev = _t(spark, sf_dir, "events")
    return rolling_stats(ev, window_buckets=7)


# --- multi-touch (U-shaped) attribution ---------------------------------------
@query(
    "attribution_multi_touch",
    """
    WITH w AS (
      SELECT event_id, user_id, ts, event_type,
             -- coalesce: list() over an EMPTY frame is NULL in DuckDB,
             -- but the engine's collect_list gives [] — same conversions
             list_filter(
               coalesce(
                 list(CASE WHEN event_type IN ('view', 'click')
                      THEN {'t_ts': ts, 't_id': event_id, 't_type': event_type}
                   END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 []),
               x -> x IS NOT NULL) AS tl
      FROM events),
    c AS (
      SELECT event_id AS conversion_id, user_id, ts,
             list_filter(list_reverse(tl)[1:3],
                         t -> (epoch_us(ts) - epoch_us(t.t_ts)) / 1000000.0
                              <= 86400.0) AS q
      FROM w WHERE event_type = 'purchase'),
    e AS (
      SELECT conversion_id, user_id, len(q) AS nq,
             unnest(q) AS t,
             unnest(range(1, len(q) + 1)) AS pos
      FROM c WHERE len(q) > 0)
    SELECT conversion_id, user_id, t.t_id AS attributed_event_id,
           t.t_type AS attributed_type, CAST(pos AS INT) AS touch_rank,
           round(CASE WHEN nq = 1 THEN 1.0
                      WHEN nq = 2 THEN 0.5
                      WHEN pos = 1 OR pos = nq THEN 0.4
                      ELSE 0.2 / (nq - 2) END, 6) AS credit
    FROM e
    UNION ALL
    SELECT conversion_id, user_id, NULL, 'direct', NULL, 1.0
    FROM c WHERE len(q) = 0
    """,
)
def attribution_multi_touch(spark, sf_dir):
    """U-shaped multi-touch attribution over the last 3 qualifying
    touches within a 1-day lookback (operators/funnel.py
    attribute_multi_touch, scheme='position'): 40/40 to the most recent
    and oldest kept touch, the middle splits 20; credits per conversion
    sum to 1, no-touch conversions get one 'direct' row."""
    from ..operators.funnel import attribute_multi_touch

    ev = _t(spark, sf_dir, "events")
    return attribute_multi_touch(
        ev,
        conversion_type="purchase",
        touch_types=("view", "click"),
        window_seconds=86400.0,
        max_touches=3,
        scheme="position",
    )


# --- exact join-size accounting ------------------------------------------------
@query(
    "join_size_estimate_events",
    """
    WITH l AS (SELECT user_id, count(*) AS cl FROM events
               WHERE event_type = 'view' GROUP BY 1),
    r AS (SELECT user_id, count(*) AS cr FROM events
          WHERE event_type = 'purchase' GROUP BY 1),
    pk AS (SELECT CAST(user_id AS VARCHAR) AS key, cl AS left_rows,
                  cr AS right_rows, cl * cr AS output_rows
           FROM l JOIN r USING (user_id))
    SELECT CAST(NULL AS VARCHAR) AS key, CAST(NULL AS BIGINT) AS left_rows,
           CAST(NULL AS BIGINT) AS right_rows, count(*) AS n_keys,
           CAST(sum(output_rows) AS BIGINT) AS output_rows
    FROM pk
    UNION ALL
    SELECT key, left_rows, right_rows, CAST(NULL AS BIGINT), output_rows
    FROM (SELECT * FROM pk ORDER BY output_rows DESC, key LIMIT 10)
    """,
)
def join_size_estimate_events(spark, sf_dir):
    """Exact equi-join output-size accounting from the two key censuses
    (operators/stats.py join_size_estimate): views x purchases per user,
    summary row + the 10 heaviest keys — the pre-join explosion check
    that costs census-sized work instead of the join itself."""
    from ..operators.stats import join_size_estimate

    ev = _t(spark, sf_dir, "events")
    return join_size_estimate(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        ["user_id"],
        top_k=10,
    )


# --- range-partition boundary planning -----------------------------------------
@query(
    "range_boundaries_lineitem",
    """
    WITH b AS (SELECT quantile_cont(l_extendedprice,
                 [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q
               FROM lineitem),
    parts AS (SELECT unnest(range(0, 8)) AS partition_id,
                     unnest(list_prepend(NULL::DOUBLE, q)) AS lo
              FROM b),
    p2 AS (SELECT partition_id, lo,
                  lead(lo) OVER (ORDER BY partition_id) AS hi
           FROM parts)
    SELECT p2.partition_id, round(p2.lo, 6) AS lo, round(p2.hi, 6) AS hi,
           CAST(count(v.l_extendedprice) AS BIGINT) AS n_rows
    FROM p2 LEFT JOIN lineitem v
      ON (p2.lo IS NULL OR v.l_extendedprice >= p2.lo)
     AND (p2.hi IS NULL OR v.l_extendedprice < p2.hi)
    GROUP BY 1, 2, 3
    """,
)
def range_boundaries_lineitem(spark, sf_dir):
    """Equal-count range-partition boundaries over lineitem prices
    (operators/layout.py range_boundaries, 8 partitions) — exact-quantile
    boundaries for a globally sorted / Iceberg sort-order write, with the
    row count each range captures."""
    from ..operators.layout import range_boundaries

    li = _t(spark, sf_dir, "lineitem")
    return range_boundaries(li, "l_extendedprice", 8)


# --- functional-dependency profiling ----------------------------------------
# Candidate FDs over lineitem: the composite key (l_orderkey, l_linenumber)
# determines l_partkey (it is the table's PK — holds), while l_orderkey
# alone determines neither supplier nor part (violated). One hash aggregate
# per candidate; output is one row per candidate.
@query(
    "fd_profile_lineitem",
    """
    SELECT 'l_orderkey -> l_suppkey' AS dependency,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(max(ndv) AS BIGINT) AS max_distinct_rhs,
           max(ndv) <= 1 AS holds
    FROM (SELECT count(DISTINCT l_suppkey) AS ndv
          FROM lineitem GROUP BY l_orderkey)
    UNION ALL
    SELECT 'l_orderkey -> l_returnflag',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(ndv) AS BIGINT),
           max(ndv) <= 1
    FROM (SELECT count(DISTINCT l_returnflag) AS ndv
          FROM lineitem GROUP BY l_orderkey)
    UNION ALL
    SELECT 'l_orderkey,l_linenumber -> l_partkey',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(ndv) AS BIGINT),
           max(ndv) <= 1
    FROM (SELECT count(DISTINCT l_partkey) AS ndv
          FROM lineitem GROUP BY l_orderkey, l_linenumber)
    """,
)
def fd_profile_lineitem(spark, sf_dir):
    from ..operators.profiling import fd_profile

    li = _t(spark, sf_dir, "lineitem")
    return fd_profile(
        li,
        [
            (["l_orderkey"], "l_suppkey"),
            (["l_orderkey"], "l_returnflag"),
            (["l_orderkey", "l_linenumber"], "l_partkey"),
        ],
    )


# --- primary-key candidate discovery ----------------------------------------
# Exact uniqueness + null census for every column of orders in ONE scan /
# one aggregate; a column is a PK candidate iff fully distinct and
# null-free.
@query(
    "pk_candidates_orders",
    """
    SELECT 'o_orderkey' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           count(DISTINCT o_orderkey) = count(*)
             AND sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
             AS is_pk_candidate
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_custkey) = count(*)
             AND sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderstatus) = count(*)
             AND sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_totalprice) = count(*)
             AND sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    """,
)
def pk_candidates_orders(spark, sf_dir):
    from ..operators.profiling import pk_candidates

    o = _t(spark, sf_dir, "orders")
    return pk_candidates(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    )


# --- inclusion-dependency (foreign-key candidate) discovery ------------------
# Does every child key value appear in the claimed parent? Each check is a
# distinct-collapse on both sides + LEFT ANTI join carrying only the key.
# The reverse direction customer -> orders is deliberately included as the
# expected-to-fail case (customers without orders).
@query(
    "ind_fk_candidates",
    """
    WITH chk AS (
      SELECT 'lineitem.l_orderkey in orders.o_orderkey' AS dependency,
             (SELECT count(DISTINCT l_orderkey) FROM lineitem
              WHERE l_orderkey IS NOT NULL) AS n_child_distinct,
             (SELECT count(*) FROM
                (SELECT DISTINCT l_orderkey AS k FROM lineitem
                 WHERE l_orderkey IS NOT NULL) c
              WHERE NOT EXISTS (SELECT 1 FROM orders p
                                WHERE p.o_orderkey = c.k)) AS n_missing
      UNION ALL
      SELECT 'lineitem.l_partkey in part.p_partkey',
             (SELECT count(DISTINCT l_partkey) FROM lineitem
              WHERE l_partkey IS NOT NULL),
             (SELECT count(*) FROM
                (SELECT DISTINCT l_partkey AS k FROM lineitem
                 WHERE l_partkey IS NOT NULL) c
              WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.k))
      UNION ALL
      SELECT 'orders.o_custkey in customer.c_custkey',
             (SELECT count(DISTINCT o_custkey) FROM orders
              WHERE o_custkey IS NOT NULL),
             (SELECT count(*) FROM
                (SELECT DISTINCT o_custkey AS k FROM orders
                 WHERE o_custkey IS NOT NULL) c
              WHERE NOT EXISTS (SELECT 1 FROM customer p
                                WHERE p.c_custkey = c.k))
      UNION ALL
      SELECT 'customer.c_custkey in orders.o_custkey',
             (SELECT count(DISTINCT c_custkey) FROM customer
              WHERE c_custkey IS NOT NULL),
             (SELECT count(*) FROM
                (SELECT DISTINCT c_custkey AS k FROM customer
                 WHERE c_custkey IS NOT NULL) c
              WHERE NOT EXISTS (SELECT 1 FROM orders p
                                WHERE p.o_custkey = c.k))
    )
    SELECT dependency, CAST(n_child_distinct AS BIGINT) AS n_child_distinct,
           CAST(n_missing AS BIGINT) AS n_missing, n_missing = 0 AS holds
    FROM chk
    """,
)
def ind_fk_candidates(spark, sf_dir):
    from ..operators.profiling import inclusion_deps

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    cust = _t(spark, sf_dir, "customer")
    return inclusion_deps(
        [
            (li, "l_orderkey", orders, "o_orderkey",
             "lineitem.l_orderkey in orders.o_orderkey"),
            (li, "l_partkey", part, "p_partkey",
             "lineitem.l_partkey in part.p_partkey"),
            (orders, "o_custkey", cust, "c_custkey",
             "orders.o_custkey in customer.c_custkey"),
            (cust, "c_custkey", orders, "o_custkey",
             "customer.c_custkey in orders.o_custkey"),
        ]
    )


# --- snapshot table diff -----------------------------------------------------
# Two deterministic snapshots derived from events: old drops event_id%17==0,
# new drops event_id%13==0 and shifts value by +1.5 where event_id%7==0.
# One full-outer key join; unchanged rows are dropped inside the projection.
@query(
    "table_diff_event_snapshots",
    """
    WITH old AS (
      SELECT event_id, event_type, value FROM events WHERE event_id % 17 <> 0),
    new AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 7 = 0 THEN value + 1.5 ELSE value END AS value
      FROM events WHERE event_id % 13 <> 0),
    j AS (
      SELECT coalesce(o.event_id, n.event_id) AS event_id,
             o.event_id IS NOT NULL AS po, n.event_id IS NOT NULL AS pn,
             concat_ws(',',
               CASE WHEN o.event_type IS DISTINCT FROM n.event_type
                    THEN 'event_type' END,
               CASE WHEN o.value IS DISTINCT FROM n.value
                    THEN 'value' END) AS cc
      FROM old o FULL JOIN new n ON o.event_id = n.event_id),
    s AS (
      SELECT event_id,
             CASE WHEN po AND NOT pn THEN 'removed'
                  WHEN pn AND NOT po THEN 'added'
                  WHEN cc <> '' THEN 'changed' END AS status,
             cc
      FROM j)
    SELECT event_id, status,
           CASE WHEN status = 'changed' THEN cc ELSE '' END AS changed_cols
    FROM s WHERE status IS NOT NULL
    """,
)
def table_diff_event_snapshots(spark, sf_dir):
    from ..operators.reconcile import table_diff

    ev = _t(spark, sf_dir, "events")
    old = ev.where(F.col("event_id") % 17 != 0).select(
        "event_id", "event_type", "value"
    )
    new = ev.where(F.col("event_id") % 13 != 0).select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.col("value") + 1.5)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    return table_diff(old, new, ["event_id"], ["event_type", "value"])


# --- orderless per-group content fingerprint ---------------------------------
# bit_xor of a 60-bit sha256 prefix over a caller-fixed canonical rendering:
# commutative, map-side combinable, comparable across engines without any
# sort or co-shuffle. The %.6f rendering is engine-stable because no double
# is exactly half at the 6-decimal cut (a dyadic rational cannot reduce to
# an odd/(2*10^6) fraction).
@query(
    "fingerprint_events_by_type",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(CAST(concat('0x', substr(sha256(concat_ws(chr(31),
             CAST(event_id AS VARCHAR),
             coalesce(event_type, '<NULL>'),
             CASE WHEN value IS NULL THEN '<NULL>'
                  ELSE printf('%.6f', value) END)), 1, 15)) AS BIGINT))
             AS fingerprint
    FROM events GROUP BY event_type
    """,
)
def fingerprint_events_by_type(spark, sf_dir):
    from ..operators.reconcile import canonical_row, table_fingerprint

    ev = _t(spark, sf_dir, "events")
    rendered = canonical_row(
        [
            F.col("event_id").cast("string"),
            F.coalesce(F.col("event_type"), F.lit("<NULL>")),
            F.when(F.col("value").isNull(), F.lit("<NULL>")).otherwise(
                F.format_string("%.6f", F.col("value"))
            ),
        ]
    )
    return table_fingerprint(ev, ["event_type"], rendered)


# --- CUSUM change-point per event type ---------------------------------------
# Day-census first; the statistic is rounded to 6 BEFORE the argmax so the
# earliest-period tiebreak is identical on both engines.
@query(
    "cusum_change_point_events",
    """
    WITH census AS (
      SELECT event_type, date_trunc('day', ts) AS period, sum(value) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    sc AS (
      SELECT event_type, period,
             sum(x) OVER w AS cum, row_number() OVER w AS k,
             sum(x) OVER (PARTITION BY event_type) AS tot,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM census WINDOW w AS (PARTITION BY event_type ORDER BY period)),
    s2 AS (
      SELECT *, round(abs(cum - k * tot / n), 6) AS s
      FROM sc WHERE k < n),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY s DESC, period ASC) AS rn
      FROM s2)
    SELECT event_type, CAST(n AS BIGINT) AS n_periods, period AS cp_period,
           s AS cusum_max,
           round(cum / k, 6) AS mean_before,
           round((tot - cum) / (n - k), 6) AS mean_after
    FROM best WHERE rn = 1
    """,
)
def cusum_change_point_events(spark, sf_dir):
    from ..operators.timeseries import change_point

    return change_point(
        _t(spark, sf_dir, "events"), "ts", "value", by=["event_type"], unit="day"
    )


def _markov_attribution_sql(conv: str = "purchase", rounds: int = 10) -> str:
    """Unrolled replica of funnel.markov_attribution: same journey
    construction, same per-round round(,12) fixed-point absorption, same
    removal-effect normalization (the PageRank-oracle convention)."""
    parts = [f"""
    marked AS (
      SELECT user_id AS u, ts, event_id AS tb, event_type AS c,
             sum(CASE WHEN event_type = '{conv}' THEN 1 ELSE 0 END) OVER w
               - CASE WHEN event_type = '{conv}' THEN 1 ELSE 0 END AS cb
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    path AS (SELECT * FROM marked WHERE cb = 0 AND c <> '{conv}'),
    conv_u AS (SELECT DISTINCT u FROM marked WHERE c = '{conv}'),
    stepped AS (
      SELECT u, c AS t_, lag(c) OVER w2 AS f_,
             row_number() OVER w2 AS rn,
             count(*) OVER (PARTITION BY u) AS n
      FROM path WINDOW w2 AS (PARTITION BY u ORDER BY ts, tb)),
    alltr AS (
      SELECT f_ AS f, t_ AS t FROM stepped WHERE rn > 1
      UNION ALL
      SELECT '__START__' AS f, t_ AS t FROM stepped WHERE rn = 1
      UNION ALL
      SELECT s.t_ AS f,
             CASE WHEN cv.u IS NOT NULL THEN '__CONV__'
                  ELSE '__NULL__' END AS t
      FROM stepped s LEFT JOIN conv_u cv ON cv.u = s.u WHERE s.rn = s.n
      UNION ALL
      SELECT '__START__' AS f, '__CONV__' AS t FROM conv_u
      WHERE u NOT IN (SELECT DISTINCT u FROM stepped)),
    trans AS (SELECT f, t, count(*) AS n FROM alltr GROUP BY 1, 2),
    probs AS (SELECT f, t, n * 1.0 / sum(n) OVER (PARTITION BY f) AS p
              FROM trans),
    scen AS (SELECT DISTINCT f AS s FROM probs WHERE f <> '__START__'
             UNION ALL SELECT '__ALL__'),
    st AS (SELECT scen.s AS sc, probs.f,
                  CASE WHEN probs.t = scen.s THEN '__NULL__'
                       ELSE probs.t END AS t,
                  probs.p
           FROM probs CROSS JOIN scen WHERE probs.f <> scen.s),
    a0 AS (SELECT DISTINCT sc, f AS s, 0.0 AS a FROM st)"""]
    for i in range(1, rounds + 1):
        parts.append(f"""a{i} AS (
      SELECT st.sc, st.f AS s,
             round(sum(st.p * CASE WHEN st.t = '__CONV__' THEN 1.0
                                   WHEN st.t = '__NULL__' THEN 0.0
                                   ELSE coalesce(av.a, 0.0) END), 12) AS a
      FROM st LEFT JOIN a{i - 1} av ON av.sc = st.sc AND av.s = st.t
      GROUP BY 1, 2)""")
    parts.append(f"""sa AS (SELECT sc, a FROM a{rounds} WHERE s = '__START__'),
    base AS (SELECT a AS b FROM sa WHERE sc = '__ALL__'),
    perch AS (
      SELECT sa.sc AS channel,
             round(base.b, 6) AS p_conv_all,
             round(sa.a, 6) AS p_conv_removed,
             CASE WHEN base.b > 0 THEN
               greatest(round(1.0 - sa.a / base.b, 6), 0.0) END
               AS removal_effect
      FROM sa CROSS JOIN base WHERE sa.sc <> '__ALL__')
    SELECT channel, p_conv_all, p_conv_removed, removal_effect,
           CASE WHEN sum(removal_effect) OVER () > 0 THEN
             round(removal_effect / sum(removal_effect) OVER (), 6) END
             AS attribution
    FROM perch""")
    return "WITH " + ",\n    ".join(parts)


# --- Markov removal-effect attribution ---------------------------------------
@query("attribution_markov_removal", _markov_attribution_sql())
def attribution_markov_removal(spark, sf_dir):
    """Data-driven attribution (operators/funnel.py markov_attribution):
    channel credit = normalized drop in absorbing-chain conversion
    probability when the channel is removed — the model-based companion
    to the last-touch and position-based rules."""
    from ..operators.funnel import markov_attribution

    return markov_attribution(_t(spark, sf_dir, "events"), conv_type="purchase")


# --- Shapley-value attribution over observed coalitions ----------------------
# Same observed-coalition game on both engines: v(unobserved) = 0, exact
# integer factorial weights, per-channel phi rounded before the share.
# Journeys use the FIRST DAY of events: over the full window conversion
# is near-universal on this corpus (v == 1 on every coalition — a
# degenerate game); day one gives 15 coalitions at a 30% rate.
@query(
    "attribution_shapley",
    """
    WITH marked AS (
      SELECT user_id AS u, event_type AS c,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts)
               - CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cb
      FROM events WHERE ts < TIMESTAMP '2024-01-02'),
    touched AS (
      SELECT u, list_sort(list_distinct(list(c))) AS s
      FROM marked WHERE cb = 0 AND c <> 'purchase' GROUP BY u),
    conv_u AS (SELECT DISTINCT u FROM marked WHERE c = 'purchase'),
    journeys AS (
      SELECT t.s, CASE WHEN cv.u IS NOT NULL THEN 1 ELSE 0 END AS conv
      FROM touched t LEFT JOIN conv_u cv ON cv.u = t.u),
    census AS (
      SELECT array_to_string(s, '|') AS key_, any_value(s) AS s,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS nc
      FROM journeys GROUP BY 1),
    cen2 AS (SELECT *, nc / (n * 1.0) AS v, len(s) AS sz FROM census),
    kk AS (SELECT count(DISTINCT ch) AS k
           FROM (SELECT unnest(s) AS ch FROM cen2)),
    terms AS (
      SELECT ch, key_, v, sz,
             array_to_string([x FOR x IN s IF x <> ch], '|') AS key_minus
      FROM (SELECT key_, s, v, sz, unnest(s) AS ch FROM cen2)),
    joined AS (
      SELECT t.ch,
             factorial(CAST(t.sz - 1 AS INTEGER)) * 1.0
               * factorial(CAST(kk.k - t.sz AS INTEGER))
               / factorial(CAST(kk.k AS INTEGER))
               * (t.v - coalesce(vm.v, 0.0)) AS term
      FROM terms t
      CROSS JOIN kk
      LEFT JOIN cen2 vm ON vm.key_ = t.key_minus),
    phi AS (SELECT ch AS channel, round(sum(term), 6) AS shapley_value
            FROM joined GROUP BY 1)
    SELECT channel, shapley_value,
           CASE WHEN sum(greatest(shapley_value, 0.0)) OVER () > 0 THEN
             round(greatest(shapley_value, 0.0)
                   / sum(greatest(shapley_value, 0.0)) OVER (), 6) END
             AS attribution
    FROM phi
    """,
)
def attribution_shapley(spark, sf_dir):
    """Shapley-value attribution (operators/funnel.py shapley_attribution)
    — the cooperative-game companion to markov/multi-touch credit."""
    from ..operators.funnel import shapley_attribution

    ev = _t(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-02").cast("timestamp")
    )
    return shapley_attribution(ev, conv_type="purchase")


# --- per-period new vs returning users ---------------------------------------
@query(
    "new_vs_returning_weekly",
    """
    WITH first_ AS (SELECT user_id, date_trunc('week', min(ts)) AS f
                    FROM events GROUP BY 1),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS period
            FROM events),
    t AS (SELECT period, CASE WHEN period = f THEN 1 ELSE 0 END AS nw
          FROM act JOIN first_ USING (user_id))
    SELECT period, CAST(count(*) AS BIGINT) AS active_users,
           CAST(sum(nw) AS BIGINT) AS new_users,
           CAST(count(*) - sum(nw) AS BIGINT) AS returning_users,
           round((count(*) - sum(nw)) * 1.0 / count(*), 6)
             AS returning_ratio
    FROM t GROUP BY period
    """,
)
def new_vs_returning_weekly(spark, sf_dir):
    """Weekly audience decomposition (operators/funnel.py
    new_vs_returning): first-seen census + distinct activity census."""
    from ..operators.funnel import new_vs_returning

    return new_vs_returning(_t(spark, sf_dir, "events"), bucket="week")


# --- touch-to-conversion latency summary -------------------------------------
# Aggregates the last-touch attribution rows (same carry-forward chain as
# attribution_last_touch; lags rounded to 6 BEFORE the summary on both
# engines); the direct bucket reports NULL latencies.
@query(
    "funnel_stage_latency",
    """
    WITH w AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('view', 'click')
                 THEN {'t_ts': ts, 't_id': event_id, 't_type': event_type}
               END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t
      FROM events),
    c AS (
      SELECT t, (epoch_us(ts) - epoch_us(t.t_ts)) / 1000000.0 AS lag
      FROM w WHERE event_type = 'purchase'),
    a AS (
      SELECT CASE WHEN t IS NOT NULL AND lag <= 86400.0 THEN t.t_type
                  ELSE 'direct' END AS attributed_type,
             CASE WHEN t IS NOT NULL AND lag <= 86400.0 THEN round(lag, 6)
               END AS lag_seconds
      FROM c)
    SELECT attributed_type, CAST(count(*) AS BIGINT) AS n_conversions,
           round(avg(lag_seconds), 6) AS avg_lag_s,
           round(quantile_cont(lag_seconds, 0.5), 6) AS p50_lag_s,
           round(quantile_cont(lag_seconds, 0.9), 6) AS p90_lag_s
    FROM a GROUP BY attributed_type
    """,
)
def funnel_stage_latency(spark, sf_dir):
    """Touch-to-conversion latency percentiles per attributed type
    (operators/funnel.py stage_latency_report) — the funnel-speed view of
    the last-touch chain."""
    from ..operators.funnel import stage_latency_report

    return stage_latency_report(
        _t(spark, sf_dir, "events"),
        conversion_type="purchase",
        touch_types=("view", "click"),
        window_seconds=86400.0,
    )
