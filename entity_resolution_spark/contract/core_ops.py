"""Driver-contract batch 1: SQL-expressible operators from SURVEY.md §2.

Every Spark query aliases computed columns identically to its DuckDB oracle
(the driver hash-compares values after sorting columns by name). Aggregate
sums are rounded where IEEE summation order could differ between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..queries import _t, query


# --- P1: threshold filter (entity_resolution.py:343-344) -------------------
@query(
    "p1_threshold_filter",
    "SELECT event_id, value FROM events WHERE value >= 95.0",
)
def p1_threshold_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("value") >= 95.0)
        .select("event_id", "value")
    )


# --- A2: group-by frequency count (entity_assignment.py:111-127) -----------
@query(
    "a2_group_count",
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang",
)
def a2_group_count(spark, sf_dir):
    return _t(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n_docs"))


# --- A3/A4: distinct + null counts (entity_resolution.py:474-477) ----------
@query(
    "a3_a4_distinct_null_counts",
    """
    SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_texts
    FROM documents
    """,
)
def a3_a4_distinct_null_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
    )


# --- O1/O2: global sort + top-k with deterministic tiebreak ----------------
@query(
    "o2_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def o2_topk(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# --- J2: outer equi-join (entity_assignment.py:434-486) --------------------
@query(
    "j2_outer_join",
    """
    SELECT c_custkey, c_name, n_name
    FROM customer FULL OUTER JOIN nation ON c_nationkey = n_nationkey
    """,
)
def j2_outer_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return c.join(n, c.c_nationkey == n.n_nationkey, "full_outer").select(
        "c_custkey", "c_name", "n_name"
    )


# --- U1: vertical union with column alignment (entity_assignment.py:488-534)
@query(
    "u1_union_align",
    """
    SELECT c_name AS name, 'dataset_1' AS _dataset_source FROM customer
    UNION ALL
    SELECT s_name AS name, 'dataset_2' AS _dataset_source FROM supplier
    """,
)
def u1_union_align(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("dataset_1").alias("_dataset_source")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("dataset_2").alias("_dataset_source")
    )
    return c.unionByName(s)


# --- A5: set-overlap Jaccard via joins (entity_resolution.py:514-527) ------
@query(
    "a5_jaccard_sets",
    """
    WITH a AS (SELECT DISTINCT c_nationkey AS k FROM customer),
         b AS (SELECT DISTINCT s_nationkey AS k FROM supplier),
         i AS (SELECT count(*) AS n FROM (SELECT k FROM a INTERSECT SELECT k FROM b)),
         u AS (SELECT count(*) AS n FROM (SELECT k FROM a UNION SELECT k FROM b))
    SELECT round(CAST(i.n AS DOUBLE) / u.n, 6) AS jaccard,
           CAST(i.n AS BIGINT) AS n_intersection,
           CAST(u.n AS BIGINT) AS n_union
    FROM i, u
    """,
)
def a5_jaccard_sets(spark, sf_dir):
    # single plan: full-outer join of the two distinct sets, then one
    # aggregate — |A∩B| = rows with both sides present, |A∪B| = all rows.
    # (Round 1 ran two driver-side count() actions = two full scans.)
    a = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("ka")).distinct()
    b = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("kb")).distinct()
    j = a.join(b, a.ka == b.kb, "full_outer")
    return j.agg(
        F.sum((F.col("ka").isNotNull() & F.col("kb").isNotNull()).cast("long")).alias("__i"),
        F.count("*").alias("__u"),
    ).select(
        F.round(F.col("__i").cast("double") / F.col("__u"), 6).alias("jaccard"),
        F.col("__i").alias("n_intersection"),
        F.col("__u").alias("n_union"),
    )


# --- A1/O2: mean of top-k, the consolidation decision aggregate ------------
# (entity_assignment.py:399-412: avg of top matches / 100)
@query(
    "a1_topk_mean",
    """
    SELECT round(avg(o_totalprice) / 100.0, 6) AS avg_topk_normalized
    FROM (SELECT o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
    """,
)
def a1_topk_mean(spark, sf_dir):
    top = (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
    return top.agg(F.round(F.avg("o_totalprice") / 100.0, 6).alias("avg_topk_normalized"))


# --- P5: frequency-threshold filter (entity_assignment.py:129-135) ---------
@query(
    "p5_freq_filter",
    """
    SELECT p_brand, CAST(count(*) AS BIGINT) AS cnt FROM part
    GROUP BY p_brand HAVING count(*) >= 5
    """,
)
def p5_freq_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


# --- A7: weighted score combination (entity_resolution.py:709-720) ---------
@query(
    "a7_weighted_score",
    """
    SELECT l_orderkey, l_linenumber,
           round(0.4 * l_quantity + 0.35 * l_discount * 100 + 0.25 * l_tax * 100, 4)
             AS weighted_score
    FROM lineitem
    """,
)
def a7_weighted_score(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            0.4 * F.col("l_quantity") + 0.35 * F.col("l_discount") * 100 + 0.25 * F.col("l_tax") * 100,
            4,
        ).alias("weighted_score"),
    )


# --- F15 + dedup: exact duplicate groups by content digest -----------------
# (the engine's Stage 1b exact-collapse, BASELINE.json sha256 invariant)
@query(
    "dedup_exact_sha",
    """
    SELECT sha256(text) AS content_sha256, CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
    FROM documents GROUP BY sha256(text)
    """,
)
def dedup_exact_sha(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("content_sha256", F.sha2(F.col("text").cast("binary"), 256))
        .groupBy("content_sha256")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("canonical_doc_id"))
    )


# --- F15: per-row sha256 invariant ----------------------------------------
@query(
    "f15_sha_invariant",
    "SELECT doc_id, sha256(text) AS content_sha256 FROM documents",
)
def f15_sha_invariant(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text").cast("binary"), 256).alias("content_sha256")
    )


# --- A1-A9 composite: TPC-H Q1-shaped aggregate ----------------------------
@query(
    "tpch_q1_agg",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
           round(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --- whitespace token counting (text-analysis operator) --------------------
@query(
    "token_count_ws",
    """
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
             AS n_tokens
    FROM documents
    """,
)
def token_count_ws(spark, sf_dir):
    from ..functions.text import whitespace_token_count_col

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", whitespace_token_count_col(F.col("text")).cast("long").alias("n_tokens")
    )


# --- OLAP rollup (multi-level aggregation) ---------------------------------
@query(
    "rollup_lineitem_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# --- OLAP cube (all grouping-set combinations) ------------------------------
@query(
    "cube_lineitem_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_revenue(spark, sf_dir):
    """CUBE companion to the rollup query: every grouping-set combination
    (both keys, each key alone, grand total) in ONE pass — Catalyst expands
    the cube into a single Expand + hash-aggregate, so the plan reads the
    fact table once regardless of the number of grouping sets (the same
    property the oracle's GROUP BY CUBE has)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# --- pivot (wide aggregation with a fixed category list) -------------------
@query(
    "pivot_event_type_counts",
    """
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
           CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_event_type_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    # explicit category list: deterministic schema, no extra distinct scan
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


# --- exact quantiles (sort-based, not approx) ------------------------------
# Spark's percentile() and DuckDB's quantile_cont share the linear-
# interpolation definition (index p*(n-1)); exact equality expected.
@query(
    "exact_quantiles_lineitem",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.50), 6) AS q50,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75,
           round(quantile_cont(l_quantity, 0.95), 6) AS q95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def exact_quantiles_lineitem(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    q = lambda p: F.round(F.percentile(F.col("l_quantity"), F.lit(p)), 6)
    return l.groupBy("l_returnflag").agg(
        q(0.25).alias("q25"), q(0.50).alias("q50"),
        q(0.75).alias("q75"), q(0.95).alias("q95"),
    )


# --- semi-structured JSON parsing (schema'd from_json, not string hacks) ---
@query(
    "json_props_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_props_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    j = e.withColumn("j", F.from_json("props", "k BIGINT"))
    return j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("j.k").alias("sum_k"),
        F.min("j.k").alias("min_k"),
        F.max("j.k").alias("max_k"),
    )


# --- TPC-H Q3 shape: selective 3-way join + group + top-k -------------------
# Join-planning showcase: the filtered customer dimension is explicitly
# broadcast into orders as a LEFT SEMI probe (no payload columns move), and
# only the surviving orders shuffle against lineitem on the join key. At
# 100 TB the lineitem<->orders join is the one unavoidable shuffle; the
# semi-join keeps it as small as the date predicates allow, and Catalyst
# pushes both date filters into the parquet scans.
@query(
    "tpch_q3_topk",
    """
    SELECT l_orderkey,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
             AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_topk(spark, sf_dir):
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    surviving = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi"
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(surviving, li.l_orderkey == surviving.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q5 shape: snowflake join through two dimension chains ------------
# region -> nation -> supplier is a pure broadcast chain (dims are tiny at
# any scale); the lineitem<->orders shuffle join is the single big exchange;
# customer joins last on (custkey, nationkey = supplier nation) so the
# "local supplier" predicate prunes before aggregation. This is the classic
# star/snowflake plan Catalyst should produce: one shuffle pair for the two
# fact tables, everything else BroadcastHashJoin.
@query(
    "tpch_q5_region_volume",
    """
    SELECT n_name,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_region_volume(spark, sf_dir):
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    nation = _t(spark, sf_dir, "nation")
    nat = nation.join(
        F.broadcast(region.select("r_regionkey")),
        nation.n_regionkey == F.col("r_regionkey"),
        "left_semi",
    ).select("n_nationkey", "n_name")
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    facts = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey
    )
    local = facts.join(
        cust,
        (F.col("o_custkey") == cust.c_custkey)
        & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    return local.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# --- TPC-H Q18 shape: join against an aggregate-derived key set -------------
# "Large-volume orders": the HAVING aggregate runs first (map-side partial
# agg on l_orderkey, the table's natural clustering), and the small survivor
# set is broadcast back into orders — so the fact table is scanned twice but
# never shuffled against itself, and customer attaches by one hash join.
@query(
    "tpch_q18_big_orders",
    """
    SELECT c_name, o_orderkey, o_orderdate,
           round(CAST(b.tq AS DOUBLE), 2) AS total_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS tq
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 200) b
    JOIN orders   ON o_orderkey = b.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def tpch_q18_big_orders(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .where(F.col("tq") > 200)
        .select("l_orderkey", F.round(F.col("tq"), 2).alias("total_qty"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "total_qty")
    )
