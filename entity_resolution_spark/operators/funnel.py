"""Ordered-funnel conversion analysis over an event stream.

The classic product-analytics question — of the users who did A, how
many went on to do B, then C, IN THAT ORDER — applied to any
(user, timestamp, type) event table. Each stage requires an event
STRICTLY after the user's earliest completion of the previous stage
(same-timestamp events do not chain; deterministic and the stricter,
safer reading).

Plan shape: one filtered min-aggregate per stage, each joined to the
previous stage's (user, ts) frame on the user key — k stages cost k
filtered scans + k key-partitioned joins of user-sized frames; the
summary is a k-row union with a lag window over k rows. Nothing is ever
pair-joined or windowed over the raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage_idx, stage, users_reached, conversion_from_prev round-6,
    conversion_overall round-6) — one row per funnel stage. Stage 1's
    conversions are 1.0 by definition; downstream rows divide by the
    previous (resp. first) stage's user count. An empty first stage
    yields zero rows reached everywhere and NULL-safe 0.0 conversions.
    """
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("a funnel needs >= 2 stages")
    reached = events.where(F.col(type_col) == stages[0]).groupBy(
        F.col(user_col).alias("__u")
    ).agg(F.min(ts_col).alias("__t"))
    counts = [reached.agg(F.count(F.lit(1)).alias("users_reached"))]
    for st in stages[1:]:
        nxt = (
            events.where(F.col(type_col) == st)
            .select(F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts"))
            .join(reached.hint("shuffle_hash"), "__u")
            .where(F.col("__ts") > F.col("__t"))
            .groupBy("__u")
            .agg(F.min("__ts").alias("__t"))
        )
        counts.append(nxt.agg(F.count(F.lit(1)).alias("users_reached")))
        reached = nxt
    rows = counts[0].select(
        F.lit(1).alias("stage_idx"), F.lit(stages[0]).alias("stage"), "users_reached"
    )
    for i, c in enumerate(counts[1:], start=2):
        rows = rows.unionAll(
            c.select(
                F.lit(i).alias("stage_idx"),
                F.lit(stages[i - 1]).alias("stage"),
                "users_reached",
            )
        )
    w = Window.partitionBy().orderBy("stage_idx")
    prev = F.lag("users_reached").over(w)
    first = F.first("users_reached").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rows.select(
        "stage_idx",
        "stage",
        F.col("users_reached").cast("long"),
        F.round(
            F.when(prev.isNull(), F.lit(1.0))
            .when(prev > 0, F.col("users_reached") / prev)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("conversion_from_prev"),
        F.round(
            F.when(first > 0, F.col("users_reached") / first).otherwise(F.lit(0.0)),
            6,
        ).alias("conversion_overall"),
    )


def cohort_retention(
    events: DataFrame,
    bucket: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, offset, active_users, cohort_size, retention round-6) —
    the classic retention matrix: users grouped by the time bucket of
    their FIRST event (their cohort), then counted in every later bucket
    they appear in; offset is buckets-since-cohort (offset 0 row carries
    retention 1.0 by construction). ``bucket``: 'week' | 'day' | 'month'
    (date_trunc units).

    Two aggregates over the events (first-seen per user, then distinct
    user-bucket activity) joined on the user key; the matrix itself is
    cohort x offset sized. Offsets count CALENDAR buckets via date
    difference, not bucket-row gaps, so empty buckets still advance the
    offset.
    """
    if bucket not in ("day", "week", "month"):
        raise ValueError("bucket must be day|week|month")
    b = lambda c: F.date_trunc(bucket, c)  # noqa: E731
    first = events.groupBy(F.col(user_col).alias("__u")).agg(
        b(F.min(ts_col)).alias("__cohort")
    )
    activity = events.select(
        F.col(user_col).alias("__u"), b(F.col(ts_col)).alias("__b")
    ).distinct()
    if bucket == "day":
        off = F.datediff(F.col("__b"), F.col("__cohort"))
    elif bucket == "week":
        off = F.floor(F.datediff(F.col("__b"), F.col("__cohort")) / 7)
    else:
        off = (F.year("__b") - F.year("__cohort")) * 12 + (
            F.month("__b") - F.month("__cohort")
        )
    cells = (
        activity.join(first.hint("shuffle_hash"), "__u")
        .groupBy(F.col("__cohort").alias("cohort"), off.cast("long").alias("offset"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    sizes = first.groupBy(F.col("__cohort").alias("cohort")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return cells.join(sizes.hint("shuffle_hash"), "cohort").select(
        "cohort",
        "offset",
        "active_users",
        "cohort_size",
        F.round(F.col("active_users") / F.col("cohort_size"), 6).alias("retention"),
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: bool = True,
) -> DataFrame:
    """(from_state, to_state, n, prob round-6) — the order-1 Markov
    transition matrix of per-user event sequences (each user's events in
    (ts, type) order; consecutive pairs counted across the whole corpus;
    rows normalized per from_state). The behavioral-model companion to
    the funnel: funnels test ONE path, the matrix shows them all.

    One key-partitioned lag window + one state-pair census; the matrix is
    |states|^2-sized."""
    order = [F.col(ts_col)] + ([F.col("to_state")] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(F.col(user_col), F.col(ts_col), F.col(type_col).alias("to_state"))
        .withColumn("from_state", F.lag("to_state").over(w))
        .where(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__t"))
    return pairs.join(totals.hint("shuffle_hash"), "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.col("__t"), 6).alias("prob"),
    )


def attribute_conversions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    window_seconds: float = 86400.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch marketing attribution: credit each conversion event to
    the user's most recent preceding touch event within the lookback
    window, or to ``'direct'`` when no touch qualifies.

    Returns one row per conversion: (conversion_id, user_col, ts,
    attributed_event_id, attributed_type, lag_seconds). ``lag_seconds``
    and ``attributed_event_id`` are NULL for direct conversions.

    Plan shape: a single per-user window pass — ``last(struct, ignore
    nulls)`` over rows preceding the current one — exactly the struct
    carry-forward used by operators/asof.py, so no self-join and no
    per-conversion scan. The lookback filter is applied AFTER the
    carry-forward, which is equivalent: the last preceding touch overall
    is the last preceding touch within the window whenever any touch is
    within the window. One sort per user partition; for pathological
    hot users apply the sessions.py segmented-scan treatment first.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col).isin(*touch_types),
        F.struct(
            F.col(ts_col).alias("t_ts"),
            F.col(id_col).alias("t_id"),
            F.col(type_col).alias("t_type"),
        ),
    )
    # exact integer microsecond difference, divided once — bit-identical
    # to (epoch_us(a) - epoch_us(b)) / 1e6 on any engine (a double-cast
    # difference would round each epoch separately and drift ~1e-6 s);
    # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike
    lag = F.timestamp_diff(
        "MICROSECOND", F.col("__t.t_ts"), F.col(ts_col)
    ) / F.lit(1000000.0)
    qualified = F.col("__t").isNotNull() & (lag <= F.lit(float(window_seconds)))
    return (
        events.withColumn("__t", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col(type_col) == conversion_type)
        .select(
            F.col(id_col).alias("conversion_id"),
            F.col(user_col),
            F.col(ts_col),
            F.when(qualified, F.col("__t.t_id")).alias("attributed_event_id"),
            F.when(qualified, F.col("__t.t_type"))
            .otherwise(F.lit("direct"))
            .alias("attributed_type"),
            F.when(qualified, F.round(lag, 6)).alias("lag_seconds"),
        )
    )


def attribute_multi_touch(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    window_seconds: float = 86400.0,
    max_touches: int = 5,
    scheme: str = "linear",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Multi-touch attribution over the user's last ``max_touches``
    touches: each conversion's credit is split across the touch events
    that precede it within the lookback window — ``'linear'`` splits
    evenly, ``'position'`` gives 40%/40% to first/last qualifying touch
    and splits the remaining 20% across the middle (the standard U-shaped
    rule; with one touch it gets full credit, with two they split evenly).

    Returns one row per (conversion, credited touch): (conversion_id,
    user_col, attributed_event_id, attributed_type, touch_rank — 1 =
    most recent, credit round-6; credits per conversion sum to 1), plus a
    single ``'direct'`` row with credit 1.0 when no touch qualifies.

    Scale shape: one per-user carry-forward window collecting the
    preceding touch list, sliced to the newest ``max_touches`` before the
    explode — so the OUTPUT is bounded at k rows per conversion, while
    the window state itself grows with a user's touch history (cap the
    history first with the sessions.py segmented pass for pathologically
    hot users). Same single per-user sort as attribute_conversions; no
    self-join.
    """
    if max_touches < 1:
        raise ValueError("max_touches must be >= 1")
    if scheme not in ("linear", "position"):
        raise ValueError("scheme must be 'linear' or 'position'")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col).isin(*touch_types),
        F.struct(
            F.col(ts_col).alias("t_ts"),
            F.col(id_col).alias("t_id"),
            F.col(type_col).alias("t_type"),
        ),
    )
    # newest-first carry list, capped at max_touches: collect_list over
    # the frame then reverse+slice (array functions run after the window
    # state, so the window itself still carries the full preceding list —
    # cap BEFORE explode keeps the output bounded; for pathologically hot
    # users pre-thin touches with the sessions.py segmented pass)
    touches = F.slice(F.reverse(F.collect_list(touch).over(w)), 1, max_touches)
    conv = (
        events.withColumn("__ts", touches)
        .filter(F.col(type_col) == conversion_type)
        .select(
            F.col(id_col).alias("conversion_id"),
            F.col(user_col),
            F.col(ts_col),
            F.filter(
                F.col("__ts"),
                lambda t: (
                    F.timestamp_diff("MICROSECOND", t["t_ts"], F.col(ts_col))
                    / F.lit(1000000.0)
                )
                <= F.lit(float(window_seconds)),
            ).alias("__q"),
        )
    )
    n = F.size("__q")
    id_type = events.schema[id_col].dataType
    direct = conv.filter(n == 0).select(
        "conversion_id",
        user_col,
        F.lit(None).cast(id_type).alias("attributed_event_id"),
        F.lit("direct").alias("attributed_type"),
        F.lit(None).cast("int").alias("touch_rank"),
        F.lit(1.0).alias("credit"),
    )
    exploded = (
        conv.filter(n > 0)
        .select(
            "conversion_id",
            user_col,
            n.alias("__n"),
            F.posexplode("__q").alias("__pos", "t"),
        )
        .select(
            "conversion_id",
            user_col,
            F.col("t.t_id").alias("attributed_event_id"),
            F.col("t.t_type").alias("attributed_type"),
            (F.col("__pos") + 1).cast("int").alias("touch_rank"),
            "__n",
        )
    )
    if scheme == "linear":
        credit = F.lit(1.0) / F.col("__n")
    else:
        # U-shaped: rank 1 (most recent) and rank __n (oldest kept) get
        # 0.4 each, middles split 0.2; degenerate cases renormalize
        credit = (
            F.when(F.col("__n") == 1, F.lit(1.0))
            .when(F.col("__n") == 2, F.lit(0.5))
            .when(
                (F.col("touch_rank") == 1) | (F.col("touch_rank") == F.col("__n")),
                F.lit(0.4),
            )
            .otherwise(F.lit(0.2) / (F.col("__n") - 2))
        )
    return exploded.select(
        "conversion_id",
        user_col,
        "attributed_event_id",
        "attributed_type",
        "touch_rank",
        F.round(credit, 6).alias("credit"),
    ).unionByName(direct)


def cohort_ltv(
    events: DataFrame,
    value_col: str = "value",
    bucket: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, offset, period_value, cum_value, cohort_size, ltv_per_user)
    — the value companion to `cohort_retention`: total event value booked
    by each first-seen cohort in every offset bucket, accumulated into the
    running lifetime value per cohort member. Offsets with no activity are
    omitted (they add nothing to the cumulative sum); offsets count
    CALENDAR buckets, so gaps still advance the clock.

    Same scale shape as the retention matrix: two hash aggregates joined
    on the user key, then ONE window over the cohort x offset matrix —
    matrix-sized, never the raw events. Values are rounded to 6 before
    the cumulative sum so the running total is summation-order stable.
    """
    if bucket not in ("day", "week", "month"):
        raise ValueError("bucket must be day|week|month")
    b = lambda c: F.date_trunc(bucket, c)  # noqa: E731
    first = events.groupBy(F.col(user_col).alias("__u")).agg(
        b(F.min(ts_col)).alias("__cohort")
    )
    ev = events.select(
        F.col(user_col).alias("__u"),
        b(F.col(ts_col)).alias("__b"),
        F.col(value_col).alias("__v"),
    ).where(F.col("__v").isNotNull())
    if bucket == "day":
        off = F.datediff(F.col("__b"), F.col("__cohort"))
    elif bucket == "week":
        off = F.floor(F.datediff(F.col("__b"), F.col("__cohort")) / 7)
    else:
        off = (F.year("__b") - F.year("__cohort")) * 12 + (
            F.month("__b") - F.month("__cohort")
        )
    cells = (
        ev.join(first.hint("shuffle_hash"), "__u")
        .groupBy(F.col("__cohort").alias("cohort"), off.cast("long").alias("offset"))
        .agg(F.round(F.sum("__v"), 6).alias("period_value"))
    )
    w = Window.partitionBy("cohort").orderBy("offset")
    sizes = first.groupBy(F.col("__cohort").alias("cohort")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        cells.withColumn("cum_value", F.round(F.sum("period_value").over(w), 6))
        .join(sizes.hint("shuffle_hash"), "cohort")
        .select(
            "cohort",
            "offset",
            "period_value",
            "cum_value",
            "cohort_size",
            F.round(F.col("cum_value") / F.col("cohort_size"), 6).alias(
                "ltv_per_user"
            ),
        )
    )


def markov_attribution(
    events: DataFrame,
    conv_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    rounds: int = 10,
) -> DataFrame:
    """Data-driven (Markov removal-effect) attribution, Anderl et al.
    2016: per channel, (channel, p_conv_all, p_conv_removed,
    removal_effect, attribution) — how much of the baseline conversion
    probability disappears when the channel is deleted from the journey
    graph, normalized into attribution shares.

    Model: each user's pre-conversion channel sequence (conv events
    excluded; journeys truncate at the first conversion) becomes
    transitions START -> c1 -> ... -> ck -> CONV|NULL. Absorption
    probabilities come from ``rounds`` fixed-point iterations a(s) <-
    sum_t P(s->t)·val(t) — identical unrolled arithmetic on any engine
    (the PageRank-oracle convention; journeys longer than ``rounds``
    states contribute no further mass, an explicit truncation shared by
    the SQL replica). Removing channel c drops its outgoing transitions
    and redirects its incoming mass to NULL (the standard null-model).

    Scale shape: one user-partitioned window pass over the events builds
    transitions; everything after is censuses of |channels|+3 states —
    the scenario dimension (one per removed channel, plus baseline) and
    all ``rounds`` joins run on frames of at most
    (|channels|+1)·(|channels|+3) rows. Control-plane arithmetic, data
    scanned once.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    _reject_reserved_channels(events, type_col, "markov_attribution")
    w_user = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    is_conv = (F.col(type_col) == conv_type).cast("int")
    # events strictly before (and excluding) the user's first conversion
    marked = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.col(type_col).alias("_c"),
        (F.sum(is_conv).over(w_user) - is_conv).alias("_convs_before"),
    )
    path = marked.where(
        (F.col("_convs_before") == 0) & (F.col("_c") != conv_type)
    )
    converted = (
        marked.where(F.col("_c") == conv_type)
        .select("_u")
        .distinct()
        .withColumn("_conv", F.lit(1))
    )
    w_path = Window.partitionBy("_u").orderBy("_ts", "_tb")
    stepped = path.select(
        "_u",
        F.col("_c").alias("_to"),
        F.lag("_c").over(w_path).alias("_from"),
        F.row_number().over(w_path).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("_u")).alias("_n"),
    )
    mids = stepped.where(F.col("_rn") > 1).select(
        "_u", "_from", "_to"
    )
    starts = stepped.where(F.col("_rn") == 1).select(
        "_u", F.lit("__START__").alias("_from"), "_to"
    )
    lasts = (
        stepped.where(F.col("_rn") == F.col("_n"))
        .join(converted.hint("shuffle_hash"), "_u", "left")
        .select(
            "_u",
            F.col("_to").alias("_from"),
            F.when(F.col("_conv") == 1, F.lit("__CONV__"))
            .otherwise(F.lit("__NULL__"))
            .alias("_to"),
        )
    )
    # converted users with NO prior channel events: START -> CONV direct
    with_path = stepped.select("_u").distinct()
    bare = (
        converted.join(with_path, "_u", "left_anti")
        .select(
            "_u",
            F.lit("__START__").alias("_from"),
            F.lit("__CONV__").alias("_to"),
        )
    )
    trans = (
        mids.unionByName(starts)
        .unionByName(lasts)
        .unionByName(bare)
        .groupBy("_from", "_to")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    probs = trans.withColumn(
        "_p",
        F.col("_n")
        / F.sum("_n").over(Window.partitionBy("_from")).cast("double"),
    ).select("_from", "_to", "_p")
    channels = probs.select(F.col("_from").alias("_ch")).where(
        F.col("_ch") != "__START__"
    ).distinct()
    scenarios = channels.select(
        F.col("_ch").alias("_scen")
    ).unionByName(
        probs.sparkSession.createDataFrame([("__ALL__",)], "_scen string")
    )
    # per-scenario transition table: drop rows FROM the removed channel,
    # redirect rows INTO it to __NULL__ (outgoing mass preserved)
    st = (
        probs.crossJoin(F.broadcast(scenarios))
        .where(F.col("_from") != F.col("_scen"))
        .select(
            "_scen",
            "_from",
            F.when(F.col("_to") == F.col("_scen"), F.lit("__NULL__"))
            .otherwise(F.col("_to"))
            .alias("_to"),
            "_p",
        )
        .localCheckpoint(eager=True)
    )
    # fixed-point absorption: a(state) per scenario, a0 = 0 everywhere
    a = st.select("_scen", F.col("_from").alias("_s")).distinct().withColumn(
        "_a", F.lit(0.0)
    )
    for _ in range(int(rounds)):
        av = a.select(
            F.col("_scen"), F.col("_s").alias("_to"), F.col("_a").alias("_av")
        )
        a = (
            st.join(av.hint("shuffle_hash"), ["_scen", "_to"], "left")
            .select(
                "_scen",
                "_from",
                (
                    F.col("_p")
                    * F.when(F.col("_to") == "__CONV__", F.lit(1.0))
                    .when(F.col("_to") == "__NULL__", F.lit(0.0))
                    .otherwise(F.coalesce("_av", F.lit(0.0)))
                ).alias("_m"),
            )
            .groupBy("_scen", F.col("_from").alias("_s"))
            .agg(F.round(F.sum("_m"), 12).alias("_a"))
        )
    start_a = a.where(F.col("_s") == "__START__").select("_scen", "_a")
    base = start_a.where(F.col("_scen") == "__ALL__").select(
        F.col("_a").alias("_base")
    )
    per_ch = (
        start_a.where(F.col("_scen") != "__ALL__")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("_scen").alias("channel"),
            F.round("_base", 6).alias("p_conv_all"),
            F.round("_a", 6).alias("p_conv_removed"),
            F.when(
                F.col("_base") > 0,
                F.greatest(
                    F.round(F.lit(1.0) - F.col("_a") / F.col("_base"), 6),
                    F.lit(0.0),
                ),
            ).alias("removal_effect"),
        )
    )
    total_re = Window.partitionBy()
    return per_ch.withColumn(
        "attribution",
        F.when(
            F.sum("removal_effect").over(total_re) > 0,
            F.round(
                F.col("removal_effect")
                / F.sum("removal_effect").over(total_re),
                6,
            ),
        ),
    )


_RESERVED_STATES = ("__START__", "__CONV__", "__NULL__", "__ALL__")


def _coalition_key(arr: F.Column) -> F.Column:
    """Collision-free coalition key: sha256 of a length-prefixed
    encoding of the sorted channel set. concat_ws('|', ...) would let a
    channel name containing '|' alias two distinct coalitions and
    silently corrupt the v(S \\ {c}) lookups; the length prefix makes
    the encoding injective for any channel strings.
    """
    return F.sha2(
        F.concat_ws(
            "",
            F.transform(
                arr,
                lambda x: F.concat(
                    F.length(x).cast("string"), F.lit(":"), x
                ),
            ),
        ),
        256,
    )


def _reject_reserved_channels(
    events: DataFrame, type_col: str, caller: str
) -> None:
    """Raise if any observed channel collides with a reserved Markov
    state sentinel — a channel literally named '__CONV__' would splice
    itself into the absorption chain instead of erroring.
    """
    hit = (
        events.select(F.col(type_col).alias("_c"))
        .where(F.col("_c").isin(*_RESERVED_STATES))
        .limit(1)
        .collect()
    )
    if hit:
        raise ValueError(
            f"{caller}: channel value {hit[0]['_c']!r} collides with a "
            f"reserved state sentinel {_RESERVED_STATES}; rename the "
            "channel before attribution"
        )


def shapley_attribution(
    events: DataFrame,
    conv_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Shapley-value attribution over observed channel coalitions (the
    simplified game of Zhao et al. 2018): each user's journey collapses to
    the SET of channels touched before their first conversion, v(S) is
    the observed conversion rate of journeys with exactly that touch set
    (unobserved coalitions contribute v = 0), and each channel's credit is
    phi_c = sum over observed S containing c of
    (|S|-1)!(k-|S|)!/k! * (v(S) - v(S\\{c})). Exact factorial weights via
    the engines' integer factorial — no sampling, no approximation beyond
    the observed-coalition restriction, which the SQL replica shares.

    Scale shape: one window/aggregate pass collapses users to coalition
    strings; the census is at most 2^k rows (k = distinct channels) and
    every join after it is census-vs-census. Control-plane arithmetic
    after a single data scan — the model-based companion to
    `markov_attribution`.
    """
    w_user = Window.partitionBy(user_col).orderBy(ts_col)
    is_conv = (F.col(type_col) == conv_type).cast("int")
    marked = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_c"),
        (F.sum(is_conv).over(w_user) - is_conv).alias("_cb"),
    )
    touched = (
        marked.where((F.col("_cb") == 0) & (F.col("_c") != conv_type))
        .groupBy("_u")
        .agg(F.sort_array(F.collect_set("_c")).alias("_set"))
    )
    converted = (
        marked.where(F.col("_c") == conv_type)
        .select("_u")
        .distinct()
        .withColumn("_conv", F.lit(1))
    )
    journeys = touched.join(converted.hint("shuffle_hash"), "_u", "left").select(
        "_set", F.coalesce("_conv", F.lit(0)).alias("_conv")
    )
    census = journeys.groupBy(
        _coalition_key(F.col("_set")).alias("_key"), F.col("_set")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_conv").alias("_nc"),
    ).withColumn("_v", F.col("_nc") / F.col("_n").cast("double"))
    k_row = census.select(F.explode("_set").alias("_ch")).distinct().agg(
        F.count(F.lit(1)).alias("_k")
    )
    # one term per (coalition, member): join the v-map on the reduced set
    terms = census.select(
        "_key", "_set", "_v", F.size("_set").alias("_s"),
        F.explode("_set").alias("_ch"),
    ).withColumn(
        "_key_minus",
        _coalition_key(F.array_remove("_set", F.col("_ch"))),
    )
    vmap = census.select(
        F.col("_key").alias("_key_minus"), F.col("_v").alias("_v_minus")
    )
    joined = (
        terms.join(vmap.hint("shuffle_hash"), "_key_minus", "left")
        .crossJoin(F.broadcast(k_row))
        .select(
            "_ch",
            (
                F.factorial(F.col("_s") - 1).cast("double")
                * F.factorial(F.col("_k") - F.col("_s")).cast("double")
                / F.factorial(F.col("_k")).cast("double")
                * (F.col("_v") - F.coalesce("_v_minus", F.lit(0.0)))
            ).alias("_t"),
        )
    )
    phi = joined.groupBy(F.col("_ch").alias("channel")).agg(
        F.round(F.sum("_t"), 6).alias("shapley_value")
    )
    # negative phi (a channel whose presence predicts WORSE conversion)
    # gets zero credit; shares normalize over the positive mass — the
    # practitioner convention for budget allocation
    w_all = Window.partitionBy()
    pos = F.greatest(F.col("shapley_value"), F.lit(0.0))
    return phi.withColumn(
        "attribution",
        F.when(
            F.sum(pos).over(w_all) > 0,
            F.round(pos / F.sum(pos).over(w_all), 6),
        ),
    )


def new_vs_returning(
    events: DataFrame,
    bucket: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-period audience decomposition: (period, active_users,
    new_users, returning_users, returning_ratio) — a user is NEW in the
    period of their first event and RETURNING in every later active
    period. The growth-dashboard companion to `cohort_retention` (same
    two aggregates, period-grain output instead of the cohort matrix).

    One first-seen census + one distinct activity census joined on the
    user key; output is period-count rows.
    """
    if bucket not in ("day", "week", "month"):
        raise ValueError("bucket must be day|week|month")
    b = lambda c: F.date_trunc(bucket, c)  # noqa: E731
    first = events.groupBy(F.col(user_col).alias("__u")).agg(
        b(F.min(ts_col)).alias("__first")
    )
    activity = events.select(
        F.col(user_col).alias("__u"), b(F.col(ts_col)).alias("period")
    ).distinct()
    tagged = activity.join(first.hint("shuffle_hash"), "__u").select(
        "period",
        (F.col("period") == F.col("__first")).cast("long").alias("__new"),
    )
    return tagged.groupBy("period").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum("__new").alias("new_users"),
        (F.count(F.lit(1)) - F.sum("__new")).alias("returning_users"),
        F.round(
            (F.count(F.lit(1)) - F.sum("__new"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("returning_ratio"),
    )


def stage_latency_report(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    window_seconds: float = 86400.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Touch-to-conversion latency summary per attributed touch type:
    (attributed_type, n_conversions, avg_lag_s, p50_lag_s, p90_lag_s) —
    the funnel-speed report on top of `attribute_conversions` (direct
    conversions, which have no lag, report as type 'direct' with NULL
    latency columns). Lags are exact integer-microsecond differences;
    percentiles are exact interpolated percentiles per type.

    Same single per-user carry-forward window as last-touch attribution,
    then one hash aggregate over conversion rows.
    """
    attributed = attribute_conversions(
        events,
        conversion_type=conversion_type,
        touch_types=touch_types,
        window_seconds=window_seconds,
        user_col=user_col,
        ts_col=ts_col,
        id_col=id_col,
        type_col=type_col,
    )
    q = lambda p: F.round(  # noqa: E731
        F.percentile(F.col("lag_seconds"), F.lit(p)), 6
    )
    return attributed.groupBy(
        F.coalesce("attributed_type", F.lit("direct")).alias("attributed_type")
    ).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.avg("lag_seconds"), 6).alias("avg_lag_s"),
        q(0.5).alias("p50_lag_s"),
        q(0.9).alias("p90_lag_s"),
    )
