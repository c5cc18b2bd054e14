"""Driver-contract batch 4: windowed aggregation (the streaming plan run in
batch mode — Spark's unified semantics let DuckDB check the same logic the
stream executes)."""

from __future__ import annotations

from ..queries import _t, query


@query(
    "windowed_event_counts",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def windowed_event_counts_q(spark, sf_dir):
    from ..streaming.windows import windowed_event_counts

    return windowed_event_counts(_t(spark, sf_dir, "events"), window="1 hour")


# --- gap-based sessionization (operators/sessions.py) ----------------------
# The batch twin of the stateful streaming sessionizer; per-user sessions
# split at >30-min inactivity gaps, summarized one row per session.
_SESSIONIZE_ORACLE = """
    WITH o AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(CASE WHEN prev_ts IS NULL
                        OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
      FROM o
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS BIGINT) AS duration_seconds
    FROM s GROUP BY user_id, session_idx
    """


@query("sessionize_events", _SESSIONIZE_ORACLE)
def sessionize_events_q(spark, sf_dir):
    from ..operators.sessions import session_summary

    return session_summary(_t(spark, sf_dir, "events"), gap_seconds=1800)


# The hot-key-safe segmented plan must produce the SAME sessions as the
# plain window (operators/sessions.sessionize_segmented): same oracle.
@query("sessionize_events_segmented", _SESSIONIZE_ORACLE)
def sessionize_events_segmented_q(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..operators.sessions import sessionize_segmented

    s = sessionize_segmented(
        _t(spark, sf_dir, "events"), gap_seconds=1800, chunk_seconds=3600
    )
    lng = lambda c: F.col(c).cast("timestamp").cast("long")
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max(lng("ts")) - F.min(lng("ts"))).alias("duration_seconds"),
    )


# --- native session windows (streaming/windows.py) -------------------------
# Spark's session_window run in batch mode; boundary semantics probed and
# pinned: merge while diff <= gap (exact microsecond arithmetic on both
# sides via epoch_us), window end = last event + gap.
@query(
    "session_window_counts",
    """
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sess
      FROM o
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sess
    """,
)
def session_window_counts_q(spark, sf_dir):
    from ..streaming.windows import session_window_counts

    return session_window_counts(_t(spark, sf_dir, "events"), gap="30 minutes")


# --- stream-stream interval join (streaming/joins.py), batch mode ----------
# Purchase attributed to every click by the same user in the prior hour —
# the watermarked stream-stream join plan run in batch (unified
# semantics); the stream==batch equivalence is pinned in
# tests/test_streaming_windows.py.
@query(
    "stream_interval_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def stream_interval_join_q(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..streaming.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    out = interval_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="cts", upper="1 hour"
    )
    return out.select("purchase_id", "click_id")


# --- streaming running EWMA (streaming/smoothing.py) ------------------------
# A REAL Structured-Streaming run (file source, applyInPandasWithState,
# AvailableNow, memory sink) folding e' = a*x + (1-a)*e in keyed state;
# the oracle is the SAME recursive CTE as the batch ewma_user_value
# query — stream == batch == SQL, three engines on one recursion. All
# files land in one AvailableNow batch and rows sort on (ts, event_id)
# inside the fold, so delivery order equals event order.
@query(
    "stream_ewma_user_value",
    """
    WITH RECURSIVE base AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id, rn, CAST(value AS DOUBLE) AS e
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.rn,
             0.4375 * CAST(b.value AS DOUBLE) + 0.5625 * r.e
      FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
    SELECT user_id, CAST(rn AS INT) AS rn,
           round(e + 0.000000001, 6) AS ewma FROM r
    """,
)
def stream_ewma_user_value_q(spark, sf_dir):
    import os
    import tempfile

    from ..session import ensure_py_files
    from ..streaming.smoothing import ewma_stream

    ensure_py_files(spark)
    static = _t(spark, sf_dir, "events")
    # events.parquet is a single file: stream the parent DIRECTORY with a
    # filename glob (the file source requires a directory basePath)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = ewma_stream(
        stream, "user_id", "ts", "value", alpha=0.4375, tiebreak="event_id"
    )
    base = tempfile.mkdtemp(prefix="ewma_stream_q_")
    qname = "sink_" + os.path.basename(base).replace("-", "_")
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .start()
    )
    if not q.awaitTermination(600):
        raise RuntimeError(f"stream_ewma query did not finish: {q.status}")
    return spark.table(qname)


# --- streaming ingestion dedup gate (streaming/dedup_gate.py) ---------------
# The REAL Structured-Streaming gate (file source, foreachBatch, versioned
# sketch state, stream checkpoint) run over two deterministic drops of the
# documents table; the oracle replicates the greedy two-phase semantics
# with per-phase recursive-CTE closures over the exact minhash band CTEs.
def _register_dedup_gate():
    from .sql_kernels import dedup_gate_sql

    @query(
        "stream_dedup_gate",
        dedup_gate_sql(0.7, "{id} % 3 != 0", "{id} % 3 = 0"),
    )
    def stream_dedup_gate_q(spark, sf_dir):
        import os
        import tempfile

        from pyspark.sql import functions as F

        from ..streaming.dedup_gate import (
            _committed_versions,
            run_dedup_gate,
        )

        d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
        base = tempfile.mkdtemp(prefix="ers_gate_")
        inp = os.path.join(base, "in")
        state = os.path.join(base, "state")
        ckpt = os.path.join(base, "ckpt")
        os.makedirs(inp)
        ts = F.timestamp_seconds(F.lit(1_700_000_000))
        # one file per drop -> exactly one micro-batch per gate run
        d.filter(F.col("doc_id") % 3 != 0).withColumn("event_time", ts).repartition(
            1
        ).write.mode("append").parquet(inp)
        run_dedup_gate(spark, inp, state, ckpt)
        d.filter(F.col("doc_id") % 3 == 0).withColumn("event_time", ts).repartition(
            1
        ).write.mode("append").parquet(inp)
        run_dedup_gate(spark, inp, state, ckpt)

        out = None
        for phase, v in enumerate(_committed_versions(state), start=1):
            part = spark.read.parquet(os.path.join(state, f"v{v}", "accepted")).select(
                "doc_id", F.lit(phase).cast("int").alias("phase")
            )
            out = part if out is None else out.unionByName(part)
        return out


_register_dedup_gate()


def _register_vocab_monitor():
    from .stats_ops import _hll_sql

    # The oracle is the BATCH HyperLogLog over the whole documents table —
    # the streaming fold must land on the exact same register file
    # (union registers = per-bucket max), so the final estimate row is
    # value-identical to the batch sketch.
    @query("stream_vocab_monitor", _hll_sql())
    def stream_vocab_monitor(spark, sf_dir):
        """REAL Structured Streaming run: the corpus arrives as two file
        drops, HLL registers fold as versioned state, and the final state
        must equal the batch sketch over everything
        (streaming/vocab_monitor.py)."""
        import os
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from ..operators.stats import hll_estimate
        from ..streaming.vocab_monitor import current_registers, run_vocab_monitor

        d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
        base = tempfile.mkdtemp(prefix="ers_vocab_")
        inp = os.path.join(base, "in")
        state = os.path.join(base, "state")
        ckpt = os.path.join(base, "ckpt")
        os.makedirs(inp)
        ts = F.timestamp_seconds(F.lit(1_700_000_000))
        try:
            for pred in (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1):
                d.filter(pred).withColumn("event_time", ts).repartition(1).write.mode(
                    "append"
                ).parquet(inp)
                run_vocab_monitor(spark, inp, state, ckpt)
            regs = current_registers(spark, state)
            return hll_estimate(regs).localCheckpoint(eager=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)


_register_vocab_monitor()


@query(
    "heavy_hitters_per_window",
    """
    WITH c AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             event_type, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2, 3)
    SELECT window_start, window_end, event_type, n_events,
           CAST(rank AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY window_start, window_end
                                       ORDER BY n_events DESC, event_type) AS rank
          FROM c)
    WHERE rank <= 3
    """,
)
def heavy_hitters_per_window(spark, sf_dir):
    """Per-window top-3 heavy hitters (streaming/windows.py
    top_k_per_window over windowed_event_counts): the batch twin of the
    streaming composition pinned stream==batch in
    test_streaming_windows.py; the rank partitions by window, so no
    global sort."""
    from ..streaming.windows import top_k_per_window, windowed_event_counts

    counts = windowed_event_counts(_t(spark, sf_dir, "events"))
    return top_k_per_window(counts, k=3).drop("sum_value")
