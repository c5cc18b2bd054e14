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
