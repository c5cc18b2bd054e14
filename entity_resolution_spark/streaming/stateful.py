"""Custom stateful streaming operator via ``applyInPandasWithState``.

``first_seen_filter`` — the streaming form of the engine's exact-duplicate
collapse: for each content digest, pass through only the FIRST row ever
seen and count suppressed duplicates in keyed state. Unlike
``dropDuplicates`` (whose state is managed opaquely and only bounded by a
watermark), this operator owns its state explicitly: per-key first-seen
timestamp + duplicate count, with a processing-time timeout that expires
idle keys — the knob that keeps state bounded on an unbounded corpus
stream.

Output: the first row per digest, extended with ``n_duplicates_so_far``
(0 on first emission; state keeps counting after emission so a later
restart carries accurate lineage counts).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("emitted", T.BooleanType()),
        T.StructField("n_dups", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("file_id", T.LongType(), False),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_duplicates_so_far", T.LongType()),
    ]
)


def _make_first_seen_fn(state_ttl_ms: int | None):
    def first_seen_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (sha,) = key
        if state.hasTimedOut:
            state.remove()
            return
        emitted, n_dups = state.get if state.exists else (False, 0)
        out_rows = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # only the min-file_id row can be emitted; everything else in
            # the batch is a duplicate — count, don't iterate rows
            if not emitted:
                first = pdf.loc[pdf["file_id"].idxmin()]
                out_rows.append(
                    {
                        "content_sha256": sha,
                        "file_id": int(first["file_id"]),
                        "repo": first["repo"],
                        "path": first["path"],
                        "n_duplicates_so_far": int(n_dups),
                    }
                )
                emitted = True
                n_dups += len(pdf) - 1
            else:
                n_dups += len(pdf)
        state.update((emitted, n_dups))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return first_seen_fn


def first_seen_filter(stream: DataFrame, state_ttl_ms: int | None = None) -> DataFrame:
    """Apply the stateful first-seen filter to a (streaming) repo-files
    frame; content_sha256 is derived if absent.

    ``state_ttl_ms``: per-key processing-time TTL that expires idle
    digests — REQUIRED for bounded state in a continuous deployment, but
    incompatible with ``Trigger.AvailableNow`` (Spark keeps scheduling
    batches to service pending timeouts and the query never reaches the
    terminated state — observed, not theoretical). Default None =
    NoTimeout, correct for bounded/batch-style runs; continuous
    deployments pass e.g. 24*3600*1000.
    """
    src = stream
    if "content_sha256" not in src.columns:
        src = src.withColumn(
            "content_sha256", F.sha2(F.col("content").cast("binary"), 256)
        )
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        src.select("content_sha256", "file_id", "repo", "path")
        .groupBy("content_sha256")
        .applyInPandasWithState(
            _make_first_seen_fn(state_ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
