"""Streaming running-EWMA via ``applyInPandasWithState``.

The streaming form of ``operators/timeseries.ewma_running``: per key,
state carries (rn, ewma) and each arriving row folds
e' = alpha*x + (1-alpha)*e, emitting (key, rn, ewma) per event — the
online smoother a live anomaly baseline keeps, with the SAME per-key
recursion (and the same float operation order) as the batch operator, so
stream output == batch output whenever rows arrive in event-time order
(micro-batches are sorted on (ts, tiebreak) internally; cross-batch
order is the stream's delivery order, which is the streaming contract).

State is two scalars per key — bounded by the key cardinality, with the
same processing-time-TTL knob as `stateful.first_seen_filter` for
unbounded key spaces (TTL expires idle keys; incompatible with
Trigger.AvailableNow — see that module's note).

Rounding happens JVM-side AFTER the stateful operator (round(e + 1e-9, 6),
the tie-break-then-round convention of the batch smoothers), so the
stream==batch comparison is bit-exact.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("rn", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _make_fn(alpha: float, order_cols: list[str], state_ttl_ms: int | None):
    beta = 1.0 - alpha

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        rn, e = state.get if state.exists else (0, 0.0)
        out_k, out_rn, out_e = [], [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            xs = pdf["__x"].to_numpy(dtype="float64")
            # resumable native kernel (one C call per batch, continuing
            # from the carried (rn, e) state — bit-identical to the
            # Python loop; see functions/_smooth_native.py)
            from ..functions._smooth_native import ewma_native

            native = ewma_native(xs, alpha, beta, rn0=rn, e0=e)
            if native is not None:
                es, e = native
                out_k += [k] * len(xs)
                out_rn += list(range(rn + 1, rn + len(xs) + 1))
                out_e += list(es)
                rn += len(xs)
            else:
                for x in xs:
                    e = x if rn == 0 else alpha * x + beta * e
                    rn += 1
                    out_k.append(k)
                    out_rn.append(rn)
                    out_e.append(e)
        state.update((rn, e))
        if state_ttl_ms is not None:
            # ProcessingTimeTimeout only arms per-key when a duration is
            # registered after each update; without this call the TTL knob
            # is a silent no-op and idle-key state never expires.
            state.setTimeoutDuration(state_ttl_ms)
        if out_k:
            yield pd.DataFrame(
                {"__k": out_k, "rn": out_rn, "__e_raw": out_e}
            )

    return fn


def ewma_stream(
    stream: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.4375,
    tiebreak: str | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Apply the stateful running EWMA to a streaming frame. Output:
    (key, rn, ewma) — identical schema and values to the batch
    `ewma_running` for in-order delivery."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    order = [ts] + ([tiebreak] if tiebreak else [])
    src = stream.where(F.col(value).isNotNull()).select(
        F.col(key).alias("__k"),
        *[F.col(c) for c in order],
        F.col(value).cast("double").alias("__x"),
    )
    out_schema = T.StructType(
        [
            T.StructField("__k", stream.schema[key].dataType),
            T.StructField("rn", T.LongType()),
            T.StructField("__e_raw", T.DoubleType()),
        ]
    )
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    folded = src.groupBy("__k").applyInPandasWithState(
        _make_fn(float(alpha), order, state_ttl_ms),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
    return folded.select(
        F.col("__k").alias(key),
        F.col("rn").cast("int").alias("rn"),
        F.round(F.col("__e_raw") + F.lit(1e-9), 6).alias("ewma"),
    )
