"""Custom stateful streaming: gap-based sessionization via
``applyInPandasWithState``.

The canonical operator Spark's built-in windows can't express: sessions
close after ``gap`` seconds of per-key inactivity, so window boundaries
depend on the data. State per key is four scalars (session start, last
event time, event count, value sum) — O(active keys), evicted by timeout,
which is what keeps it viable on an unbounded 100 TB stream.

Works in both modes: on a streaming DataFrame it emits sessions as their
timeouts fire; the batch twin ``sessionize_batch`` computes identical
sessions with pure window functions (lag + cumulative session ids) for
backfill and for the equivalence tests.

API note: Spark 4 ships ``transformWithStateInPandas`` as the successor
arbitrary-state API (typed ValueState/ListState/MapState, timers, TTL).
This module stays on ``applyInPandasWithState`` deliberately: the newer
API's Python driver worker crashes in this build/sandbox even on a
minimal rate-source probe ("TransformWithStateInPySpark driver worker
exited unexpectedly"), and an operator that cannot execute in CI is dead
code by this repo's conventions. The state layout here (flat per-key
scalar tuple) ports to a ValueState one-for-one when the runtime
supports it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

_US = 1_000_000


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: emit (key, start, end, n_events, sum_value)
    for every closed session; open sessions close when the event-time
    timeout (gap after the last event) fires."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs))
        ts_us = (rows[ts_col].astype("int64") // 1000).sort_values()
        vals = rows[value_col].astype("float64")
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = int(ts_us.iloc[0]), int(ts_us.iloc[0]), 0, 0.0

        closed = []
        for t, v in zip(ts_us, vals.loc[ts_us.index]):
            t = int(t)
            if n > 0 and t - last_us > gap_seconds * _US:
                closed.append((start_us, last_us, n, total))
                start_us, n, total = t, 0, 0.0
            last_us = max(last_us, t)
            n += 1
            total += float(v)
        state.update((start_us, last_us, n, total))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [n for *_, n, _t in closed],
                    "sum_value": [t for *_, t in closed],
                }
            )

    wm = events.withWatermark(ts_col, watermark)
    return wm.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin of ``sessionize``: identical session semantics with pure
    window functions — lag() marks session breaks, a running sum of breaks
    numbers sessions, then one grouped agg per (key, session).

    Plan: one shuffle on the key (both windows and the final groupBy share
    the hash partitioning on ``key_col``; Catalyst reuses the exchange).
    This is the backfill path at 100 TB — no per-key state, just sort
    within partitions.
    """
    by_key = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(by_key)
    is_break = (
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_seconds * _US)
    ).cast("long")
    sessioned = events.withColumn(
        "_session_id", F.sum(is_break).over(by_key.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessioned.groupBy(key_col, "_session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum → double: partition-order independent
            F.sum(F.col(value_col).cast("decimal(27,2)")).cast("double").alias("sum_value"),
        )
        .drop("_session_id")
    )

