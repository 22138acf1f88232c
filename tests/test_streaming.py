"""Streaming surface tests: a streaming plan drained with availableNow must
equal its batch twin (same declarative agg), and gap-sessionization must
produce identical sessions in streaming (applyInPandasWithState) and batch
(window-function) form.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from bigdata_etl_customer360_spark.streaming.stateful import sessionize, sessionize_batch
from bigdata_etl_customer360_spark.streaming.windows import (
    run_available_now,
    stream_dedup,
    stream_from_parquet,
    tumbling_agg,
)

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _write_events(path: str, rows: list[tuple[int, str, float]]) -> None:
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp(r[1]) for r in rows], pa.timestamp("us")
            ),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


MAIN_ROWS = [
    # user 1: two sessions (gap > 600s between 10:00:05 and 10:30:00)
    (1, "2022-01-01 10:00:00", 1.0),
    (1, "2022-01-01 10:00:05", 2.0),
    (1, "2022-01-01 10:30:00", 3.0),
    (1, "2022-01-01 10:31:00", 4.0),
    # user 2: one session
    (2, "2022-01-01 09:00:00", 10.0),
    (2, "2022-01-01 09:05:00", 20.0),
]
# far-future events: advance the watermark so every main session times out
FLUSH_ROWS = [(99, "2022-01-02 00:00:00", 0.0), (99, "2022-01-02 00:00:01", 0.0)]


@pytest.fixture
def stream_dir(spark, tmp_path):
    d = tmp_path / "stream_src"
    d.mkdir()
    _write_events(str(d / "a_main.parquet"), MAIN_ROWS)
    time.sleep(0.05)
    _write_events(str(d / "b_flush.parquet"), FLUSH_ROWS)
    # file source orders by mtime when maxFilesPerTrigger caps a batch
    os.utime(d / "b_flush.parquet", (time.time() + 5, time.time() + 5))
    return str(d)


def test_tumbling_agg_stream_equals_batch(spark, stream_dir, tmp_path):
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(27,2)")).cast("double").alias("sv"),
    ]
    stream = stream_from_parquet(spark, stream_dir, EVENT_SCHEMA, max_files_per_trigger=1)
    got = run_available_now(
        tumbling_agg(stream, "ts", "1 hour", aggs, group_cols=["user_id"], watermark="0 seconds"),
        "t_tumbling",
        checkpoint_dir=str(tmp_path / "ckpt_t"),
    )
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dir)
    want = tumbling_agg(batch, "ts", "1 hour", aggs, group_cols=["user_id"], watermark="0 seconds")
    # append-mode emits only watermark-closed windows; every window closed
    # by the flush rows must match the batch result for those windows
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows <= want_rows
    # all windows strictly before the flush watermark must have been emitted
    emitted_users = {r[2] for r in got_rows}
    assert {1, 2} <= emitted_users


def test_stream_dedup(spark, tmp_path):
    d = tmp_path / "dd_src"
    d.mkdir()
    _write_events(
        str(d / "dup.parquet"),
        [(1, "2022-01-01 10:00:00", 1.0)] * 3 + [(2, "2022-01-01 10:00:00", 1.0)],
    )
    stream = stream_from_parquet(spark, str(d), EVENT_SCHEMA)
    got = run_available_now(
        stream_dedup(stream, ["user_id", "ts"], "ts"),
        "t_dedup",
        checkpoint_dir=str(tmp_path / "ckpt_d"),
    )
    assert got.count() == 2


def test_sessionize_stream_equals_batch(spark, stream_dir, tmp_path):
    sessions = sessionize(
        stream_from_parquet(spark, stream_dir, EVENT_SCHEMA, max_files_per_trigger=1),
        gap_seconds=600,
        watermark="0 seconds",
    )
    got = run_available_now(
        sessions, "t_sessions", checkpoint_dir=str(tmp_path / "ckpt_s")
    )
    got_pdf = (
        got.filter(F.col("user_id") != 99)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )

    batch = spark.createDataFrame(
        [(u, pd.Timestamp(t).to_pydatetime(), v) for u, t, v in MAIN_ROWS], EVENT_SCHEMA
    )
    want_pdf = (
        sessionize_batch(batch, gap_seconds=600)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got_pdf) == len(want_pdf) == 3
    for col in ("user_id", "session_start", "session_end", "n_events", "sum_value"):
        assert got_pdf[col].tolist() == want_pdf[col].tolist(), col


def test_sliding_agg_stream_closes_windows(spark, stream_dir, tmp_path):
    from bigdata_etl_customer360_spark.streaming.windows import sliding_agg

    aggs = [F.count(F.lit(1)).alias("n")]
    stream = stream_from_parquet(spark, stream_dir, EVENT_SCHEMA, max_files_per_trigger=1)
    got = run_available_now(
        sliding_agg(stream, "ts", "1 hour", "30 minutes", aggs,
                    group_cols=["user_id"], watermark="0 seconds"),
        "t_sliding",
        checkpoint_dir=str(tmp_path / "ckpt_sl"),
    )
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dir)
    want = sliding_agg(batch, "ts", "1 hour", "30 minutes", aggs,
                       group_cols=["user_id"], watermark="0 seconds")
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows <= want_rows
    # every row lands in window/slide = 2 overlapping windows
    u1_batch = [r for r in want_rows if r[2] == 1]
    assert len(u1_batch) >= 3
    assert {r[2] for r in got_rows} >= {1, 2}
