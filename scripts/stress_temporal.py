"""Stress the round-5 temporal operators at millions of rows with
constructed exact ground truths (no external library needed).

  - range_join: 200k keys x 25 intervals each (5M intervals), points
    placed half inside / half outside by construction -> exact expected
    match count, zero tolerance.
  - interval_concurrency (keyless distributed prefix sum): 5M staggered
    unit-offset intervals of length K -> steady-state concurrency is
    exactly K, and the sweep must return to 0 at the end.

Run: PYTHONPATH=/root/repo python scripts/stress_temporal.py
"""

import time

from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.temporal import (
    interval_concurrency,
    range_join,
)
from bigdata_etl_customer360_spark.session import get_session


def main():
    spark = get_session(app_name="stress-temporal", master="local[32]")

    # ---- range_join: 5M intervals, 10M points, half of them inside
    n_keys, per_key = 200_000, 25
    ivs = (
        spark.range(n_keys * per_key)
        .select(
            (F.col("id") % n_keys).alias("k"),
            F.timestamp_seconds(F.col("id") * 100).alias("s"),
            F.timestamp_seconds(F.col("id") * 100 + 50).alias("e"),
        )
    )
    pts = (
        spark.range(n_keys * per_key)
        .select(
            (F.col("id") % n_keys).alias("k"),
            F.explode(
                F.array(
                    F.timestamp_seconds(F.col("id") * 100 + 25),   # inside
                    F.timestamp_seconds(F.col("id") * 100 + 75),   # gap
                )
            ).alias("ts"),
        )
    )
    t0 = time.time()
    got = range_join(pts, ivs, "ts", "s", "e", keys=["k"], bin_seconds=3600).count()
    dt = time.time() - t0
    expected = n_keys * per_key
    print(f"range_join: matches={got} expected={expected} ok={got == expected} sec={dt:.1f}")
    assert got == expected

    # ---- keyless sweep: 5M intervals [i, i+K), steady concurrency == K
    n_iv, K = 5_000_000, 1000
    iv2 = spark.range(n_iv).select(
        F.timestamp_seconds(F.col("id")).alias("s"),
        F.timestamp_seconds(F.col("id") + K).alias("e"),
    )
    t0 = time.time()
    prof = interval_concurrency(iv2, "s", "e")
    row = prof.agg(
        F.max("n_open").alias("mx"),
        F.sum("net_change").alias("net"),
        F.count(F.lit(1)).alias("boundaries"),
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"sweep: max_open={row['mx']} (expect {K}) net={row['net']} (expect 0) "
        f"boundaries={row['boundaries']} sec={dt:.1f}"
    )
    assert row["mx"] == K and row["net"] == 0
    spark.stop()


if __name__ == "__main__":
    main()
