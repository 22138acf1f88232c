"""Stress mann_whitney at fact-table scale: 10M rows, ~100k distinct
values (heavy ties), exact numpy ground truth via the same integer
midrank counting formula (2*R_a is a BIGINT; U values are exact halves)
— the distributed prefix-sum rank path must match it bit-for-bit.

Run: PYTHONPATH=/root/repo python scripts/stress_stats.py
"""

import time

import numpy as np
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.quality import mann_whitney
from bigdata_etl_customer360_spark.session import get_session


def main():
    spark = get_session(app_name="stress-stats", master="local[32]")
    n = 10_000_000
    # deterministic synthetic: group a values ~ (i*2654435761 % 100000),
    # group b shifted by +173 on 30% of mass — a real location shift
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        (
            (F.col("id") * F.lit(2654435761)) % F.lit(100_000)
            + F.when(
                (F.col("id") % 2 == 1) & (F.col("id") % 10 < 3), F.lit(173)
            ).otherwise(F.lit(0))
        ).cast("double").alias("v"),
    )
    t0 = time.time()
    r = mann_whitney(df, "g", "v", "a", "b").first()
    dt = time.time() - t0
    print(f"spark: n_a={r['n_a']} n_b={r['n_b']} u_a={r['u_a']} "
          f"z={r['z']:.6f} in {dt:.1f}s")

    # exact numpy ground truth with the same integer counting
    t0 = time.time()
    ids = np.arange(n, dtype=np.int64)
    g_a = ids % 2 == 0
    v = (ids * 2654435761) % 100_000
    v = v + np.where((~g_a) & (ids % 10 < 3), 173, 0)
    vals, inv = np.unique(v, return_inverse=True)
    cnt = np.bincount(inv)
    ca = np.bincount(inv[g_a], minlength=len(vals))
    below = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    r2a = int((ca * (2 * below + cnt + 1)).sum())
    na, nb = int(g_a.sum()), int(n - g_a.sum())
    u_a = (r2a - na * (na + 1)) / 2.0
    print(f"numpy: u_a={u_a} in {time.time()-t0:.1f}s")
    assert r["u_a"] == u_a and r["n_a"] == na and r["n_b"] == nb
    print("EXACT match at 10M rows / ~100k distinct values")
    spark.stop()


if __name__ == "__main__":
    main()
