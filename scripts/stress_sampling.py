"""Stress the deterministic sampling/sharding operators at 10M rows:
exact invariants, not statistical hopes.

  - stratified_split: 20 strata x 500k -> per-stratum counts are exactly
    floor(0.8n)/floor(0.9n)-floor(0.8n)/rest.
  - shard_corpus: 1024 shards -> positions are contiguous 1..n_s per
    shard, total conserved, max/min shard size within 10% of uniform.
  - mixture_sample: two domains with a forced scarce one -> scarce kept
    whole, composition within binomial noise of 50/50.

Run: PYTHONPATH=/root/repo python scripts/stress_sampling.py
"""

import time

from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.sampling import (
    mixture_sample,
    shard_corpus,
    stratified_split,
)
from bigdata_etl_customer360_spark.session import get_session


def main():
    spark = get_session(app_name="stress-sampling", master="local[32]")
    n = 10_000_000
    base = spark.range(n).select(
        F.col("id").alias("i"), (F.col("id") % 20).cast("string").alias("s")
    )

    t0 = time.time()
    sp = (
        stratified_split(base, ["s"], (0.8, 0.1, 0.1), id_col="i")
        .groupBy("s", "split")
        .count()
        .collect()
    )
    cnt = {(r["s"], r["split"]): r["count"] for r in sp}
    per = n // 20
    ok_split = all(
        cnt[(str(k), "train")] == int(0.8 * per)
        and cnt[(str(k), "val")] == int(0.9 * per) - int(0.8 * per)
        and cnt[(str(k), "test")] == per - int(0.9 * per)
        for k in range(20)
    )
    t_split = time.time() - t0

    t0 = time.time()
    sh = (
        shard_corpus(base, "i", 1024)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"))
        .collect()
    )
    sizes = [r["n"] for r in sh]
    ok_shard = (
        len(sh) == 1024
        and all(r["mx"] == r["n"] for r in sh)   # contiguous 1..n_s
        and sum(sizes) == n
        and max(sizes) < 1.1 * n / 1024
        and min(sizes) > 0.9 * n / 1024
    )
    t_shard = time.time() - t0

    t0 = time.time()
    mixed = base.withColumn(
        "d", F.when(F.col("i") < 100_000, F.lit("rare")).otherwise(F.lit("big"))
    )
    mx = (
        mixture_sample(mixed, "d", {"big": 0.5, "rare": 0.5}, id_col="i")
        .groupBy("d")
        .count()
        .collect()
    )
    by = {r["d"]: r["count"] for r in mx}
    ok_mix = by["rare"] == 100_000 and abs(by["big"] - 100_000) < 2_000
    t_mix = time.time() - t0

    print(
        f"stratified ok={ok_split} {t_split:.1f}s | "
        f"shard ok={ok_shard} sizes[{min(sizes)}..{max(sizes)}] {t_shard:.1f}s | "
        f"mixture ok={ok_mix} big={by['big']} {t_mix:.1f}s"
    )
    assert ok_split and ok_shard and ok_mix
    spark.stop()


if __name__ == "__main__":
    main()
