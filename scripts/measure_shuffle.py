"""Measured shuffle-write bytes for the top wall-clock queries at sf0.1.

Round-8's own lesson: shuffle COUNT is not the cost model — bytes through
the serializers are. This script runs the bench's most expensive queries
with the Spark UI enabled and records, per query, real shuffle-write
bytes (UI REST /stages, the stress_ladder.py precedent) plus wall time,
so the 100×-scale argument in PLANS.md/BASELINE.md rests on measured
bytes, not exchange counts (VERDICT r8 task 5).

Usage: python scripts/measure_shuffle.py [query ...]
       (default: the top-10 wall-clock queries of BENCH_FULL.json)
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdata_etl_customer360_spark.session import get_session  # noqa: E402


def shuffle_write_bytes(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in stages
        if s.get("status") == "COMPLETE"
    )


def main() -> None:
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 1:
        names = sys.argv[1:]
    else:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
            bench = json.load(f)["queries"]
        names = [k for k, _ in sorted(bench.items(), key=lambda kv: -kv[1])[:10]]

    spark = get_session(
        app_name="measure-shuffle",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warmup (JIT + shuffle machinery), not measured
    from pyspark.sql import functions as F

    spark.range(0, 1_000_000).groupBy((F.col("id") % 32).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    ).count()

    rows = []
    for name in names:
        s0, t0 = shuffle_write_bytes(spark), time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sb = shuffle_write_bytes(spark) - s0
        spark.catalog.clearCache()
        rows.append((name, dt, sb))
        print(f"# {name}: {dt:.2f}s shuffle_write={sb/1e6:.1f} MB", file=sys.stderr)

    print("| query | wall (s) | shuffle write (MB) |")
    print("|---|---|---|")
    for name, dt, sb in rows:
        print(f"| {name} | {dt:.2f} | {sb/1e6:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
