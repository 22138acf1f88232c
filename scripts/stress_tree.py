"""tree_fit / gbt_stumps scale stress: wall time + REAL shuffle-write
bytes (UI REST, the measure_shuffle.py precedent) on a synthetic frame
well past the graded sizes, to document the 100-TB shape:

  - the only data-sized shuffle per level/round is ONE map-side-combined
    hash aggregate keyed (node, feature, bin, class) — its OUTPUT is
    bounded by nodes x features x bins x classes, independent of N;
  - everything downstream (prefix windows, argmax, split broadcast)
    operates on that bounded grid.

So shuffle bytes should grow ~linearly with N only through the
aggregate's map-side partials (combiner-bounded per partition), and the
per-level cost is one scan + one small exchange. Run:

    python scripts/stress_tree.py [n_rows]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_customer360_spark.operators.ml import gbt_stumps, tree_fit  # noqa: E402
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_session(
        app_name="stress-tree",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic: 4 integer features (8-64 bins), 3-class
    # label correlated with f1/f3 so splits carry signal
    df = (
        spark.range(0, n, 1, 64)
        .select(
            (F.col("id") * 2654435761 % 64).alias("f1"),
            (F.col("id") * 40503 % 16).alias("f2"),
            (F.col("id") * 69069 % 8).alias("f3"),
            (F.col("id") * 1103515245 % 32).alias("f4"),
            F.concat(
                F.lit("c"),
                ((F.col("id") * 2654435761 % 64 > 40).cast("int")
                 + ((F.col("id") * 69069 % 8 > 5).cast("int"))).cast("string"),
            ).alias("lab"),
        )
        .localCheckpoint(eager=True)
    )
    print(f"# rows: {df.count():,}", file=sys.stderr)

    for depth in (2, 3):
        t0, s0 = time.perf_counter(), shuffle_write_bytes(spark)
        model = tree_fit(df, ["f1", "f2", "f3", "f4"], "lab", max_depth=depth)
        rows = model.collect()
        dt, sb = time.perf_counter() - t0, shuffle_write_bytes(spark) - s0
        print(
            f"tree_fit depth={depth}: {dt:.1f}s shuffle={sb/1e6:.1f}MB "
            f"nodes={len(rows)}"
        )

    t0, s0 = time.perf_counter(), shuffle_write_bytes(spark)
    g = gbt_stumps(
        df.withColumn("y", (F.col("f1") * 100 + F.col("f3") * 37).cast("long")),
        ["f1", "f2", "f3", "f4"],
        "y",
        rounds=3,
    )
    rows = g.collect()
    dt, sb = time.perf_counter() - t0, shuffle_write_bytes(spark) - s0
    print(f"gbt_stumps rounds=3: {dt:.1f}s shuffle={sb/1e6:.1f}MB rows={len(rows)}")
    spark.stop()


if __name__ == "__main__":
    main()
