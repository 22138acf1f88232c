"""Scale evidence for the bucketed seen-fingerprint lake (r13,
VERDICT r12 task 3): fold 10 batches of 100k docs through incremental
dedup against ~1M accumulated fingerprints, once with the PLAIN parquet
snapshot (read -> anti-join -> union+distinct -> overwrite-swap, the
pre-r13 flow) and once with the fp-BUCKETED lake
(`sources.bucketed.seen_fold_bucketed`: anti-join + append-only-new,
lake side shuffle-free). Records, per variant:

  - wall seconds over the 10-batch fold,
  - REAL shuffle-write bytes (Spark UI REST /stages, the stress_ladder
    pattern) — the number the bucketing exists to cut: the plain
    snapshot re-shuffles the ENTIRE seen set on every batch's anti-join
    AND rewrites it on every fold, so its shuffle volume grows with
    history x batches; the lake's grows only with the batches,
  - per-batch survivor counts and an id-sum checksum, asserted EQUAL
    between variants (the layout change must not move one row).

~40% of each batch after the first re-crawls earlier texts (id % CYCLE),
so the anti-join does real work every round.

Run: PYTHONPATH=/root/repo python scripts/stress_seen_lake.py
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_customer360_spark.operators.dedup import (  # noqa: E402
    dedup_incremental,
    doc_fingerprints,
)
from bigdata_etl_customer360_spark.session import get_session  # noqa: E402
from bigdata_etl_customer360_spark.sources.bucketed import (  # noqa: E402
    seen_fold_bucketed,
)

N_BATCHES = 10
BATCH = 100_000
CYCLE = 600_000  # ids past this re-crawl text of id % CYCLE


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


def batch_df(spark, b: int):
    return spark.range(b * BATCH, (b + 1) * BATCH).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), (F.col("id") % CYCLE).cast("string")).alias(
            "text"
        ),
    )


def run_plain(spark, root: str) -> dict:
    """Pre-r13 flow: plain parquet snapshot, union+distinct full rewrite."""
    seen_path = f"{root}/seen_plain"
    stats = []
    t0, s0 = time.time(), shuffle_write_bytes(spark)
    seen = None
    for b in range(N_BATCHES):
        survivors = dedup_incremental(batch_df(spark, b), seen, id_col="doc_id")
        row = survivors.agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("s")
        ).first()
        stats.append((row["n"], row["s"]))
        fps = doc_fingerprints(survivors)
        merged = fps if seen is None else seen.unionByName(fps).distinct()
        merged.write.mode("overwrite").parquet(f"{seen_path}.tmp")
        shutil.rmtree(seen_path, ignore_errors=True)
        pathlib.Path(f"{seen_path}.tmp").rename(seen_path)
        seen = spark.read.parquet(seen_path)
    return {
        "wall_s": round(time.time() - t0, 1),
        "shuffle_mb": round((shuffle_write_bytes(spark) - s0) / 1e6, 1),
        "batches": stats,
    }


def run_bucketed(spark, root: str) -> dict:
    """r13 flow: fp-bucketed lake, anti-join + append-only-new."""
    table = "stress_seen_lake"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    stats = []
    t0, s0 = time.time(), shuffle_write_bytes(spark)
    for b in range(N_BATCHES):
        seen = spark.table(table) if spark.catalog.tableExists(table) else None
        survivors = dedup_incremental(batch_df(spark, b), seen, id_col="doc_id")
        row = survivors.agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("s")
        ).first()
        stats.append((row["n"], row["s"]))
        seen_fold_bucketed(
            spark,
            table,
            doc_fingerprints(survivors),
            buckets=32,
            path=f"{root}/seen_lake",
        )
    out = {
        "wall_s": round(time.time() - t0, 1),
        "shuffle_mb": round((shuffle_write_bytes(spark) - s0) / 1e6, 1),
        "batches": stats,
    }
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return out


def main() -> None:
    root = tempfile.mkdtemp(prefix="c360_stress_seen_lake_")
    spark = get_session(
        app_name="stress-seen-lake",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.driver.memory": "16g",
            "spark.sql.warehouse.dir": f"{root}/warehouse",
        },
    )
    try:
        plain = run_plain(spark, root)
        bucketed = run_bucketed(spark, root)
        assert plain["batches"] == bucketed["batches"], (
            "storage layout changed the fold result:\n"
            f"plain    {plain['batches']}\nbucketed {bucketed['batches']}"
        )
        print(
            json.dumps(
                {
                    "n_batches": N_BATCHES,
                    "batch_rows": BATCH,
                    "plain": {k: plain[k] for k in ("wall_s", "shuffle_mb")},
                    "bucketed": {
                        k: bucketed[k] for k in ("wall_s", "shuffle_mb")
                    },
                    "survivors_total": int(sum(n for n, _ in plain["batches"])),
                    "results_identical": True,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
