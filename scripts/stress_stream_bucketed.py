"""Scale evidence for the BUCKETED streaming dedup maintainer (r14,
VERDICT r13 task 2): drive the two REAL maintainers —
`stream_dedup_incremental` (plain snapshot: per-batch full-history
anti-join shuffle + read-union-distinct-overwrite) and
`stream_dedup_incremental_bucketed` (fp-bucketed lake: lake-side
shuffle-free anti-join + append-only-new fold) — over the SAME 10-file
availableNow drain (100k docs per micro-batch, ~40% re-crawls of earlier
texts) and record, per variant:

  - wall seconds for the whole drain (foreachBatch end to end),
  - REAL shuffle-write bytes (Spark UI REST /stages, the stress_seen_lake
    pattern) — the plain maintainer's shuffle volume grows with
    history x batches, the bucketed one's only with the batches,
  - per-batch survivor (count, id-sum) pairs, asserted IDENTICAL between
    variants — the storage layout must not move one row.

This is the streaming closure of scripts/stress_seen_lake.py (which
measures the same fold batch-side, without foreachBatch/checkpoint
overhead): the numbers that justify porting the lake into the maintainer.

SSB_COMPACT_OVER=<n> opts the bucketed variant into maintainer
self-compaction (`compact_files_over`) — the late-r15 feature: file
count bounded by the threshold + one fold, per-batch results still
identical to the plain maintainer. Measured (late r15, same host
back-to-back): without -> bucketed 21.9s / 78.2 MB shuffle / 384 lake
files (6 ingesting batches x 64 aligned fold files; the 4 pure-re-crawl
batches append nothing); with SSB_COMPACT_OVER=128 -> 21.2s / 104.9 MB
/ 128 files — the compaction rewrites show up as shuffle, not wall, and
bound the file count 3x with results identical.

Run: PYTHONPATH=/root/repo [SSB_COMPACT_OVER=128] \
    python scripts/stress_stream_bucketed.py
"""

from __future__ import annotations

import glob
import json
import os
import pathlib
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdata_etl_customer360_spark.session import get_session  # noqa: E402
from bigdata_etl_customer360_spark.streaming.windows import (  # noqa: E402
    stream_dedup_incremental,
    stream_dedup_incremental_bucketed,
    stream_from_parquet,
)

N_BATCHES = 10
BATCH = 100_000
CYCLE = 600_000  # ids past this re-crawl text of id % CYCLE

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


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


def write_source(spark, src: str) -> None:
    os.makedirs(src)
    for b in range(N_BATCHES):
        stage = f"{src}.stage{b}"
        (
            spark.range(b * BATCH, (b + 1) * BATCH)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("document body "),
                    (F.col("id") % CYCLE).cast("string"),
                ).alias("text"),
            )
            .coalesce(1)  # one file per batch: mtime order == batch order
            .write.parquet(stage)
        )
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(src, f"batch{b}.parquet")
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + 10 * b,) * 2)
        shutil.rmtree(stage)


def per_batch_stats(spark, survivors_path: str):
    rows = (
        spark.read.parquet(survivors_path)
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("s"))
        .orderBy("batch")
        .collect()
    )
    return [(int(r["batch"]), int(r["n"]), int(r["s"])) for r in rows]


def main() -> None:
    root = tempfile.mkdtemp(prefix="c360_stress_stream_bkt_")
    spark = get_session(
        app_name="stress-stream-bucketed",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.driver.memory": "16g",
            "spark.sql.warehouse.dir": f"{root}/warehouse",
        },
    )
    try:
        src = f"{root}/src"
        write_source(spark, src)

        t0, s0 = time.time(), shuffle_write_bytes(spark)
        stream_dedup_incremental(
            stream_from_parquet(spark, src, SCHEMA, max_files_per_trigger=1),
            f"{root}/seen_plain",
            f"{root}/survivors_plain",
            f"{root}/ckpt_plain",
        )
        plain = {
            "wall_s": round(time.time() - t0, 1),
            "shuffle_mb": round((shuffle_write_bytes(spark) - s0) / 1e6, 1),
        }

        table = "stress_stream_seen_lake"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        t0, s0 = time.time(), shuffle_write_bytes(spark)
        stream_dedup_incremental_bucketed(
            stream_from_parquet(spark, src, SCHEMA, max_files_per_trigger=1),
            table,
            f"{root}/survivors_bkt",
            f"{root}/ckpt_bkt",
            buckets=64,
            seen_table_path=f"{root}/seen_lake",
            compact_files_over=(
                int(os.environ["SSB_COMPACT_OVER"])
                if "SSB_COMPACT_OVER" in os.environ
                else None
            ),
        )
        bucketed = {
            "wall_s": round(time.time() - t0, 1),
            "shuffle_mb": round((shuffle_write_bytes(spark) - s0) / 1e6, 1),
            "lake_files": sum(
                1
                for _r, _d, fs in os.walk(f"{root}/seen_lake")
                for f in fs
                if not f.startswith(("_", "."))
            ),
        }

        a = per_batch_stats(spark, f"{root}/survivors_plain")
        b = per_batch_stats(spark, f"{root}/survivors_bkt")
        assert a == b, f"layout changed the drain result:\nplain    {a}\nbucketed {b}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        print(
            json.dumps(
                {
                    "n_batches": N_BATCHES,
                    "batch_rows": BATCH,
                    "plain": plain,
                    "bucketed": bucketed,
                    "survivors_total": int(sum(n for _, n, _ in a)),
                    "results_identical": True,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
