"""Scale evidence for the streaming NEAR-dup maintainer (r15, VERDICT r14
task 1): drive `stream_dedup_neardup` over an 8-batch / 20k-docs-per-batch
availableNow history (~30% near-dup re-crawls — one appended token,
word-3-gram Jaccard ~0.89 — and ~10% exact re-crawls of earlier texts) and
record:

  - per-batch wall seconds, drained ONE batch per call (each call is a
    fresh availableNow drain of exactly one new file, so the per-call wall
    IS the per-batch cost, checkpoint/startup floor included). The 100 TB
    claim under test: per-batch cost stays ~|batch|-shaped as the
    band/signature lakes grow — the lake side is never re-shuffled
    (bucketed scans) and never rewritten (append-only-new folds);
  - total REAL shuffle-write bytes (Spark UI REST /stages, the
    stress_stream_bucketed pattern);
  - the two-execution-models equivalence at this scale: the drained
    survivor set must EQUAL the batch ground truth — corpus anti-join the
    id_b side of `minhash_lsh_pairs` (same 64/32 banding, same exact
    shingle-set verification at 0.6) over the concatenated history.

Measured (r15, local[32]): with ND_BUCKETS=16 the per-batch wall is FLAT
— [29.2 (JVM warmup), 7.8, 7.2, 8.0, 8.1, 8.7, 10.7, 10.0] s — against a
lake growing to 5.1M band rows, 52 MB total shuffle, survivors exactly
the 100k originals, streaming == batch ground truth. The SAME run at
ND_BUCKETS=64 degraded to [23.6, 17.2, 17.0, 23.6, 27.9, 32.2, 31.6,
29.3]: per-batch listing/open overhead on accreted append files — NOT
the joins (shuffle bytes were lower, 45 vs 52 MB).

REVISED (late r15): the real accretion rate was write-tasks × buckets
files per fold (Spark's bucketed writer doesn't shuffle — each task
writes one file per bucket present). `lake_create_or_append` now
repartitions on the bucket key at the bucket width before every write
(one file per non-empty bucket per fold; the exchange is batch-sized,
or elided when the upstream already matches), and the over-bucketing
penalty VANISHED: ND_BUCKETS=64 measures [11.3, 7.0, 6.0, 5.6, 5.1,
6.6, 8.6, 9.2] and ND_BUCKETS=16 [12.1, 6.1, 5.7, 5.8, 7.3, 10.4,
10.7, 6.7] — flat, statistically identical to each other, and faster
than the PRE-fix 16-bucket run. `buckets` sizing is back to a pure
join-parallelism choice; `compact_lake` still bounds the (now
fold-count-linear) file growth.

ND_COMPACT_AT=<batch> runs `sources.bucketed.compact_lake` on both lakes
after that batch's drain (wall recorded separately) — the maintenance
pass the over-bucketing finding calls for. Measured (r15, ND_BUCKETS=64,
compact after batch 3): per-batch wall [20.2, 13.1, 39.6, 39.8, | 15.0,
17.4, 16.2, 18.5] — the batches after the 18.3s compaction pass recover
the file-count overhead (the uncompacted 64-bucket run kept degrading
to ~30s/batch), and the final survivor set still equals the batch
ground truth (results_identical across the mid-run rewrite).

Run: PYTHONPATH=/root/repo [ND_BUCKETS=16] [ND_COMPACT_AT=3] \\
    python scripts/stress_neardup.py
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

from bigdata_etl_customer360_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
)
from bigdata_etl_customer360_spark.operators.util import cache_scope  # noqa: E402
from bigdata_etl_customer360_spark.session import get_session  # noqa: E402
from bigdata_etl_customer360_spark.streaming.windows import (  # noqa: E402
    stream_dedup_neardup,
    stream_from_parquet,
)

N_BATCHES = 8
BATCH = 20_000
CYCLE = 100_000  # ids past this re-crawl (near or exact) id % CYCLE

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


def corpus_text(idc):
    """11 tokens per doc, stride == token count so distinct base ids
    share NO tokens (realistic low organic match rate — the planted
    re-crawls are the only near-dups); re-crawl ids (past CYCLE) reuse
    the base text, ~3/4 of them with one appended token (near-dup at
    jaccard 8/9), the rest byte-identical (exact)."""
    base = idc % CYCLE
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(10)),
            lambda i: F.concat(F.lit("tok"), (base * 11 + i).cast("string")),
        ),
    )
    return (
        F.when(idc < CYCLE, body)
        .when(idc % 4 == 0, body)  # exact re-crawl
        .otherwise(F.concat(body, F.lit(" v"), (idc % 3).cast("string")))
    )


def write_batch(spark, src: str, b: int) -> str:
    stage = f"{src}.stage{b}"
    (
        spark.range(b * BATCH, (b + 1) * BATCH)
        .select(
            F.col("id").alias("doc_id"),
            corpus_text(F.col("id")).alias("text"),
        )
        .coalesce(1)
        .write.parquet(stage)
    )
    (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
    dst = os.path.join(src, f"batch{b}.parquet")
    os.rename(part, dst)
    os.utime(dst, (1_700_000_000 + 10 * b,) * 2)
    shutil.rmtree(stage)
    return dst


def main() -> None:
    root = tempfile.mkdtemp(prefix="c360_stress_neardup_")
    spark = get_session(
        app_name="stress-neardup",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.driver.memory": "16g",
            "spark.sql.warehouse.dir": f"{root}/warehouse",
        },
    )
    table_b, table_s = "stress_nd_bands", "stress_nd_sigs"
    try:
        src = f"{root}/src"
        os.makedirs(src)
        spark.sql(f"DROP TABLE IF EXISTS {table_b}")
        spark.sql(f"DROP TABLE IF EXISTS {table_s}")
        s0 = shuffle_write_bytes(spark)
        compact_at = int(os.environ.get("ND_COMPACT_AT", "-1"))
        compact_wall = None
        walls = []
        for b in range(N_BATCHES):
            write_batch(spark, src, b)
            t0 = time.time()
            stream_dedup_neardup(
                stream_from_parquet(spark, src, SCHEMA, max_files_per_trigger=1),
                table_b,
                table_s,
                f"{root}/survivors",
                f"{root}/ckpt",
                num_hashes=64,
                bands=32,
                threshold=0.6,
                buckets=int(os.environ.get("ND_BUCKETS", "16")),
                bands_table_path=f"{root}/bands_lake",
                sigs_table_path=f"{root}/sigs_lake",
            )
            walls.append(round(time.time() - t0, 2))
            if b == compact_at:
                from bigdata_etl_customer360_spark.sources.bucketed import (
                    compact_lake,
                )

                t0 = time.time()
                compact_lake(spark, table_b, f"{root}/bands_lake")
                compact_lake(spark, table_s, f"{root}/sigs_lake")
                compact_wall = round(time.time() - t0, 2)
        shuffle_mb = round((shuffle_write_bytes(spark) - s0) / 1e6, 1)

        got = sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{root}/survivors").collect()
        )
        history = spark.read.parquet(src)
        with cache_scope():
            dropped = (
                minhash_lsh_pairs(
                    history, num_hashes=64, bands=32, threshold=0.6
                )
                .select("id_b")
                .distinct()
                .withColumnRenamed("id_b", "doc_id")
            )
            expected = sorted(
                r["doc_id"]
                for r in history.join(dropped, "doc_id", "left_anti")
                .select("doc_id")
                .collect()
            )
        assert got == expected, (
            f"streaming != batch minhash ground truth: "
            f"{len(got)} vs {len(expected)} survivors"
        )
        lake_rows = spark.table(table_b).count()
        print(
            json.dumps(
                {
                    "n_batches": N_BATCHES,
                    "batch_rows": BATCH,
                    "per_batch_wall_s": walls,
                    "shuffle_mb_total": shuffle_mb,
                    "survivors_total": len(got),
                    "band_lake_rows": int(lake_rows),
                    "compact_after_batch": compact_at if compact_at >= 0 else None,
                    "compact_wall_s": compact_wall,
                    "results_identical": True,
                }
            ),
            flush=True,
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table_b}")
        spark.sql(f"DROP TABLE IF EXISTS {table_s}")
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
