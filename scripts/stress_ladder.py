"""sf1-scale gate for the curation/dedup ladder: ~500k docs (100x the
sf0.1 corpus: per original, 1 pristine + 14 exact copies + 85 light
mutations), measuring WALL TIME and real SHUFFLE-WRITE BYTES (Spark REST
/stages API) per phase, so BASELINE.md records that ladder shuffle volume
tracks the POSTING LISTS (8-byte shingle keys), not the corpus text.

Phases:
  A. posting-list sizing: capped shingle postings count vs corpus rows —
     the quantity every dedup shuffle is proportional to.
  B. curate_corpus end-to-end with the minhash pairs_fn (the 100 TB
     probabilistic tier): quality gate -> exact dedup -> LSH near-dup ->
     connected components -> canonical -> stratified sample.
  C. bucketed-vs-plain canonical dedup chain at the same scale: identical
     row sets (asserted); shuffle bytes recorded per side.

Run: PYTHONPATH=/root/repo python scripts/stress_ladder.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_customer360_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    with_shingles,
)
from bigdata_etl_customer360_spark.operators.graph import (  # noqa: E402
    keep_cluster_canonical,
)
from bigdata_etl_customer360_spark.operators.util import cache_scope  # noqa: E402
from bigdata_etl_customer360_spark.plans.pipelines import curate_corpus  # noqa: E402
from bigdata_etl_customer360_spark.session import get_session  # noqa: E402

N_COPIES = 100
MAX_DF = 500  # boilerplate cap: pair-identifying shingles have df ~ 100


def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    copies = spark.range(0, N_COPIES).select(F.col("id").alias("copy"))
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * N_COPIES + F.col("copy")).alias("doc_id"),
            F.when(
                F.col("copy") >= 15,
                F.concat(F.col("text"), F.lit(" mut"), F.col("copy").cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        .repartition(64)
    )


def shuffle_write_bytes(spark) -> int:
    """Sum shuffle-write bytes over all completed stages via the UI REST
    API — a real measurement, not an estimate."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages
               if s.get("status") == "COMPLETE")


def main():
    spark = get_session(
        app_name="stress-ladder",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = corpus(spark).localCheckpoint(eager=True)  # pin the input out of the measurement
    n_docs = docs.count()
    report: dict[str, dict] = {}

    # ---- A. posting-list sizing: what the dedup shuffles actually carry
    t0, s0 = time.time(), shuffle_write_bytes(spark)
    posts = (
        with_shingles(docs, "text", 3)
        .select(F.col("doc_id"), F.explode("shingles").alias("_s"))
        .select("doc_id", F.xxhash64("_s").alias("_sh"))
    )
    keep = (
        posts.groupBy("_sh").agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= MAX_DF).select("_sh")
    )
    n_posts = posts.count()
    n_capped = posts.join(keep, on="_sh").count()
    report["postings"] = {
        "corpus_docs": n_docs,
        "posting_rows": n_posts,
        "capped_posting_rows": n_capped,
        "sec": round(time.time() - t0, 1),
        "shuffle_mb": round((shuffle_write_bytes(spark) - s0) / 1e6, 1),
    }

    # ---- B. the full ladder with the 100 TB (minhash) tier
    t0, s0 = time.time(), shuffle_write_bytes(spark)
    with cache_scope():
        out = curate_corpus(
            docs,
            sample_n=20,
            jaccard_threshold=0.5,
            pairs_fn=lambda d: minhash_lsh_pairs(
                d, threshold=0.5, verify=True, max_df=MAX_DF
            ),
        )
        n_out = out.count()
    report["curate_corpus"] = {
        "docs_in": n_docs,
        "docs_out": n_out,
        "sec": round(time.time() - t0, 1),
        "shuffle_mb": round((shuffle_write_bytes(spark) - s0) / 1e6, 1),
    }
    assert 0 < n_out <= 5000, n_out  # at most one canonical per original

    # ---- C. bucketed vs plain canonical chain: same rows, less shuffle
    from bigdata_etl_customer360_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )
    import shutil
    import tempfile

    pairs_of = lambda d: minhash_lsh_pairs(  # noqa: E731
        d, threshold=0.5, verify=True, max_df=MAX_DF
    )

    t0, s0 = time.time(), shuffle_write_bytes(spark)
    with cache_scope():
        plain = sorted(
            r["doc_id"]
            for r in keep_cluster_canonical(docs, pairs_of(docs)).select("doc_id").collect()
        )
    plain_sec = round(time.time() - t0, 1)
    plain_mb = round((shuffle_write_bytes(spark) - s0) / 1e6, 1)

    wh = tempfile.mkdtemp(prefix="c360_stress_ladder_wh_")
    try:
        write_bucketed(
            docs, "stress_ladder_docs", ["doc_id"], 64,
            path=wh + "/stress_ladder_docs",
        )
        bdocs = read_bucketed(spark, "stress_ladder_docs")
        t0, s0 = time.time(), shuffle_write_bytes(spark)
        with cache_scope():
            bucketed = sorted(
                r["doc_id"]
                for r in keep_cluster_canonical(bdocs, pairs_of(bdocs)).select("doc_id").collect()
            )
        b_sec = round(time.time() - t0, 1)
        b_mb = round((shuffle_write_bytes(spark) - s0) / 1e6, 1)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS stress_ladder_docs")

    assert bucketed == plain, (len(bucketed), len(plain))
    report["canonical_chain"] = {
        "rows": len(plain),
        "plain_sec": plain_sec, "plain_shuffle_mb": plain_mb,
        "bucketed_sec": b_sec, "bucketed_shuffle_mb": b_mb,
    }
    # Measured finding (recorded in BASELINE.md, round 6): at the MINHASH
    # tier the chain's shuffle bytes are dominated by shingle/band-hash
    # keys, NOT doc_id — bucketing by id removes only the signature
    # groupBy / canonical-join exchanges, a noise-level slice of total
    # bytes here (10388 vs 10390 MB at 500k docs). The id-bucketing win
    # belongs to id-keyed ladders (dedup_ladder_bucketed's plan test);
    # no bytes assert — row equality above is the hard gate.

    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
