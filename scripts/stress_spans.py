"""Stress dedup_spans at 100k docs with PLANTED cross-doc repeated spans —
exact expected removal counts by construction.

Corpus: 100k docs of 40 unique filler tokens each (token text embeds the
doc id, so no accidental cross-doc 8-grams). A 16-token SPAN is planted
into every doc whose id % 10 == 0 (10k occurrences corpus-wide) at token
offset 12. Expected, exactly:
  - the single globally-first occurrence (doc 0) keeps all 40+16 tokens
  - every other planted doc loses exactly the 16 span tokens
  - unplanted docs lose nothing
Also checks conservation (kept + removed == original) on a sample and
records wall time for BASELINE.md.

Run: PYTHONPATH=/root/repo python scripts/stress_spans.py
"""

import time

from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.curation import dedup_spans
from bigdata_etl_customer360_spark.operators.util import cache_scope
from bigdata_etl_customer360_spark.session import get_session

SPAN = " ".join(f"s{i}" for i in range(16))  # 16 shared tokens


def main():
    spark = get_session(app_name="stress-spans", master="local[32]")
    n = 100_000

    filler_pre = F.concat_ws(
        " ", *[F.concat(F.lit(f"a{j}d"), F.col("id")) for j in range(12)]
    )
    filler_post = F.concat_ws(
        " ", *[F.concat(F.lit(f"b{j}d"), F.col("id")) for j in range(28)]
    )
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 10 == 0,
                F.concat_ws(" ", filler_pre, F.lit(SPAN), filler_post),
            )
            .otherwise(F.concat_ws(" ", filler_pre, filler_post))
            .alias("text"),
        )
        .repartition(32)
    )

    t0 = time.time()
    with cache_scope():
        out = dedup_spans(docs, span_tokens=8, min_count=2)
        agg = out.groupBy((F.col("doc_id") % 10 == 0).alias("planted")).agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_removed").alias("removed"),
            F.sum((F.col("n_removed") == 0).cast("long")).alias("untouched"),
        )
        rows = {r["planted"]: r for r in agg.collect()}
    dt = time.time() - t0

    planted, clean = rows[True], rows[False]
    assert clean["docs"] == n - n // 10 and clean["removed"] == 0, clean
    assert planted["docs"] == n // 10, planted
    # every planted doc except the canonical (doc 0) loses exactly 16
    assert planted["removed"] == 16 * (n // 10 - 1), planted
    assert planted["untouched"] == 1, planted

    # conservation spot-check on the canonical + 2 others
    sample = {
        r["doc_id"]: r
        for r in out.filter(F.col("doc_id").isin(0, 10, 7)).collect()
    }
    assert sample[0]["n_removed"] == 0 and SPAN in sample[0]["cleaned"]
    assert sample[10]["n_removed"] == 16 and SPAN not in sample[10]["cleaned"]
    assert sample[7]["n_removed"] == 0
    print(
        f"dedup_spans stress OK: {n} docs, {n // 10} planted occurrences, "
        f"removed={int(planted['removed'])} (exact), {dt:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
