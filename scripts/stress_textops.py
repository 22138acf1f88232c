"""Scale stress for the round-4 text/curation operators at 100k docs —
20× the sf0.1 corpus, same replication recipe as the round-1 dedup
stress (7 exact copies + 13 light mutations per doc), with a planted
3-line structure per doc so ``strip_boilerplate_lines`` exercises its
full plan (shared footer in every doc, per-original header shared by a
doc's 20 copies, unique body line).

Measured ops, one JSON line each:
- strip_boilerplate_lines(min_docs=1000): footer (df=100k) and every
  header (df=20... below threshold, kept) — asserts exactly 1 line
  removed per doc.
- build_vocab(min_count=5, max_vocab=50_000) over the 100k-doc corpus.
- repeated_ngram_stats (bigrams) over the same.
- weighted_sample at weight=len/1000 (map-only reference point).

Run: python scripts/stress_textops.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def corpus(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(0, 20).select(F.col("id").alias("copy"))
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * 20 + F.col("copy")).alias("doc_id"),
            F.concat(
                F.lit("header-"),
                F.col("doc_id").cast("string"),
                F.lit("\n"),
                # mutations: copies 7..19 get a marker token so they are
                # near- (not exact-) duplicates of the original text
                F.when(F.col("copy") >= 7,
                       F.concat(F.col("text"), F.lit(" mut"),
                                F.col("copy").cast("string"))
                 ).otherwise(F.col("text")),
                F.lit("\nSubscribe to the newsletter"),
            ).alias("text"),
        )
        .repartition(64)
    )


def timed(label, df, extra=None):
    t0 = time.time()
    n = df.count()
    out = {"op": label, "sec": round(time.time() - t0, 1), "rows": n}
    out.update(extra or {})
    print(json.dumps(out))
    return n


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from bigdata_etl_customer360_spark.operators.curation import (
        repeated_ngram_stats,
        strip_boilerplate_lines,
    )
    from bigdata_etl_customer360_spark.operators.sampling import weighted_sample
    from bigdata_etl_customer360_spark.operators.textstats import build_vocab

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = corpus(spark).cache()
    n_docs = docs.count()
    print(json.dumps({"op": "corpus", "rows": n_docs}))

    sb = strip_boilerplate_lines(docs, min_docs=1000)
    bad = sb.filter(F.col("n_removed") != 1).count()
    timed("strip_boilerplate_lines", sb, {"docs_with_wrong_removal": bad})

    vocab = build_vocab(docs, min_count=5, max_vocab=50_000)
    timed("build_vocab", vocab)

    rep = repeated_ngram_stats(docs, n=2)
    timed("repeated_ngram_stats", rep)

    ws = weighted_sample(
        docs.withColumn(
            "w", F.least(F.lit(1.0), F.length("text").cast("double") / F.lit(1000.0))
        ),
        weight_col="w",
    )
    timed("weighted_sample", ws)

    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
