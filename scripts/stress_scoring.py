"""Scale stress for the round-8 scoring operators — bm25_search,
ngram_lm_score, dsir_weights, char_entropy — at 100k and 500k docs
(20x / 100x the sf0.1 corpus; same replication recipe as the other
stresses: per-copy mutation markers so texts are near- not exact-dups).

Beyond wall time (expect ~linear in token volume — all four are
explode -> map-side-combined aggs + broadcast/model joins), each run
asserts CROSS-OPERATOR invariants no single-op unit test can see:

- bm25_search row count == boolean_search(mode='or') row count for the
  same terms (two independent plans must agree on the match set);
- sum(lm_score.n_bigrams) == sum(dsir_weights.n_bigrams) (both consume
  the ONE shared word_bigrams_expr — a divergent copy would break this);
- char_entropy row count == docs with non-empty text.

Run: python scripts/stress_scoring.py   (one JSON line per (scale, op)).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def corpus(spark, n_copies: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(0, n_copies).select(F.col("id").alias("copy"))
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * n_copies + F.col("copy")).alias("doc_id"),
            F.when(
                F.col("copy") > 0,
                F.concat(
                    F.col("text"), F.lit(" mut"), F.col("copy").cast("string")
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)  # time the operators, not the build
    )


def timed(label, scale, df):
    t0 = time.time()
    n = df.count()
    rec = {"docs": scale, "op": label, "sec": round(time.time() - t0, 1), "rows": n}
    print(json.dumps(rec), flush=True)
    return n


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bigdata_etl_customer360_spark.operators.curation import dsir_weights
    from bigdata_etl_customer360_spark.operators.textstats import (
        bm25_search,
        boolean_search,
        char_entropy,
        ngram_lm_score,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    terms = ["spark", "join", "window"]

    for n_copies in (20, 100):
        docs = corpus(spark, n_copies)
        scale = docs.count()

        n_bm = timed("bm25_search", scale, bm25_search(docs, terms))
        n_or = boolean_search(docs, terms, mode="or").count()
        assert n_bm == n_or, (n_bm, n_or)

        # time the eager checkpoint itself (it materializes the plan);
        # the later n_bigrams aggs then read the checkpoint, not the plan
        t0 = time.time()
        lm = ngram_lm_score(docs).localCheckpoint(eager=True)
        print(json.dumps({"docs": scale, "op": "ngram_lm_score",
                          "sec": round(time.time() - t0, 1),
                          "rows": lm.count()}), flush=True)
        t0 = time.time()
        ds = dsir_weights(
            docs, target_ids=docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
        ).localCheckpoint(eager=True)
        print(json.dumps({"docs": scale, "op": "dsir_weights",
                          "sec": round(time.time() - t0, 1),
                          "rows": ds.count()}), flush=True)
        lm_total = lm.agg(F.sum("n_bigrams")).first()[0]
        ds_total = ds.agg(F.sum("n_bigrams")).first()[0]
        assert lm_total == ds_total, (lm_total, ds_total)

        n_ent = timed("char_entropy", scale, char_entropy(docs))
        n_nonempty = docs.filter(F.length("text") > 0).count()
        assert n_ent == n_nonempty, (n_ent, n_nonempty)

        print(
            json.dumps(
                {
                    "docs": scale,
                    "invariants": "bm25==boolean_or, lm_bigrams==dsir_bigrams, "
                    "entropy_rows==nonempty",
                    "ok": True,
                }
            ),
            flush=True,
        )
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
