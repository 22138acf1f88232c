"""Scale stress for embedding_cosine_pairs(mode='lsh') — the 100 TB
embedding-dedup path (VERDICT r2 item 4).

Generates a SKEWED 50k-vector corpus (Zipf-sized clusters of near-dups
around real sf0.1 embedding seeds + a uniform background), then for each
``num_planes`` setting records:

- bucket-occupancy histogram (max / p99 / median over (table, signature)
  buckets) — occupancy skew is THE failure mode of LSH-bucketed matmul:
  one mega-bucket serializes an O(m²) numpy matmul on one task and its
  m×m float64 score matrix bounds peak task memory (reported as
  ``peak_task_mb = max_occ² × 8B``);
- wall time of the full pair materialization (pairs.count());
- verified pair count at threshold;
- recall vs the exact blocked-matmul mode on a fixed 6k subsample
  (exact all-pairs at 50k is O(n²)=2.5e9 int64 dots — exactly what the
  LSH tier exists to avoid — so recall is measured on the subsample).

Run:  python scripts/stress_embed_lsh.py   (writes one JSON line per
config to stdout; prose summary belongs in BASELINE.md).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_TOTAL = 50_000
N_CLUSTERED = 35_000  # rest is uniform background
MAX_CLUSTER = 200  # Zipf-sized, capped: dup clusters are small in practice
DIM = 64
NOISE = 0.22  # intra-cluster cosine mostly >= ~0.9
THRESHOLD = 0.85
SUBSAMPLE = 6_000
SEED = 42


def make_corpus() -> pd.DataFrame:
    rng = np.random.default_rng(SEED)
    seeds = pd.read_parquet("/root/testdata/sf0.1/embeddings.parquet")
    base = np.stack(seeds["embedding"].to_numpy()).astype(np.float64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    draws = np.clip(rng.zipf(1.35, size=N_CLUSTERED), 2, MAX_CLUSTER)
    sizes = draws[np.cumsum(draws) <= N_CLUSTERED]

    rows = []
    for c, sz in enumerate(sizes):
        seed_vec = base[c % len(base)]
        member = seed_vec + rng.normal(0.0, NOISE / np.sqrt(DIM), size=(sz, DIM))
        rows.append(member)
    clustered = np.vstack(rows)
    uniform = rng.normal(0.0, 1.0, size=(N_TOTAL - len(clustered), DIM))
    uniform /= np.linalg.norm(uniform, axis=1, keepdims=True)
    vecs = np.vstack([clustered, uniform]).astype(np.float32)
    return pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [v.tolist() for v in vecs],
        }
    )


def occupancy(spark, df, num_planes, num_tables):
    from pyspark.sql import functions as F
    from bigdata_etl_customer360_spark.operators.similarity import (
        hyperplane_signatures,
    )

    sigs = hyperplane_signatures(num_planes, num_tables)
    occ = (
        df.select(sigs(F.col("embedding")).alias("_s"))
        .select(F.posexplode("_s").alias("_tbl", "_sig"))
        .groupBy("_tbl", "_sig")
        .count()
        .select("count")
        .toPandas()["count"]
        .to_numpy()
    )
    return {
        "buckets": int(len(occ)),
        "max": int(occ.max()),
        "p99": int(np.percentile(occ, 99)),
        "median": int(np.median(occ)),
        "peak_task_mb": round(float(occ.max()) ** 2 * 8 / 2**20, 1),
    }


def main() -> None:
    from pyspark.sql import SparkSession
    from bigdata_etl_customer360_spark.operators.dedup import embedding_cosine_pairs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .appName("stress_embed_lsh")
        .getOrCreate()
    )
    pdf = make_corpus()
    corpus = (
        spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
        .repartition(64)
        .cache()
    )
    corpus.count()
    sub = corpus.filter(f"vec_id % {N_TOTAL // SUBSAMPLE} = 0").cache()
    n_sub = sub.count()

    t0 = time.time()
    exact_sub = set(
        map(
            tuple,
            embedding_cosine_pairs(
                sub, threshold=THRESHOLD, mode="exact", num_blocks=8
            )
            .select("id_a", "id_b")
            .toPandas()
            .to_numpy(),
        )
    )
    t_exact = time.time() - t0
    print(
        json.dumps(
            {
                "config": "exact_subsample",
                "n": n_sub,
                "pairs": len(exact_sub),
                "sec": round(t_exact, 1),
            }
        )
    )

    for num_planes, num_tables in [(8, 16), (12, 16), (16, 16)]:
        occ = occupancy(spark, corpus, num_planes, num_tables)
        t0 = time.time()
        pairs = embedding_cosine_pairs(
            corpus,
            threshold=THRESHOLD,
            mode="lsh",
            num_planes=num_planes,
            num_tables=num_tables,
        ).cache()
        n_pairs = pairs.count()
        dt = time.time() - t0
        lsh_sub = set(
            map(
                tuple,
                pairs.join(sub.select(F_id("id_a")), "id_a")
                .join(sub.select(F_id("id_b")), "id_b")
                .select("id_a", "id_b")
                .toPandas()
                .to_numpy(),
            )
        )
        recall = len(lsh_sub & exact_sub) / max(1, len(exact_sub))
        pairs.unpersist()
        print(
            json.dumps(
                {
                    "config": f"lsh_planes{num_planes}_tables{num_tables}",
                    "n": N_TOTAL,
                    "pairs": n_pairs,
                    "sec": round(dt, 1),
                    "recall_vs_exact_sub": round(recall, 4),
                    "occupancy": occ,
                }
            )
        )


def F_id(name):
    from pyspark.sql import functions as F

    return F.col("vec_id").alias(name)


if __name__ == "__main__":
    main()
