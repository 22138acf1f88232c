"""Scale stress for pagerank — the link-analysis quality prior (graded
as `pagerank` over the support-thresholded co-purchase graph).

Two graphs, far past the graded size:

- ``copurchase_full``: the UNthresholded sf0.1 co-purchase graph
  (~2.4M directed edges over ~20k parts) — dense, heavy multi-edges,
  the realistic "you didn't prune" case.
- ``zipf_web``: 1M-edge synthetic web-ish graph over 100k nodes with
  Zipf-distributed in-degree (preferential attachment shape) plus a 5%
  dangling tail — the shape PageRank exists for.

Each run verifies EVERY rank against a numpy power iteration with the
identical update rule (vectorized np.add.at), reporting the max absolute
error (expect < 1e-9; float sum order differs between engines).

Run: python scripts/stress_pagerank.py  (one JSON line per graph).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SEED = 11
ITERS = 8
DAMPING = 0.85


def np_pagerank(edges: np.ndarray) -> dict[int, float]:
    nodes = np.unique(edges)
    idx = {int(n): i for i, n in enumerate(nodes)}
    n = len(nodes)
    src = np.fromiter((idx[int(u)] for u in edges[:, 0]), np.int64, len(edges))
    dst = np.fromiter((idx[int(v)] for v in edges[:, 1]), np.int64, len(edges))
    deg = np.zeros(n, np.int64)
    np.add.at(deg, src, 1)
    r = np.full(n, 1.0 / n)
    dangling_mask = deg == 0
    for _ in range(ITERS):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / deg[src])
        dm = r[dangling_mask].sum()
        r = (1.0 - DAMPING) / n + DAMPING * (contrib + dm / n)
    return {int(nodes[i]): float(r[i]) for i in range(n)}


def copurchase_edges(spark) -> np.ndarray:
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    pdf = (
        a.join(b, "o")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .toPandas()
    )
    return pdf.to_numpy(dtype=np.int64)


def zipf_web_edges(n_nodes: int = 100_000, n_edges: int = 1_000_000) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    # sources uniform over the non-dangling 95%; destinations Zipf-ranked
    src = rng.integers(0, int(n_nodes * 0.95), size=n_edges, dtype=np.int64)
    dst = np.minimum(rng.zipf(1.3, size=n_edges), n_nodes).astype(np.int64) - 1
    keep = src != dst
    return np.stack([src[keep], dst[keep]], axis=1)


def rdd_pagerank(spark, edges_df, num_partitions: int = 64):
    """RDD-tier co-partitioned power iteration — the 'eliminate the
    per-round exchanges' experiment (r6/r7 unclaimed idea): edge and
    rank pair-RDDs share ONE pinned hash partitioner, so edges⋈ranks and
    nodes⋈contrib are narrow and the only per-round shuffle is the
    contribution reduceByKey; rdd.localCheckpoint PRESERVES the
    partitioner (unlike DataFrame.localCheckpoint, which drops
    outputPartitioning). The price: every round moves O(E) Python
    tuples through pickle + python workers instead of Tungsten rows —
    measured here to decide whether 1 shuffle/round beats 3."""
    from operator import add

    P = num_partitions
    e = (
        edges_df.rdd.map(lambda r: (int(r[0]), int(r[1])))
        .partitionBy(P)
        .cache()
    )
    deg = e.mapValues(lambda _: 1).reduceByKey(add, numPartitions=P)
    ed = e.join(deg).cache()  # (src, (dst, deg)) — narrow, co-partitioned
    ed.count()
    nodes = (
        e.flatMap(lambda kv: ((kv[0], None), (kv[1], None)))
        .reduceByKey(lambda a, b: None, numPartitions=P)
        .cache()
    )
    n = nodes.count()
    dang = nodes.subtractByKey(deg, numPartitions=P).cache()
    dang.count()
    base = (1.0 - DAMPING) / n
    ranks = nodes.mapValues(lambda _: 1.0 / n)  # mapValues keeps partitioner
    for _ in range(ITERS):
        contrib = (
            ed.join(ranks)  # narrow
            .map(lambda kv: (kv[1][0][0], kv[1][1] / kv[1][0][1]))
            .reduceByKey(add, numPartitions=P)  # the ONE shuffle
        )
        dm = dang.join(ranks).map(lambda kv: kv[1][1]).sum()
        dm_share = DAMPING * dm / n
        ranks = nodes.leftOuterJoin(contrib).mapValues(
            lambda v, _b=base, _s=dm_share: _b
            + DAMPING * (v[1] if v[1] is not None else 0.0)
            + _s
        )
        ranks = ranks.cache()
        ranks.localCheckpoint()
        ranks.count()
    out = dict(ranks.collect())
    for r in (e, ed, nodes, dang):
        r.unpersist()
    return out


def run(spark, name: str, edges: np.ndarray, variant: str = "df") -> None:
    from bigdata_etl_customer360_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], schema="src long, dst long"
    ).repartition(64)
    df = df.localCheckpoint(eager=True)  # time the loop, not the driver upload
    t0 = time.time()
    if variant == "rdd":
        got = rdd_pagerank(spark, df)
    else:
        out = pagerank(
            df,
            damping=DAMPING,
            iterations=ITERS,
            broadcast_ranks=(variant == "df_broadcast"),
        ).toPandas()
        got = dict(zip(out["id"].astype(int), out["rank"].astype(float)))
    dt = time.time() - t0
    want = np_pagerank(edges)
    max_err = max(abs(got[k] - v) for k, v in want.items())
    print(
        json.dumps(
            {
                "graph": name,
                "variant": variant,
                "edges": int(len(edges)),
                "nodes": int(len(want)),
                "iterations": ITERS,
                "sec": round(dt, 1),
                "max_abs_err_vs_numpy": float(f"{max_err:.3g}"),
                "mass": round(float(sum(got.values())), 9),
            }
        ),
        flush=True,
    )


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cop = copurchase_edges(spark)
    web = zipf_web_edges()
    for variant in ("df", "df_broadcast", "rdd"):
        run(spark, "copurchase_full", cop, variant)
        run(spark, "zipf_web", web, variant)
    spark.stop()


if __name__ == "__main__":
    main()
