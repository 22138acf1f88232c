"""Scale stress for hits — the mutual-reinforcement link-analysis
fixpoint (graded as `hits_bipartite` over the customer→part purchase
graph). Completes the float-iterative family's independent-reference
evidence: pagerank and LPA have numpy-verified scale runs
(stress_pagerank / stress_lpa); this is the same check for HITS.

Two graphs, far past the graded size (~600k edges at sf0.1):

- ``bipartite_zipf``: 200k hub-side x 50k authority-side nodes, 2M
  edges with Zipf-ranked authority endpoints — popular authorities
  make single aggregate cells heavy (the skew path of the per-round
  hash agg), and the bipartite shape is what the operator exists for.
- ``zipf_web``: the stress_pagerank generator (1M edges / 100k nodes)
  — a general directed graph where the same node holds BOTH scores.

Each run verifies EVERY hub and authority score against a vectorized
numpy mirror of the exact update (L1 normalization each half-step,
multi-edges count per occurrence, h_0 = 1), reporting max absolute
error — expect < 1e-9: scores are IEEE doubles accumulated in shuffle
order, so only summation order differs (graph.py:735-738).

Run: python scripts/stress_hits.py  (one JSON line per graph).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SEED = 23
ITERS = 8


def np_hits(edges: np.ndarray, iters: int = ITERS):
    """Mirror of operators.graph.hits: NO edge dedup (multi-edges vote
    per occurrence), h_0 = 1 on the full endpoint-union node set, L1
    normalization each half-step; no-in-edge nodes hold authority 0,
    no-out-edge nodes hold hub 0."""
    nodes = np.unique(edges)
    n = len(nodes)
    s = np.searchsorted(nodes, edges[:, 0])
    d = np.searchsorted(nodes, edges[:, 1])
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a_raw = np.zeros(n)
        np.add.at(a_raw, d, h[s])
        a = a_raw / a_raw.sum()
        h_raw = np.zeros(n)
        np.add.at(h_raw, s, a[d])
        h = h_raw / h_raw.sum()
    return {int(nodes[i]): (float(h[i]), float(a[i])) for i in range(n)}


def bipartite_zipf(
    n_left: int = 200_000, n_right: int = 50_000, n_edges: int = 2_000_000
) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    src = rng.integers(0, n_left, size=n_edges, dtype=np.int64)
    dst = (
        np.minimum(rng.zipf(1.3, size=n_edges), n_right).astype(np.int64)
        - 1
        + n_left  # disjoint id spaces: left = hubs, right = authorities
    )
    return np.stack([src, dst], axis=1)


def zipf_web_edges(n_nodes: int = 100_000, n_edges: int = 1_000_000) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    src = rng.integers(0, int(n_nodes * 0.95), size=n_edges, dtype=np.int64)
    dst = np.minimum(rng.zipf(1.3, size=n_edges), n_nodes).astype(np.int64) - 1
    keep = src != dst
    return np.stack([src[keep], dst[keep]], axis=1)


def run(spark, name: str, edges: np.ndarray) -> None:
    from bigdata_etl_customer360_spark.operators.graph import hits

    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], schema="src long, dst long"
    ).repartition(64)
    df = df.localCheckpoint(eager=True)  # time the rounds, not the upload
    t0 = time.time()
    out = hits(df, iterations=ITERS).toPandas()
    dt = time.time() - t0
    got = {
        int(r.id): (float(r.hub), float(r.authority))
        for r in out.itertuples(index=False)
    }
    want = np_hits(edges)
    assert set(got) == set(want), f"node set: {len(got)} vs {len(want)}"
    max_err = max(
        max(abs(got[k][0] - hv), abs(got[k][1] - av))
        for k, (hv, av) in want.items()
    )
    print(
        json.dumps(
            {
                "graph": name,
                "edges": int(len(edges)),
                "nodes": int(len(want)),
                "iterations": ITERS,
                "sec": round(dt, 1),
                "max_abs_err_vs_numpy": float(f"{max_err:.3g}"),
                "hub_mass": round(float(sum(h for h, _ in got.values())), 9),
                "auth_mass": round(float(sum(a for _, a in got.values())), 9),
            }
        ),
        flush=True,
    )
    assert max_err < 1e-8, f"max abs err {max_err} vs numpy reference"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, "bipartite_zipf", bipartite_zipf())
    run(spark, "zipf_web", zipf_web_edges())
    spark.stop()


if __name__ == "__main__":
    main()
