"""Scale stress for label_propagation's graded contract (r11: 4
synchronous rounds, early_stop=False, pinned smallest-label tie-break)
— the forced re-grade of round 12, far past the graded size.

Two graphs:

- ``planted_communities``: 100k nodes in 1,000 communities of 100
  (intra ring + random chords, ~1% inter-community chords) — the shape
  LPA exists for; ~1M undirected edges (~2M directed after the
  both-ways union).
- ``zipf_web``: the stress_pagerank generator — 1M edges over 100k
  nodes with Zipf in-degree. Hubs make single (node, label) cells
  heavy, stressing the per-round count aggregate's skew path, and hub
  labels flood, so labels KEEP changing at round 4 (the bounded-round
  cap is doing real work, not riding a converged fixpoint).

Each run verifies EVERY label against a vectorized numpy reference
implementing the identical synchronous update: per round, node u adopts
argmin over neighbor labels of (-count, label) — count ties break to the
SMALLEST label, the operator's pinned rule (graph.py:585-592). Exact
integer semantics, so the match is equality, not a tolerance.

Run: python scripts/stress_lpa.py  (one JSON line per graph).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SEED = 17
ROUNDS = 4  # the graded contract: max_iterations=4, early_stop=False


def np_lpa(edges: np.ndarray, rounds: int = ROUNDS) -> dict[int, int]:
    """Synchronous LPA with the pinned tie-break, vectorized.

    ``edges`` is directed (u, v) rows WITHOUT self-loops; the function
    adds the reverse direction and dedupes, mirroring the operator's
    unionByName + distinct (multi-edges collapse, each undirected edge
    votes once per endpoint)."""
    both = np.concatenate([edges, edges[:, ::-1]], axis=0)
    both = np.unique(both, axis=0)
    nodes = np.unique(both)
    n = len(nodes)
    u = np.searchsorted(nodes, both[:, 0])
    v = np.searchsorted(nodes, both[:, 1])
    lbl = np.arange(n, dtype=np.int64)  # label as NODE INDEX; decode at end
    for _ in range(rounds):
        key = u * n + lbl[v]
        uk, cnt = np.unique(key, return_counts=True)
        ku, kl = uk // n, uk % n
        # per ku: min (-cnt, kl) == order by (ku asc, cnt desc, kl asc)
        order = np.lexsort((kl, -cnt, ku))
        first = np.ones(len(order), dtype=bool)
        first[1:] = ku[order][1:] != ku[order][:-1]
        sel = order[first]
        new = lbl.copy()
        new[ku[sel]] = kl[sel]
        lbl = new
    return {int(nodes[i]): int(nodes[lbl[i]]) for i in range(n)}


def planted_communities(
    n_comm: int = 1_000, comm_size: int = 100, chords_per_node: int = 8
) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    n = n_comm * comm_size
    ids = np.arange(n, dtype=np.int64)
    comm = ids // comm_size
    ring = np.stack([ids, (ids + 1) % comm_size + comm * comm_size], axis=1)
    c_src = np.repeat(ids, chords_per_node)
    c_dst = (
        rng.integers(0, comm_size, size=len(c_src), dtype=np.int64)
        + comm[c_src] * comm_size
    )
    inter_m = n  # ~1% of ~n*9 intra edges
    i_src = rng.integers(0, n, size=inter_m, dtype=np.int64)
    i_dst = rng.integers(0, n, size=inter_m, dtype=np.int64)
    e = np.concatenate([ring, np.stack([c_src, c_dst], axis=1),
                        np.stack([i_src, i_dst], axis=1)])
    return e[e[:, 0] != e[:, 1]]


def zipf_web_edges(n_nodes: int = 100_000, n_edges: int = 1_000_000) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    src = rng.integers(0, int(n_nodes * 0.95), size=n_edges, dtype=np.int64)
    dst = np.minimum(rng.zipf(1.3, size=n_edges), n_nodes).astype(np.int64) - 1
    keep = src != dst
    return np.stack([src[keep], dst[keep]], axis=1)


def run(spark, name: str, edges: np.ndarray) -> None:
    from bigdata_etl_customer360_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], schema="id_a long, id_b long"
    ).repartition(64)
    df = df.localCheckpoint(eager=True)  # time the rounds, not the upload
    t0 = time.time()
    out = label_propagation(
        df, max_iterations=ROUNDS, early_stop=False
    ).toPandas()
    dt = time.time() - t0
    got = dict(zip(out["id"].astype(int), out["label"].astype(int)))
    want = np_lpa(edges)
    assert set(got) == set(want), (
        f"node set mismatch: {len(got)} vs {len(want)}"
    )
    n_diff = sum(1 for k, v in want.items() if got[k] != v)
    print(
        json.dumps(
            {
                "graph": name,
                "edges_directed_distinct": int(
                    len(np.unique(np.concatenate(
                        [edges, edges[:, ::-1]]), axis=0))
                ),
                "nodes": int(len(want)),
                "rounds": ROUNDS,
                "sec": round(dt, 1),
                "labels_mismatched_vs_numpy": n_diff,
                "communities": int(len(set(got.values()))),
            }
        ),
        flush=True,
    )
    assert n_diff == 0, f"{n_diff} labels diverge from the numpy reference"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, "planted_communities", planted_communities())
    run(spark, "zipf_web", zipf_web_edges())
    spark.stop()


if __name__ == "__main__":
    main()
