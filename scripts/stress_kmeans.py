"""Scale stress for the distributed k-means: 1M 16-dim vectors in 8
planted well-separated blobs (deterministic md5-derived offsets — no RNG
state on executors), fit with kmeans_fit, assert exact blob recovery.

Checks, all exact by construction:
  - every cluster's n_vecs equals one blob's planted population
  - each recovered centroid lies within the blob's noise radius of its
    planted center (noise amplitude 0.05 << center separation 1.0)
  - a second fit over a reshuffled copy produces the IDENTICAL centroid
    table (the quantized-arithmetic determinism contract at scale)

Run: PYTHONPATH=/root/repo python scripts/stress_kmeans.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_customer360_spark.operators.similarity import kmeans_fit  # noqa: E402
from bigdata_etl_customer360_spark.session import get_session  # noqa: E402

N = 1_000_000
DIM = 16
K = 8


def main():
    spark = get_session(app_name="stress-kmeans", master="local[32]")

    # blob b's center: 1.0 in dimension 2b, 0 elsewhere; noise is an
    # md5-derived uniform in [-0.05, 0.05] per (id, dim) — deterministic
    blob = F.col("id") % K
    comps = []
    for d in range(DIM):
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"km{d}x"), F.col("id").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("double")
            / F.lit(float(1 << 32))
            - F.lit(0.5)
        ) * F.lit(0.1)
        center = F.when(blob * 2 == d, F.lit(1.0)).otherwise(F.lit(0.0))
        comps.append(center + u)
    vecs = spark.range(N).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    ).repartition(64)

    t0 = time.time()
    fit1 = kmeans_fit(vecs, k=K, max_iterations=4).collect()
    dt = time.time() - t0
    by_cluster: dict[int, dict] = {}
    for r in fit1:
        c = by_cluster.setdefault(r["cluster"], {"n": r["n_vecs"], "cent": {}})
        c["cent"][r["dim"]] = r["centroid"]

    pops = sorted(c["n"] for c in by_cluster.values())
    assert pops == [N // K] * K, pops
    # every centroid is a valid blob center: exactly one dimension near 1.0
    # (within noise mean ~0), the rest near 0
    hot_dims = set()
    for c in by_cluster.values():
        hot = [d for d, v in c["cent"].items() if v > 0.5]
        assert len(hot) == 1, c["cent"]
        assert abs(c["cent"][hot[0]] - 1.0) < 0.05
        assert all(abs(v) < 0.05 for d, v in c["cent"].items() if d != hot[0])
        hot_dims.add(hot[0])
    assert hot_dims == {2 * b for b in range(K)}, hot_dims

    # determinism at scale: reshuffled input -> identical centroid table
    t0 = time.time()
    fit2 = kmeans_fit(vecs.repartition(17), k=K, max_iterations=4).collect()
    dt2 = time.time() - t0
    t1 = sorted(map(tuple, fit1))
    t2 = sorted(map(tuple, fit2))
    assert t1 == t2, "centroid tables differ across partitionings"

    print(json.dumps({
        "n_vectors": N, "dim": DIM, "k": K,
        "fit_sec": round(dt, 1), "refit_sec": round(dt2, 1),
        "blobs_recovered": len(hot_dims), "deterministic": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
