"""Scale evidence for the executor-side PQ/IVFPQ ADC LUT build (r14,
VERDICT r13 task 4): the per-query lookup tables used to be a bounded
DRIVER loop (collect the query frame, python-iterate the int64 matmuls,
createDataFrame the nested rows) — fine for the graded queries<<corpus
regime, but it capped the operator at what the driver could iterate and
serialize. The build is now an Arrow-batched pandas UDF over the query
frame, so the LUT cost distributes with the query partitioning and only
the broadcast of the FINISHED tables bounds the query side.

This stress drives the new path far past the old regime and pins both
halves of the claim:

1. EXACTNESS AT SCALE — ``cosine_topk_pq`` with ``rerank >= |corpus|``
   over QN_EXACT synthetic queries (deterministic per-index perturbations
   of the sf0.1 corpus) must equal a numpy replication of the family's
   quantized-cosine brute force, row for row (the pq_full_rerank
   invariant, re-proved at 500x the graded query count).
2. BUILD-PATH A/B — the LUT build alone (query collect + driver loop +
   createDataFrame + materialize vs the distributed UDF plan), timed at
   QN_WALL queries, plus the end-to-end wall of the full operator at
   that scale for both PQ and IVF×PQ. The driver loop's cost is pure
   driver CPU + py4j serialization and cannot parallelize; the UDF build
   rides the executor pool.

Run: PYTHONPATH=/root/repo python scripts/stress_pq_lut.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_customer360_spark.operators.similarity import (  # noqa: E402
    QUANT_SCALE,
    cosine_topk_ivfpq,
    cosine_topk_pq,
    pq_fit,
    pq_query_luts,
)
from bigdata_etl_customer360_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QN_EXACT = 5_000  # exactness tier: full-rerank == numpy brute
QN_WALL = 20_000  # wall tier: 10x the corpus, 2000x the graded frame
K = 5


def make_queries(spark, corpus, n):
    """n deterministic queries: corpus row (i % N) perturbed by a pure
    function of the query index — no RNG, rerun-stable."""
    n_corpus = corpus.count()
    reps = (n + n_corpus - 1) // n_corpus
    q = (
        corpus.select("vec_id", "embedding")
        .crossJoin(spark.range(reps).select(F.col("id").alias("_rep")))
        .withColumn("qid", F.col("vec_id") + F.col("_rep") * n_corpus)
        .filter(F.col("qid") < n)
        .select(
            F.col("qid").alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + ((F.col("qid") % 97) - 48).cast("float") / F.lit(1e4)
                + (i % 7).cast("float") / F.lit(1e5),
            ).alias("embedding"),
        )
    )
    return q


def numpy_quantized_topk(Q, C, qids, cids, k, exclude_self=True):
    """The family's exact quantized cosine, replicated: int64 quantize of
    the RAW vector (quantize_expr — cosine is scale-invariant, so the
    exact tier never normalizes) -> exact integer dots/norms -> one
    double division; ties (cosine desc, neighbor asc)."""
    Qq = np.floor(Q * float(QUANT_SCALE) + 0.5).astype("int64")
    Cq = np.floor(C * float(QUANT_SCALE) + 0.5).astype("int64")
    qn = (Qq * Qq).sum(axis=1).astype("float64")
    cn = (Cq * Cq).sum(axis=1).astype("float64")
    out = {}
    for i in range(len(Qq)):
        dots = (Cq @ Qq[i]).astype("float64")
        cos = dots / (np.sqrt(qn[i]) * np.sqrt(cn))
        order = sorted(range(len(cids)), key=lambda j: (-cos[j], cids[j]))
        picks = []
        for j in order:
            if exclude_self and cids[j] == qids[i]:
                continue
            picks.append((int(cids[j]), float(cos[j])))
            if len(picks) == k:
                break
        out[int(qids[i])] = picks
    return out


def main() -> None:
    spark = get_session("stress_pq_lut")
    corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    results: dict = {}

    # --- exactness tier -------------------------------------------------
    qx = make_queries(spark, corpus, QN_EXACT).localCheckpoint(eager=True)
    t0 = time.time()
    got = (
        cosine_topk_pq(
            qx, corpus, k=K, rerank=1_000_000, max_query_rows=1_000_000,
            exclude_self=True,
        )
        .collect()
    )
    t_exact = time.time() - t0
    got_map: dict = {}
    for r in got:
        got_map.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["cosine"])
        )
    for picks in got_map.values():  # collect order is arbitrary — rank it
        picks.sort(key=lambda p: (-p[1], p[0]))
    Q = np.stack([np.asarray(r["embedding"], dtype="float64") for r in qx.orderBy("vec_id").collect()])
    qids = np.arange(QN_EXACT)
    C_rows = corpus.orderBy("vec_id").collect()
    C = np.stack([np.asarray(r["embedding"], dtype="float64") for r in C_rows])
    cids = np.asarray([r["vec_id"] for r in C_rows])
    want = numpy_quantized_topk(Q, C, qids, cids, K)
    n_bad = 0
    for qid, picks in want.items():
        g = got_map.get(qid, [])
        if [p[0] for p in g] != [p[0] for p in picks] or any(
            abs(a[1] - b[1]) > 0 for a, b in zip(g, picks)
        ):
            n_bad += 1
    results["exact"] = {
        "queries": QN_EXACT,
        "mismatched_queries": n_bad,
        "wall_s": round(t_exact, 2),
    }
    assert n_bad == 0, f"{n_bad} queries diverge from numpy quantized brute"

    # --- wall tier: LUT build A/B + end-to-end --------------------------
    qw = make_queries(spark, corpus, QN_WALL).localCheckpoint(eager=True)
    _, qbook, _ = pq_fit(corpus)
    m, kc, sub = qbook.shape

    t0 = time.time()  # OLD path: driver loop (pre-r14), build+materialize
    q_rows = qw.select("vec_id", "embedding").collect()
    lut_rows = []
    for r in q_rows:
        v = np.asarray(r["embedding"], dtype="float64")
        v /= max(float(np.linalg.norm(v)), 1e-12)
        qv = np.floor(v * float(QUANT_SCALE) + 0.5).astype("int64")
        lut_rows.append(
            (
                r["vec_id"],
                [
                    [int(x) for x in (qbook[s] @ qv[s * sub : (s + 1) * sub])]
                    for s in range(m)
                ],
            )
        )
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    driver_luts = spark.createDataFrame(
        lut_rows,
        StructType(
            [
                StructField("query_id", qw.schema["vec_id"].dataType),
                StructField("_luts", ArrayType(ArrayType(LongType()))),
            ]
        ),
    )
    n_driver = driver_luts.count()
    t_driver = time.time() - t0

    t0 = time.time()  # NEW path: the same build as a distributed UDF plan
    n_udf = pq_query_luts(qw, qbook).count()
    t_udf = time.time() - t0
    assert n_udf == n_driver == QN_WALL

    t0 = time.time()  # NEW path: end-to-end operator at QN_WALL
    n_pq = cosine_topk_pq(
        qw, corpus, k=K, rerank=40, max_query_rows=1_000_000
    ).count()
    t_pq = time.time() - t0
    t0 = time.time()
    n_ivfpq = cosine_topk_ivfpq(
        qw, corpus, k=K, num_centroids=16, nprobe=4, rerank=40,
        max_query_rows=1_000_000,
    ).count()
    t_ivfpq = time.time() - t0
    results["wall"] = {
        "queries": QN_WALL,
        "driver_lut_build_s": round(t_driver, 2),
        "udf_lut_build_s": round(t_udf, 2),
        "driver_lut_rows": n_driver,
        "pq_end_to_end_s": round(t_pq, 2),
        "pq_rows": n_pq,
        "ivfpq_end_to_end_s": round(t_ivfpq, 2),
        "ivfpq_rows": n_ivfpq,
    }
    assert n_pq == QN_WALL * K and n_ivfpq == QN_WALL * K
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
