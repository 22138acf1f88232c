"""Scale stress for semantic_dedup — SemDeDup keep-earliest over
sign-pattern buckets (graded as `semantic_dedup` at 2k vectors; this runs
500k, 250x the graded size).

Corpus: 500k seeded 64-dim float32 vectors; every 100th vector gets a
planted near-twin (id + 1_000_000, tiny noise, cosine ~ 0.9997) — 5,000
planted pairs. For each bucket_bits in {8, 10, 12}:

- wall time + survivor count;
- planted-twin recall: fraction of twins DROPPED (a twin is catchable
  only when the noise didn't flip any of the first-b sign bits — the
  documented SemDeDup boundary trade; sign flips need a dim near 0, so
  recall stays high and falls slowly with b);
- expected candidate-pair volume Σ|bucket|²/2 (the occupancy² law the
  IVF/BASELINE guidance uses): doubling bits quarters the pair volume.

At bucket_bits=10 the survivor set is verified EXACTLY against a numpy
replay of the same quantized-integer rule (floor(x*2^20+0.5) int64 dot /
double sqrt norms, keep iff no earlier same-bucket cosine >= t) — the
determinism contract holds at 500k, not just at oracle scale.

Run: python scripts/stress_semdedup.py   (one JSON line per setting).
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SEED = 17
N = 500_000
DIM = 64
TWIN_EVERY = 100
TWIN_OFF = 1_000_000
NOISE = 0.02
THRESHOLD = 0.95
QSCALE = float(1 << 20)


def build_corpus(path: str) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(SEED)
    V = rng.standard_normal((N, DIM)).astype("float32")
    ids = np.arange(N, dtype="int64")
    twin_src = ids[::TWIN_EVERY]
    twins = (
        V[twin_src] + rng.standard_normal((len(twin_src), DIM)).astype("float32") * NOISE
    ).astype("float32")
    all_ids = np.concatenate([ids, twin_src + TWIN_OFF])
    all_v = np.concatenate([V, twins])
    order = np.argsort(all_ids)
    all_ids, all_v = all_ids[order], all_v[order]
    tbl = pa.table(
        {
            "vec_id": pa.array(all_ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(all_v.reshape(-1), pa.float32()), DIM
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, path)
    return all_ids, all_v.astype("float64")


def np_semantic_dedup(ids: np.ndarray, V: np.ndarray, bits: int) -> set[int]:
    """Exact numpy replay of the operator's quantized rule."""
    Q = np.floor(V * QSCALE + 0.5).astype("int64")
    nsq = (Q * Q).sum(axis=1)
    powers = 1 << np.arange(bits - 1, -1, -1)
    bkt = ((V[:, :bits] >= 0).astype("int64") * powers).sum(axis=1)
    dropped: set[int] = set()
    for b in np.unique(bkt):
        sel = np.where(bkt == b)[0]
        sel = sel[np.argsort(ids[sel])]
        qs, ns, bi = Q[sel], nsq[sel], ids[sel]
        dots = qs @ qs.T
        denom = np.sqrt(ns.astype("float64"))
        cos = dots.astype("float64") / np.outer(denom, denom)
        for j in range(1, len(sel)):
            if (cos[j, :j] >= THRESHOLD).any():
                dropped.add(int(bi[j]))
    return dropped


def main() -> None:
    from pyspark.sql import SparkSession

    from bigdata_etl_customer360_spark.operators.similarity import semantic_dedup

    tmp = tempfile.mkdtemp(prefix="c360_semdedup_")
    path = f"{tmp}/vecs.parquet"
    ids, V = build_corpus(path)
    n_twins = len(range(0, N, TWIN_EVERY))

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(path)

    for bits in (8, 10, 12):
        powers = 1 << np.arange(bits - 1, -1, -1)
        bkt = ((V[:, :bits] >= 0).astype("int64") * powers).sum(axis=1)
        _, occ = np.unique(bkt, return_counts=True)
        pair_volume = int((occ.astype("int64") ** 2).sum() // 2)
        t0 = time.time()
        out = semantic_dedup(
            df, threshold=THRESHOLD, bucket_bits=bits, vec_col="embedding"
        ).select("vec_id")
        survivors = {int(r["vec_id"]) for r in out.collect()}
        dt = time.time() - t0
        twin_ids = set(range(TWIN_OFF, TWIN_OFF + N, TWIN_EVERY))
        caught = sum(1 for t in twin_ids if t not in survivors)
        rec = {
            "bucket_bits": bits,
            "vectors": int(len(ids)),
            "buckets_occupied": int(len(occ)),
            "mean_occupancy": round(float(occ.mean()), 1),
            "candidate_pairs": pair_volume,
            "sec": round(dt, 1),
            "survivors": len(survivors),
            "planted_twins": n_twins,
            "twin_recall": round(caught / n_twins, 4),
        }
        if bits == 10:
            dropped = np_semantic_dedup(ids, V, bits)
            want = {int(i) for i in ids} - dropped
            rec["exact_match_vs_numpy"] = survivors == want
        print(json.dumps(rec), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
