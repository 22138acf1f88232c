"""Measure bloom_prefilter in its CLAIMED payoff regime (VERDICT r10
task 7b — the round-10 note only measured the BHJ-regime loss): a
semi-join against a dimension too FAT to broadcast (autoBroadcast off,
wide payload), where the plain plan must shuffle the whole fact side
into a sort-merge join while the prefilter ships only the m/32-long
word array and rejects non-member rows before the exchange.

Setup: 20M fact rows (int key + double + 200-char payload that SURVIVES
to the aggregate, so the plain plan must exchange it), 400k-member
dimension with its own 200-char payload (~90 MB — over the default
10 MB broadcast threshold), m = 2^22 (the collect cap; ~1% nominal fp
at n=400k, k=4; rides the 1-row broadcast path above _INLINE_BITS).

Three measurements, identical result row-counts asserted:
  A. plain semi-join, broadcast DISABLED (the honest SMJ baseline)
  B. bloom_prefilter + semi-join, broadcast DISABLED
  C. plain semi-join, broadcast allowed (the regime bloom should LOSE to)

Run: PYTHONPATH=/root/repo python scripts/stress_bloom_regime.py
"""

import json
import time
import urllib.request

from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.quality import (
    bloom_build,
    bloom_prefilter,
)
from bigdata_etl_customer360_spark.session import get_session

N_FACTS = 20_000_000
N_MEMBERS = 400_000
M_BITS = 1 << 22
K = 4


def _shuffle_write_bytes(spark) -> int:
    """UI-REST shuffle-write total (the measure_shuffle.py probe)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in stages
        if s.get("status") == "COMPLETE"
    )


def main():
    spark = get_session(
        app_name="stress-bloom-regime",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    facts = spark.range(N_FACTS).select(
        (F.col("id") % 20_000_000).alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
        F.concat(F.lit("p" * 192), F.col("id").cast("string")).alias("fpay"),
    )
    # members = multiples of 50 below 20M -> 400k keys, 2% of fact rows hit
    dim = spark.range(N_MEMBERS).select(
        (F.col("id") * 50).alias("k"),
        F.concat(F.lit("x" * 192), F.col("id").cast("string")).alias("payload"),
    )
    facts.write.mode("overwrite").parquet("/tmp/bloom_regime_facts")
    dim.write.mode("overwrite").parquet("/tmp/bloom_regime_dim")
    facts = spark.read.parquet("/tmp/bloom_regime_facts")
    dim = spark.read.parquet("/tmp/bloom_regime_dim")

    bloom = bloom_build(dim, "k", m_bits=M_BITS, k=K).cache()
    t0 = time.time()
    n_words = bloom.count()
    t_build = time.time() - t0

    def semi(fact_side):
        # the aggregate CONSUMES the fact payload, so column pruning
        # cannot drop it before the join exchange — the row width the
        # prefilter claims to save is real
        return (
            fact_side.join(dim.select("k"), on="k", how="left_semi")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(27,2)")).alias("s"),
                F.sum(F.length("fpay")).alias("w"),
            )
        )

    def run(label, df, conf):
        for key, val in conf.items():
            spark.conf.set(key, val)
        try:
            b0 = _shuffle_write_bytes(spark)
            t0 = time.time()
            row = df.collect()[0]
            dt = time.time() - t0
            mb = (_shuffle_write_bytes(spark) - b0) / 1e6
            print(
                f"{label}: {dt:.2f}s shuffle={mb:.1f}MB "
                f"n={row['n']} sum={row['s']} w={row['w']}",
                flush=True,
            )
            return dt, (row["n"], str(row["s"]), row["w"])
        finally:
            for key in conf:
                spark.conf.unset(key)

    no_bhj = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    t_a, r_a = run("A plain semi (SMJ regime)", semi(facts), no_bhj)
    pre = bloom_prefilter(facts, "k", bloom, m_bits=M_BITS, k=K)
    t_b, r_b = run("B bloom_prefilter + semi (SMJ regime)", semi(pre), no_bhj)
    t_c, r_c = run("C plain semi (BHJ allowed)", semi(facts), {})
    n_pass = bloom_prefilter(facts, "k", bloom, m_bits=M_BITS, k=K).count()
    true_n = r_a[0]

    assert r_a == r_b == r_c, "prefilter must be result-transparent"
    fp = (n_pass - true_n) / max(N_FACTS - true_n, 1)
    print(
        f"build {t_build:.2f}s ({n_words} words); prefilter passes "
        f"{n_pass} vs {true_n} true ({fp:.4%} fp over non-members)"
    )
    print(
        f"shuffle-regime speedup A/B = {t_a / t_b:.2f}x; "
        f"BHJ still wins B by {t_b / t_c:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
