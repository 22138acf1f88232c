"""Stress k_core at sizes where the peel-cascade depth matters.

Construction gives an exact ground truth without an external library:
  - N disjoint K6 cliques      -> every clique node survives k=5 with
                                  in-core degree 5 (the 5-core is the
                                  cliques, exactly)
  - a long chain               -> peels COMPLETELY at k=2 only after
                                  ~len/2 rounds from both ends; at k=5
                                  it vanishes in round 1 (cheap)
  - a deep "onion": ring + chords
                               -> exercises multi-round cascades
  - a Zipf star hub            -> degree skew: the hub has deg 50k but
                                  is in NO 2-core (pendant leaves peel,
                                  then the hub) — the claim a plain
                                  degree filter gets wrong at any scale

Run: python scripts/stress_kcore.py
"""

import time

from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.graph import k_core
from bigdata_etl_customer360_spark.session import get_session


def main():
    spark = get_session(app_name="stress-kcore", master="local[32]")
    n_cliques = 50_000        # 50k * K6 = 300k nodes, 750k clique edges
    chain_len = 200_000
    star_deg = 50_000

    cliques = spark.range(n_cliques).select(
        F.explode(
            F.expr(
                "transform(flatten(transform(sequence(0, 4), i -> "
                "transform(sequence(i + 1, 5), j -> struct(i, j)))), "
                "p -> struct(id * 6 + p.i as src, id * 6 + p.j as dst))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    base = 10_000_000
    chain = spark.range(chain_len).select(
        (F.col("id") + base).alias("src"),
        (F.col("id") + base + 1).alias("dst"),
    )
    hub = 20_000_000
    star = spark.range(star_deg).select(
        F.lit(hub).alias("src"), (F.col("id") + hub + 1).alias("dst")
    )
    edges = cliques.unionAll(chain).unionAll(star)

    t0 = time.time()
    out = k_core(edges, 5, src="src", dst="dst")
    rows = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("degree").alias("dmin"),
        F.max("degree").alias("dmax"),
    ).collect()[0]
    dt = time.time() - t0
    expect = n_cliques * 6
    print(
        f"k=5 over {n_cliques} K6 + {chain_len}-chain + {star_deg}-star: "
        f"core nodes {rows['n']} (expect {expect}), degree "
        f"[{rows['dmin']},{rows['dmax']}] (expect [5,5]) in {dt:.1f}s"
    )
    assert rows["n"] == expect and rows["dmin"] == 5 and rows["dmax"] == 5

    # idempotence: the k-core of the k-core's edge set is itself
    core_nodes = out.select(F.col("id").alias("src"))
    core_edges = (
        edges.join(core_nodes, "src", "left_semi")
        .join(core_nodes.withColumnRenamed("src", "dst"), "dst", "left_semi")
    )
    again = k_core(core_edges, 5, src="src", dst="dst")
    assert again.count() == expect
    print("fixed-point idempotence holds")

    # the hub headline: degree >= 2 keeps the 50k-degree hub; the 2-core
    # does not (star peels in 2 rounds regardless of hub degree)
    t0 = time.time()
    star_core = k_core(star, 2, src="src", dst="dst").count()
    print(f"star-only 2-core: {star_core} nodes (expect 0) "
          f"in {time.time() - t0:.1f}s")
    assert star_core == 0
    spark.stop()


if __name__ == "__main__":
    main()
