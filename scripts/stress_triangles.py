"""Stress count_triangles at graph sizes where the wedge bound matters.

Construction gives an exact ground truth without an external library:
  - N disjoint K8 cliques  -> N * C(8,3) = 56N triangles
  - a long chain           -> 0 triangles (worst case for path joins)
  - one Zipf star hub      -> 0 triangles but extreme degree skew; the
    degree orientation must keep the hub's OUT-degree small (every
    star edge orients AWAY from leaves only if the hub ranks higher —
    it does, by degree), so the wedge join never pairs the hub's
    neighbors quadratically.

Run: python scripts/stress_triangles.py
"""

import time

from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.graph import count_triangles
from bigdata_etl_customer360_spark.session import get_session


def main():
    spark = get_session(app_name="stress-triangles", master="local[32]")
    n_cliques = 25_000          # 25k * K8 = 200k nodes, 700k clique edges
    chain_len = 100_000
    star_deg = 50_000

    cliques = spark.range(n_cliques).select(
        F.explode(
            F.expr(
                "transform(flatten(transform(sequence(0, 6), i -> "
                "transform(sequence(i + 1, 7), j -> struct(i, j)))), "
                "p -> struct(id * 8 + p.i as src, id * 8 + p.j as dst))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    base = 10_000_000
    chain = spark.range(chain_len).select(
        (F.col("id") + base).alias("src"), (F.col("id") + base + 1).alias("dst")
    )
    hub = 20_000_000
    star = spark.range(star_deg).select(
        F.lit(hub).alias("src"), (F.col("id") + hub + 1).alias("dst")
    )
    edges = cliques.unionAll(chain).unionAll(star)

    t0 = time.time()
    row = count_triangles(edges).collect()[0]
    dt = time.time() - t0
    expected = 56 * n_cliques
    print(
        f"nodes={row['n_nodes']} edges={row['n_edges']} "
        f"triangles={row['n_triangles']} expected={expected} "
        f"ok={row['n_triangles'] == expected} sec={dt:.1f}"
    )
    assert row["n_triangles"] == expected
    spark.stop()


if __name__ == "__main__":
    main()
