"""Graph operators for dedup pipelines: connected components over a
pair list.

Near-dup detection (ngram/minhash/simhash/embedding tiers in
``operators/dedup.py``) emits PAIRS, but corpus curation needs GROUPS:
"these 7 docs are one duplicate cluster — keep one canonical member".
The bridge is connected components over the pair graph.

``connected_components`` is iterative min-label propagation with
pointer-jumping compression, all DataFrame joins/aggregations:

- round k: every node takes the min label over itself + its neighbors
  (one shuffle on node id), then labels are compressed one hop
  (``label = label(label)``, a self-join) — the pointer-jumping step
  that collapses long chains in O(log n) rounds instead of O(diameter).
- each round materializes via ``localCheckpoint`` so the plan does not
  grow with the iteration count (a k-round lineage would re-run every
  prior join per action); convergence is one tiny SUM aggregate on the
  materialized frame — labels only decrease, so a non-falling label sum
  means a fixed point (no old-vs-new join needed).

Scale shape: per round, shuffle volume is O(|edges| + |nodes|) keyed on
node id — never all-pairs, no driver-side graph. Duplicate-cluster
graphs are near-cliques (diameter ~2-3), so 2-3 rounds is typical; the
compression step bounds pathological chain graphs at O(log n) rounds.
This is the DataFrame re-expression of the alternating-star MapReduce
algorithm family (Kiveris et al., "Connected Components in MapReduce
and Beyond").

Unlike the pure lazy operators, this runs its own Spark jobs (the
convergence loop needs actions); the result is a materialized
(localCheckpointed) frame, so intermediate caches are released before
returning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_id: str = "id",
    out_component: str = "component",
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
    round_log: list[int] | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the SMALLEST node id in the node's connected
    component — deterministic regardless of partitioning or edge order.

    Nodes not present in ``edges`` (singletons) are absent from the
    output; callers attach them with a left join + coalesce(own id).

    ``checkpoint_dir``: when set, per-round materialization uses RELIABLE
    checkpoints written under this path (``sc.setCheckpointDir``) instead
    of ``localCheckpoint``. localCheckpoint stores blocks on executors —
    losing one executor mid-loop kills the job on a real cluster; point
    this at durable storage (HDFS/S3) for production runs. Local mode and
    tests keep the default (no executor loss, no write amplification).

    ``round_log``: pass a list to receive the per-round label-sum
    decrease (observability for scale runs; len(round_log) == rounds run,
    0 in the final converged round). Labels only ever DECREASE under the
    min-update rule, so "sum of labels stopped falling" ⟺ "no label
    changed" — which is why convergence costs one tiny aggregate per
    round instead of an old-vs-new join.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        _ckpt = lambda df: df.checkpoint(eager=True)
    else:
        _ckpt = lambda df: df.localCheckpoint()

    # undirected: materialize both directions once; distinct so repeated
    # pairs (multi-tier dedup often re-finds the same pair) don't inflate
    # every round's message volume. Cached — consumed once per round.
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")).filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    )
    sym = e.union(e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))).filter(
        F.col("_u") != F.col("_v")
    ).distinct().cache()

    # label init: min over self + direct neighbors (both directions are in
    # sym, so every node appears as _u). Invariant from here on:
    # lbl(n) <= n and lbl(n) is in n's component.
    lab = _ckpt(
        sym.groupBy(F.col("_u").alias("id"))
        .agg(F.least(F.min("_u"), F.min("_v")).alias("lbl"))
    )

    # decimal(38,0): node ids are arbitrary longs — a long sum could wrap
    # silently and fake (or miss) convergence
    def _lblsum(frame: DataFrame) -> int:
        return int(
            frame.agg(F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s"))
            .collect()[0]["s"]
            or 0
        )

    prev_sum = _lblsum(lab)
    for _ in range(max_iterations):
        # propagate: each node offers its label to every neighbor
        msgs = sym.join(lab, sym["_u"] == lab["id"]).select(
            F.col("_v").alias("id"), F.col("lbl")
        )
        cand = (
            lab.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
        )
        # pointer jump: label(label) — every label IS a node id (invariant),
        # so the inner join preserves all rows; the parent's label is <= the
        # child's by the min-only update rule.
        parent = cand.select(F.col("id").alias("_pid"), F.col("lbl").alias("_plbl"))
        new_lab = _ckpt(
            cand.join(parent, cand["lbl"] == parent["_pid"])
            .select("id", F.col("_plbl").alias("lbl"))
        )
        new_sum = _lblsum(new_lab)
        delta = prev_sum - new_sum
        lab.unpersist()
        lab = new_lab
        prev_sum = new_sum
        if round_log is not None:
            round_log.append(delta)
        if delta == 0:
            break

    sym.unpersist()
    return lab.select(F.col("id").alias(out_id), F.col("lbl").alias(out_component))


def keep_cluster_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drop every near-duplicate except one canonical row per cluster:
    connected components over ``pairs``, keep rows whose id IS the
    component min (singletons — rows in ``df`` touching no pair — are
    their own component and always survive). The standard last stage of
    the dedup ladder: pairs -> clusters -> one kept doc per cluster."""
    comp = connected_components(
        pairs, src, dst, out_id=id_col, out_component="_component",
        checkpoint_dir=checkpoint_dir,
    )
    return (
        df.join(comp, id_col, "left")
        .filter(F.coalesce(F.col("_component"), F.col(id_col)) == F.col(id_col))
        .drop("_component")
    )
