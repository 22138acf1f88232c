"""Macro-pipelines: the reference's two ETL programs re-expressed as
compositions of engine operators, generalized onto the driver's synthetic
tables (FIXTURES.md §B).

``user_profile``  ≙ profile_agg macro — ETL_customer_interaction.py:43-59
                    (per-customer engagement profile: pivoted totals,
                    active days, most-watched label, taste flags,
                    activeness bucket).
``behavior_trend`` ≙ most_search + trend_compare macros —
                    ETL_customer_behavior.py:10-15,196-201 (per-user
                    dominant item per period, period-over-period change).
``curate_corpus``  the LLM-pipeline counterpart: quality gate → exact
                    dedup → near-dup clustering → balanced sample, the
                    whole curation ladder as one composed plan.

The two reference macros run as ONE declarative plan: a single scan feeds
a single shuffle-by-key aggregation; all scalar labeling is codegen'd
projection on top. The reference instead pivoted per day before unioning
(30 shuffles) and round-tripped through driver pandas — neither survives
100 TB.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.functions.expressions import (
    argmax_label,
    bucketize_expr,
    flag_concat,
)
from bigdata_etl_customer360_spark.operators.relational import (
    map_dimension,
    pivot_agg,
    top_k_per_group,
    trend_compare,
)
from bigdata_etl_customer360_spark.operators.util import scoped_cache

# events.event_type → engagement class; 'error' is deliberately unmapped
# (dropped), mirroring the reference's Type=='Error' filter
# (ETL_customer_interaction.py:20).
DEFAULT_EVENT_CLASSES: Mapping[str, str] = {
    "click": "click",
    "view": "view",
    "purchase": "purchase",
    "signup": "signup",
}
# Argmax tie priority (fixed order, mirrors the when-chain priority at
# ETL_customer_interaction.py:25-31).
DEFAULT_CLASS_PRIORITY: Sequence[str] = ("purchase", "view", "click", "signup")


def user_profile(
    events: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    classes: Mapping[str, str] = DEFAULT_EVENT_CLASSES,
    priority: Sequence[str] = DEFAULT_CLASS_PRIORITY,
    active_boundaries: Sequence[int] = (10, 21),
    active_labels: Sequence[str] = ("Low", "Medium", "High"),
) -> DataFrame:
    """Per-user engagement profile (flagship; profile_agg macro).

    Output: key, total_<class>... (exact-decimal sums of value), active_days
    (exact distinct days), most_engaged (argmax w/ pinned tie priority),
    engagement_mix (dash-joined nonzero classes), activeness (bucket).

    Activeness boundary semantics pin the reference's mixed-closure rule
    (>20 High, 10<=x<=20 Medium, else Low — ETL_customer_interaction.py:54-57)
    via integer half-open buckets [<10, <21, rest).
    """
    class_values = list(dict.fromkeys(classes.values()))
    total_cols = [f"total_{v}" for v in class_values]

    mapped = map_dimension(events, type_col, dict(classes), out_col="_class", drop_unmapped=True)
    # one shuffle: pivoted exact sums + distinct-day count ride the same
    # groupBy (conditional aggregation keeps it an ordinary hash agg).
    day = F.to_date(F.col(ts_col))
    agg_exprs = [
        F.coalesce(
            F.sum(F.when(F.col("_class") == v, F.col(value_col)).cast("decimal(27,2)")).cast(
                "double"
            ),
            F.lit(0.0),
        ).alias(f"total_{v}")
        for v in class_values
    ] + [F.countDistinct(day).alias("active_days")]
    profile = mapped.groupBy(F.col(key)).agg(*agg_exprs)

    prio_cols = [f"total_{p}" for p in priority]
    return (
        profile.withColumn("most_engaged", argmax_label(prio_cols, list(priority)))
        .withColumn("engagement_mix", flag_concat(total_cols, class_values))
        .withColumn(
            "activeness",
            bucketize_expr("active_days", list(active_boundaries), list(active_labels), right_closed=False),
        )
    )


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    sample_n: int = 20,
    min_tokens: int = 20,
    max_stopword_ratio: float = 0.35,
    min_distinct_ratio: float = 0.5,
    jaccard_threshold: float = 0.3,
    pairs_fn: Callable[[DataFrame], DataFrame] | None = None,
    checkpoint_dir: str | None = None,
    benchmark: DataFrame | None = None,
    decontaminate_min_overlap: int = 5,
    boilerplate_min_docs: int | None = None,
    max_top_ngram_pct: int | None = None,
) -> DataFrame:
    """End-to-end corpus curation — the full training-data ladder in one
    macro, each stage an engine operator:

      strip_boilerplate_lines  (only when ``boilerplate_min_docs`` is
                             given) remove corpus-wide repeated lines
                             BEFORE quality gating, so a shared footer
                             neither inflates token counts nor glues
                             unrelated docs into near-dup pairs
      → filter_corpus        quality gate (Gopher-shaped rules)
      → repetition gate      (only when ``max_top_ngram_pct`` is given)
                             drop docs whose top bigram covers more than
                             that percentage of all bigrams
                             (repeated_ngram_stats, integer compare)
      → decontaminate        (only when ``benchmark`` is given) drop docs
                             overlapping the eval set by
                             ``decontaminate_min_overlap`` shingles
      → dedup_exact          one row per normalized text (hash agg)
      → near-dup pairs       ngram-Jaccard by default; pass ``pairs_fn``
                             (e.g. a minhash_lsh_pairs closure) for the
                             100 TB probabilistic tier — the rest of the
                             ladder is tier-agnostic
      → keep_cluster_canonical  pairs → connected components → one
                             canonical doc per duplicate cluster
      → sample_n_per_group   deterministic balanced sample per stratum

    Every stage is deterministic (pinned tie-breaks, content-derived
    hashes), so the curated corpus is reproducible across runs, engines,
    and partitionings — with the default exact pair tier the whole
    pipeline is SQL-expressible and oracle-checked (`curate_corpus`
    graded query). Scale shape: two hash aggs + one inverted-index join
    + O(log n) CC rounds + one stratum shuffle; nothing all-pairs,
    nothing driver-side.
    """
    from bigdata_etl_customer360_spark.operators.dedup import (
        dedup_exact,
        ngram_jaccard_pairs,
    )
    from bigdata_etl_customer360_spark.operators.graph import keep_cluster_canonical
    from bigdata_etl_customer360_spark.operators.sampling import sample_n_per_group
    from bigdata_etl_customer360_spark.operators.textstats import filter_corpus

    if boilerplate_min_docs is not None:
        from bigdata_etl_customer360_spark.operators.curation import (
            strip_boilerplate_lines,
        )

        docs = strip_boilerplate_lines(
            docs, id_col=id_col, text_col=text_col, min_docs=boilerplate_min_docs
        ).drop(text_col, "n_removed").withColumnRenamed("cleaned", text_col)
    filtered = filter_corpus(
        docs,
        text_col,
        min_tokens=min_tokens,
        max_stopword_ratio=max_stopword_ratio,
        min_distinct_ratio=min_distinct_ratio,
    )
    if max_top_ngram_pct is not None:
        from bigdata_etl_customer360_spark.operators.curation import (
            repeated_ngram_stats,
        )
        from pyspark.sql import functions as F

        rep = repeated_ngram_stats(filtered, id_col=id_col, text_col=text_col)
        ok = rep.filter(
            F.col("top_ngram_count") * 100
            <= F.lit(max_top_ngram_pct) * F.col("total_ngrams")
        ).select(id_col)
        filtered = filtered.join(ok, id_col, "semi")
    if benchmark is not None:
        from bigdata_etl_customer360_spark.operators.curation import decontaminate

        filtered = decontaminate(
            filtered,
            benchmark,
            id_col=id_col,
            text_col=text_col,
            min_overlap=decontaminate_min_overlap,
        )
    unique = dedup_exact(filtered, text_col, id_col)
    # the near-dup self-join consumes `unique` on both sides AND the
    # canonical keep joins back against it — materialize once instead of
    # re-running the gate + hash agg per consumer.
    unique = scoped_cache(unique)
    pairs = (
        pairs_fn(unique)
        if pairs_fn is not None
        else ngram_jaccard_pairs(unique, id_col, text_col, threshold=jaccard_threshold)
    )
    canonical = keep_cluster_canonical(
        unique, pairs, id_col, checkpoint_dir=checkpoint_dir
    )
    return sample_n_per_group(canonical, group_col, sample_n, id_col)


def behavior_trend(
    events: DataFrame,
    key: str = "user_id",
    item_col: str = "event_type",
    ts_col: str = "ts",
    split_ts: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Dominant item per user, early vs late period, with change labels
    (most_search + trend_compare macros).

    The period split defaults to the midpoint of the observed time range
    (computed as one tiny agg broadcast into the plan) so the pipeline is
    self-contained at any scale factor; pass ``split_ts`` to pin it.
    Top-1 tie-break is deterministic: (count desc, item asc) — the
    reference left ties to chance (ETL_customer_behavior.py:13).
    """
    if split_ts is None:
        # midpoint in exact epoch MICROSECONDS — integer arithmetic end to
        # end, so the boundary is timezone-free and bit-stable (DuckDB
        # oracle mirrors it with epoch_us()).
        bounds = events.select(
            F.timestamp_micros(
                ((F.unix_micros(F.min(ts_col)) + F.unix_micros(F.max(ts_col))) / 2)
                .cast("long")
            ).alias("_split")
        )
        with_split = events.crossJoin(F.broadcast(bounds))
    else:
        with_split = events.withColumn("_split", F.to_timestamp(F.lit(split_ts)))

    # ONE scan: tag each event with its period, count per
    # (key, period, item), rank within (key, period) — instead of
    # filtering the source twice (2 scans + 2 count shuffles).
    period = F.when(F.col(ts_col) < F.col("_split"), F.lit("early")).otherwise(
        F.lit("late")
    )
    counted = (
        with_split.withColumn("_period", period)
        .groupBy(key, "_period", item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = top_k_per_group(
        counted,
        [key, "_period"],
        [F.col("cnt").desc(), F.col(item_col).asc()],
        k=1,
    )
    top = scoped_cache(
        top.select(F.col(key), F.col("_period"), F.col(item_col).alias("dominant"))
    )
    # cached: ≤2 rows per key, consumed by both period branches below —
    # without the boundary each branch re-runs the scan+count+rank.

    early = top.filter(F.col("_period") == "early").drop("_period")
    late = top.filter(F.col("_period") == "late").drop("_period")
    return trend_compare(
        early,
        late,
        key=key,
        value_col="dominant",
        left_suffix="_early",
        right_suffix="_late",
        how=how,
    )
