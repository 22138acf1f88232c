"""Core relational operators (SURVEY §2.2-2.7, §2.11 macro-operators).

Each is a pure ``DataFrame -> DataFrame`` function built from declarative
DataFrame ops so Catalyst gets the whole plan: predicate pushdown, column
pruning, partial aggregation, AQE join selection all apply. Scale notes per
operator explain why the chosen plan survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.functions.expressions import bucketize_expr, case_map


def map_dimension(
    df: DataFrame,
    col: str,
    mapping: Mapping[str, str],
    out_col: str | None = None,
    drop_unmapped: bool = False,
    default: str | None = None,
) -> DataFrame:
    """Dimension mapping via generated CASE (E1+P3, dimension_map macro).

    Reference: AppName → content type + drop of unmapped 'Error' rows
    (ETL_customer_interaction.py:9-21). Zero-shuffle: the CASE is a
    codegen'd projection; the unmapped filter pushes down to the scan.
    """
    out_col = out_col or col
    mapped = df.withColumn(out_col, case_map(col, mapping, default=default))
    if drop_unmapped:
        mapped = mapped.filter(F.col(out_col).isNotNull())
    return mapped


def map_dimension_join(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_key: str,
    dim_value: str,
    out_col: str,
    drop_unmapped: bool = False,
) -> DataFrame:
    """Dimension mapping via broadcast join — the scale path for large
    dimensions (a CASE with 100k branches would blow up codegen).

    ``broadcast(dim)`` keeps it shuffle-free on the fact side.
    """
    joined = df.join(
        F.broadcast(dim.select(F.col(dim_key), F.col(dim_value).alias(out_col))),
        on=df[col] == dim[dim_key],
        how="inner" if drop_unmapped else "left",
    ).drop(dim_key)
    return joined


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    value_col: str,
    agg: str = "sum",
    fill: float | int | None = 0,
    prefix: str = "",
    exact_decimal_scale: int | None = None,
) -> DataFrame:
    """Pivot-aggregate with PINNED pivot values (A4+A5, daily_pivot macro).

    Reference: groupBy(Contract).pivot(Type).sum(TotalDuration).fillna(0)
    (ETL_customer_interaction.py:69). Pinning ``pivot_values`` kills the
    eager distinct-values job and makes the output schema deterministic —
    at 100 TB an unpinned pivot is a full extra scan. Implemented as
    conditional aggregation (sum(CASE WHEN pivot=v THEN x END)) rather than
    Spark's pivot() so the plan is a single ordinary partial+final hash
    aggregate — one shuffle, map-side combine.

    ``exact_decimal_scale`` routes float sums through exact decimal
    arithmetic (order-independent; see functions.exact_sum).
    """
    def _agg_for(v: str) -> Column:
        matched = F.when(F.col(pivot_col) == v, F.col(value_col))
        if exact_decimal_scale is not None and agg == "sum":
            out = F.sum(matched.cast(f"decimal(27,{exact_decimal_scale})")).cast("double")
        else:
            out = getattr(F, agg)(matched)
        if fill is not None:
            out = F.coalesce(out, F.lit(fill))
        return out.alias(f"{prefix}{v}")

    return df.groupBy(*[F.col(k) for k in keys]).agg(*[_agg_for(v) for v in pivot_values])


def multi_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Grouped multi-aggregate (A2+A3). Thin declarative wrapper: Catalyst
    plans a two-phase hash aggregate (map-side partial + reduce-side final)
    — one shuffle regardless of how many aggregates ride along."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group with a DETERMINISTIC total order (W1+P4,
    most_search macro).

    Reference: row_number over (user_id, count desc) + filter rank==1
    (ETL_customer_behavior.py:13-14) — ties nondeterministic there; callers
    here must pass a tie-breaking suffix in ``order_by`` (tests enforce it).
    Window+filter shuffles once on the group key; with AQE, skewed groups
    get split. The redundant global orderBy the reference does first
    (ETL_customer_behavior.py:12) is intentionally absent.
    """
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def union_by_name(frames: Sequence[DataFrame], allow_missing: bool = True) -> DataFrame:
    """Schema-aligned union (U2). The reference folds per-day frames with
    positional union / unionByName in a Python loop
    (ETL_customer_behavior.py:170-181, ETL_customer_interaction.py:92);
    position-based union silently mis-aligns reordered columns, so
    by-name is the engine default."""
    if not frames:
        raise ValueError("union of zero frames")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=allow_missing)
    return out


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE-shaped snapshot upsert as a pure frame transform: every key
    present in ``updates`` takes the update row (matched → replace), keys
    absent from ``updates`` carry the target row through (not matched by
    source → keep), and update keys absent from ``target`` are inserts.
    ``updates`` must be unique per key (enforce upstream — e.g.
    ``top_k_per_group`` k=1 for latest-wins) and share the target's
    columns by name.

    Plan: one left-anti join of target against the distinct update keys +
    a by-name union — the core of an idempotent daily snapshot rebuild
    (re-running with the same updates is a no-op by construction). At
    scale the anti-join shuffles both sides on the key unless the target
    is bucketed by it (``sources/bucketed.py``), which drops the
    target-side exchange; the union is shuffle-free."""
    upd = updates.select(*target.columns)
    kept = target.join(upd.select(*keys).distinct(), on=list(keys), how="left_anti")
    return kept.unionByName(upd)


def bucketize(
    df: DataFrame,
    col: str,
    boundaries: Sequence[float],
    labels: Sequence[str],
    out_col: str,
    right_closed: bool = True,
) -> DataFrame:
    """Range bucketing (E5) as an operator."""
    return df.withColumn(out_col, bucketize_expr(col, boundaries, labels, right_closed))


def trend_compare(
    left: DataFrame,
    right: DataFrame,
    key: str,
    value_col: str,
    left_suffix: str = "_t1",
    right_suffix: str = "_t2",
    how: str = "inner",
    trend_col: str = "trending_type",
    change_col: str = "value_change",
) -> DataFrame:
    """Period-over-period comparison (J1+E6+E7, trend_compare macro).

    Reference: June⋈July on user_id, Unchanged/Changed flag + transition
    label (ETL_customer_behavior.py:196-201). ``how`` exposes left/full for
    the keep-single-period-users variant the reference silently drops.
    Join strategy is Catalyst's: broadcast when one side is small, else
    sort-merge on the key; AQE converts to broadcast at runtime if a
    filter shrank a side.
    """
    lv, rv = value_col + left_suffix, value_col + right_suffix
    l = left.select(F.col(key), F.col(value_col).alias(lv))
    r = right.select(F.col(key), F.col(value_col).alias(rv))
    joined = l.join(r, on=key, how=how)
    same = F.col(lv) == F.col(rv)
    return joined.withColumn(
        trend_col, F.when(same, F.lit("Unchanged")).otherwise(F.lit("Changed"))
    ).withColumn(
        change_col,
        F.when(same, F.lit("Unchanged")).otherwise(F.concat_ws("-", F.col(lv), F.col(rv))),
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
    salt_on: str | None = None,
) -> DataFrame:
    """Equi-join resilient to heavy key skew: the skewed side gets a
    salt in [0, salt_buckets); the small side is replicated
    salt_buckets× with every salt value; the join runs on (key, salt), so
    one hot key spreads over salt_buckets reducers instead of one.

    Results are identical to ``skewed.join(small, key, how)`` — the salt
    never reaches the output. AQE's skew-join split handles moderate skew
    on its own; explicit salting is for the pathological single-key case
    (one user/null-key with a double-digit share of rows). Cost: the
    small side shuffles salt_buckets× its size — keep it the dimension.

    ``salt_on``: name of a (unique-ish) column to derive the salt from
    deterministically (``pmod(xxhash64(col, seed), buckets)``) — stable
    under task retry and re-runs. Default (None) uses ``rand(seed)``:
    rand re-draws when a failed task re-executes, so a retried partition
    can land rows in different buckets. The JOIN OUTPUT is identical
    either way (the salt only routes rows); prefer ``salt_on`` whenever a
    row-unique column exists so even intermediate shuffle placement is
    reproducible.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (skewed side preserved)")
    if salt_on is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_on), F.lit(seed)), F.lit(salt_buckets))
        salted = skewed.withColumn("_salt", salt.cast("int"))
    else:
        salted = skewed.withColumn("_salt", (F.rand(seed) * salt_buckets).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted.join(replicated, on=[key, "_salt"], how=how).drop("_salt")


def choose_join_strategy(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    broadcast_max_rows: int = 1_000_000,
    skew_share_bp: int = 100,
) -> tuple[str, dict]:
    """MEASURED join-strategy decision (the skew autopilot's brain):

      1. ``dim`` small enough (row count <= ``broadcast_max_rows``) ->
         ``"broadcast"`` — no fact shuffle at all, skew irrelevant.
      2. else profile the fact key (:func:`~...quality.skew_profile`
         top-1): heaviest key holding >= ``skew_share_bp`` basis points
         of fact rows -> ``"salted"`` — the pathological single-key case
         AQE's skew split mitigates but one hot key can still dominate.
      3. else ``"plain"`` — Catalyst/AQE handle moderate skew fine.

    The rule is deterministic in the measurements (exact integer counts
    and basis points — no sampling, no floats), so the same data always
    picks the same plan. Returns ``(strategy, stats)`` with the measured
    evidence (``n_dim``, ``top_share_bp``) for audit/logging.

    Like the graph operators, this runs its own (bounded) Spark jobs: a
    count on the DIM side and, only when the dim is too big to
    broadcast, ONE collapsed hash aggregate over the fact (|distinct
    keys| intermediate, top-1 collected). At 100 TB you'd persist the
    profile of a hot fact table and feed it back in; the measured rule
    is the same either way.
    """
    n_dim = dim.count()
    stats: dict = {"n_dim": n_dim, "top_share_bp": None}
    if n_dim <= int(broadcast_max_rows):
        return "broadcast", stats
    from bigdata_etl_customer360_spark.operators.quality import skew_profile

    top = skew_profile(fact, [key], top_k=1).collect()
    share = int(top[0]["share_bp"]) if top else 0
    stats["top_share_bp"] = share
    if share >= int(skew_share_bp):
        return "salted", stats
    return "plain", stats


def adaptive_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    broadcast_max_rows: int = 1_000_000,
    skew_share_bp: int = 100,
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Skew-aware equi-join autopilot: measure, then pick broadcast /
    salted / plain via :func:`choose_join_strategy`. The RESULT is
    identical to ``fact.join(dim, key, how)`` on every path (broadcast is
    a hint; the salt never escapes :func:`salted_join`) — only the
    physical strategy changes, which is what the parity oracle on the
    graded query certifies.
    """
    strategy, _stats = choose_join_strategy(
        fact, dim, key, broadcast_max_rows, skew_share_bp
    )
    if strategy == "broadcast":
        return fact.join(F.broadcast(dim), on=key, how=how)
    if strategy == "salted":
        return salted_join(
            fact, dim, key, how=how, salt_buckets=salt_buckets, salt_on=salt_on
        )
    return fact.join(dim, on=key, how=how)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    change_col: str = "change",
    changed_cols_col: str = "changed_cols",
) -> DataFrame:
    """Diff two snapshots of a keyed table — the CDC-generation /
    dataset-regression primitive: which keys were ``added``, ``removed``,
    or ``changed`` (and WHICH columns changed), with unchanged rows
    dropped.

    Comparison is null-safe (``<=>``): NULL -> value and value -> NULL
    both count as a change, NULL -> NULL does not. ``changed_cols`` is
    the comma-joined sorted list of differing column names (empty for
    added/removed — the whole row appeared/vanished).

    Plan: ONE full-outer hash join on the keys + a codegen projection;
    output ~ |changed keys|, never the table. The big-snapshot diff at
    100 TB is exactly this shape — co-partition or bucket both snapshots
    on the keys and the join needs no extra exchange.
    """
    kcols = list(keys)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in old.columns if c not in kcols
    ]
    o = old.select(
        *[F.col(k).alias(k) for k in kcols],
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in kcols],
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = o.join(n, on=kcols, how="full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in sorted(cols)
            ]
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    return (
        j.withColumn(change_col, change)
        .filter(F.col(change_col).isNotNull())
        .select(
            *kcols,
            change_col,
            F.when(
                F.col(change_col) == "changed", F.array_join(diffs, ",")
            ).otherwise(F.lit("")).alias(changed_cols_col),
        )
    )


def assign_row_ids(
    df: DataFrame,
    order_by: Sequence[str],
    out_col: str = "row_id",
    start: int = 1,
) -> DataFrame:
    """Dense global row ids in a pinned total order — the
    zipWithIndex/sequence-number primitive (stable example ids, sharded
    file manifests, reproducible pagination) WITHOUT the naive plan's
    fatal flaw: ``row_number() OVER (ORDER BY ...)`` is an empty-frame
    window that funnels the whole table through ONE reducer.

    Scale shape (the distributed prefix-sum pattern shared with keyless
    ``interval_concurrency``): range-partition on the order keys [the
    only shuffle], per-partition ``row_number`` [local sort within each
    range], then per-partition COUNTS (a |partitions|-row driver collect,
    bounded like pagerank's convergence sums) become broadcast offsets
    added map-side. Result identical to the single-reducer form for any
    total order.

    ``order_by`` must be a TOTAL order (unique key combination) or ids
    within a tie group depend on partition placement — pass a tiebreaker
    column (ids, hashes) last, same rule as every pinned sort here.
    """
    keys = [F.col(c) for c in order_by]
    if not keys:
        raise ValueError("assign_row_ids needs at least one order column")
    from bigdata_etl_customer360_spark.operators.util import range_prefix_offsets

    binned, off_expr, _ = range_prefix_offsets(df, keys, F.count(F.lit(1)))
    w = Window.partitionBy("_pid").orderBy(*[k.asc() for k in keys])
    return binned.select(
        *df.columns,
        (F.row_number().over(w) - F.lit(1) + off_expr + F.lit(int(start)))
        .cast("long")
        .alias(out_col),
    )


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    minimize_y: bool = True,
) -> DataFrame:
    """2-D Pareto frontier (skyline): the rows no other row dominates,
    where "a dominates b" means a is <= b on both criteria and strictly
    better on at least one (after orienting each axis by its
    ``minimize_*`` flag). The multi-criteria "best offers" operator —
    cheapest-AND-earliest orders, cost-vs-latency suppliers — that no
    single ORDER BY can express. Ties are kept: two identical points do
    not dominate each other, so duplicate frontier points all survive.

    Plan (no UDF, no self-join, never all-pairs):

    1. group by x -> per-group best y (one hash aggregate);
    2. over the grouped frame, ordered by oriented x, the running best y
       over STRICTLY smaller x (``ROWS .. 1 PRECEDING`` — rows are
       distinct in x after the grouping, so the frame IS the strict
       predecessor set; one single-partition window over |distinct x|
       rows, the bounded-domain exception to the no-global-window rule —
       a frontier input is an aggregate, not a fact table);
    3. an x-group survives iff its best y strictly beats every
       predecessor's best (a predecessor with equal best-y and smaller x
       dominates); surviving groups join back (broadcast — the frontier
       candidate set is tiny) to recover the original rows with
       y == the group best.

    Exactness: pure comparisons on original values — no floats are
    created, so any orderable numeric column works. Rows with NULL in
    either criterion are excluded (incomparable). Output: the input
    rows (all columns) that lie on the frontier.
    """
    sx = F.col(x_col) if minimize_x else -F.col(x_col)
    best_y = F.min(y_col) if minimize_y else F.max(y_col)
    clean = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    groups = clean.groupBy(x_col).agg(best_y.alias("_by"))
    w = Window.orderBy(sx).rowsBetween(Window.unboundedPreceding, -1)
    prior = (F.min("_by") if minimize_y else F.max("_by")).over(w)
    beats = (
        F.col("_by") < F.col("_prior")
        if minimize_y
        else F.col("_by") > F.col("_prior")
    )
    survivors = (
        groups.withColumn("_prior", prior)
        .filter(F.col("_prior").isNull() | beats)
        .select(x_col, "_by")
    )
    return clean.join(
        F.broadcast(survivors),
        (clean[x_col] == survivors[x_col]) & (clean[y_col] == survivors["_by"]),
        "left_semi",
    )


def take_until_share(
    df: DataFrame,
    keys: Sequence[str],
    weight_col: str,
    order_col: str,
    share_num: int = 9,
    share_den: int = 10,
    scale: int = 2,
) -> DataFrame:
    """Per-group nucleus selection: order each group's rows by weight
    (heaviest first, ``order_col`` breaking ties) and keep the SHORTEST
    prefix whose weight reaches ``share_num/share_den`` of the group
    total — "the domains that cover 90% of traffic", "the customers
    behind 3/4 of revenue": the coverage cut a fixed top-k cannot
    express (skewed groups need 3 rows, flat groups need 300).

    A row survives iff the cumulative weight BEFORE it is still short of
    the target: ``prev_cum * den < total * num`` — evaluated entirely in
    exact DECIMAL/integer arithmetic (weights cast to
    DECIMAL(18, scale); no float ever enters the decision), so the cut
    is deterministic and engine-exact. The first row of every non-empty
    group always survives (prev_cum = 0); rows with NULL weight are
    excluded.

    Plan: ONE shuffle on ``keys`` shared by the running-sum window and
    the group-total window (same partitioning — Catalyst reuses the
    exchange); no joins, no UDFs. Output: the surviving input rows.
    """
    dec_in = f"decimal(18,{scale})"
    w = F.col(weight_col).cast(dec_in)
    clean = df.filter(F.col(weight_col).isNotNull())
    by_key = Window.partitionBy(*[F.col(k) for k in keys])
    ordered = by_key.orderBy(F.col(weight_col).desc(), F.col(order_col).asc())
    prev_cum = F.coalesce(
        F.sum(w).over(ordered.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast(dec_in),
    )
    total = F.sum(w).over(by_key)
    return (
        clean.withColumn("_pc", prev_cum)
        .withColumn("_tt", total)
        .filter(
            F.col("_pc") * F.lit(int(share_den))
            < F.col("_tt") * F.lit(int(share_num))
        )
        .drop("_pc", "_tt")
    )


def _int_div(a: Column, b: Column) -> Column:
    """Exact integer floor-div for non-negative long Columns without
    F.expr name plumbing: the numerator is made an exact multiple of the
    divisor first, so the double division is exact below 2^53."""
    return ((a - a % b) / b).cast("long")


def _ntile_from_rownum(rn: Column, n: Column, k: int) -> Column:
    """SQL-standard NTILE(k) bucket from a 1-based global row number and
    the partition size: the first ``n % k`` buckets get ``n div k + 1``
    rows, the rest ``n div k`` — bit-identical to ``F.ntile``/DuckDB
    NTILE (pinned by the unit test), but computable from a DISTRIBUTED
    row numbering instead of a single-reducer window."""
    kk = F.lit(int(k)).cast("long")
    q = _int_div(n, kk)
    r = n % kk
    cut = r * (q + F.lit(1))
    # q == 0 (fewer rows than buckets): cut == n >= rn, so only the
    # first branch is ever taken and bucket == rn, matching NTILE.
    return F.when(
        rn <= cut, _int_div(rn - F.lit(1), q + F.lit(1)) + F.lit(1)
    ).otherwise(r + _int_div(rn - cut - F.lit(1), q) + F.lit(1))


def rfm_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    ref_ts: str,
    n_bins: int = 5,
) -> DataFrame:
    """RFM segmentation — the Customer-360 workhorse: per key, Recency
    (days from the last transaction to ``ref_ts``), Frequency
    (transaction count) and Monetary (exact DECIMAL revenue sum), each
    scored 1..``n_bins`` by equal-population quantile (score ``n_bins``
    = best: most recent / most frequent / highest spend), plus a pinned
    segment label ladder (champion > at_risk > loyal > big_spender >
    new > hibernating > regular, first match wins — at_risk outranks
    loyal so a stale-but-frequent customer surfaces as churn risk, the
    standard RFM playbook reading).

    Determinism: recency is integer epoch-microsecond arithmetic
    (``div``, never float); monetary is a DECIMAL(27,2) sum; quantile
    scores are SQL-standard NTILE semantics with ties pinned by
    (metric, key) total order — every output value is engine-exact.

    Scale shape: the naive ``NTILE(k) OVER (ORDER BY metric)`` funnels
    every customer through ONE reducer. Here the three metrics MELT into
    one long frame ((key, metric_idx, value) with the value widened to a
    common DECIMAL — order-preserving for each metric), and ONE
    distributed prefix-sum numbering over (metric_idx, value, key)
    ranks all three at once (r17; previously three sequential
    assign_row_ids passes paid three range shuffles + three eager
    checkpoints + three offset collects over the same aggregate). Each
    metric holds exactly ``n`` rows, so its within-metric rank is
    ``global_rank - (metric_idx-1)*n``, the bucket is the same
    closed-form NTILE formula, and ``n`` itself falls out of the
    collected partition totals — a driver literal, no 1-row-broadcast
    join. One pivot aggregate on the key folds the long frame back to
    one row per customer. Ranks, and therefore scores, are bit-identical
    to the three-pass form: same per-metric total order, same formula.
    """
    from bigdata_etl_customer360_spark.operators.util import (
        range_prefix_offsets,
    )

    amount_dec = F.col(amount_col).cast("decimal(27,2)")
    ref_us = F.unix_micros(F.to_timestamp(F.lit(ref_ts)))
    base = (
        df.groupBy(key_col)
        .agg(
            # NTZ parquet timestamps need the TIMESTAMP route (session tz
            # is pinned UTC, so the reinterpretation is value-preserving)
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias(
                "_last_us"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(amount_dec).alias("_mon_dec"),
        )
        .select(
            key_col,
            _int_div(ref_us - F.col("_last_us"), F.lit(86_400_000_000)).alias(
                "recency_days"
            ),
            "frequency",
            "_mon_dec",
        )
        .withColumn("_neg_rec", -F.col("recency_days"))
    )
    # melt: DECIMAL(38,2) holds every metric exactly (longs and the
    # DECIMAL(27,2) sum widen losslessly), so within-metric ordering is
    # unchanged; payload columns ride along (3 small numbers — cheaper
    # than a join back after scoring)
    melted = base.select(
        key_col,
        "recency_days",
        "frequency",
        "_mon_dec",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("_m"),
                    F.col("_neg_rec").cast("decimal(38,2)").alias("_val"),
                ),
                F.struct(
                    F.lit(2).alias("_m"),
                    F.col("frequency").cast("decimal(38,2)").alias("_val"),
                ),
                F.struct(
                    F.lit(3).alias("_m"),
                    F.col("_mon_dec").cast("decimal(38,2)").alias("_val"),
                ),
            )
        ).alias("_mv"),
    ).select(
        key_col, "recency_days", "frequency", "_mon_dec",
        F.col("_mv._m").alias("_m"), F.col("_mv._val").alias("_val"),
    )
    order_keys = [F.col("_m"), F.col("_val"), F.col(key_col)]
    binned, off_expr, total_rows = range_prefix_offsets(
        melted, order_keys, F.count(F.lit(1))
    )
    w = Window.partitionBy("_pid").orderBy(*[k.asc() for k in order_keys])
    rn_global = (F.row_number().over(w) - F.lit(1) + off_expr + F.lit(1)).cast(
        "long"
    )
    # n = rows per metric: the melted frame holds exactly 3n rows and the
    # offsets collect already counted them (bounded driver work, no extra job)
    n = int(total_rows) // 3
    rn = rn_global - (F.col("_m") - F.lit(1)).cast("long") * F.lit(int(n))
    bucket = _ntile_from_rownum(rn, F.lit(int(n)).cast("long"), n_bins).cast(
        "int"
    )
    long_scored = binned.select(
        key_col, "recency_days", "frequency", "_mon_dec", "_m",
        bucket.alias("_score"),
    )
    scored = long_scored.groupBy(key_col).agg(
        F.first("recency_days").alias("recency_days"),
        F.first("frequency").alias("frequency"),
        F.first("_mon_dec").alias("_mon_dec"),
        F.max(F.when(F.col("_m") == 1, F.col("_score"))).alias("r_score"),
        F.max(F.when(F.col("_m") == 2, F.col("_score"))).alias("f_score"),
        F.max(F.when(F.col("_m") == 3, F.col("_score"))).alias("m_score"),
    )
    hi = int(n_bins) - 1  # >= threshold for "top" buckets at n_bins=5 -> 4
    lo = 2
    segment = (
        F.when(
            (F.col("r_score") >= hi)
            & (F.col("f_score") >= hi)
            & (F.col("m_score") >= hi),
            F.lit("champion"),
        )
        .when((F.col("r_score") <= lo) & (F.col("f_score") >= 3), F.lit("at_risk"))
        .when(F.col("f_score") >= hi, F.lit("loyal"))
        .when(F.col("m_score") >= hi, F.lit("big_spender"))
        .when((F.col("r_score") >= hi) & (F.col("f_score") <= lo), F.lit("new"))
        .when(F.col("r_score") <= lo, F.lit("hibernating"))
        .otherwise(F.lit("regular"))
    )
    return scored.select(
        key_col,
        "recency_days",
        "frequency",
        F.col("_mon_dec").cast("double").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        segment.alias("segment"),
    )
