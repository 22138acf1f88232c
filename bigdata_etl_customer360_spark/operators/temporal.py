"""Temporal operators: as-of join.

The as-of join ("most recent right-side row at or before each left-side
row") is the canonical operator relational engines special-case (DuckDB
ASOF JOIN, kdb aj, pandas merge_asof). Spark has no native form; the
scalable formulation here is the UNION + CARRY-FORWARD window:

    union(left-tagged, right-tagged)                      [no shuffle]
    last(right_value, ignorenulls) over (key, time order) [ONE shuffle]
    filter to left rows                                   [no shuffle]

Cost is a single hash partition on the key + an in-partition sort —
identical shape to any windowed aggregate, and O(|L|+|R|) state. The
naive alternatives both die at scale: a range join explodes to every
(left, right) pair within the horizon before picking the max, and a
per-left-row correlated max is a join per row. The carry-forward plan
reads each input once.

Determinism: rows are ordered by (ts, side, *value_cols); at equal
timestamps the right row sorts BEFORE the left row (ties count as "at or
before"), and equal-timestamp right rows resolve to the greatest value
tuple — pinned, engine-independent semantics (the same ORDER BY
reproduces it in ANSI SQL, which is what makes the operator
oracle-checkable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For every ``left`` row, attach the latest ``right`` row of the same
    ``on`` key with ``right_ts <= left_ts`` (``direction='backward'``,
    the default) or the EARLIEST right row with ``right_ts >= left_ts``
    (``direction='forward'`` — "next event after": next restock after an
    order, next heartbeat after an alert). Left rows with no matching
    right row keep nulls (left-outer semantics).

    Forward is the same single-window carry plan on reversed time order;
    both directions are inclusive at equal timestamps and resolve
    equal-timestamp right ties to the greatest payload tuple (one pinned
    rule, not one per direction).

    Output: all ``left`` columns plus ``<right_ts><suffix>`` and
    ``<v><suffix>`` for each value column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    # the right payload rides as ONE struct so the carried values are
    # row-atomic (per-column last(ignorenulls) could stitch fields from
    # DIFFERENT right rows whenever a payload field is null)
    r_struct = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r_struct_type = (
        right.select(r_struct.alias("_p")).schema["_p"].dataType
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        r_struct.alias("_r"),
    )
    unioned = tagged_l.unionByName(tagged_r)

    # pinned total order: time, then right-before-left, then the payload
    # struct (equal-ts right rows resolve to the greatest payload tuple;
    # struct comparison is field-ordered, engine-independent)
    t_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_side").asc(), F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_asof")
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        F.col("_asof._ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_asof.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts: str,
    seq_col: str,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Build a slowly-changing-dimension Type-2 history from a change log.

    Every input row is one version of the ``key``'s attributes, stamped at
    ``ts``. The operator adds the classic SCD2 triple: ``effective_from``
    (the row's own timestamp), ``effective_to`` (the NEXT version's
    timestamp, exclusive upper bound; NULL on the open-ended current row)
    and ``current_flag``.

    Semantics parity: this is the warehouse-side generalization of the
    reference's daily profile snapshots (ETL_customer_behavior.py keeps
    only latest-state rows; SCD2 keeps the full validity timeline so any
    as-of date can be answered with a BETWEEN filter).

    Scale: ONE hash shuffle on ``key`` + an in-partition sort — the same
    cost as any windowed aggregate; no self-join (the naive "join each row
    to its successor" formulation shuffles the table twice and explodes on
    timestamp ties). State is O(1) per row (lead carries one tuple).

    Determinism: versions are ordered by ``(ts, seq_col)``; ``seq_col``
    must be unique per key (an event id / change-log LSN), which pins the
    timeline under same-timestamp updates regardless of partitioning.
    """
    clash = {effective_from, effective_to, current_flag} & set(df.columns)
    if clash:
        raise ValueError(
            f"scd2_history output column(s) {sorted(clash)} already exist in "
            "the input frame; rename the inputs or pass different "
            "effective_from/effective_to/current_flag names"
        )
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(seq_col).asc())
    nxt = F.lead(ts).over(w)
    return df.select(
        "*",
        F.col(ts).alias(effective_from),
        nxt.alias(effective_to),
        nxt.isNull().alias(current_flag),
    )


def _epoch_s(col: str) -> Column:
    """Epoch seconds for TIMESTAMP *or* TIMESTAMP_NTZ columns: NTZ casts
    to BIGINT only via TIMESTAMP, which re-interprets wall time in the
    session timezone — pinned to UTC engine-wide (session.py), so this
    matches DuckDB's epoch() on naive timestamps."""
    return F.col(col).cast("timestamp").cast("long")


def rolling_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    trailing_seconds: int | None,
    aggs: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Event-time rolling aggregates: each row gets every ``(name, agg)``
    in ``aggs`` evaluated over its key's rows inside the trailing time
    window ending at the row (see :func:`rolling_window` for frame
    semantics and the scale notes)."""
    w = rolling_window(keys, ts, trailing_seconds)
    return df.select("*", *[a.over(w).alias(n) for n, a in aggs])


def rolling_window(
    keys: Sequence[str],
    ts: str,
    trailing_seconds: int | None,
) -> Window:
    """RANGE-frame window over event time: partition by ``keys``, order by
    ``ts`` as epoch seconds, frame = [now - trailing_seconds, now]
    (inclusive both ends — equal-timestamp peers are all in-frame, which
    is what makes the result independent of intra-timestamp row order and
    therefore deterministic and oracle-checkable; ANSI ``RANGE BETWEEN
    INTERVAL x PRECEDING AND CURRENT ROW`` has the same peer semantics).

    Scale: ONE hash shuffle on ``keys`` + an in-partition sort — the same
    cost as any windowed aggregate. Spark evaluates RANGE frames with a
    sliding two-pointer over the sorted partition, so state is O(window
    rows), not O(partition). Skewed keys concentrate on one reducer like
    any per-key window; pre-aggregate to a coarser tick (e.g. daily) first
    when per-key row counts are extreme.

    ``trailing_seconds=None`` means unbounded preceding (cumulative).
    """
    order = _epoch_s(ts)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(order)
    if trailing_seconds is None:
        return w.rangeBetween(Window.unboundedPreceding, 0)
    return w.rangeBetween(-int(trailing_seconds), 0)


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    out_ts: str = "ts",
    out_net: str = "net_change",
    out_open: str = "n_open",
) -> DataFrame:
    """Sweep-line concurrency profile: for every boundary instant, how many
    intervals ``[start, end)`` are open at/after that instant. The classic
    "concurrent sessions / in-flight shipments over time" query.

    Plan (the O(n log n) shape, vs the naive self-join's O(n^2) pairs):

        +1 at each start, -1 at each end            [map-only union]
        groupBy (keys, ts): SUM(delta) -> net       [ONE shuffle; collapses
                                                     ties so the running sum
                                                     has no order ambiguity]
        running SUM(net) over (keys, ts ASC)        [window]

    With ``keys`` the window is per-key — ordinary windowed-agg cost.
    KEYLESS, a global running sum would naively serialize into a single
    reducer; here it is a distributed prefix sum instead: range-partition
    the collapsed boundaries by ts, cumsum within each range partition,
    then add per-partition offsets (an exclusive scan over the tiny
    per-partition totals, computed driver-side from at most
    #partitions rows and broadcast back). Two boundary rows per interval
    and the collapsed distinct-ts frame is what flows — at 100 TB the
    heavy input is reduced to |distinct boundaries| before any sort.

    Half-open semantics: an interval ending at t is NOT open at t (its -1
    applies at t). Deterministic: after the groupBy, (keys, ts) is unique,
    so the running sum is order-free.
    """
    kcols = list(keys)
    starts = df.select(
        *kcols, F.col(start_col).alias(out_ts), F.lit(1).cast("bigint").alias("_d")
    )
    ends = df.select(
        *kcols, F.col(end_col).alias(out_ts), F.lit(-1).cast("bigint").alias("_d")
    )
    net = (
        starts.unionAll(ends)
        .groupBy(*kcols, out_ts)
        .agg(F.sum("_d").alias(out_net))
    )
    if kcols:
        w = (
            Window.partitionBy(*kcols)
            .orderBy(F.col(out_ts).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return net.select(*kcols, out_ts, out_net, F.sum(out_net).over(w).alias(out_open))

    # keyless: distributed prefix sum over range partitions (shared
    # machinery: operators.util.range_prefix_offsets pins _pid placement
    # for the totals collect and the windowed projection alike)
    from bigdata_etl_customer360_spark.operators.util import range_prefix_offsets

    binned, off_expr, _ = range_prefix_offsets(net, [F.col(out_ts)], F.sum(out_net))
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(out_ts).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return binned.select(
        out_ts,
        out_net,
        (F.sum(out_net).over(w) + off_expr).cast("bigint").alias(out_open),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bin_seconds: int = 86400,
    max_bins_per_interval: int = 1000,
) -> DataFrame:
    """Point-in-interval join (``start <= point <= end``), optionally with
    equi-keys — the batch twin of streaming/sources' interval join and the
    general form behind "which campaign window / validity period does this
    event fall in".

    Spark plans a bare inequality join as BroadcastNestedLoopJoin (or a
    cartesian) — O(|P|*|I|) compares and a broadcast of a whole side;
    fine for a dimension, fatal big-to-big. This operator grid-buckets
    instead: a point belongs to exactly ONE bin (floor(epoch/bin));
    an interval is exploded to EVERY bin it touches (``sequence``), so
    every qualifying (point, interval) pair meets on precisely one
    equi-join key and the residual ``BETWEEN`` filter needs no
    de-duplication afterwards. Cost: |I| * avg_bins_per_interval exploded
    rows and a hash join — shuffle ~ data size, never |P|*|I|.

    Pick ``bin_seconds`` near the typical interval length: bins/interval
    stays O(1) while bin occupancy stays bounded. ``max_bins_per_interval``
    fails fast (plan-time guard on max span via an aggregate would cost a
    job; this clamps the sequence and raises at execute time via
    element_at) — actually enforced as a cheap static cap: spans longer
    than the cap raise, pointing at a larger bin width.

    Both bounds inclusive (ANSI ``BETWEEN``), timestamps compared exactly.
    """
    kcols = list(keys)
    # an inverted interval (end < start) contains no point by definition —
    # filter it out explicitly (it would otherwise crash F.sequence with a
    # negative span, a cryptic error for a data-quality problem)
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    p_bin = F.floor(_epoch_s(point_ts) / F.lit(bin_seconds))
    i_start = F.floor(_epoch_s(start_col) / F.lit(bin_seconds))
    i_end = F.floor(_epoch_s(end_col) / F.lit(bin_seconds))
    guard = F.when(
        i_end - i_start >= F.lit(max_bins_per_interval),
        F.raise_error(
            F.lit(
                f"range_join: interval spans >= {max_bins_per_interval} bins; "
                "increase bin_seconds or max_bins_per_interval"
            )
        ).cast("long"),
    ).otherwise(i_end)
    p = points.withColumn("_bin", p_bin)
    i = intervals.withColumn("_bin", F.explode(F.sequence(i_start, guard)))
    joined = p.join(i, on=kcols + ["_bin"], how="inner").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bin")


def transition_counts(
    df: DataFrame,
    key: str,
    ts: str,
    state_col: str,
    seq_col: str,
    out_prev: str = "prev_state",
    out_state: str = "state",
) -> DataFrame:
    """First-order Markov transition counts over per-key state sequences:
    order each key's rows by (ts, seq_col), LAG the state, count
    (prev_state, state) pairs, and attach the exact transition
    probability (count / row-count of the prev_state, computed as a
    single BIGINT/BIGINT division so both engines produce the identical
    double). A key's first row has prev_state NULL ("session start").

    Plan: one shuffle for the per-key window (lag), one hash agg on the
    tiny (prev, state) domain with map-side partials — the agg output is
    |states|^2 rows no matter how big the input. Determinism: ``seq_col``
    (a unique event id) pins intra-timestamp order.

    Semantics parity: generalizes the reference's per-user
    most-frequent-action profiling (ETL_customer_interaction.py) to
    action SEQUENCES.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(seq_col).asc())
    lagged = df.select(
        F.lag(state_col).over(w).alias(out_prev), F.col(state_col).alias(out_state)
    )
    counts = lagged.groupBy(out_prev, out_state).agg(F.count("*").alias("n"))
    w_tot = Window.partitionBy(out_prev)
    return counts.select(
        out_prev,
        out_state,
        "n",
        (F.col("n") / F.sum("n").over(w_tot)).alias("p"),
    )


def resample_timeseries(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    step_seconds: int,
    value_col: str | None = None,
    value_decimal: str = "decimal(18,2)",
    fill: str = "zero",
    out_cell: str = "cell",
    out_n: str = "n_rows",
    out_sum: str = "val_sum",
) -> DataFrame:
    """Resample an event stream onto a regular per-key time grid and fill
    the gaps — the missing-tick repair every downstream time-series model
    (and every "days with zero sales" report) needs.

    Steps: (1) floor each row onto a grid cell (``floor(epoch/step)*step``,
    re-materialized as a timestamp); (2) aggregate per (keys, cell): row
    count and, when ``value_col`` is given, an exact DECIMAL sum (cast to
    DOUBLE on output — the repo-wide float-determinism contract);
    (3) build each key's spine with ``sequence(min_cell, max_cell, step)``
    + explode — bounds are INCLUSIVE, matching ``generate_series``;
    (4) left-join the aggregates back onto the spine and fill holes:
    ``fill='zero'`` coalesces to 0 (additive metrics), ``fill='ffill'``
    carries the last seen sum forward (level metrics; counts still
    zero-fill — an empty cell genuinely has 0 rows).

    Scale: the raw stream is reduced to |keys|x|cells| by the FIRST hash
    agg — everything after (min/max, explode, join) runs on grid-sized
    data. The explode is per-key span/step rows; a key spanning years at
    1s resolution explodes large, so pick ``step_seconds`` at the grain
    you report on. Two shuffles total (agg; spine⋈agg), both on
    grid-sized frames. Deterministic: (keys, cell) unique post-agg, sums
    exact DECIMAL.
    """
    if fill not in ("zero", "ffill"):
        raise ValueError("fill must be 'zero' or 'ffill'")
    kcols = list(keys)
    cell_s = (F.floor(_epoch_s(ts) / F.lit(step_seconds)) * F.lit(step_seconds)).cast("long")
    aggs = [F.count("*").alias(out_n)]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast(value_decimal)).alias("_vsum"))
    per_cell = df.withColumn("_cs", cell_s).groupBy(*kcols, "_cs").agg(*aggs)
    spine = (
        per_cell.groupBy(*kcols)
        .agg(F.min("_cs").alias("_a"), F.max("_cs").alias("_b"))
        .select(
            *kcols,
            F.explode(
                F.sequence(F.col("_a"), F.col("_b"), F.lit(int(step_seconds)))
            ).alias("_cs"),
        )
    )
    joined = spine.join(per_cell, on=kcols + ["_cs"], how="left")
    out = [
        *kcols,
        F.timestamp_seconds(F.col("_cs")).alias(out_cell),
        F.coalesce(F.col(out_n), F.lit(0)).cast("bigint").alias(out_n),
    ]
    if value_col is not None:
        if fill == "zero":
            vs = F.coalesce(F.col("_vsum"), F.lit(0).cast(value_decimal))
        else:
            w = (
                Window.partitionBy(*kcols)
                .orderBy(F.col("_cs").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            vs = F.last("_vsum", ignorenulls=True).over(w)
        out.append(vs.cast("double").alias(out_sum))
    return joined.select(*out)


def rolling_zscore(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value_col: str,
    trailing_seconds: int,
    value_decimal: str = "decimal(27,6)",
    min_n: int = 5,
    threshold: float = 3.0,
    z_out: str = "z",
    flag_out: str = "is_anomaly",
) -> DataFrame:
    """Rolling z-score anomaly flagging: each row's value against the
    mean/stddev of its key's trailing time window (window includes the
    current row — the streaming-monitor convention; a true outlier still
    stands out because it is one of >= min_n samples).

    Determinism: the window accumulates EXACT decimal moments (n, Σx,
    Σx²); mean, sample variance and z derive from those exact values
    through a fixed-shape IEEE expression — identical bits on any
    engine/partitioning, unlike windowed ``avg``/``stddev`` over raw
    doubles. The value participates at ``value_decimal`` quantization on
    both sides of the subtraction (part of the contract, like
    weighted_sample's 1/scale coin).

    Guards: z is NULL when the window has < ``min_n`` samples or zero
    variance; ``is_anomaly`` is then FALSE (never null). Cost: ONE hash
    shuffle — the same single window as any rolling aggregate
    (:func:`rolling_window` notes apply).
    """
    w = rolling_window(keys, ts, trailing_seconds)
    xd = F.col(value_col).cast(value_decimal)
    n = F.count(xd).over(w)
    s = F.sum(xd).over(w)
    s2 = F.sum((xd * xd).cast("decimal(38,12)")).over(w)
    nd = n.cast("double")
    sd = s.cast("double")
    s2d = s2.cast("double")
    x = xd.cast("double")
    var = (nd * s2d - sd * sd) / (nd * (nd - F.lit(1.0)))
    std = F.sqrt(var)
    z = (x - sd / nd) / std
    # Guard on the PRE-sqrt variance: a constant window's double-rounded
    # variance can go slightly NEGATIVE (plain negative fails `> 0`), but
    # sqrt of it is NaN, and Spark/DuckDB both order NaN ABOVE all doubles
    # so `std > 0.0` would pass and emit z=NaN with is_anomaly=TRUE.
    ok = (n >= F.lit(int(min_n))) & (var > F.lit(0.0))
    return df.select(
        "*",
        F.when(ok, z).alias(z_out),
        F.coalesce(
            F.when(ok, F.abs(z) > F.lit(float(threshold))), F.lit(False)
        ).alias(flag_out),
    )


def match_event_pattern(
    df: DataFrame,
    key: str,
    ts: str,
    seq_col: str,
    state_col: str,
    alphabet: dict[str, str],
    pattern: str,
    out_path: str = "path",
    out_match: str = "matched",
) -> DataFrame:
    """Sequence-pattern matching over per-key event journeys — the
    MATCH_RECOGNIZE / funnel-regex capability: each key's events are
    ordered by (ts, seq), mapped through ``alphabet`` to one character
    each (unmapped states are dropped), concatenated into a path string,
    and tested against ``pattern`` (an RE2∩Java regex, e.g. ``v.*c.*p``
    for "view, then click, then purchase, anything between").

    Output: one row per key with the encoded ``path`` and a boolean
    ``matched`` — feed it to a filter or an aggregation for funnel
    counts with arbitrary path grammars (the fixed 3-stage funnel query
    is the special case ``v.*c.*p``).

    Plan: ONE hash shuffle — collect_list with map-side partials, then a
    per-row in-memory sort of each key's (ts, seq, char) triples (struct
    field order IS the sort order, so no window pass at all); the path
    string is bounded by events-per-key — for hot keys cap upstream
    (`sample_n_per_group`) like any per-key collect. Determinism:
    (ts, seq) is a total order; the regex subset excludes
    backreferences/lookaround so both engines agree.
    """
    mapping = F.create_map(*[F.lit(x) for kv in alphabet.items() for x in kv])
    ch = mapping[F.col(state_col)]
    evs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts).alias("t"), F.col(seq_col).alias("s"), F.col("_ch").alias("c")
            )
        )
    )
    per_key = (
        df.select(F.col(key), F.col(ts), F.col(seq_col), ch.alias("_ch"))
        .filter(F.col("_ch").isNotNull())
        .groupBy(key)
        .agg(evs.alias("_evs"))
        .select(
            key,
            F.array_join(
                F.transform(F.col("_evs"), lambda e: e["c"]), ""
            ).alias(out_path),
        )
    )
    return per_key.select(
        key, out_path, F.col(out_path).rlike(pattern).alias(out_match)
    )


def scd2_snapshot_at(
    history: DataFrame,
    at,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
) -> DataFrame:
    """Point-in-time reconstruction from an SCD2 history — "the table as
    of T", the query the validity timeline exists to answer: rows whose
    half-open interval ``[effective_from, effective_to)`` contains ``at``
    (open-ended current rows qualify via NULL ``effective_to``). Exactly
    one version per key survives for any T at or after the key's first
    version; same-timestamp version stacks resolve to the last one (an
    empty ``[t, t)`` interval can never contain T — the
    :func:`scd2_history` tie rule carried through).

    Plan: a pure filter — predicate pushdown carries it into the scan of
    a stored history table; zero shuffle, zero joins. ``at`` is a
    timestamp or ISO string.
    """
    at_lit = F.lit(at).cast(history.schema[effective_from].dataType)
    return history.filter(
        (F.col(effective_from) <= at_lit)
        & (F.col(effective_to).isNull() | (F.col(effective_to) > at_lit))
    )


def ewma_level(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.25,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average level per key — the recursive
    smoother ``s_1 = x_1; s_i = (1-alpha)*s_{i-1} + alpha*x_i`` folded over
    each key's value series in event-time order (pandas ``ewm(adjust=False)``
    semantics). The output is the key's CURRENT smoothed level — the
    baseline that anomaly thresholds and short-horizon forecasts hang off,
    and the one time-series primitive a plain windowed average cannot
    express (every prior point contributes, with geometrically decaying
    weight).

    Rows with a NULL timestamp or value are excluded (a missing point
    contributes nothing to the level); keys with no surviving rows are
    absent from the output. Output: ``(*keys, n_points, out_col)``.

    Determinism: the fold order is pinned by (epoch-micros, value) — a
    total order even under timestamp ties — and the recursion is evaluated
    as ONE in-order float fold (`F.aggregate` over the sorted array; the
    in-order-float-fold contract), rounded 1e-8. With ``alpha`` an exact
    binary fraction (default 0.25) the per-step constants are literal-
    identical across engines.

    Scale: one map-side-combined shuffle on ``keys`` (collect_list partial
    aggregation), fold state O(1) per key beyond the collected series; the
    collected array is per (key)'s OWN rows only — the operator targets
    per-entity series (bounded per key), not one global series. For a
    global series, pre-aggregate to a coarse tick first (daily_resample)
    so the array stays bounded.
    """
    from bigdata_etl_customer360_spark.operators.util import let1

    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha!r}")
    clean = df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
    ordered = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros(F.col(ts_col)).alias("_ts"),
                    F.col(value_col).cast("double").alias("_v"),
                )
            )
        ),
        lambda s: s["_v"],
    )

    def _fold(v: Column) -> Column:
        return F.round(
            F.aggregate(
                F.slice(v, 2, F.greatest(F.size(v) - 1, F.lit(0))),
                F.element_at(v, 1),
                lambda acc, x: acc * F.lit(1.0 - a) + F.lit(a) * x,
            ),
            8,
        )

    return clean.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_points"),
        let1(ordered, _fold).alias(out_col),
    )


def holt_smooth(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Holt double-exponential smoothing (level + additive trend) per
    key — :func:`ewma_level`'s two-component sibling, the smallest model
    that FORECASTS (EWMA's flat level cannot express drift):

        l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1})
        b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}

    with the textbook initialization l_2 = x_2, b_2 = x_2 - x_1
    (Hyndman & Athanasopoulos, FPP) and the recursion running from the
    third point. Output per key: ``(*keys, n_points, level, trend,
    forecast)`` with ``forecast = level + trend`` (the one-step-ahead
    point forecast), all rounded 1e-8. Single-point keys pin
    ``(level=x, trend=0)``; NULL ts/value rows are excluded.

    Determinism: the in-order-float-fold contract with a STRUCT
    accumulator — order pinned by (epoch-micros, value), alpha/beta
    exact binary fractions, one fold per key (DuckDB mirrors it with a
    struct-valued ``list_reduce``). The level expression appears twice
    per step (inside its own slot and inside the trend update); both
    engines recompute the identical IEEE expression, so duplication is
    value-neutral.

    Scale: identical to ewma_level — one map-side-combined shuffle on
    ``keys``, per-entity series only (pre-aggregate to a coarse tick for
    global series).
    """
    from bigdata_etl_customer360_spark.operators.util import let1

    a = float(alpha)
    bt = float(beta)
    for name, v in (("alpha", a), ("beta", bt)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{name} must be in (0, 1], got {v!r}")
    clean = df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
    ordered = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros(F.col(ts_col)).alias("_ts"),
                    F.col(value_col).cast("double").alias("_v"),
                )
            )
        ),
        lambda s: s["_v"],
    )

    def _fold(v: Column) -> Column:
        n = F.size(v)
        x1 = F.element_at(v, 1)
        x2 = F.element_at(v, 2)
        init = F.struct(x2.alias("l"), (x2 - x1).alias("b"))

        def step(acc: Column, x: Column) -> Column:
            newl = F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])
            newb = F.lit(bt) * (newl - acc["l"]) + F.lit(1.0 - bt) * acc["b"]
            return F.struct(newl.alias("l"), newb.alias("b"))

        folded = F.aggregate(
            F.slice(v, 3, F.greatest(n - 2, F.lit(0))), init, step
        )
        level = F.when(n == 1, x1).otherwise(folded["l"])
        trend = F.when(n == 1, F.lit(0.0)).otherwise(folded["b"])
        return F.struct(
            F.round(level, 8).alias("level"),
            F.round(trend, 8).alias("trend"),
            F.round(level + trend, 8).alias("forecast"),
        )

    out = clean.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_points"),
        let1(ordered, _fold).alias("_h"),
    )
    return out.select(
        *keys,
        "n_points",
        F.col("_h.level").alias("level"),
        F.col("_h.trend").alias("trend"),
        F.col("_h.forecast").alias("forecast"),
    )


def merge_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union of overlapping/touching intervals per key — the coverage
    primitive (machine uptime, user on-screen time, content
    availability windows): half-open ``[start, end)`` inputs collapse to
    the minimal set of disjoint covering intervals, plus per-interval
    counts. Intervals that merely TOUCH (a.end == b.start) merge — the
    half-open union has no gap there. Zero-length intervals (start ==
    end) are kept and merge into anything containing their point.

    Algorithm (the sessionize shape — one window, no joins): order each
    key's intervals by (start, end); an interval starts a NEW merged
    group iff its start exceeds the running max of all PRIOR ends
    (strictly greater — equality touches); group id = running sum of
    break flags; one grouped aggregate emits
    ``(keys..., merged_start = min(start), merged_end = max(end),
    n_source = count)``.

    Exactness: pure comparisons and min/max on the original values — any
    orderable type (timestamps, epochs, integers) works unchanged, and
    the output is engine-exact. Rows with NULL bounds or end < start are
    rejected with a loud filter upstream contract (here: excluded).

    Plan: ONE shuffle on ``keys`` shared by both windows and the final
    groupBy (same partitioning — exchange reuse); state is O(1) per row.
    """
    clean = df.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    )
    by_key = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prior_max_end = F.max(end_col).over(
        by_key.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = (
        F.when(prior_max_end.isNull(), F.lit(1))
        .when(F.col(start_col) > prior_max_end, F.lit(1))
        .otherwise(F.lit(0))
    )
    grouped = clean.withColumn("_brk", brk).withColumn(
        "_gid", F.sum("_brk").over(by_key.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grouped.groupBy(*[F.col(k) for k in keys], F.col("_gid"))
        .agg(
            F.min(start_col).alias("merged_start"),
            F.max(end_col).alias("merged_end"),
            F.count(F.lit(1)).alias("n_source"),
        )
        .drop("_gid")
    )


def autocorrelation(
    df: DataFrame,
    order_col: str,
    value_col: str,
    max_lag: int = 7,
    group_cols: Sequence[str] = (),
    scale: int = 2,
) -> DataFrame:
    """Sample autocorrelation function (ACF) at lags 1..``max_lag`` over
    an ordered series — the seasonality / decay readout behind forecast
    model choice (is weekly structure real? how fast does memory fade?):

        r_k = sum_{t<=n-k} (x_t - mean)(x_{t+k} - mean)
              / sum_t (x_t - mean)^2

    Position-based lags over the ``order_col`` ordering (resample the
    series upstream if calendar regularity matters; ``order_col`` must
    be unique per group — it is the tie-free sort key).

    Exactness (the linear_trend/ab_test discipline): values cast to
    DECIMAL(18, scale); every lag's moments — pair count, sum x*lead_k,
    head/tail sums — and the global (n, sumx, sumx2) are EXACT decimal
    aggregates from ONE pass; the finale expands the mean-centered forms

        num_k = P_k - mean*(H_k + T_k) + (n-k)*mean^2
        den   = Q - n*mean^2

    as one fixed-shape IEEE expression per lag, shipped UNROUNDED (the
    corr_matrix contract). Degenerate series (constant: den == 0; or
    n <= k: no pairs) pin r to NULL, never NaN.

    Plan: ONE window sort per group computes every lead; ONE aggregate
    collects all per-lag moments; a literal-size array explode emits
    the (lag, n_pairs, r) rows. With no ``group_cols`` the window is
    global — the bounded-domain exception, for SERIES frames (an
    aggregate, e.g. daily totals), never fact tables.

    Output: ``(*group_cols, lag, n_pairs, r)``.
    """
    if max_lag < 1:
        raise ValueError("autocorrelation needs max_lag >= 1")
    dec_in = f"decimal(18,{scale})"
    dec_prod = f"decimal(38,{2 * scale})"
    x = F.col(value_col).cast(dec_in)
    gcols = [F.col(c) for c in group_cols]
    w = (
        Window.partitionBy(*gcols).orderBy(F.col(order_col).asc())
        if group_cols
        else Window.orderBy(F.col(order_col).asc())
    )
    led = df.filter(F.col(value_col).isNotNull()).select(
        *gcols,
        x.alias("_x"),
        *[F.lead(x, k).over(w).alias(f"_ld{k}") for k in range(1, max_lag + 1)],
    )
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s"),
        F.sum((F.col("_x") * F.col("_x")).cast(dec_prod)).alias("_q"),
    ]
    for k in range(1, max_lag + 1):
        ld = F.col(f"_ld{k}")
        aggs += [
            F.count(ld).alias(f"_c{k}"),
            F.sum((F.col("_x") * ld).cast(dec_prod)).alias(f"_p{k}"),
            F.sum(F.when(ld.isNotNull(), F.col("_x"))).alias(f"_h{k}"),
            F.sum(ld).alias(f"_t{k}"),
        ]
    m = led.groupBy(*gcols).agg(*aggs) if group_cols else led.agg(*aggs)
    n_d = F.col("_n").cast("double")
    mean = F.col("_s").cast("double") / n_d
    den = F.col("_q").cast("double") - n_d * mean * mean
    per_lag = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.col(f"_c{k}").cast("long").alias("n_pairs"),
                F.when(
                    (F.col(f"_c{k}") > 0) & (den != F.lit(0.0)),
                    (
                        F.col(f"_p{k}").cast("double")
                        - mean
                        * (
                            F.col(f"_h{k}").cast("double")
                            + F.col(f"_t{k}").cast("double")
                        )
                        + F.col(f"_c{k}").cast("double") * mean * mean
                    )
                    / den,
                ).alias("r"),
            )
            for k in range(1, max_lag + 1)
        ]
    )
    return m.select(*gcols, F.explode(per_lag).alias("_l")).select(
        *group_cols, "_l.lag", "_l.n_pairs", "_l.r"
    )


def _risk_table(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """Shared risk-set core of :func:`kaplan_meier` / :func:`nelson_aalen`:
    per group, the sorted list of (event time t, events d, at-risk n)
    structs — d and n exact integers from ONE distinct-duration
    aggregate + a cumulative-count window (censor-only times shape n
    but emit no row)."""
    gcols = [F.col(c) for c in group_cols]
    clean = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    )
    per_t = clean.groupBy(*gcols, F.col(duration_col).alias("_t")).agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum((F.col(event_col) == 1).cast("long")).alias("_d"),
    )
    w_all = (
        Window.partitionBy(*gcols) if group_cols else Window.partitionBy()
    )
    w_cum = w_all.orderBy(F.col("_t").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = w_all.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    risked = per_t.select(
        *gcols,
        "_t",
        "_d",
        (
            F.sum("_c").over(w_tot)
            - F.coalesce(F.sum("_c").over(w_cum), F.lit(0))
        ).alias("_n"),
    ).filter(F.col("_d") >= 1)
    return risked.groupBy(*gcols).agg(
        F.sort_array(
            F.collect_list(F.struct("_t", "_d", "_n"))
        ).alias("_lst")
    ).filter(F.size("_lst") > 0)


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — :func:`kaplan_meier`'s
    additive sibling (H(t) = sum over t_i <= t of d_i/n_i): the curve
    statisticians difference to read the hazard RATE over time, and the
    numerically stable route to survival at heavy censoring
    (exp(-H) >= KM's product). Same right-censoring semantics, same
    exact risk table (:func:`_risk_table`), same in-order float fold —
    a SUM of fixed-shape d/n terms from the 0.0 init instead of the
    product from 1.0 — shipped UNROUNDED (identical IEEE sequences).

    Output: ``(*group_cols, t, n_risk, n_events, cum_hazard)`` — one
    row per distinct event time.
    """
    lst = _risk_table(df, duration_col, event_col, group_cols)
    gcols = [F.col(c) for c in group_cols]
    curve = F.transform(
        F.sequence(F.lit(1), F.size("_lst")),
        lambda i: F.struct(
            F.element_at("_lst", i)["_t"].alias("t"),
            F.element_at("_lst", i)["_n"].alias("n_risk"),
            F.element_at("_lst", i)["_d"].alias("n_events"),
            F.aggregate(
                F.slice("_lst", F.lit(1), i),
                F.lit(0.0),
                lambda acc, x: acc
                + x["_d"].cast("double") / x["_n"].cast("double"),
            ).alias("cum_hazard"),
        ),
    )
    return (
        lst.select(*gcols, F.explode(curve).alias("_e"))
        .select(
            *group_cols, "_e.t", "_e.n_risk", "_e.n_events", "_e.cum_hazard"
        )
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Kaplan-Meier survival curve — the time-to-event readout
    (conversion latency, churn, failure curves) under RIGHT CENSORING,
    which a naive "average time to purchase over converters" gets
    wrong (it silently drops everyone who has not converted YET):

        S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

    with ``d_i`` = events at ``t_i`` and ``n_i`` = subjects still at
    risk (duration >= t_i, events AND censored). One row per subject:
    ``duration_col`` (any orderable numeric) + ``event_col`` (1 =
    event observed, 0 = censored at that duration).

    Exactness: d_i and n_i are exact integers (n_i = N - subjects
    strictly before t_i, a cumulative count over the DISTINCT-duration
    aggregate); each survival value is the IN-ORDER product
    ``((1*f_1)*f_2)*...*f_i`` of fixed-shape factors ``1.0 - d/n`` —
    the in-order-float-fold contract (DuckDB twin: list products over
    slices; multiplication by the 1.0 init is IEEE-exact, so both
    engines run the identical sequence), shipped UNROUNDED.

    Plan: ONE hash aggregate to distinct durations, a cumulative-count
    window over that aggregate, then the per-group curve folds inside
    one collect_list row (distinct EVENT times are bounded — a curve
    you can plot — never the subject table; the slice-fold is O(k^2)
    multiplications JVM-side, trivial at plottable k). With no
    ``group_cols`` the windows are global — bounded-domain exception,
    same argument.

    Output: ``(*group_cols, t, n_risk, n_events, survival)`` — one row
    per distinct EVENT time (censor-only times shape n_risk but emit no
    row, the standard KM product-limit convention).
    """
    lst = _risk_table(df, duration_col, event_col, group_cols)
    gcols = [F.col(c) for c in group_cols]
    curve = F.transform(
        F.sequence(F.lit(1), F.size("_lst")),
        lambda i: F.struct(
            F.element_at("_lst", i)["_t"].alias("t"),
            F.element_at("_lst", i)["_n"].alias("n_risk"),
            F.element_at("_lst", i)["_d"].alias("n_events"),
            F.aggregate(
                F.slice("_lst", F.lit(1), i),
                F.lit(1.0),
                lambda acc, x: acc
                * (
                    F.lit(1.0)
                    - x["_d"].cast("double") / x["_n"].cast("double")
                ),
            ).alias("survival"),
        ),
    )
    return (
        lst.select(*gcols, F.explode(curve).alias("_e"))
        .select(*group_cols, "_e.t", "_e.n_risk", "_e.n_events", "_e.survival")
    )


def cusum_changepoint(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    scale: int = 2,
) -> DataFrame:
    """Single change-point detection via the CUSUM statistic: the split
    position maximizing the cumulative deviation from the global mean,

        C_t = sum_{i<=t} (x_i - mean),   split at argmax_t |C_t|

    — "when did the level shift?" over a series (a regime change in
    daily revenue, a deploy that moved a metric). Equivalent to the
    max-|T| form used here with NO floats in the decision:

        T_t = n * cumsum_t - t * total        (value units x n)

    computed in exact integer sub-units (values scaled by 10^scale into
    BIGINT cents; |T| compared as integers, argmax ties pinned to the
    EARLIEST t). Only the reported magnitude becomes a double at the
    end (|T| / (n * 10^scale), one fixed shape). Overflow bound:
    n * |total_cents| must fit int64 — at larger scales lift the same
    arithmetic to DECIMAL(38).

    Plan: one window pass over the ordered series (cumsum + position +
    total share a sort), one rank to pick the argmax row. Series
    frames only (an aggregate — the ACF bounded-domain contract); with
    ``group_cols`` every window partitions by group.

    Output: ``(*group_cols, split_at, t, max_cusum)`` — ``split_at``
    is the LAST ``order_col`` value of the left segment, ``t`` its
    1-based position, ``max_cusum`` the peak |C_t| in value units.
    """
    mult = 10 ** int(scale)
    cents = F.round(
        F.col(value_col).cast(f"decimal(18,{scale})") * F.lit(mult)
    ).cast("long")
    gcols = [F.col(c) for c in group_cols]
    base = (
        Window.partitionBy(*gcols) if group_cols else Window.partitionBy()
    )
    w_ord = base.orderBy(F.col(order_col).asc())
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = df.filter(F.col(value_col).isNotNull()).select(
        *gcols,
        F.col(order_col).alias("split_at"),
        F.row_number().over(w_ord).alias("t"),
        F.sum(cents).over(w_cum).alias("_c"),
        F.sum(cents).over(w_all).alias("_s"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    t_stat = F.col("_n") * F.col("_c") - F.col("t") * F.col("_s")
    ranked = staged.withColumn("_abs", F.abs(t_stat)).withColumn(
        "_rk",
        F.row_number().over(
            base.orderBy(F.col("_abs").desc(), F.col("t").asc())
        ),
    )
    return ranked.filter(F.col("_rk") == 1).select(
        *group_cols,
        "split_at",
        "t",
        (
            F.col("_abs").cast("double")
            / (F.col("_n").cast("double") * F.lit(float(mult)))
        ).alias("max_cusum"),
    )


def decompose_daily(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int = 7,
    trend_window: int = 7,
    value_decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Additive seasonal-trend decomposition of a daily series (the
    classical-decomposition core of STL, computed exactly):

        y_t      = trend_t + seasonal_{dow(t)} + resid_t
        trend_t  = centered moving average of y over ``trend_window``
                   consecutive days (NULL unless ALL w days exist)
        seasonal = per-weekday mean of the detrended series, CENTERED so
                   the ``period`` indices sum to 0
        resid    = what's left

    The anomaly/forecast preprocessor that upgrades
    :func:`seasonal_index`'s multiplicative ratios to the additive
    decomposition drift monitors want (a residual spike is an anomaly
    AFTER the weekly rhythm and the growth trend are explained away).

    Exactness contract: daily totals are exact decimal sums; the
    centered MA and the weekday means are kept SCALED by integer
    factors as exact decimals (detrended*w = w*y - sum_w(y), so no
    division happens before aggregation), and every double in the
    output is a fixed-shape expression over those exact aggregates.
    The single cross-weekday reduction (centering) is an in-order
    float fold over the ``period`` weekday rows (the bm25/token_jsd
    contract), so both engines fold identically. Weekday is
    ``pmod(floor(epoch/86400), period)`` (0 = Thursday for period 7 —
    the seasonal_index convention).

    Absent days are absent (feed a :func:`resample_timeseries`
    zero-filled grid when missing days are real zeros); trend and
    resid pin to NULL at series edges / gaps (incomplete window).

    Plan: one hash aggregate to daily totals, ONE keyless RANGE window
    over the bounded daily frame (days, not rows — fine single-
    partition, the holt_smooth precedent), a ``period``-row seasonal
    aggregate broadcast back. Output:
    ``(day, day_idx, y, trend, seasonal, resid)``.
    """
    if trend_window % 2 != 1 or trend_window < 1:
        raise ValueError(f"trend_window must be odd >= 1, got {trend_window!r}")
    half = trend_window // 2
    w_lit = F.lit(float(trend_window))

    daily = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.floor(_epoch_s(ts_col) / F.lit(86400)).cast("long").alias("day")
        )
        .agg(F.sum(F.col(value_col).cast(value_decimal)).alias("_y"))
    )
    wr = Window.orderBy("day").rangeBetween(-half, half)
    ma = daily.select(
        "day",
        F.pmod(F.col("day"), F.lit(period)).alias("day_idx"),
        "_y",
        F.sum("_y").over(wr).alias("_wsum"),
        F.count(F.lit(1)).over(wr).alias("_wcnt"),
    )
    # detrended, scaled by w to stay exact: d_scaled = w*y - sum_w(y)
    full = ma.withColumn(
        "_dsc",
        F.when(
            F.col("_wcnt") == trend_window,
            F.lit(trend_window) * F.col("_y") - F.col("_wsum"),
        ),
    )
    per_dow = full.filter(F.col("_dsc").isNotNull()).groupBy("day_idx").agg(
        F.sum("_dsc").alias("_s"), F.count(F.lit(1)).alias("_nd")
    )
    # raw seasonal per weekday: s_d = S_d / (w * n_d) — ONE double
    # division of exact decimals
    raw = per_dow.select(
        "day_idx",
        (
            F.col("_s").cast("double") / (w_lit * F.col("_nd").cast("double"))
        ).alias("_raw"),
    )
    # centering: sbar = in-order fold of the (<= period) raw values
    # sorted by day_idx, / period — engine-identical float sequence
    sbar = raw.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("day_idx"), F.col("_raw")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["_raw"],
        ).alias("_fold"),
        F.count(F.lit(1)).alias("_k"),
    ).select((F.col("_fold") / F.col("_k").cast("double")).alias("_sbar"))
    seasonal = raw.crossJoin(F.broadcast(sbar)).select(
        "day_idx", (F.col("_raw") - F.col("_sbar")).alias("seasonal")
    )
    trend = F.when(
        F.col("_wcnt") == trend_window,
        F.col("_wsum").cast("double") / w_lit,
    )
    return (
        full.join(F.broadcast(seasonal), "day_idx", "left")
        .select(
            "day",
            "day_idx",
            F.col("_y").cast("double").alias("y"),
            trend.alias("trend"),
            "seasonal",
            (F.col("_y").cast("double") - trend - F.col("seasonal")).alias(
                "resid"
            ),
        )
    )


def daily_anomalies(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    k: float = 3.0,
    period: int = 7,
    trend_window: int = 7,
    value_decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Decomposition-residual anomaly days — the drift monitor
    :func:`decompose_daily` exists to feed: a day is anomalous when its
    residual (what's left AFTER the trend and the weekly rhythm are
    explained away) sits more than ``k`` residual-standard-deviations
    from the residual mean. A raw-value z-score flags every Black
    Friday; the residual z-score flags only the days the seasonal
    model cannot explain.

    Determinism: the residuals are decompose_daily's engine-identical
    doubles; their mean and variance come from TWO in-order float folds
    over the day-sorted residual list (the token_jsd contract — the
    daily frame is bounded), and the z-score / flag are fixed-shape
    expressions over those. Days without a residual (window edges,
    gaps) emit NULL z and flag 0. Zero residual variance (a perfectly
    explained series) pins z to NULL, flag 0.

    Output: ``(day, day_idx, y, resid, z, is_anomaly)``.
    """
    dec = decompose_daily(
        df,
        ts_col,
        value_col,
        period=period,
        trend_window=trend_window,
        value_decimal=value_decimal,
    )
    stats = (
        dec.filter(F.col("resid").isNotNull())
        .agg(
            F.sort_array(
                F.collect_list(F.struct("day", "resid"))
            ).alias("_lst")
        )
        .select(
            F.aggregate(
                "_lst", F.lit(0.0), lambda a, x: a + x["resid"]
            ).alias("_s"),
            F.aggregate(
                "_lst", F.lit(0.0), lambda a, x: a + x["resid"] * x["resid"]
            ).alias("_q"),
            F.size("_lst").cast("double").alias("_n"),
        )
        .select(
            (F.col("_s") / F.col("_n")).alias("_mean"),
            # q/n - (s/n)^2 can round to a tiny NEGATIVE for near-constant
            # residuals; sqrt(neg) is NaN, and Spark orders NaN greater
            # than every number, so `_sd > 0` would flag EVERY day
            # anomalous with z=NaN (ADVICE r9).  Clamp at exact 0.0: the
            # clamped sd is 0, the `_sd > 0` gate pins z to NULL, flag 0.
            F.sqrt(
                F.greatest(
                    F.col("_q") / F.col("_n")
                    - (F.col("_s") / F.col("_n")) * (F.col("_s") / F.col("_n")),
                    F.lit(0.0),
                )
            ).alias("_sd"),
        )
    )
    z = (F.col("resid") - F.col("_mean")) / F.col("_sd")
    return dec.crossJoin(F.broadcast(stats)).select(
        "day",
        "day_idx",
        "y",
        "resid",
        F.when(F.col("resid").isNotNull() & (F.col("_sd") > 0), z).alias("z"),
        F.when(
            F.col("resid").isNotNull()
            & (F.col("_sd") > 0)
            & (F.abs(z) > F.lit(float(k))),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_anomaly"),
    )


def seasonal_index(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    value_decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Multiplicative day-of-week seasonal indices over a daily series —
    the seasonality quantifier that turns :func:`autocorrelation`'s
    "lag-7 is real" into usable factors (deseasonalize before
    :func:`holt_smooth`, or staff by them):

        index(d) = mean(daily totals on weekday d) / mean(all days)

    Weekday is INTEGER epoch-day arithmetic ``pmod(floor(epoch_s /
    86400), 7)`` (0 = Thursday, the 1970-01-01 anchor — labeled
    ``day_idx``; never an engine dayofweek(), whose numbering
    conventions differ). FLOOR division + pmod — not truncation + `%`,
    whose sign follows the dividend — so pre-1970 timestamps (negative
    epoch seconds) land on the correct weekday with day_idx in [0, 7)
    (ADVICE r8). Input
    rows aggregate to exact DECIMAL daily totals first; every mean is
    a ratio of exact decimal sums, and the index is one fixed-shape
    double expression, unrounded. Days with no rows count as zero-total
    days only if the input grid says so — feed a
    :func:`resample_timeseries` zero-filled grid when absent days are
    real zeros.

    Output: 7 rows (for a series spanning all weekdays) —
    ``(day_idx, n_days, day_mean, seasonal_index)``.
    """
    day = F.floor(_epoch_s(ts_col) / F.lit(86400))
    daily = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(day.cast("long").alias("_day"))
        .agg(F.sum(F.col(value_col).cast(value_decimal)).alias("_t"))
    )
    staged = daily.select(
        F.pmod(F.col("_day"), F.lit(7)).alias("day_idx"), "_t"
    )
    glob = staged.agg(
        (
            F.sum("_t").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("_gmean")
    )
    per_dow = staged.groupBy("day_idx").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("_t").alias("_s")
    )
    mean_d = F.col("_s").cast("double") / F.col("n_days").cast("double")
    return per_dow.crossJoin(F.broadcast(glob)).select(
        "day_idx",
        "n_days",
        mean_d.alias("day_mean"),
        F.when(
            F.col("_gmean") != F.lit(0.0), mean_d / F.col("_gmean")
        ).alias("seasonal_index"),
    )
