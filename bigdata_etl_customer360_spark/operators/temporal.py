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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every ``left`` row, attach the latest ``right`` row of the same
    ``on`` key with ``right_ts <= left_ts`` (backward as-of). Left rows
    with no prior right row keep nulls (left-outer semantics).

    Output: all ``left`` columns plus ``<right_ts><suffix>`` and
    ``<v><suffix>`` for each value column.
    """
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
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_r").asc_nulls_first())
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
