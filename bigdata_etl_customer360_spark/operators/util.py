"""Shared operator plumbing."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let1(bound: Column, body: Callable[[Column], Column]) -> Column:
    """``let v = bound in body(v)`` as a Catalyst expression.

    Spark's projection collapsing INLINES a withColumn-defined expression
    into every downstream reference — an expensive subexpression used k
    times is computed k times (no CSE in interpreted higher-order
    functions). Binding it as a one-element-array lambda variable forces
    single evaluation: ``element_at(transform(array(bound), v -> body), 1)``.
    """
    return F.element_at(F.transform(F.array(bound), body), 1)


def inline1(bound: Column, body: Callable[[Column], Column]) -> Column:
    """Multi-output ``let``: evaluate ``bound`` once, emit the fields of
    ``body(bound)`` (a struct) as real columns via the ``inline``
    generator. Use in ``df.select("*", inline1(...))``.

    Unlike ``let1`` + struct-field extraction (which re-inlines the whole
    expression per field), a generator's child is evaluated ONCE per row
    and its output attributes are ordinary columns downstream projections
    can reference for free.
    """
    return F.inline(F.transform(F.array(bound), body))


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    before compute-heavy per-row work.

    A small/compacted input (one parquet row group) plans as ONE partition,
    serializing an expensive projection onto one core while the rest of the
    cluster idles. The repartition shuffle costs far less than the skew it
    removes. No-op when the input is already parallel enough — at real
    scale (thousands of input splits) this never triggers.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
