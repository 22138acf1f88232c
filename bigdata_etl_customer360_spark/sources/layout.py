"""Multi-dimensional data layout: Z-order (Morton) clustering for write
paths whose readers filter on SEVERAL columns at once.

Sorting a table on one column makes parquet min/max pruning perfect for
that column and useless for every other; interleaving the bits of k
columns gives every one of them locality, so a selective filter on ANY
of the z-columns skips most row groups. This is the Delta/Iceberg
`OPTIMIZE ZORDER BY` capability re-expressed as plain Catalyst
expressions + a range-partitioned write — nothing engine-private.

Scale notes: the z-key is pure per-row codegen (bit shifts/masks) after
ONE tiny min/max aggregate (2k values to the driver — bounded, like the
IVF centroid fit); the clustered write is a repartitionByRange + in-
partition sort, the same cost as any global sort, paid once at write
time to make every subsequent multi-predicate scan cheap. Min/max
linear normalization is skew-sensitive (a single outlier compresses the
grid); for heavy-tailed columns pre-bucket by rank (ntile) first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_expr(
    norm_cols: Sequence[Column],
    bits: int = 12,
) -> Column:
    """Interleave the low ``bits`` bits of pre-normalized non-negative
    int columns into one Morton key (column i contributes bit b to key
    position b*k + i). Pure codegen — no UDF."""
    k = len(norm_cols)
    if not 1 <= k * bits <= 63:
        raise ValueError("k*bits must fit a signed 64-bit key")
    z = F.lit(0).cast("long")
    for i, c in enumerate(norm_cols):
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long")),
                    b * k + i,
                )
            )
    return z


def with_zorder_key(
    df: DataFrame,
    columns: Sequence[str],
    bits: int = 12,
    out_col: str = "_z",
) -> DataFrame:
    """Attach a Morton key built from min/max-normalized ``columns``
    (numeric or timestamp). One small aggregate for the bounds, then a
    map-only projection."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in columns],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in columns],
    ).collect()[0]
    top = (1 << bits) - 1
    norms = []
    for c in columns:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        span = (mx - mn) or 1.0
        norms.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * F.lit(top)),
            ).cast("long")
        )
    return df.withColumn(out_col, zorder_expr(norms, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    columns: Sequence[str],
    bits: int = 12,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order key of
    ``columns``: range-partition on the key (num_files output files with
    contiguous z-ranges), sort within partitions, drop the key. Readers
    filtering on any z-column then prune most row groups via parquet
    min/max stats — the multi-dimensional sibling of a sorted write."""
    keyed = with_zorder_key(df, columns, bits)
    (
        keyed.repartitionByRange(int(num_files), F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def with_zorder_key_ranked(
    df: DataFrame,
    columns: Sequence[str],
    bits: int = 12,
    out_col: str = "_z",
    relative_error: float = 0.001,
) -> DataFrame:
    """Rank-normalized Morton key: each column maps through its own
    quantile grid instead of a min/max line, so heavy-tailed or
    outlier-bearing columns still spread across the full 2^bits cells
    (one extreme value compresses the min/max variant's whole grid into
    a few cells — measured in the layout test).

    Bounds: one ``approxQuantile`` pass per column (driver receives
    2^bits doubles per column — bounded, like the IVF centroid fit);
    the per-row cell lookup is a BITS-deep branchless binary search
    unrolled into ``element_at``/``when`` expressions over the literal
    boundary array — pure codegen, no higher-order interpreted lambda
    scanning 2^bits elements per row.

    Ties/duplicates in the quantile grid are fine (equal boundaries make
    some cells empty; ordering stays correct). NULLs map to cell 0.
    """
    cells = 1 << bits
    norms = []
    for c in columns:
        qs = [i / cells for i in range(1, cells)]
        bounds = df.approxQuantile(c, qs, relative_error)
        arr = F.lit(bounds)
        idx: Column = F.lit(0)
        step = cells >> 1
        while step >= 1:
            cand = idx + F.lit(step)
            # boundary[k] separates cell k-1 from cell k (1-indexed array)
            ok = (cand <= F.lit(cells - 1)) & (
                F.col(c).cast("double") >= F.element_at(arr, cand.cast("int"))
            )
            idx = F.when(ok, cand).otherwise(idx)
            step >>= 1
        norms.append(F.coalesce(idx, F.lit(0)).cast("long"))
    return df.withColumn(out_col, zorder_expr(norms, bits))


def compact_parquet(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the lakehouse maintenance pass streaming
    sinks make necessary (a per-trigger file sink leaves thousands of
    KB-sized parquet files; every later scan pays per-file open cost and
    tiny row groups defeat min/max pruning): rewrite the directory into
    ``ceil(total_bytes / target_bytes)`` files, optionally sorted within
    partitions to restore row-group pruning on hot columns.

    Crash-safe swap (the `_merge_into_snapshot` discipline): the rewrite
    lands in ``<path>._tmp``, the old directory rotates to ``<path>._old``
    only after the new data is fully written, and ``._old`` survives until
    the new directory is in place — at every instant one full copy exists.

    Returns ``{"files_before", "files_after", "bytes", "rows"}`` for the
    maintenance log. Single-writer assumption, like the snapshot sinks.
    On a real deployment the same pass runs per partition directory
    (compact yesterday's partition after the stream closes it).
    """
    import math
    import os
    import shutil

    tmp, old = path.rstrip("/") + "._tmp", path.rstrip("/") + "._old"
    # RECOVERY: a crash between rename(path, ._old) and rename(._tmp, path)
    # leaves the data only in ._old — restore it before doing anything
    # (the _merge_into_snapshot discipline, actually implemented)
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
    shutil.rmtree(tmp, ignore_errors=True)  # stale partial rewrite

    files = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(path)
        for f in fn
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / float(target_bytes)))
    df = spark.read.parquet(path)
    rows = df.count()
    out = df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after = [
        f
        for dp, _dn, fn in os.walk(path)
        for f in fn
        if f.endswith(".parquet")
    ]
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes": int(total),
        "rows": int(rows),
    }
