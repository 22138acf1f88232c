"""Z-order layout tests: the Morton key interleaves correctly, and a
z-ordered parquet write prunes row groups on BOTH dimensions where a
single-column sort prunes only one."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.sources.layout import (
    with_zorder_key,
    write_zordered,
    zorder_expr,
)


def test_zorder_expr_interleaves_bits(spark):
    df = spark.createDataFrame([Row(a=a, b=b) for a in range(4) for b in range(4)])
    out = df.select(
        "a", "b", zorder_expr([F.col("a"), F.col("b")], bits=2).alias("z")
    ).collect()
    for r in out:
        want = 0
        for bit in range(2):
            want |= ((r["a"] >> bit) & 1) << (2 * bit)
            want |= ((r["b"] >> bit) & 1) << (2 * bit + 1)
        assert r["z"] == want


def test_zorder_expr_key_width_guard(spark):
    import pytest

    with pytest.raises(ValueError, match="64-bit"):
        zorder_expr([F.col("a")] * 8, bits=8)


def _touched(files, col, lo, hi):
    """Row groups whose [min,max] for col intersects [lo, hi]."""
    n = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            grp = meta.row_group(rg)
            for ci in range(grp.num_columns):
                c = grp.column(ci)
                if c.path_in_schema == col:
                    st = c.statistics
                    if st is None or (st.min <= hi and st.max >= lo):
                        n += 1
    return n


def test_zordered_write_prunes_both_dimensions(spark, tmp_path):
    # 64x64 grid: x-sorted layout gives y zero locality; z-order gives both
    rows = [Row(x=x, y=y, payload=x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows)

    zpath = str(tmp_path / "zordered")
    xpath = str(tmp_path / "xsorted")
    write_zordered(df, zpath, ["x", "y"], bits=6, num_files=16)
    (
        df.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    zfiles = glob.glob(zpath + "/*.parquet")
    xfiles = glob.glob(xpath + "/*.parquet")

    # correctness: same rows back
    assert sorted(r["payload"] for r in spark.read.parquet(zpath).collect()) == sorted(
        r["payload"] for r in df.collect()
    )

    # selective y-slice: x-sorted layout must scan EVERY row group;
    # the z-ordered layout skips most of them
    z_touch = _touched(zfiles, "y", 3, 6)
    x_touch = _touched(xfiles, "y", 3, 6)
    z_total = sum(pq.ParquetFile(f).metadata.num_row_groups for f in zfiles)
    x_total = sum(pq.ParquetFile(f).metadata.num_row_groups for f in xfiles)
    assert x_touch == x_total, "x-sorted layout has no y locality"
    assert z_touch <= z_total // 2, f"z-order should skip >=half: {z_touch}/{z_total}"

    # and the x-slice still prunes on the z layout too (both dims work)
    assert _touched(zfiles, "x", 3, 6) <= z_total // 2


def test_csv_and_orc_round_trip(spark, tmp_path):
    """read_csv (explicit schema, FAILFAST) and read_orc round-trip the
    same rows; CSV with a bad row fails fast instead of null-poisoning."""
    import pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bigdata_etl_customer360_spark.sources.readers import read_csv, read_orc

    df = spark.createDataFrame(
        [Row(k=i, name=f"n{i}") for i in range(100)]
    ).select(F.col("k").cast("long"), "name")
    orc_path = str(tmp_path / "orc")
    csv_path = str(tmp_path / "csv")
    df.write.orc(orc_path)
    df.write.option("header", "true").csv(csv_path)

    schema = StructType(
        [StructField("k", LongType()), StructField("name", StringType())]
    )
    got_csv = read_csv(spark, csv_path, schema)
    got_orc = read_orc(spark, orc_path, columns=["k", "name"])
    want = sorted((r["k"], r["name"]) for r in df.collect())
    assert sorted((r["k"], r["name"]) for r in got_csv.collect()) == want
    assert sorted((r["k"], r["name"]) for r in got_orc.collect()) == want

    bad = tmp_path / "bad.csv"
    bad.write_text("k,name\n1,ok\nnot_a_number,oops\n")
    with pytest.raises(Exception):
        read_csv(spark, str(bad), schema).collect()


def test_ranked_zorder_survives_outliers_and_is_monotone(spark):
    """One huge outlier collapses the min/max grid onto a few cells; the
    rank-normalized key keeps the full spread. Cell assignment must be
    monotone in the underlying value."""
    import random

    from bigdata_etl_customer360_spark.sources.layout import (
        with_zorder_key,
        with_zorder_key_ranked,
    )

    random.seed(7)
    rows = [Row(x=float(random.randint(0, 100)), y=float(i % 64)) for i in range(4096)]
    rows.append(Row(x=1e9, y=1.0))
    df = spark.createDataFrame(rows)
    mm = with_zorder_key(df, ["x", "y"], bits=6).select("_z").distinct().count()
    rk = with_zorder_key_ranked(df, ["x", "y"], bits=6).select("_z").distinct().count()
    assert rk > 10 * mm  # 2509 vs 65 measured

    # monotonicity of the rank binning (single column isolates the cell id)
    one = spark.createDataFrame([Row(v=float(i)) for i in range(1000)])
    cells = (
        with_zorder_key_ranked(one, ["v"], bits=4)
        .orderBy("v")
        .select("_z")
        .collect()
    )
    seq = [r["_z"] for r in cells]
    assert seq == sorted(seq)
    assert len(set(seq)) >= 14  # ~16 cells actually used


def test_compact_parquet_reduces_files_keeps_rows(spark, tmp_path):
    import pyspark.sql.functions as F

    from bigdata_etl_customer360_spark.sources.layout import compact_parquet

    p = str(tmp_path / "frag")
    # 40 tiny files (one per partition write)
    spark.range(4000).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    ).repartition(40).write.parquet(p)
    before = spark.read.parquet(p)
    want = sorted(r["id"] for r in before.collect())
    stats = compact_parquet(spark, p, target_bytes=1 << 30, sort_within_by=["k"])
    assert stats["files_before"] >= 40
    assert stats["files_after"] == 1
    assert stats["rows"] == 4000
    got = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert got == want


def test_compact_parquet_recovers_from_crashed_swap(spark, tmp_path):
    import os

    import pyspark.sql.functions as F

    from bigdata_etl_customer360_spark.sources.layout import compact_parquet

    p = str(tmp_path / "crashy")
    spark.range(100).select(F.col("id")).repartition(5).write.parquet(p)
    want = sorted(r["id"] for r in spark.read.parquet(p).collect())
    # simulate the crash window: data rotated to ._old, path missing
    os.rename(p, p + "._old")
    stats = compact_parquet(spark, p, target_bytes=1 << 30)
    assert stats["rows"] == 100
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == want
    assert not os.path.isdir(p + "._old")
