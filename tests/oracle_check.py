"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle side-by-side, compare row count + (sorted-by-name)
columns + order-insensitive values."""

from __future__ import annotations

import math

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0.0"  # normalize -0.0
        return repr(v)  # full precision — exact match required
    return str(v)


def _canon(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)
    )
    return cols, rows


def compare_frames(spark_pdf, oracle_pdf) -> list[str]:
    """Returns a list of mismatch descriptions; empty == match."""
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, sr = _canon(spark_pdf)
    oc, orows = _canon(oracle_pdf)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    if sr != orows:
        n_bad = sum(1 for a, b in zip(sr, orows) if a != b) + abs(len(sr) - len(orows))
        for a, b in zip(sr, orows):
            if a != b:
                problems.append(f"first differing row:\n  spark : {a}\n  oracle: {b}")
                break
        problems.append(f"value mismatch in {n_bad} row slots (of {len(sr)})")
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        df = q(spark, sf_dir)
        n = df.count()
        return [] if n >= 0 else [f"{name}: negative row count?"]
    spark_pdf = q(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(sql, sf_dir)
    return compare_frames(spark_pdf, oracle_pdf)
