"""Reusable scalar expression builders (SURVEY §2.8 E1-E9).

All pure Catalyst ``Column`` expressions — they stay inside whole-stage
codegen, never leave the JVM, and are deterministic (every tie the
reference resolved by accidental when-chain order is pinned explicitly
here).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def case_map(
    col: Column | str,
    mapping: Mapping[str, str],
    default: str | None = None,
) -> Column:
    """Data-driven CASE WHEN chain (E1): value -> label dimension mapping.

    The reference hardcodes the AppName→content-type mapping as a 7-branch
    ``when`` chain (ETL_customer_interaction.py:10-17); here the dimension
    is config, not code. For small dimensions a generated CASE beats a
    broadcast join: zero shuffle, zero extra plan nodes, fully codegen'd.
    For dimensions with >~10k entries, use
    ``operators.dimension_map.map_dimension_join`` instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for value, label in mapping.items():
        cond = c == F.lit(value)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default) if default is not None else F.lit(None))


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a float column via exact decimal arithmetic.

    Float addition is not associative, so a parallel double-sum differs
    run-to-run in the last ulp. Summing as DECIMAL is exact (hence
    partition-order independent) and casts back to DOUBLE losslessly for
    2-decimal business values. At 100 TB this is what makes re-runs and
    oracle comparisons bit-stable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double")


def argmax_label(
    cols: Sequence[str],
    labels: Sequence[str] | None = None,
) -> Column:
    """Name of the greatest of N columns, ties by position order (E2/E3).

    Reference semantics: ``greatest(*)`` + a fixed-order when-chain
    (ETL_customer_interaction.py:25-31) — the first column in ``cols``
    wins ties, matching the reference's when-order tie priority.
    """
    labels = list(labels) if labels is not None else list(cols)
    if len(labels) != len(cols):
        raise ValueError("labels must match cols")
    greatest = F.greatest(*[F.col(c) for c in cols]) if len(cols) > 1 else F.col(cols[0])
    expr: Column | None = None
    for c, lab in zip(cols, labels):
        cond = F.col(c) == greatest
        expr = F.when(cond, F.lit(lab)) if expr is None else expr.when(cond, F.lit(lab))
    return expr


def flag_concat(
    cols: Sequence[str],
    labels: Sequence[str] | None = None,
    sep: str = "-",
) -> Column:
    """Separator-joined labels of the nonzero columns, fixed order (E4).

    ``concat_ws`` skips null branches, exactly reproducing the
    reference's "Taste" column (ETL_customer_interaction.py:34-41).
    """
    labels = list(labels) if labels is not None else list(cols)
    parts = [
        F.when(F.col(c) != 0, F.lit(lab)) for c, lab in zip(cols, labels)
    ]
    return F.concat_ws(sep, *parts)


def bucketize_expr(
    col: Column | str,
    boundaries: Sequence[float],
    labels: Sequence[str],
    right_closed: bool = True,
) -> Column:
    """Range bucketing CASE (E5), boundaries pinned and test-covered.

    ``boundaries=[10, 20], labels=["Low","Medium","High"]`` reproduces the
    reference's activeness buckets (ETL_customer_interaction.py:54-57):
    x > 20 → High, 10 <= x <= 20 → Medium, x < 10 → Low. With
    ``right_closed=True`` bucket i is (b[i-1], b[i]]; values above the last
    boundary take the last label.
    """
    if len(labels) != len(boundaries) + 1:
        raise ValueError("need len(labels) == len(boundaries) + 1")
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for b, lab in zip(boundaries, labels[:-1]):
        cond = (c <= F.lit(b)) if right_closed else (c < F.lit(b))
        expr = F.when(cond, F.lit(lab)) if expr is None else expr.when(cond, F.lit(lab))
    return expr.otherwise(F.lit(labels[-1]))
