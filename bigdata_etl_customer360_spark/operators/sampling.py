"""Deterministic sampling for training-data pipelines.

Random sampling breaks the reproducibility contract a data pipeline needs
(a re-run must produce the same corpus, or downstream hashes/evals drift).
These samplers derive membership from content-independent key hashes, like
``textstats.with_hash_split``: the same rows are chosen on any engine, any
partitioning, any run. (Unlike the fraction-based hash split, a fixed-SIZE
sample is rank-based, so adding rows to a stratum can displace previously
chosen rows — determinism is per-corpus, not append-stable.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_n_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "c360",
) -> DataFrame:
    """Fixed-size stratified sample: exactly ``min(n, |stratum|)`` rows per
    ``group_col`` value, chosen by ranking on ``md5(salt || id)`` — a
    uniform, engine-portable pseudo-random order (md5 hex compares the
    same everywhere; the id tie-break covers identical digests).

    The standard balanced-corpus op (n docs per language / per source):
    one shuffle on the stratum key, per-partition top-n via the rank
    window. Strata are processed independently, so a skewed giant stratum
    costs a sort of ITS rows only — and at 100 TB, swap ``row_number``
    pruning stays in the window operator (no global sort, no collect).
    """
    rank_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "c360w",
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    ``weight_col`` (clamped to [0, 1]) — the standard quality-weighted
    corpus downsample ("keep high-quality docs, thin the tail"), made
    reproducible by deriving the coin flip from ``md5(salt || id)``
    instead of ``rand()``.

    Mechanism: the first 8 md5 hex chars (32 bits, engine-portable) read
    as an integer ``u`` uniform on [0, 2^32); the weight quantizes to
    ``q = floor(clamp(weight) * scale)`` and the row survives iff
    ``u * scale < q * 2^32`` — all BIGINT (max operand ~4.3e18, inside
    int64), no float ever compared, so the same rows are chosen by any
    engine (quantization to 1/scale granularity is part of the contract,
    not drift). Weights >= 1 always keep; <= 0 always drop.

    Scale: a map-only filter — zero shuffle, pushes into the scan stage.
    Re-runs, retries, and engine swaps keep the identical row set, which
    is what makes downstream dedup/eval hashes stable.
    """
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    q = F.floor(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.col(weight_col).cast("double")))
        * F.lit(scale)
    ).cast("bigint")
    return df.filter(u * F.lit(scale) < q * F.lit(4294967296))
