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
