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


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "c360mix",
    scale: int = 1_000_000,
) -> DataFrame:
    """Domain-mixture downsampling: pick rows so the output composition
    approaches the target ``weights`` (the Pile/LLaMA-style per-source
    training-mix step: "50% web, 20% code, ..."), keeping the mixture as
    LARGE as the data allows without upsampling.

    Mechanism: with per-domain counts n_i and target fractions w_i, the
    largest achievable total is T = min_i(n_i / w_i); domain i keeps rows
    at rate r_i = clamp(w_i * T / n_i, 0, 1) — the scarcest domain is
    consumed whole and every other domain thins to match. Domains absent
    from ``weights`` are DROPPED (an explicit mix is a whitelist). A
    weighted domain with ZERO rows in the data participates in T with
    n_i = 0, so T = 0 and the sample is EMPTY — the requested composition
    is unachievable and the operator says so loudly (an empty frame)
    rather than silently delivering a different mixture. The
    per-row coin reuses :func:`weighted_sample`'s engine-portable
    md5/BIGINT contract (quantized to 1/scale), so the exact row set is
    reproducible on any engine/partitioning — expected counts are hit in
    distribution, not exactly (rate-based, not rank-based, so membership
    is per-row stable and appending one domain's data never reshuffles
    another's sample).

    Plan: domain counts = one map-side-combined hash agg whose output is
    |domains| rows; rates derive in-plan (broadcast the tiny counts x
    weights frame both times) and the filter itself is map-only against
    the broadcast rates — the big table is read once for counting, once
    for filtering, with no wide shuffle anywhere.
    """
    if not weights:
        raise ValueError("mixture_sample needs a non-empty weights dict")
    if any(not v > 0 for v in weights.values()):
        raise ValueError("mixture weights must be > 0 (omit a domain to drop it)")
    spark = df.sparkSession
    from bigdata_etl_customer360_spark.operators.util import local_df

    wdf = local_df(
        spark,
        [(str(k), float(v)) for k, v in weights.items()],
        f"{domain_col} string, _w double",
    )
    counts = df.groupBy(domain_col).agg(F.count("*").alias("_n"))
    # LEFT join from the weights (counts side broadcast — it is already a
    # collapsed |domains|-row aggregate): a weighted domain absent from the
    # data keeps a row with _n = 0, so it bounds T at 0 per the docstring
    # formula instead of being silently dropped by an inner join.
    caps = wdf.join(F.broadcast(counts), on=domain_col, how="left").withColumn(
        "_n", F.coalesce(F.col("_n"), F.lit(0))
    )
    t_max = caps.select(F.min(F.col("_n") / F.col("_w")).alias("_T"))
    # _n = 0 (empty weighted domain) has no rows to keep anyway; guard the
    # division so ANSI mode never sees 0/0 — its rate is pinned to 0.
    rate = F.when(
        F.col("_n") > 0, F.col("_w") * F.col("_T") / F.col("_n")
    ).otherwise(F.lit(0.0))
    rates = caps.crossJoin(F.broadcast(t_max)).select(
        domain_col,
        F.floor(
            F.greatest(F.lit(0.0), F.least(F.lit(1.0), rate)) * F.lit(scale)
        )
        .cast("bigint")
        .alias("_q"),
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (
        df.join(F.broadcast(rates), on=domain_col, how="inner")
        .filter(u * F.lit(scale) < F.col("_q") * F.lit(4294967296))
        .drop("_q")
    )


def stratified_split(
    df: DataFrame,
    strata: list[str],
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
    salt: str = "c360split",
    labels: tuple[str, str, str] = ("train", "val", "test"),
    out_col: str = "split",
) -> DataFrame:
    """Exact-count stratified train/val/test assignment: within every
    stratum, rows are ranked by ``md5(salt || id)`` (a deterministic
    shuffle) and the first ``floor(f_train*n)`` go to train, the next
    ``floor((f_train+f_val)*n) - floor(f_train*n)`` to val, the rest to
    test — so every stratum's split sizes are exact integers, unlike
    rate-based hash splits whose per-stratum counts drift binomially
    (`textstats.with_hash_split` is the rate-based sibling: append-stable
    but inexact; this one is exact but rank-based, so appending rows can
    reassign earlier ones).

    Determinism: rank order is (md5 hex ASC, id ASC) — a total order with
    an engine-portable string compare; the boundary arithmetic is the
    IEEE double ``floor(f * n)`` evaluated identically by any engine.

    Plan: ONE hash shuffle on the strata (window rank + count); the md5
    ranking key computes map-side. Skew = stratum size, same as any
    per-group window.
    """
    f_train, f_val, _ = fractions
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    wn = Window.partitionBy(*strata)
    rn = F.row_number().over(w)
    n = F.count("*").over(wn)
    b1 = F.floor(F.lit(float(f_train)) * n)
    b2 = F.floor(F.lit(float(f_train + f_val)) * n)
    return df.select(
        "*",
        F.when(rn <= b1, F.lit(labels[0]))
        .when(rn <= b2, F.lit(labels[1]))
        .otherwise(F.lit(labels[2]))
        .alias(out_col),
    )


def shard_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 8,
    salt: str = "c360shard",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Reproducible global shuffle + sharding — the step between a curated
    corpus and training dataloaders: every row gets a shard in
    [0, num_shards) and a position within its shard, both derived from
    ``md5(salt || id)`` so the exact same shard files come out of any
    engine, any partitioning, any re-run (and changing ``salt`` is a
    fresh epoch-level reshuffle).

    Shard = first-32-md5-bits mod num_shards (balanced to ~n/num_shards
    by uniformity); position = rank of the md5 hex within the shard
    (ties — impossible for distinct ids, but pinned anyway — break by
    id). Writing with ``partitionBy(shard)`` + sort on ``pos`` then
    yields byte-stable shard files.

    Plan: the shard assignment is map-only; the position needs ONE hash
    shuffle on ``shard`` (a window per shard). Shards are uniform by
    construction, so the window never sees skew regardless of data skew.
    Sizing at scale: each shard's rank is ONE reducer by design (a shard
    file's rows must be totally ordered), so pick ``num_shards`` to make
    a shard ≈ one output file (hundreds of MB) — at 100 TB that means
    tens of thousands of shards, not 8.
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    shard = (u % F.lit(int(num_shards))).cast("int")
    w = Window.partitionBy(shard).orderBy(h.asc(), F.col(id_col).asc())
    return df.select(
        "*", shard.alias(shard_col), F.row_number().over(w).alias(pos_col)
    )


def group_split(
    df: DataFrame,
    group_col: str,
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "c360gsplit",
    labels: tuple[str, str, str] = ("train", "val", "test"),
    out_col: str = "split",
    scale: int = 1_000_000,
) -> DataFrame:
    """LEAKAGE-SAFE train/val/test assignment: the split is a pure
    function of the GROUP key (near-dup cluster id, url domain, author,
    …), so every row of a group lands in the same split — the guard
    against evaluation leakage through near-duplicates that row-level
    splitting (`stratified_split`, `with_hash_split`) cannot give.

    Mechanism: the group's md5-derived 32-bit uniform ``u`` (same
    engine-portable coin as :func:`weighted_sample`) is compared against
    quantized cumulative boundaries — all BIGINT, no float compare, so
    membership is reproducible on any engine AND append-stable: adding
    rows (or whole new groups) never reassigns an existing group.
    Fractions are hit in expectation over groups; exactness is the price
    of append-stability (the reverse trade of ``stratified_split``).

    Plan: a map-only projection — ZERO shuffle, no group enumeration; the
    coin recomputes per row from the group key. At 100 TB this assigns
    splits in the scan stage of whatever reads it.
    """
    f_train, f_val, f_test = fractions
    if min(f_train, f_val, f_test) < 0 or abs(f_train + f_val + f_test - 1.0) > 1e-9:
        raise ValueError("fractions must be >= 0 and sum to 1")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(group_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    q1 = int(f_train * scale)
    q2 = int((f_train + f_val) * scale)
    return df.select(
        "*",
        F.when(u * F.lit(scale) < F.lit(q1) * F.lit(4294967296), F.lit(labels[0]))
        .when(u * F.lit(scale) < F.lit(q2) * F.lit(4294967296), F.lit(labels[1]))
        .otherwise(F.lit(labels[2]))
        .alias(out_col),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "c360cap",
) -> DataFrame:
    """Domain-cap sampling: keep at most ``k`` rows per group — the
    anti-dominance rule a crawl pipeline applies so no single host /
    source / near-dup cluster floods the training mix (the complement of
    :func:`mixture_sample`'s ratio targeting: a hard per-group ceiling).

    Which ``k`` survive is DETERMINISTIC and uniform-ish: rows rank
    within their group by the md5-derived coin of ``(salt, id)`` — the
    engine-portable 32-bit uniform every sampler here shares — with the
    id as the total tie-break, so reruns, retries, and any partitioning
    pick the identical representatives (append-stability is deliberately
    NOT promised: adding rows to a full group can rotate which k win the
    coin order — use :func:`group_split`-style keyed rules when
    append-stability matters more than uniformity).

    Plan: ONE hash shuffle on ``group_col`` for the ranking window, then
    a filter — no joins, no driver state; groups under the cap pass
    through untouched. Output: the surviving original rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(k))
        .drop("_rk")
    )
