"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — the standard pretraining-dedup ladder:

- ``dedup_exact``       exact duplicates via normalized-text fingerprint
                        (one shuffle on the hash; keeps the smallest id).
- ``ngram_jaccard_pairs`` EXACT near-dup pairs by word-shingle Jaccard —
                        inverted-index join, no O(n²) cross product.
- ``minhash_lsh_pairs`` MinHash + banded LSH candidates, verified with
                        exact Jaccard — the 100 TB-scale path: cost is
                        O(n·sig) + bucket joins instead of all-pairs.
- ``simhash``           64-bit SimHash fingerprints + near-dup pairs via
                        Hamming-ball banding.

Everything except the Hamming popcount runs as Catalyst array expressions
(JVM, codegen) — no Python in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.textstats import tokens_expr


def with_shingles(df: DataFrame, col: str = "text", n: int = 3, out_col: str = "shingles") -> DataFrame:
    toks = tokens_expr(col)
    return df.withColumn("_t", toks).withColumn(
        out_col,
        F.when(F.size(F.col("_t")) >= n, _shingles_from("_t", n)).otherwise(
            F.array().cast("array<string>")
        ),
    ).drop("_t")


def _shingles_from(tok_col: str, n: int) -> Column:
    parts = ", ".join(f"element_at({tok_col}, i + {j})" for j in range(n))
    sh = F.expr(
        f"transform(sequence(1, size({tok_col}) - {n - 1}), i -> concat_ws(' ', {parts}))"
    )
    return F.array_distinct(sh)


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per distinct normalized text: the one with the
    smallest id (deterministic winner). Plan: fingerprint projection →
    one shuffle on the 128-bit hash → min-id filter. Grouping on the
    md5 rather than the full text keeps shuffle rows small at scale."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    fp = df.withColumn("_fp", F.md5(normalized))
    w_min = F.min(F.col(id_col)).over(Window.partitionBy("_fp"))
    return fp.withColumn("_keep", F.col(id_col) == w_min).filter("_keep").drop("_fp", "_keep")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT near-duplicate pairs: Jaccard over distinct word n-grams.

    Plan: explode shingles → inverted-index self-join on shingle (only
    docs sharing ≥1 shingle ever meet — no cross product) → count shared
    shingles per pair → Jaccard from |A|,|B|,|A∩B|. The explode-join is
    the scalable formulation: shuffle is proportional to the posting
    lists, and AQE splits skewed shingle buckets. For web-scale corpora
    drop stop-shingles (document frequency cap) first, or use
    ``minhash_lsh_pairs``.
    """
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("_id"), F.col("shingles")
    )
    sized = sh.withColumn("_sz", F.size("shingles"))
    posts = sized.select("_id", "_sz", F.explode("shingles").alias("_sh"))
    a, b = posts.alias("a"), posts.alias("b")
    inter = (
        a.join(b, (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                 F.col("a._sz").alias("sz_a"), F.col("b._sz").alias("sz_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """MinHash + banded-LSH near-dup candidates, optionally verified with
    exact Jaccard — the scale path for near-dedup.

    Signature: ``sig[i] = min over shingles of xxhash64(i, shingle)``
    (seeded by prepending the permutation index — all JVM-side array
    exprs). Banding: ``bands`` groups of ``num_hashes/bands`` rows; docs
    colliding on any band hash become candidates (standard LSH S-curve).
    Cost at scale: O(n·num_hashes) + a shuffle on (band, band_hash) —
    never all-pairs. ``verify=True`` re-checks candidates with exact
    Jaccard so precision is 1.0; recall follows the S-curve.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands

    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("_id"), F.col("shingles")
    ).filter(F.size("shingles") > 0)

    sig = sh.withColumn(
        "_sig",
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}), "
            f"i -> array_min(transform(shingles, s -> xxhash64(i, s))))"
        ),
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, xxhash64(b, slice(_sig, b * {rows_per_band} + 1, "
                f"{rows_per_band})) AS bhash))"
            )
        ).alias("_band"),
    ).select("_id", F.col("_band.band").alias("band"), F.col("_band.bhash").alias("bhash"))

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    if not verify:
        return cand

    sets = sh.select(F.col("_id"), F.col("shingles"), F.size("shingles").alias("_sz"))
    cand = (
        cand.join(sets.withColumnRenamed("_id", "id_a").withColumnRenamed("shingles", "sh_a")
                  .withColumnRenamed("_sz", "sz_a"), on="id_a")
        .join(sets.withColumnRenamed("_id", "id_b").withColumnRenamed("shingles", "sh_b")
              .withColumnRenamed("_sz", "sz_b"), on="id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter).cast("double")
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
) -> DataFrame:
    """64-bit SimHash fingerprint from word tokens, entirely in Catalyst:
    for each bit b, sum ±1 contributions of xxhash64(token) bit b over all
    tokens; bit b of the fingerprint is 1 iff the sum is positive."""
    toks = tokens_expr(text_col)
    bit_votes = (
        "transform(sequence(0, 63), b -> "
        "aggregate(_toks, 0L, (acc, t) -> acc + CASE WHEN (shiftright(xxhash64(t), b) & 1) = 1 "
        "THEN 1 ELSE -1 END))"
    )
    fingerprint = (
        "aggregate(transform(sequence(0, 63), b -> "
        "CASE WHEN element_at(_votes, b + 1) > 0 THEN shiftleft(1L, b) ELSE 0L END), "
        "0L, (acc, x) -> acc | x)"
    )
    return (
        df.withColumn("_toks", toks)
        .withColumn("_votes", F.expr(bit_votes))
        .withColumn(out_col, F.expr(fingerprint))
        .drop("_toks", "_votes")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via block
    banding: split the 64-bit fingerprint into max_hamming+1 blocks — any
    pair within the Hamming ball collides on at least one full block
    (pigeonhole), so candidates come from equi-joins on block values,
    never a cross product."""
    blocks = max_hamming + 1
    width = 64 // blocks
    fp = with_simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
    banded = fp.select(
        "_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {blocks - 1}), "
                f"b -> struct(b AS blk, shiftright(simhash, b * {width}) & {(1 << width) - 1} AS bval))"
            )
        ).alias("_b"),
    ).select("_id", "simhash", F.col("_b.blk").alias("blk"), F.col("_b.bval").alias("bval"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
