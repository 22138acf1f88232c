"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk_brute``: exact top-k by cosine — broadcast the query set,
  score every corpus vector. The right baseline when |queries| is small;
  cost is a single pass over the corpus (no shuffle of the corpus at all).
- ``cosine_topk_lsh``: random-hyperplane LSH bucketing — the scale path:
  queries only meet corpus vectors sharing a hash bucket, turning the
  all-pairs score into bucket-local joins.

Determinism contract: embeddings are quantized to integers
(``floor(x * 2^20 + 0.5)``) so dot products and norms are EXACT integer
arithmetic; the final cosine is one correctly-rounded double expression.
Identical values on any engine, any partitioning, any evaluation order —
this is what makes an approximate-looking operator oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.util import (
    ARROW_TASK_BYTES,
    fan_out,
    scoped_cache,
)

QUANT_SCALE = 1 << 20  # ~6 decimal digits of embedding precision

# Every topk entry point broadcasts the QUERY side (brute/lsh/ivf score
# joins assume |queries| fits one executor). Misuse with a corpus-sized
# query frame would OOM a real cluster, so the entry points probe the
# query count first and refuse past this bound.
MAX_QUERY_ROWS = 1_000_000


def _guard_query_side(queries: DataFrame, max_query_rows: int) -> DataFrame:
    """Refuse a query frame too large to broadcast — and RETURN the
    materialized probe for the caller to use as the query side. The probe
    is ``limit(n+1).localCheckpoint()``: it stops after n+1 rows (cost
    bounded by the threshold, not the frame) and the checkpoint means the
    query lineage executes ONCE — the guard's row count and the
    operator's broadcast both read the materialized rows instead of
    re-running an arbitrarily expensive upstream plan twice. For corpus x
    corpus similarity use ``dedup.embedding_cosine_pairs`` (bucketed,
    nothing broadcast)."""
    # memoized per DataFrame OBJECT (r16): the recall certificates run 2-3
    # searches against the SAME query frame; plans are immutable, so the
    # materialized probe is reusable — one localCheckpoint+count instead
    # of one per entry-point call. Keyed on the threshold too (a stricter
    # re-check must re-count).
    cached = getattr(queries, "_c360_guard_probe", None)
    if cached is not None and cached[0] == max_query_rows:
        return cached[1]
    probe = queries.limit(max_query_rows + 1).localCheckpoint(eager=True)
    if probe.count() > max_query_rows:
        raise ValueError(
            f"query side has more than {max_query_rows} rows; the topk "
            "operators broadcast the query set and are meant for "
            "queries << corpus. For corpus-scale pair search use "
            "embedding_cosine_pairs (mode='lsh'), or raise "
            "max_query_rows explicitly if the executors can hold it."
        )
    queries._c360_guard_probe = (max_query_rows, probe)
    return probe


def hyperplane_signatures(num_planes: int, num_tables: int, seed: int = 0xC360):
    """Pandas UDF computing all ``num_tables`` random-hyperplane LSH
    signatures per vector in ONE numpy matmul per Arrow batch (vs
    num_tables*num_planes interpreted aggregate() passes in pure
    Catalyst). Hyperplanes come from a fixed-seed PCG64, so signatures
    are deterministic on every worker."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    def _signatures(vecs):
        V = np.stack(vecs.to_numpy()).astype("float64")  # (batch, dim)
        rng = np.random.default_rng(seed)
        W = rng.standard_normal((V.shape[1], num_tables * num_planes))
        bits = (V @ W) > 0  # (batch, tables*planes)
        weights = (1 << np.arange(num_planes)).astype("int64")
        sigs = np.stack(
            [bits[:, t * num_planes : (t + 1) * num_planes] @ weights
             for t in range(num_tables)],
            axis=1,
        ).astype("int32")  # (batch, tables)
        return pd.Series(list(sigs))

    return F.pandas_udf(_signatures, ArrayType(IntegerType()))


def quantize_expr(col: str | Column, out: str = "q") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(float(QUANT_SCALE)) + F.lit(0.5)).cast("long")
    ).alias(out)


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _norm_sq(a: str) -> Column:
    return F.aggregate(
        F.transform(F.col(a), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk_brute(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine), k rows per
    query, ties broken by neighbor id asc.

    Plan: broadcast(quantized queries) ⨯ corpus scan → codegen'd integer
    dot/norm arrays → per-query window top-k. The corpus is read once and
    never shuffled before the (tiny) top-k exchange; at 100 TB with a
    bounded query set this is scan-bound, which is optimal for brute force.
    """
    queries = _guard_query_side(queries, max_query_rows)
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(vec_col).alias("_qv")
    ).withColumn("_qn", _norm_sq("_qv"))
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), quantize_expr(vec_col).alias("_cv")
    ).withColumn("_cn", _norm_sq("_cv"))

    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine",
        _dot("_qv", "_cv").cast("double")
        / (F.sqrt(F.col("_qn").cast("double")) * F.sqrt(F.col("_cn").cast("double"))),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 12,
    num_tables: int = 4,
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each table hashes a vector to a ``num_planes``-bit signature (sign of
    the projection onto pseudo-random hyperplanes derived from xxhash64 —
    deterministic, no RNG state to ship). Query and corpus vectors meet
    only when some table bucket matches, then candidates are scored
    exactly like the brute path and top-k'd. Recall is tunable with
    (num_planes, num_tables); precision of returned scores is exact.

    Scale: corpus signatures are one projection pass; the join shuffles
    on (table, bucket) — bucket sizes ~ n / 2^num_planes keep it local.
    """
    queries = _guard_query_side(queries, max_query_rows)
    signatures = hyperplane_signatures(num_planes, num_tables)

    def with_buckets(df: DataFrame, label: str) -> DataFrame:
        """(id, tbl, sig) only — no payload vectors through the bucket
        join, so the shuffle rows are 3 scalars; vectors join back by id
        for scoring. Cached: feeds the join AND is a materialization
        boundary (constraint-inferred isnotnull(sig) filters would
        otherwise re-run the signature UDF below the scan)."""
        out = df.select(F.col(id_col).alias(label), signatures(F.col(vec_col)).alias("_s"))
        return scoped_cache(
            out.select(label, F.posexplode("_s").alias("tbl", "sig"))
        )

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(
        fan_out(corpus, per_task_bytes=ARROW_TASK_BYTES), "neighbor_id"
    )
    cand = qb.join(cb, on=["tbl", "sig"]).select("query_id", "neighbor_id")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])

    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(vec_col).alias("_qv")
    ).withColumn("_qn", _norm_sq("_qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize_expr(vec_col).alias("_cv")
    ).withColumn("_cn", _norm_sq("_cv"))
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn(
            "cosine",
            _dot("_qv", "_cv").cast("double")
            / (F.sqrt(F.col("_qn").cast("double")) * F.sqrt(F.col("_cn").cast("double"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _normalized_sample(
    corpus: DataFrame, sample_size: int, id_col: str, vec_col: str
):
    """Deterministic bounded corpus sample, L2-normalized — the shared
    fit input for the IVF coarse quantizer and the PQ codebooks.
    orderBy(hash).limit(n) plans as TakeOrderedAndProject: per-partition
    top-n heaps merged on the driver — no full sort shuffle, and (unlike
    an unordered limit after a filter) WHICH rows survive is a pure
    function of the data, independent of partitioning or scan order.
    The id tie-break covers the ~2^-64 hash-collision case."""
    import numpy as np

    sample_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(int(sample_size))
        .collect()
    )
    sample_rows.sort(key=lambda r: r[id_col])  # order-independent fit
    S = np.stack([np.asarray(r[vec_col], dtype="float64") for r in sample_rows])
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    return S


def _spherical_kmeans(S, num_centroids: int, iters: int, seed: int = 0x17F):
    """Fixed-seed spherical k-means over the pinned sample (driver-side
    numpy, fully deterministic) — unit-norm centroids."""
    import numpy as np

    ncent = min(int(num_centroids), len(S))
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), size=ncent, replace=False)].copy()
    for _ in range(int(iters)):
        assign = np.argmax(S @ C.T, axis=1)
        for j in range(ncent):
            members = S[assign == j]
            if len(members):
                m = members.sum(axis=0)
                C[j] = m / np.maximum(np.linalg.norm(m), 1e-12)
    return C


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 64,
    nprobe: int = 8,
    sample_size: int = 4096,
    kmeans_iters: int = 8,
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) coarse
    quantizer — the other standard ANN scale path next to LSH.

    Build: spherical k-means centroids are fit on a bounded, hash-chosen
    corpus sample on the driver (numpy, fixed seed, sample sorted by id —
    fully deterministic) and shipped to executors inside a pandas-UDF
    closure; every corpus vector is assigned to its nearest centroid in
    one vectorized matmul pass. Search: each query probes its ``nprobe``
    closest cells; candidates are scored with the same quantized-integer
    exact cosine as the brute path, then per-query top-k.

    Scale: corpus assignment is a single projection pass; the search join
    shuffles on cell id, touching ~nprobe/num_centroids of the corpus per
    query instead of all of it. Recall rises with nprobe (== brute force
    at nprobe=num_centroids).
    """
    queries = _guard_query_side(queries, max_query_rows)
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    S = _normalized_sample(corpus, sample_size, id_col, vec_col)
    centroids = _spherical_kmeans(S, num_centroids, kmeans_iters)
    ncent = len(centroids)

    def _cells(vecs, top):
        V = np.stack(vecs.to_numpy()).astype("float64")
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = V @ centroids.T
        idx = np.argsort(-sims, axis=1)[:, :top].astype("int32")
        return pd.Series(list(idx))

    assign_udf = F.pandas_udf(lambda s: _cells(s, 1), ArrayType(IntegerType()))
    probe_udf = F.pandas_udf(lambda s: _cells(s, min(nprobe, ncent)), ArrayType(IntegerType()))

    c_cells = scoped_cache(fan_out(corpus, per_task_bytes=ARROW_TASK_BYTES).select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(assign_udf(F.col(vec_col)), 1).alias("cell"),
    ))
    q_cells = scoped_cache(queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_udf(F.col(vec_col))).alias("cell"),
    ))

    cand = q_cells.join(c_cells, on="cell").select("query_id", "neighbor_id")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])

    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(vec_col).alias("_qv")
    ).withColumn("_qn", _norm_sq("_qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize_expr(vec_col).alias("_cv")
    ).withColumn("_cn", _norm_sq("_cv"))
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn(
            "cosine",
            _dot("_qv", "_cv").cast("double")
            / (F.sqrt(F.col("_qn").cast("double")) * F.sqrt(F.col("_cn").cast("double"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def normalize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "normalized",
    norm_col: str = "l2_norm",
) -> DataFrame:
    """L2-normalize an embedding column — the prep step before any cosine
    tier (normalized vectors turn cosine into a plain dot product).
    Adds ``out_col`` (array<double>, unit length) and ``norm_col`` (the
    pre-normalization L2). Zero-norm vectors normalize to NULL, not NaN.

    Determinism: the norm is ONE in-order double fold (bit-identical on
    any engine — the `vector_norms` contract), bound through ``inline1``
    so BOTH outputs come from a single evaluation — let1 + per-field
    struct extraction would re-inline the whole fold-and-divide once per
    field (the no-CSE rule), and a temp column could collide with caller
    columns. Pure per-row expressions — map-only, zero shuffle.
    """
    from bigdata_etl_customer360_spark.operators.util import inline1

    sq = lambda acc, x: acc + x.cast("double") * x.cast("double")  # noqa: E731

    def body(norm: Column) -> Column:
        return F.struct(
            norm.alias(norm_col),
            F.when(
                norm > F.lit(0.0),
                F.transform(
                    F.col(vec_col), lambda x: x.cast("double") / norm
                ),
            ).alias(out_col),
        )

    return df.select(
        "*",
        inline1(F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), sq)), body),
    )


def embedding_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    quant_bits: int = 20,
) -> DataFrame:
    """Per-group centroid components from QUANTIZED exact sums — the
    kmeans-update / class-prototype step, bit-reproducible under any
    partitioning (a raw float sum across rows drifts with partition
    order): each component is scaled by 2^quant_bits (exact — a
    power-of-two double multiply), FLOOR'd to a BIGINT (the quantization
    grain, ~1e-6 at 20 bits — part of the contract, like
    weighted_sample's coin), summed exactly, and divided back out in one
    fixed-shape double expression.

    Output: ``(group_col, dim, centroid, n_vecs)`` — one row per group x
    dimension. Plan: posexplode [map-only] -> ONE map-side-combined hash
    agg on (group, dim) [the only shuffle; |groups|·dims rows out] ->
    projection. The vectors themselves never shuffle.
    """
    scale = float(1 << int(quant_bits))
    q = F.floor(F.col("_x").cast("double") * F.lit(scale)).cast("bigint")
    exploded = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("dim", "_x"),
    )
    return (
        exploded.groupBy(group_col, "dim")
        .agg(
            F.sum(q).alias("_s"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select(
            group_col,
            F.col("dim").cast("int").alias("dim"),
            (
                F.col("_s").cast("double")
                / F.lit(scale)
                / F.col("n_vecs").cast("double")
            ).alias("centroid"),
            "n_vecs",
        )
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
    quant_bits: int = 20,
) -> DataFrame:
    """Nearest-centroid assignment (squared euclidean; ties -> lowest
    cluster id, numpy argmin's first-occurrence rule): a broadcast of the
    centroid list inside an Arrow-batched pandas UDF — map-only, zero
    shuffle, the predict step of :func:`kmeans_fit`.

    The distance arithmetic is EXACT int64 over floor(x * 2^quant_bits)
    quantized vectors/centroids — a float BLAS matmul's reduction order
    can vary with Arrow batch shape (which varies with partitioning), and
    a ~1-ulp flip between two near-equidistant centroids would cascade
    through k-means into different final clusters. Integer matmul has one
    answer. Bound check: |q| <= 2^quant_bits * max|x|; at 20 bits a
    dim-4096 dot of values |x| <= 1e3 stays ~1e24/2^40 << 2^63.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType

    scale = float(1 << int(quant_bits))
    Cq = np.floor(np.asarray(centroids, dtype="float64") * scale).astype("int64")
    c_norm = (Cq * Cq).sum(axis=1)  # int64, exact

    # no type hints: `from __future__ import annotations` stringifies them
    # and the pandas_udf signature parser rejects string forms — pass the
    # return type explicitly like the other UDFs in this module
    def _nearest(vecs):
        V = np.stack(vecs.to_numpy()).astype("float64")
        Vq = np.floor(V * scale).astype("int64")
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d = -2 * (Vq @ Cq.T) + c_norm[None, :]  # exact int64
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    nearest = F.pandas_udf(_nearest, IntegerType())

    return df.withColumn(out_col, nearest(F.col(vec_col)))


def _farthest_point_init(S, k: int, scale: float):
    """Deterministic greedy farthest-point seeding over a sample matrix
    (rows already in pinned id order): quantized coordinates, distances
    accumulated in float64 — int64 squared sums overflow (and wrap
    negative) at coordinate magnitudes the assign path itself documents
    as safe; float64 here is still fully deterministic because the
    sample and its shape are pinned (scalar ufunc sums over a fixed
    array, no BLAS batch-shape variance). Ties break by lowest row index
    (np.argmax first-occurrence)."""
    import numpy as np

    if len(S) == 0:
        return S
    Sq = np.floor(S * scale)  # float64 holding quantized values
    chosen = [0]
    d2 = ((Sq - Sq[0]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(Sq)):
        nxt = int(np.argmax(d2))
        if d2[nxt] == 0:
            break  # fewer than k distinct points
        chosen.append(nxt)
        cand = ((Sq - Sq[nxt]) ** 2).sum(axis=1)
        d2 = np.minimum(d2, cand)
    return S[chosen]


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iterations: int = 5,
    sample_size: int = 4096,
    quant_bits: int = 20,
) -> DataFrame:
    """DISTRIBUTED Lloyd's k-means over the FULL dataset — the scale
    companion of the IVF quantizer's driver-sample fit: assignment is a
    map-only broadcast-centroid pandas UDF over every row, and the
    centroid update runs through :func:`embedding_centroids`' quantized
    exact sums, so the whole fit is DETERMINISTIC under any partitioning
    (raw float centroid sums would drift with partition order and k-means
    amplifies any drift into different final clusters).

    Init: deterministic greedy farthest-point (k-means++ without the
    RNG) over the same ``orderBy(xxhash64(id), id).limit(sample_size)``
    sample the IVF fit uses: seed with the sample's first vector in id
    order, then repeatedly take the sample vector farthest (exact
    quantized int64 distance; ties -> lowest index) from its nearest
    chosen seed — naive first-k seeding routinely lands several seeds in
    one cluster and Lloyd cannot always recover (measured: 2 of 8
    planted blobs merged at 1M vectors). Empty clusters keep their
    previous centroid.
    Output: ``(cluster, dim, centroid, n_vecs)``, the same shape as
    :func:`embedding_centroids`.

    Scale shape, per iteration: ONE Arrow map stage (no shuffle) + ONE
    map-side-combined (cluster, dim) aggregate whose output is k*dim rows
    — collected to the driver (bounded, documented: 8 x 64 here; the
    pagerank-convergence-collect pattern). The vectors never shuffle; the
    corpus is scanned once per iteration. Iterative — rows-only at the
    driver; exactness is pinned by a numpy reference replicating the
    quantized arithmetic bit for bit (unit test).
    """
    import numpy as np

    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(int(sample_size))
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    scale = float(1 << int(quant_bits))
    S = np.array([[float(x) for x in r[vec_col]] for r in rows], dtype="float64")
    C = [list(map(float, v)) for v in _farthest_point_init(S, k, scale)]

    base = fan_out(
        df.select(id_col, vec_col), per_task_bytes=ARROW_TASK_BYTES
    ).cache()
    n_vecs_by_cluster: dict[int, int] = {}
    for _ in range(int(max_iterations)):
        assigned = kmeans_assign(
            base, C, vec_col=vec_col, out_col="_cl", quant_bits=quant_bits
        )
        stats = embedding_centroids(
            assigned, group_col="_cl", vec_col=vec_col, quant_bits=quant_bits
        ).collect()  # k*dim rows — bounded
        new_C = [list(c) for c in C]
        n_vecs_by_cluster = {}
        for r in stats:
            new_C[r["_cl"]][r["dim"]] = float(r["centroid"])
            n_vecs_by_cluster[r["_cl"]] = int(r["n_vecs"])
        C = new_C
    base.unpersist()  # fit runs its own actions; release before returning
    spark = df.sparkSession
    out = [
        (ci, di, C[ci][di], n_vecs_by_cluster.get(ci, 0))
        for ci in range(len(C))
        for di in range(len(C[ci]))
    ]
    from bigdata_etl_customer360_spark.operators.util import local_df

    return local_df(
        spark, out, "cluster int, dim int, centroid double, n_vecs long"
    )


def semantic_qz(
    df: DataFrame,
    bucket_bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SemDeDup quantize/bucket stage ``(_sid, _bkt, _qv, _nsq)`` —
    shared by :func:`semantic_dedup` and the streaming maintainer
    (``streaming.windows.stream_dedup_semantic``), ONE definition so the
    batch == streaming invariant can't drift: deterministic sign-pattern
    bucket (MSB-first over the first ``bucket_bits`` dims) + the
    module's quantized-integer vector/norm. ``scoped_cache``d (feeds
    both self-join sides downstream)."""
    bucket = F.lit(0).cast("long")
    for i in range(int(bucket_bits)):
        bit = F.when(
            F.element_at(F.col(vec_col), i + 1).cast("double") >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        bucket = bucket * F.lit(2) + bit
    return scoped_cache(
        df.select(
            F.col(id_col).alias("_sid"),
            bucket.alias("_bkt"),
            quantize_expr(vec_col, "_qv"),
        ).withColumn("_nsq", _norm_sq("_qv"))
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    bucket_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_bucket_col: str | None = None,
) -> DataFrame:
    """Embedding-level semantic dedup (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): drop every vector that has an EARLIER (smaller-id)
    near-duplicate — cosine >= ``threshold`` — inside its semantic
    bucket; return the survivors. The embedding-space completion of the
    text dedup ladder (exact -> minhash -> simhash -> embedding): it
    removes paraphrases and re-encodings that share no tokens.

    Bucketing is DETERMINISTIC sign-pattern partitioning: bucket id =
    the sign bits of the first ``bucket_bits`` dimensions (a fixed
    axis-aligned hyperplane cut — the degenerate-but-deterministic case
    of random-hyperplane LSH, chosen so an oracle can recompute it
    exactly; swap in :func:`hyperplane_signatures` when recall across
    bucket boundaries matters more than oracle-exactness). Near-dup
    pairs whose members land in different buckets are NOT compared —
    the standard SemDeDup trade (it clusters with k-means and only
    dedups within clusters, accepting boundary misses, because the
    all-pairs alternative cannot exist at corpus scale).

    Scale shape: one map stage stamps (bucket, quantized vector, norm);
    ONE shuffle on bucket for the self-join; within-bucket candidate
    pairs are ~ Σ|bucket|²/2 — size ``bucket_bits`` ~ log2(N / target
    bucket size) so buckets stay bounded as the corpus grows (the same
    occupancy² law measured for IVF in BASELINE.md). The keep decision
    is a bucket-local anti-join semantics (EXISTS earlier near-dup),
    expressed as a left-semi over the pair stream inverted to survivors
    via anti-join — no window over the whole corpus, no driver state.

    Determinism: cosine uses the module's quantized-integer dot/norm
    contract (exact int64 sums; ONE double division at the end), so the
    >= threshold compare is engine-exact — the whole operator
    hash-matches a SQL oracle.

    Output: the surviving rows of ``df`` (all original columns), plus
    the bucket id when ``out_bucket_col`` is set.
    """
    if not -1.0 <= threshold <= 1.0:
        raise ValueError("threshold must be a cosine in [-1, 1]")
    if bucket_bits < 0:
        raise ValueError("bucket_bits must be >= 0")
    # temp-column collision guard (the r6 _pid lesson): a same-named input
    # column would be silently dropped/duplicated by the join-back
    clash = {"_sid", "_bkt"} & set(df.columns)
    if clash:
        raise ValueError(
            f"semantic_dedup reserves columns {sorted(clash)}; rename them"
        )
    if out_bucket_col is not None and out_bucket_col in df.columns:
        raise ValueError(
            f"out_bucket_col {out_bucket_col!r} already exists in the input"
        )
    qz = semantic_qz(df, bucket_bits, id_col, vec_col)
    a = qz.select(
        F.col("_sid").alias("_ida"),
        "_bkt",
        F.col("_qv").alias("_qa"),
        F.col("_nsq").alias("_na"),
    )
    b = qz.select(
        F.col("_sid").alias("_idb"),
        "_bkt",
        F.col("_qv").alias("_qb"),
        F.col("_nsq").alias("_nb"),
    )
    cos = _dot("_qa", "_qb").cast("double") / (
        F.sqrt(F.col("_na").cast("double")) * F.sqrt(F.col("_nb").cast("double"))
    )
    # ids with an EARLIER in-bucket near-dup (the drop set)
    dropped = (
        a.join(b, on="_bkt")
        .filter(F.col("_idb") < F.col("_ida"))
        .filter(cos >= F.lit(float(threshold)))
        .select(F.col("_ida").alias("_sid"))
        .distinct()
    )
    survivors = qz.select("_sid", "_bkt").join(dropped, on="_sid", how="left_anti")
    out = df.join(
        survivors.select(F.col("_sid").alias(id_col), "_bkt"), on=id_col
    )
    if out_bucket_col is not None:
        return out.withColumnRenamed("_bkt", out_bucket_col)
    return out.drop("_bkt")


def pq_fit(
    corpus: DataFrame,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    sample_size: int = 4096,
    kmeans_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Fit a product-quantization codebook (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the (L2-normalized)
    vector into ``num_subspaces`` contiguous slices and k-means each
    slice independently on a DETERMINISTIC bounded corpus sample (the
    IVF quantizer's hash-ordered-limit sample, sorted by id — a pure
    function of the data). Returns ``(codebook, qbook, qbook_nsq)``:

    - ``codebook``: float64 array (num_subspaces, codes_per_subspace,
      sub_dim) — the per-subspace centroids;
    - ``qbook`` / ``qbook_nsq``: the same centroids quantized to int64
      (``floor(x * 2^20 + 0.5)``) and their per-code squared norms —
      encode/ADC run on EXACT integers so code assignment and scores
      are bit-stable under any partitioning or Arrow batch shape (the
      kmeans lesson: float BLAS reduction order varies with batch
      shape).

    Driver cost is bounded by ``sample_size`` rows (the documented
    bounded-collect class); nothing corpus-sized leaves the executors.
    """
    S = _normalized_sample(corpus, sample_size, id_col, vec_col)
    return _pq_codebooks(S, num_subspaces, codes_per_subspace, kmeans_iters)


def _pq_codebooks(S, num_subspaces: int, codes_per_subspace: int, iters: int):
    """Per-subspace k-means codebooks over a given (sample) matrix —
    shared by :func:`pq_fit` (raw normalized vectors) and
    :func:`cosine_topk_ivfpq` (cell RESIDUALS). Returns
    (codebook float64, qbook int64, qbook_nsq int64)."""
    import numpy as np

    dim = S.shape[1]
    m = int(num_subspaces)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by num_subspaces {m}")
    sub = dim // m
    kc = min(int(codes_per_subspace), len(S))
    rng = np.random.default_rng(0x9C0)
    codebook = np.empty((m, kc, sub))
    for s in range(m):
        X = S[:, s * sub : (s + 1) * sub]
        C = X[rng.choice(len(X), size=kc, replace=False)].copy()
        for _ in range(int(iters)):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(kc):
                members = X[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        codebook[s] = C
    qbook = np.floor(codebook * float(QUANT_SCALE) + 0.5).astype("int64")
    qbook_nsq = (qbook * qbook).sum(axis=2)  # (m, kc)
    return codebook, qbook, qbook_nsq


def ivfpq_fit(
    corpus: DataFrame,
    num_centroids: int = 64,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    sample_size: int = 4096,
    kmeans_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Fit the IVF×PQ model: coarse spherical-k-means cells over the
    pinned corpus sample, then PQ codebooks on the sample's CELL
    RESIDUALS (the FAISS IVFPQ composition). Returns ``(centroids,
    qbook, qbook_nsq)`` — the ``model`` accepted by
    :func:`cosine_topk_ivfpq`, and the exact fit sequence the maintained
    index (``operators.ann_index.ivfpq_index_build``) persists.

    Deterministic (pinned sample, fixed seeding), so a model fit ONCE is
    bit-interchangeable with the per-query inline fit — fit-and-reuse
    across repeated searches over the same corpus costs nothing in
    fidelity (the pq_recall/ivfpq_recall certificates run their
    with-self and without-self searches off one fit). Driver cost is
    bounded by ``sample_size`` rows."""
    import numpy as np

    S = _normalized_sample(corpus, sample_size, id_col, vec_col)
    centroids = _spherical_kmeans(S, num_centroids, kmeans_iters)
    resid = S - centroids[np.argmax(S @ centroids.T, axis=1)]
    _, qbook, qbook_nsq = _pq_codebooks(
        resid, num_subspaces, codes_per_subspace, kmeans_iters
    )
    return centroids, qbook, qbook_nsq


def pq_encode(
    corpus: DataFrame,
    qbook,
    qbook_nsq,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Encode every vector as ``num_subspaces`` small ints — the PQ
    storage tier (64 dims × 4 bytes -> 8 codes; a 100 TB embedding
    column becomes ~3 TB of codes that fit hot storage). Assignment is
    argmin over EXACT int64 squared distances of the 2^20-quantized
    normalized vector to the quantized codebook (ties break on the
    lowest code index), computed in one Arrow pass — map-only, zero
    shuffle, bit-stable under any batch shape."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    qb = np.asarray(qbook)
    qn = np.asarray(qbook_nsq)
    m, kc, sub = qb.shape

    def _enc(vecs):
        V = np.stack(vecs.to_numpy()).astype("float64")
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        Q = np.floor(V * float(QUANT_SCALE) + 0.5).astype("int64")
        out = np.empty((len(V), m), dtype="int32")
        for s in range(m):
            Xs = Q[:, s * sub : (s + 1) * sub]  # int64 (batch, sub)
            # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2; ||x||^2 constant per
            # row for the argmin -> compare -2 x·c + ||c||^2 (exact int64)
            dots = Xs @ qb[s].T  # int64 (batch, kc)
            d = qn[s][None, :] - 2 * dots
            out[:, s] = np.argmin(d, axis=1)  # first (lowest) code on ties
        return pd.Series(list(out))

    enc = F.pandas_udf(_enc, ArrayType(IntegerType()))
    return corpus.select(F.col(id_col), enc(F.col(vec_col)).alias(out_col))


def pq_query_luts(
    queries: DataFrame,
    qbook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query ADC lookup tables ``(query_id, _luts m×kc int64)`` —
    exact ``q_s · c_{s,j}`` partial dots from the SAME quantized query
    the exact tier uses. Built EXECUTOR-SIDE as an Arrow-batched pandas
    UDF over the query frame (VERDICT r13 task 4 — the old bounded
    driver loop capped the operator at what the driver could iterate
    and serialize; now the build distributes with the query
    partitioning and only the broadcast of the FINISHED tables bounds
    the query side). Bit-identical to the old driver loop: normalize +
    quantize are per-row elementwise ops and the LUT matmul is EXACT
    int64 (integer matmul is order-independent, so Arrow batch shape
    cannot perturb it). Shared by :func:`cosine_topk_pq`; scale A/B vs
    the driver loop in scripts/stress_pq_lut.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    qb = np.asarray(qbook)
    m, kc, sub = qb.shape

    def _lut(vecs):
        V = np.stack(vecs.to_numpy()).astype("float64")
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        Q = np.floor(V * float(QUANT_SCALE) + 0.5).astype("int64")
        per_s = [Q[:, s * sub : (s + 1) * sub] @ qb[s].T for s in range(m)]
        return pd.Series(
            [[per_s[s][i].tolist() for s in range(m)] for i in range(len(V))]
        )

    lut_udf = F.pandas_udf(_lut, ArrayType(ArrayType(LongType())))
    return fan_out(queries, per_task_bytes=ARROW_TASK_BYTES).select(
        F.col(id_col).alias("query_id"), lut_udf(F.col(vec_col)).alias("_luts")
    )


def cosine_topk_pq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    rerank: int | None = None,
    sample_size: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
    model=None,
) -> DataFrame:
    """Approximate cosine top-k via product quantization with exact
    re-ranking — the third standard ANN scale path next to LSH and IVF:
    LSH prunes by bucket, IVF by cell, PQ compresses the VECTORS so the
    first-pass scan reads codes instead of floats.

    Search: per query, an ADC (asymmetric distance computation) lookup
    table of exact int64 ``q_s · c_{s,j}`` partial dots is broadcast
    with the query; every corpus row's approximate score is the
    JVM-side sum of ``m`` table lookups over its codes (whole-stage
    codegen'd ``aggregate(zip_with(...))`` — no floats, no Python);
    the top ``rerank`` candidates per query (default ``4*k``) are then
    re-scored with the family's exact quantized cosine and the final
    top-k returned — output schema and exactness of returned scores
    match the sibling entry points. ``rerank >= |corpus|`` makes the
    result EXACTLY brute force (the oracle-checked ``pq_full_rerank``
    invariant, the ivf_full_probe pattern).

    Scale: codes are ~dim·4/m bytes per row; the ADC pass scans codes
    only, the exact tier touches ``rerank`` rows per query. Everything
    is deterministic: pinned sample fit, int64 encode, int64 ADC,
    quantized exact re-rank with id tie-breaks — so ``model`` (the
    :func:`pq_fit` return, fit once over the same corpus/params) is
    bit-interchangeable with the inline fit; pass it when running
    several searches against one corpus (the certificate pattern).
    """
    queries = _guard_query_side(queries, max_query_rows)
    import numpy as np

    R = int(rerank) if rerank is not None else 4 * int(k)
    if model is None:
        model = pq_fit(
            corpus,
            num_subspaces=num_subspaces,
            codes_per_subspace=codes_per_subspace,
            sample_size=sample_size,
            id_col=id_col,
            vec_col=vec_col,
        )
    _, qbook, qbook_nsq = model
    m, kc, sub = qbook.shape

    codes = scoped_cache(
        pq_encode(
            fan_out(corpus, per_task_bytes=ARROW_TASK_BYTES),
            qbook, qbook_nsq, id_col, vec_col,
        )
        .withColumnRenamed(id_col, "neighbor_id")
    )

    luts = pq_query_luts(queries, qbook, id_col=id_col, vec_col=vec_col)

    adc = (
        codes.join(F.broadcast(luts))
        .withColumn(
            "_adc",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("_luts"),
                    lambda c, l: F.element_at(l, c + F.lit(1)),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .select("query_id", "neighbor_id", "_adc")
    )
    if exclude_self:
        adc = adc.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_adc").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        adc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= R)
        .select("query_id", "neighbor_id")
    )

    return _exact_rerank(cand, queries, corpus, k, id_col, vec_col)


def _exact_rerank(
    cand: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared exact tier of the candidate-generating ANN entry points:
    score ``cand (query_id, neighbor_id)`` with the family's quantized
    cosine (broadcast query vectors, corpus joined by id) and return the
    per-query top-k with the pinned (cosine desc, neighbor asc) order."""
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(vec_col).alias("_qv")
    ).withColumn("_qn", _norm_sq("_qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize_expr(vec_col).alias("_cv")
    ).withColumn("_cn", _norm_sq("_cv"))
    return _exact_rerank_pre(cand, q, c, k)


def _exact_rerank_pre(
    cand: DataFrame,
    q: DataFrame,
    c: DataFrame,
    k: int,
) -> DataFrame:
    """:func:`_exact_rerank` over PRE-quantized sides — ``q`` carries
    ``(query_id, _qv, _qn)``, ``c`` ``(neighbor_id, _cv, _cn)``. Split
    out so the maintained index (``operators.ann_index``) can re-rank
    from its STORED quantized vectors (written by the same
    ``quantize_expr``/``_norm_sq`` at fold time — exact ints, so stored
    == recomputed) without carrying the raw embedding column."""
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn(
            "cosine",
            _dot("_qv", "_cv").cast("double")
            / (
                F.sqrt(F.col("_qn").cast("double"))
                * F.sqrt(F.col("_cn").cast("double"))
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _ivfpq_enc_udf(centroids, qbook, qbook_nsq):
    """IVF×PQ row encoder (``[cell, code_1..code_m]`` per vector) as an
    Arrow-batched pandas UDF over a FROZEN model — shared by
    :func:`cosine_topk_ivfpq` (model fit inline per query) and the
    maintained index (``operators.ann_index``, model fit once at build
    and frozen for every append). Cell choice is a per-row float argmax
    (same rows-only caveat as cosine_topk_ivf); code assignment is exact
    int64 over the quantized residual — bit-stable under any Arrow batch
    shape."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    cents = np.asarray(centroids)
    qb = np.asarray(qbook)
    qn = np.asarray(qbook_nsq)
    m, kc, sub = qb.shape

    def _enc(vecs):
        V = np.stack(vecs.to_numpy()).astype("float64")
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        cells = np.argmax(V @ cents.T, axis=1)
        Rv = V - cents[cells]
        Q = np.floor(Rv * float(QUANT_SCALE) + 0.5).astype("int64")
        out = np.empty((len(V), m + 1), dtype="int32")
        out[:, 0] = cells
        for s in range(m):
            dots = Q[:, s * sub : (s + 1) * sub] @ qb[s].T
            out[:, s + 1] = np.argmin(qn[s][None, :] - 2 * dots, axis=1)
        return pd.Series(list(out))

    return F.pandas_udf(_enc, ArrayType(IntegerType()))


def _ivfpq_candidates(
    queries: DataFrame,
    codes: DataFrame,
    centroids,
    qbook,
    nprobe: int,
    R: int,
    id_col: str,
    vec_col: str,
    exclude_self: bool,
) -> DataFrame:
    """ADC first pass of the IVF×PQ family over a FROZEN model and a
    ``(neighbor_id, cell, codes)`` frame: per-(query, probed cell) int64
    base ``q·centroid_c`` + per-subspace residual LUTs are built
    EXECUTOR-SIDE (VERDICT r13 task 4 — one struct-returning Arrow UDF
    per query row, exploded into the per-(query, cell) rows the
    broadcast join consumes; the float cell-probe argsort runs as a
    PER-ROW gemv exactly like the old driver loop, because a batched
    gemm's BLAS reduction order could flip near-tie cell choices with
    Arrow batch shape — the pq_fit lesson; bases and LUTs are exact
    int64, order-independent by construction). Returns the per-query
    top-``R`` ``(query_id, neighbor_id)`` candidates for the exact
    re-rank tail. Shared by :func:`cosine_topk_ivfpq` and the maintained
    index's search-from-index path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    cents = np.asarray(centroids)
    qb = np.asarray(qbook)
    m, kc, sub = qb.shape
    ncent = len(cents)
    qcent = np.floor(cents * float(QUANT_SCALE) + 0.5).astype("int64")

    np_probe = min(int(nprobe), ncent)
    tab_schema = StructType(
        [
            StructField("cells", ArrayType(IntegerType())),
            StructField("bases", ArrayType(LongType())),
            StructField("luts", ArrayType(ArrayType(LongType()))),
        ]
    )

    def _qtabs(vecs):
        V = np.stack(vecs.to_numpy()).astype("float64")
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        Q = np.floor(V * float(QUANT_SCALE) + 0.5).astype("int64")
        per_s = [Q[:, s * sub : (s + 1) * sub] @ qb[s].T for s in range(m)]
        cells_o, bases_o, luts_o = [], [], []
        for i in range(len(V)):
            probed = np.argsort(-(V[i] @ cents.T))[:np_probe]
            cells_o.append([int(c) for c in probed])
            bases_o.append([int(Q[i] @ qcent[c]) for c in probed])
            luts_o.append([per_s[s][i].tolist() for s in range(m)])
        return pd.DataFrame({"cells": cells_o, "bases": bases_o, "luts": luts_o})

    qtabs = F.pandas_udf(_qtabs, tab_schema)
    # one UDF row per query, consumed by BOTH broadcast sides below —
    # scoped_cache (the derived-self-join-input rule) so the Arrow stage
    # runs once. The broadcast splits in two on purpose: (query, cell,
    # base) prunes WHICH rows meet which queries (|q| × nprobe tiny
    # rows), while the m×kc LUT ships ONCE PER QUERY keyed on query_id —
    # the single-frame layout duplicated every query's LUT nprobe times,
    # an nprobe× broadcast inflation that matters exactly when the
    # distributed build lets |q| grow.
    per_q = scoped_cache(
        fan_out(queries, per_task_bytes=ARROW_TASK_BYTES)
        .select(F.col(id_col).alias("query_id"), qtabs(F.col(vec_col)).alias("_t"))
        .select(
            "query_id",
            F.col("_t.cells").alias("_cells"),
            F.col("_t.bases").alias("_bases"),
            F.col("_t.luts").alias("_luts"),
        )
    )
    cell_base = per_q.select(
        "query_id",
        F.explode(F.arrays_zip("_cells", "_bases")).alias("_cb"),
    ).select(
        "query_id",
        F.col("_cb._cells").alias("cell"),
        F.col("_cb._bases").alias("_base"),
    )
    query_luts = per_q.select("query_id", "_luts")

    adc = (
        codes.join(F.broadcast(cell_base), on="cell")
        .join(F.broadcast(query_luts), on="query_id")
        .withColumn(
            "_adc",
            F.col("_base")
            + F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("_luts"),
                    lambda c, l: F.element_at(l, c + F.lit(1)),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .select("query_id", "neighbor_id", "_adc")
    )
    if exclude_self:
        adc = adc.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_adc").desc(), F.col("neighbor_id").asc()
    )
    return (
        adc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= R)
        .select("query_id", "neighbor_id")
    )


def cosine_topk_ivfpq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_centroids: int = 64,
    nprobe: int = 8,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    rerank: int | None = None,
    sample_size: int = 4096,
    kmeans_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_query_rows: int = MAX_QUERY_ROWS,
    model=None,
) -> DataFrame:
    """IVF×PQ — the composition production ANN indexes actually ship
    (FAISS ``IVFPQ``; Jégou et al. 2011 §IV): an IVF coarse quantizer
    prunes WHICH rows are scored (only ``nprobe`` cells per query) while
    product quantization on the CELL RESIDUALS compresses what the
    first-pass scan reads (m codes per row instead of the vector). Both
    halves reuse this module's existing machinery: the pinned-sample
    spherical k-means (:func:`_spherical_kmeans`) for cells,
    :func:`_pq_codebooks` on the sample's residuals for codes, and the
    family's exact quantized re-rank tail (:func:`_exact_rerank`).

    Scoring: for a query q probing cell c, ``q·v ≈ q·centroid_c +
    q·residual(v)`` — the first term is one per-(query, cell) int64
    constant, the second an ADC sum of m int64 table lookups over the
    row's codes, all JVM-side (``aggregate(zip_with(...))``); the top
    ``rerank`` (default ``4*k``) candidates per query re-rank exactly.
    With ``nprobe >= num_centroids`` AND ``rerank >= |corpus|`` the
    result is EXACTLY brute force — the oracle-checked ``ivfpq_full``
    invariant (both pruning tiers gate nothing; same pattern as
    ivf_full_probe / pq_full_rerank).

    Scale: the first pass reads (cell, codes) — ~4 + m bytes per row —
    and touches ~nprobe/num_centroids of the corpus per query; the
    exact tier touches ``rerank`` rows per query. Cell assignment is a
    float argmax (same rows-only caveat as cosine_topk_ivf); codes and
    ADC are exact int64, and the returned scores are exact. The fit is
    deterministic, so ``model`` (the :func:`ivfpq_fit` return over the
    same corpus/params) is bit-interchangeable with the inline fit —
    pass it for repeated searches against one corpus.
    """
    queries = _guard_query_side(queries, max_query_rows)

    R = int(rerank) if rerank is not None else 4 * int(k)
    if model is None:
        model = ivfpq_fit(
            corpus,
            num_centroids=num_centroids,
            num_subspaces=num_subspaces,
            codes_per_subspace=codes_per_subspace,
            sample_size=sample_size,
            kmeans_iters=kmeans_iters,
            id_col=id_col,
            vec_col=vec_col,
        )
    centroids, qbook, qbook_nsq = model
    m = qbook.shape[0]

    enc = _ivfpq_enc_udf(centroids, qbook, qbook_nsq)
    codes = scoped_cache(
        fan_out(corpus, per_task_bytes=ARROW_TASK_BYTES)
        .select(F.col(id_col).alias("neighbor_id"), enc(F.col(vec_col)).alias("_cc"))
        .select(
            "neighbor_id",
            F.element_at("_cc", 1).alias("cell"),
            F.slice("_cc", 2, m).alias("codes"),
        )
    )
    cand = _ivfpq_candidates(
        queries, codes, centroids, qbook, nprobe, R, id_col, vec_col, exclude_self
    )
    return _exact_rerank(cand, queries, corpus, k, id_col, vec_col)


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    lists — the standard hybrid-retrieval combiner (BM25 + vector
    top-k): scores live on incomparable scales, ranks do not, so

        rrf(d) = sum over lists containing d of 1 / (k + rank_d)

    with the conventional k=60 damping. Each input frame carries
    (``id_col``, ``rank_col``) with unique ids and 1-based integer
    ranks (rank upstream with orderBy+limit — lists are top-N by
    definition, the bounded step).

    Determinism: integer ranks in, and the score is the FIXED
    left-assoc sum ``t_1 + t_2 + ... + t_N`` of fixed-shape terms
    (absent list -> exact 0.0) — identical IEEE sequences across
    engines, shipped unrounded. ``top_k`` ties pinned (score DESC, id
    ASC) via orderBy+limit.

    Plan: N-1 full-outer equi-joins over top-N-sized frames (kilobytes;
    broadcastable), one codegen projection. Output:
    ``(id_col, rank_1..rank_N, n_lists, rrf_score)``.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    out = None
    for i, r in enumerate(rankings, 1):
        f = r.select(
            F.col(id_col), F.col(rank_col).cast("long").alias(f"rank_{i}")
        )
        out = f if out is None else out.join(f, id_col, "full_outer")
    terms = [
        F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        for i in range(1, len(rankings) + 1)
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    present = [
        F.col(f"rank_{i}").isNotNull().cast("int")
        for i in range(1, len(rankings) + 1)
    ]
    n_lists = present[0]
    for p in present[1:]:
        n_lists = n_lists + p
    out = out.select(
        id_col,
        *[f"rank_{i}" for i in range(1, len(rankings) + 1)],
        n_lists.alias("n_lists"),
        score.alias("rrf_score"),
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("rrf_score").desc(), F.col(id_col).asc()
        ).limit(int(top_k))
    return out
