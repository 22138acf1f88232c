"""Classical-ML training operators built from exact histogram aggregates.

``tree_fit`` is the distributed CART split finder (the MLlib/XGBoost-hist
pattern re-expressed as plain DataFrame ops): per tree level, ONE hash
aggregate builds per-(node, feature, value, class) counts, per-class
window prefix-sums turn every distinct value into a candidate threshold
simultaneously, and the gini argmax is decided on exact integer products
(the chi2_features DECIMAL(38) discipline) — zero UDFs, zero collects of
row data, ``max_depth`` passes over the assignment frame total.

Reference analogue: none (the 306-line reference has no ML surface);
public formulation per Breiman et al. (CART) and the histogram trainers
in Spark MLlib / LightGBM. This module completes the classical family
next to nb_classify / kmeans / isotonic_fit (VERDICT r8 item 7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _gini_split_scores(
    g: DataFrame, n_classes: int, keys: list[str]
) -> DataFrame:
    """Candidate-threshold scoring shared by every tree level.

    ``g`` holds one row per (``*keys``, ``_v``) with per-class counts
    ``_c0.._ck``; every distinct value becomes the candidate split
    "left = (x <= v)" via per-class prefix sums in ONE window pass.
    Minimizing weighted gini is equivalent to maximizing

        score = (nR * sum_c nLc^2  +  nL * sum_c nRc^2) / (nL * nR)

    whose numerator/denominator are EXACT integers (DECIMAL(38,0)
    products, <= 2N^3 — exact to N ~ 1e9 rows/node); the ranking double
    ``score`` is one division of those exact integers, so both engines
    compute the identical IEEE value, and exact ties break on
    (feature asc, value asc). The split-vs-stop decision (``_gain``) is
    the fully exact comparison  num * n > sum_c nc^2 * nL * nR
    (products <= 2N^4) — a zero-gain split (both sides identically
    distributed) must NOT win over declaring a leaf, and a double
    comparison could round that boundary."""
    wp = (
        Window.partitionBy(*keys)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*keys)
    cols = [g[k] for k in keys] + [g["_v"]]
    lefts = [F.sum(f"_c{i}").over(wp).alias(f"_l{i}") for i in range(n_classes)]
    tots = [F.sum(f"_c{i}").over(wt).alias(f"_t{i}") for i in range(n_classes)]
    p = g.select(*cols, *lefts, *tots, F.max("_v").over(wt).alias("_vmax"))

    nl = sum((F.col(f"_l{i}") for i in range(n_classes)), F.lit(0))
    nt = sum((F.col(f"_t{i}") for i in range(n_classes)), F.lit(0))
    nr = nt - nl
    suml2 = sum(
        (
            F.col(f"_l{i}").cast(_DEC) * F.col(f"_l{i}").cast(_DEC)
            for i in range(n_classes)
        ),
        F.lit(0).cast(_DEC),
    )
    sumr2 = sum(
        (
            (F.col(f"_t{i}") - F.col(f"_l{i}")).cast(_DEC)
            * (F.col(f"_t{i}") - F.col(f"_l{i}")).cast(_DEC)
            for i in range(n_classes)
        ),
        F.lit(0).cast(_DEC),
    )
    sumt2 = sum(
        (
            F.col(f"_t{i}").cast(_DEC) * F.col(f"_t{i}").cast(_DEC)
            for i in range(n_classes)
        ),
        F.lit(0).cast(_DEC),
    )
    num = nr.cast(_DEC) * suml2 + nl.cast(_DEC) * sumr2
    den = nl.cast(_DEC) * nr.cast(_DEC)
    return (
        p.filter(F.col("_v") < F.col("_vmax"))
        .select(
            *keys,
            "_v",
            nl.cast("long").alias("_nl"),
            nr.cast("long").alias("_nr"),
            (num.cast("double") / den.cast("double")).alias("_score"),
            (num * nt.cast(_DEC) > sumt2 * den).alias("_gain"),
        )
    )


def tree_fit(
    df: DataFrame,
    features: list[str],
    label_col: str,
    max_depth: int = 2,
    min_samples_split: int = 2,
    feature_decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Fit a depth-limited CART classification tree; returns the MODEL
    as a DataFrame, one row per node in heap numbering (root 1, children
    of ``i`` are ``2i``/``2i+1``):

        (node_id, depth, n, split_feature, split_value, prediction)

    Internal nodes carry (split_feature, split_value) with NULL
    prediction; leaves carry the majority-class ``prediction`` (ties on
    label asc) with NULL split columns. Split semantics: left child
    takes ``feature <= split_value``. A node becomes a leaf when it
    reaches ``max_depth``, holds < ``min_samples_split`` rows, is pure,
    or no candidate split has strictly positive gini gain (decided
    EXACTLY — see :func:`_gini_split_scores`).

    Determinism: label set is a bounded sorted collect; histograms and
    gain decisions are exact integers; ranking ties pin on
    (feature asc, value asc). Feature values must be exactly
    representable at ``feature_decimal`` (ids, counts, cents, day
    numbers — the repo-wide quantize-first rule); rows with NULL label
    or any NULL feature are excluded.

    Plan, per level: ONE melt (explode of a |features|-wide struct
    array) -> ONE hash aggregate keyed (node, feature, value, class)
    [the only data-sized shuffle] -> window prefix over the per-node
    per-feature value grid (bounded by distinct values x nodes) -> a
    tiny split table localCheckpointed and broadcast back to advance
    row assignments. ``max_depth`` such passes total; no UDFs, no
    row-data collects, leaf rows leave the frame as soon as their node
    terminates.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth!r}")
    labels = [
        r[0]
        for r in df.select(F.col(label_col))
        .filter(F.col(label_col).isNotNull())
        .distinct()
        .orderBy(label_col)
        .collect()
    ]
    spark = df.sparkSession
    model_schema = (
        "node_id long, depth int, n long, split_feature string, "
        "split_value double, prediction string"
    )
    if not labels:
        return spark.createDataFrame([], model_schema)
    k = len(labels)

    cond = F.col(label_col).isNotNull()
    for f in features:
        cond = cond & F.col(f).isNotNull()
    assign = df.filter(cond).select(
        *[F.col(f).cast(feature_decimal).alias(f) for f in features],
        F.col(label_col).alias("_lab"),
        F.lit(1).cast("long").alias("_node"),
    )

    melt = F.explode(
        F.array(
            *[
                F.struct(F.lit(f).alias("_f"), F.col(f).alias("_v"))
                for f in sorted(features)
            ]
        )
    )
    # ONE hash aggregate builds the per-class histogram directly
    # (conditional counts over the pinned label list — no intermediate
    # (node, f, v, class) shuffle)
    class_counts = [
        F.count(F.when(F.col("_lab") == F.lit(lab), F.lit(1)))
        .cast("long")
        .alias(f"_c{i}")
        for i, lab in enumerate(labels)
    ]

    def node_stats(per_class: DataFrame) -> DataFrame:
        """(_node, _c0.._ck) -> (_node, _n, _cmax, _maj); majority ties
        break on label asc via the sorted (-count, label) struct."""
        n = sum((F.col(f"_c{i}") for i in range(k)), F.lit(0).cast("long"))
        cmax = (
            F.greatest(*[F.col(f"_c{i}") for i in range(k)])
            if k > 1
            else F.col("_c0")
        )
        maj = F.sort_array(
            F.array(
                *[
                    F.struct(
                        (-F.col(f"_c{i}")).alias("_neg"),
                        F.lit(lab).alias("_lab"),
                    )
                    for i, lab in enumerate(labels)
                ]
            )
        )[0]["_lab"]
        return per_class.select(
            "_node", n.alias("_n"), cmax.alias("_cmax"), maj.alias("_maj")
        )

    f0 = sorted(features)[0]
    parts: list[DataFrame] = []
    for depth in range(max_depth + 1):
        if depth > 0:
            # cut the per-level join lineage; depth 0 is a pure parquet
            # projection and rescans cheaper than it materializes
            assign = assign.localCheckpoint(eager=True)
        if depth == max_depth:
            final_counts = assign.groupBy("_node").agg(*class_counts)
            parts.append(
                node_stats(final_counts).select(
                    F.col("_node").alias("node_id"),
                    F.lit(depth).cast("int").alias("depth"),
                    F.col("_n").alias("n"),
                    F.lit(None).cast("string").alias("split_feature"),
                    F.lit(None).cast("double").alias("split_value"),
                    F.col("_maj").alias("prediction"),
                )
            )
            break

        hist = (
            assign.select("_node", "_lab", melt.alias("_fv"))
            .select(
                "_node",
                "_lab",
                F.col("_fv._f").alias("_f"),
                F.col("_fv._v").alias("_v"),
            )
            .groupBy("_node", "_f", "_v")
            .agg(*class_counts)
        ).localCheckpoint(eager=True)
        # per-node stats fall out of the histogram (any one feature's
        # value-marginal sums to the node's class counts) — no second
        # scan of the assignment frame
        node_counts = node_stats(
            hist.filter(F.col("_f") == F.lit(f0))
            .groupBy("_node")
            .agg(
                *[
                    F.sum(f"_c{i}").cast("long").alias(f"_c{i}")
                    for i in range(k)
                ]
            )
        )
        scored = _gini_split_scores(hist, k, ["_node", "_f"])
        wbest = Window.partitionBy("_node").orderBy(
            F.col("_score").desc(), F.col("_f").asc(), F.col("_v").asc()
        )
        splittable = node_counts.filter(
            (F.col("_n") >= int(min_samples_split))
            & (F.col("_cmax") < F.col("_n"))
        ).select("_node")
        splits = (
            scored.filter(F.col("_gain"))
            .join(F.broadcast(splittable), "_node", "left_semi")
            .withColumn("_rn", F.row_number().over(wbest))
            .filter(F.col("_rn") == 1)
            .select("_node", "_f", "_v")
            .localCheckpoint(eager=True)
        )
        stats = node_counts.join(F.broadcast(splits), "_node", "left")
        parts.append(
            stats.select(
                F.col("_node").alias("node_id"),
                F.lit(depth).cast("int").alias("depth"),
                F.col("_n").alias("n"),
                F.col("_f").alias("split_feature"),
                F.col("_v").cast("double").alias("split_value"),
                F.when(F.col("_f").isNull(), F.col("_maj")).alias("prediction"),
            ).localCheckpoint(eager=True)
        )
        if splits.isEmpty():
            break
        fval = None
        for f in sorted(features):
            branch = F.when(F.col("_f") == F.lit(f), F.col(f))
            fval = branch if fval is None else fval.when(
                F.col("_f") == F.lit(f), F.col(f)
            )
        assign = (
            assign.join(F.broadcast(splits), "_node")
            .withColumn(
                "_node",
                F.col("_node") * 2
                + F.when(fval > F.col("_v"), F.lit(1)).otherwise(F.lit(0)),
            )
            .drop("_f", "_v")
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def tree_apply(
    df: DataFrame,
    model: DataFrame,
    out_col: str = "prediction",
    feature_decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Apply a :func:`tree_fit` model: adds ``out_col`` with the leaf
    prediction per row. The model is a bounded driver collect (< 2^depth
    rows) compiled into ONE nested CASE expression — map-only, zero
    shuffles, whole-stage codegen'd. A row with a NULL split feature
    routes to the RIGHT child (the `x <= v` test is false for NULL),
    matching the training exclusion."""
    rows = {r["node_id"]: r for r in model.collect()}
    if not rows:
        return df.withColumn(out_col, F.lit(None).cast("string"))

    def node_expr(node_id: int) -> Column:
        r = rows[node_id]
        if r["split_feature"] is None:
            return F.lit(r["prediction"])
        left, right = 2 * node_id, 2 * node_id + 1
        test = F.col(r["split_feature"]).cast(feature_decimal) <= F.lit(
            r["split_value"]
        )
        # a child absent from the model (empty side) predicts NULL
        lexpr = node_expr(left) if left in rows else F.lit(None).cast("string")
        rexpr = (
            node_expr(right) if right in rows else F.lit(None).cast("string")
        )
        return F.when(test, lexpr).otherwise(rexpr)

    return df.withColumn(out_col, node_expr(1))


def _rhu(a: int, b: int) -> int:
    """round-half-up(a / b) for b > 0, any-sign a, in exact integer
    arithmetic: floor((2a + b) / (2b)). Python // FLOORS; DuckDB's //
    TRUNCATES toward zero on negatives (-7 // 2 = -3), so oracle twins
    must NOT use bare // — route through the pmod identity instead
    (``_fdiv`` in __spark_entry__.py: (m - pmod(m, d)) // d, exact
    because truncation == floor on an exact multiple). No float touches
    the value on either side."""
    return (2 * a + b) // (2 * b)


def gbt_stumps(
    df: DataFrame,
    features: list[str],
    target_col: str,
    rounds: int = 2,
    feature_decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Gradient-boosted regression STUMPS under squared loss (the
    GBT-lite next to :func:`tree_fit` — Friedman 2001, unit learning
    rate): each round fits one depth-1 split to the CURRENT residuals
    and subtracts the per-side mean. The model frame is returned:

        (round, split_feature, split_value, gamma_left, gamma_right,
         n_left, n_right)

    with round 0 the base prediction (global mean in ``gamma_left``,
    split columns NULL). Prediction for a row = gamma_0 + sum over
    rounds of the side's gamma.

    Exactness: the target must be an INTEGRAL column (cents, counts —
    quantize upstream, the repo-wide rule). Every leaf value is
    round-half-up(sum/n) computed by the floor-division identity
    floor((2S + n) / 2n) on exact integers, so residuals stay EXACT
    integers round over round — no float drift can accumulate.
    Split ranking: minimizing SSE == maximizing
    (SL^2*nR + SR^2*nL)/(nL*nR); numerator/denominator are exact
    DECIMAL(38,0), the ranking double is their one division
    (engine-identical), ties pin (feature asc, value asc), and the
    split-vs-stop decision (variance reduction > 0) is the fully exact
    integer comparison num*n > S_tot^2*(nL*nR).

    Headroom: that gain comparison is S^2*N-scale, so the DECIMAL(38,0)
    bound is |S|^2 * N < 10^38, i.e. |S| < 10^19 / sqrt(N) — e.g.
    |S| ~ 1e16 for N=1e6 rows per node, NOT a flat 1e18 (ADVICE r9).
    On overflow Spark decimal arithmetic yields NULL and the candidate
    would silently drop as no-gain while DuckDB's HUGEINT raises loudly
    — keep target magnitudes inside the bound (cents-scale targets at
    billions of rows fit; re-scale the quantization otherwise). A round
    with no strictly-positive-gain split stops the model early.

    Plan, per round: ONE melt + hash aggregate keyed (feature, value)
    with map-side-combined residual sums [the only data-sized shuffle],
    window prefix over the bounded value grid, a 1-row best-split
    collect (bounded driver scalar, the kmeans/vocab policy), one
    conditional aggregate for the side sums, and a map-only residual
    update localCheckpointed to cut lineage. No UDFs.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds!r}")
    spark = df.sparkSession
    schema = (
        "round int, split_feature string, split_value double, "
        "gamma_left long, gamma_right long, n_left long, n_right long"
    )
    cond = F.col(target_col).isNotNull()
    for f in features:
        cond = cond & F.col(f).isNotNull()
    base = df.filter(cond).select(
        *[F.col(f).cast(feature_decimal).alias(f) for f in features],
        F.col(target_col).cast("long").alias("_y"),
    )
    head = base.agg(
        F.sum("_y").cast(_DEC).alias("_s"), F.count(F.lit(1)).alias("_n")
    ).first()
    n_all = int(head["_n"])
    if n_all == 0:
        return spark.createDataFrame([], schema)
    f0 = _rhu(int(head["_s"]), n_all)
    model = [(0, None, None, f0, None, n_all, None)]

    melt = F.explode(
        F.array(
            *[
                F.struct(F.lit(f).alias("_f"), F.col(f).alias("_v"))
                for f in sorted(features)
            ]
        )
    )
    cur = base.withColumn("_r", (F.col("_y") - F.lit(f0)).cast("long"))
    for t in range(1, rounds + 1):
        cur = cur.localCheckpoint(eager=True)
        g = (
            cur.select("_r", melt.alias("_fv"))
            .select("_r", F.col("_fv._f").alias("_f"), F.col("_fv._v").alias("_v"))
            .groupBy("_f", "_v")
            .agg(
                F.sum("_r").cast(_DEC).alias("_sv"),
                F.count(F.lit(1)).alias("_cv"),
            )
        )
        wp = (
            Window.partitionBy("_f")
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy("_f")
        p = g.select(
            "_f",
            "_v",
            F.sum("_sv").over(wp).alias("_sl"),
            F.sum("_cv").over(wp).cast("long").alias("_nl"),
            F.sum("_sv").over(wt).alias("_st"),
            F.sum("_cv").over(wt).cast("long").alias("_nt"),
            F.max("_v").over(wt).alias("_vmax"),
        ).filter(F.col("_v") < F.col("_vmax"))
        sl = F.col("_sl").cast(_DEC)
        sr = (F.col("_st") - F.col("_sl")).cast(_DEC)
        st = F.col("_st").cast(_DEC)
        nl = F.col("_nl").cast(_DEC)
        nr = (F.col("_nt") - F.col("_nl")).cast(_DEC)
        num = sl * sl * nr + sr * sr * nl
        den = nl * nr
        # the winner row already carries its exact side sums: _sl/_nl are
        # the value-prefix DECIMAL residual sum / count for rows with
        # feature <= v (exactly the old per-round `sides` conditional
        # aggregate — same integers from the same exact decimal fold), so
        # the extra full-frame pass per round is pure recomputation (r16)
        best = (
            p.filter(num * F.col("_nt").cast(_DEC) > st * st * den)
            .orderBy(
                (num.cast("double") / den.cast("double")).desc(),
                F.col("_f").asc(),
                F.col("_v").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        bf, bv = row["_f"], row["_v"]
        side = F.col(bf) <= F.lit(bv).cast(feature_decimal)
        nl_w, nr_w = int(row["_nl"]), int(row["_nt"]) - int(row["_nl"])
        sl_w = int(row["_sl"])
        sr_w = int(row["_st"]) - sl_w
        gl = _rhu(sl_w, nl_w)
        gr = _rhu(sr_w, nr_w)
        model.append((t, bf, float(bv), gl, gr, nl_w, nr_w))
        cur = cur.withColumn(
            "_r",
            (
                F.col("_r")
                - F.when(side, F.lit(gl)).otherwise(F.lit(gr))
            ).cast("long"),
        )
    from bigdata_etl_customer360_spark.operators.util import local_df

    return local_df(spark, model, schema)
