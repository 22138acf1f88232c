"""tree_fit / tree_apply — parity against an independent brute-force
CART implemented with exact Python integers (Fraction-free: the same
cross-multiplied gini comparisons, so agreement is exact, not
approximate)."""

import pytest
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.ml import tree_apply, tree_fit


def brute_tree(rows, features, max_depth, min_split=2):
    """rows: list of (dict feature->int value, label). Returns
    {node_id: (depth, n, feat|None, thr|None, pred|None)} with the exact
    semantics tree_fit documents."""
    model = {}

    def best_split(sub):
        labs = sorted({l for _, l in sub})
        best = None  # (score_num, score_den, f, v) compared exactly
        for f in sorted(features):
            vals = sorted({r[f] for r, _ in sub})
            for v in vals[:-1]:
                left = [(r, l) for r, l in sub if r[f] <= v]
                right = [(r, l) for r, l in sub if r[f] > v]
                nl, nr = len(left), len(right)
                suml2 = sum(
                    sum(1 for _, l in left if l == c) ** 2 for c in labs
                )
                sumr2 = sum(
                    sum(1 for _, l in right if l == c) ** 2 for c in labs
                )
                num = nr * suml2 + nl * sumr2
                den = nl * nr
                # positive gain, exactly: num * n > sum_c nc^2 * den
                sumt2 = sum(
                    sum(1 for _, l in sub if l == c) ** 2 for c in labs
                )
                if num * len(sub) <= sumt2 * den:
                    continue
                if best is None or num * best[1] > best[0] * den or (
                    num * best[1] == best[0] * den and (f, v) < (best[2], best[3])
                ):
                    best = (num, den, f, v)
        return best

    def majority_tie_asc(sub):
        counts = {}
        for _, l in sub:
            counts[l] = counts.get(l, 0) + 1
        best = None
        for lab in sorted(counts):
            if best is None or counts[lab] > counts[best]:
                best = lab
        return best

    def rec(node, depth, sub):
        n = len(sub)
        pure = len({l for _, l in sub}) == 1
        sp = None
        if depth < max_depth and n >= min_split and not pure:
            sp = best_split(sub)
        if sp is None:
            model[node] = (depth, n, None, None, majority_tie_asc(sub))
            return
        _, _, f, v = sp
        model[node] = (depth, n, f, float(v), None)
        rec(2 * node, depth + 1, [(r, l) for r, l in sub if r[f] <= v])
        rec(2 * node + 1, depth + 1, [(r, l) for r, l in sub if r[f] > v])

    rec(1, 0, rows)
    return model


def spark_model_dict(model_df):
    return {
        r["node_id"]: (
            r["depth"],
            r["n"],
            r["split_feature"],
            r["split_value"],
            r["prediction"],
        )
        for r in model_df.collect()
    }


def test_tree_fit_matches_bruteforce_random(spark):
    import random

    rng = random.Random(11)
    rows = [
        (
            {"a": rng.randrange(6), "b": rng.randrange(4), "c": rng.randrange(3)},
            rng.choice("xyz"),
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["c"], l) for r, l in rows],
        "a int, b int, c int, lab string",
    )
    got = spark_model_dict(tree_fit(df, ["a", "b", "c"], "lab", max_depth=3))
    want = brute_tree(rows, ["a", "b", "c"], max_depth=3)
    assert got == want


def test_tree_fit_pure_and_small_nodes_become_leaves(spark):
    # one feature separates perfectly at depth 1 -> children are pure
    # leaves even though max_depth allows another level
    rows = [(i, "lo" if i <= 4 else "hi") for i in range(10)]
    df = spark.createDataFrame(rows, "x int, lab string")
    got = spark_model_dict(tree_fit(df, ["x"], "lab", max_depth=3))
    assert got[1] == (0, 10, "x", 4.0, None)
    assert got[2] == (1, 5, None, None, "lo")
    assert got[3] == (1, 5, None, None, "hi")
    assert set(got) == {1, 2, 3}


def test_tree_fit_no_gain_is_root_leaf(spark):
    # label independent of x with identical class mix on both sides of
    # every threshold -> zero gain everywhere -> root is a leaf (the
    # EXACT boundary a double comparison could flip)
    rows = [(x, lab) for x in range(4) for lab in ("p", "q")]
    df = spark.createDataFrame(rows, "x int, lab string")
    got = spark_model_dict(tree_fit(df, ["x"], "lab", max_depth=2))
    assert got == {1: (0, 8, None, None, "p")}


def test_tree_fit_null_rows_excluded_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, None), (3, "a")], "x int, lab string"
    )
    got = spark_model_dict(tree_fit(df, ["x"], "lab", max_depth=1))
    assert got[1][1] == 2  # only the two fully-non-null rows
    empty = tree_fit(
        spark.createDataFrame([], "x int, lab string"), ["x"], "lab"
    )
    assert empty.count() == 0


def test_tree_apply_routes_and_nulls(spark):
    train = spark.createDataFrame(
        [(i, "lo" if i <= 4 else "hi") for i in range(10)], "x int, lab string"
    )
    model = tree_fit(train, ["x"], "lab", max_depth=2)
    test = spark.createDataFrame([(0,), (4,), (5,), (None,)], "x int")
    got = {r["x"]: r["prediction"] for r in tree_apply(test, model).collect()}
    assert got[0] == "lo" and got[4] == "lo" and got[5] == "hi"
    assert got[None] == "hi"  # NULL fails `x <= v` -> right child


def test_tree_apply_agrees_with_training_partition(spark):
    """Every training row lands in the leaf whose majority it was
    counted into: per-leaf counts from tree_apply == the model's n."""
    li = spark.createDataFrame(
        [((i * 7919) % 50, (i * 104729) % 11, "rst"[(i * 31) % 3]) for i in range(500)],
        "q int, d int, lab string",
    )
    model = tree_fit(li, ["q", "d"], "lab", max_depth=2)
    leaves = {
        r["node_id"]: r["n"]
        for r in model.collect()
        if r["split_feature"] is None
    }
    # recompute leaf membership by routing through the tree
    rows = {r["node_id"]: r for r in model.collect()}

    def leaf_of(q, d):
        node = 1
        while rows[node]["split_feature"] is not None:
            r = rows[node]
            val = q if r["split_feature"] == "q" else d
            node = 2 * node + (0 if val <= r["split_value"] else 1)
        return node

    from collections import Counter

    want = Counter(leaf_of(r["q"], r["d"]) for r in li.collect())
    assert dict(want) == leaves


def brute_gbt(rows, features, rounds):
    """rows: list of (dict feature->int, y int). Same exact-integer
    semantics as gbt_stumps, independently implemented."""
    def rhu(a, b):
        return (2 * a + b) // (2 * b)

    n = len(rows)
    f0 = rhu(sum(y for _, y in rows), n)
    model = [(0, None, None, f0, None, n, None)]
    res = [(r, y - f0) for r, y in rows]
    for t in range(1, rounds + 1):
        st, nt = sum(v for _, v in res), len(res)
        best = None
        for f in sorted(features):
            vals = sorted({r[f] for r, _ in res})
            for v in vals[:-1]:
                sl = sum(rv for r, rv in res if r[f] <= v)
                nl = sum(1 for r, _ in res if r[f] <= v)
                sr, nr = st - sl, nt - nl
                num, den = sl * sl * nr + sr * sr * nl, nl * nr
                if num * nt <= st * st * den:
                    continue
                if (
                    best is None
                    or num * best[1] > best[0] * den
                    or (num * best[1] == best[0] * den and (f, v) < (best[2], best[3]))
                ):
                    best = (num, den, f, v)
        if best is None:
            break
        _, _, bf, bv = best
        left = [(r, rv) for r, rv in res if r[bf] <= bv]
        right = [(r, rv) for r, rv in res if r[bf] > bv]
        gl = rhu(sum(rv for _, rv in left), len(left))
        gr = rhu(sum(rv for _, rv in right), len(right))
        model.append((t, bf, float(bv), gl, gr, len(left), len(right)))
        res = [(r, rv - (gl if r[bf] <= bv else gr)) for r, rv in res]
    return model


def test_gbt_stumps_matches_bruteforce(spark):
    import random

    from bigdata_etl_customer360_spark.operators.ml import gbt_stumps

    rng = random.Random(5)
    rows = [
        (
            {"a": rng.randrange(8), "b": rng.randrange(5)},
            rng.randrange(-500, 5000) + 100 * (rng.randrange(8) < 4),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(r["a"], r["b"], y) for r, y in rows], "a int, b int, y long"
    )
    got = [tuple(r) for r in gbt_stumps(df, ["a", "b"], "y", rounds=3).collect()]
    assert got == brute_gbt(rows, ["a", "b"], 3)


def test_gbt_stumps_constant_target_stops_after_base(spark):
    from bigdata_etl_customer360_spark.operators.ml import gbt_stumps

    df = spark.createDataFrame([(i, 7) for i in range(10)], "x int, y long")
    got = [tuple(r) for r in gbt_stumps(df, ["x"], "y", rounds=3).collect()]
    assert got == [(0, None, None, 7, None, 10, None)]


def test_gbt_stumps_negative_halves_round_half_up(spark):
    """Residual means at exactly -.5 must round toward +inf on both
    engines (floor((2a+b)/(2b)) — the documented identity)."""
    from bigdata_etl_customer360_spark.operators.ml import gbt_stumps

    # y: two groups; group means produce a -.5 leaf mean in round 1
    df = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 4), (1, 5)], "x int, y long"
    )
    got = {r["round"]: r for r in gbt_stumps(df, ["x"], "y", rounds=1).collect()}
    # f0 = rhu(10, 4) = floor(24/8) = 3; residuals -3,-2,1,2
    assert got[0]["gamma_left"] == 3
    # left mean -2.5 -> rhu(-5,2) = floor(-8/4) = -2; right mean 1.5 -> 2
    assert got[1]["gamma_left"] == -2 and got[1]["gamma_right"] == 2


def test_tree_graded_oracle_shape_assumption(spark):
    """The tree_train/tree_eval DuckDB oracles hard-code the 'root and
    BOTH level-1 children split' depth-2 shape (their _cart_advance CTE
    inner-joins assignments to per-level best splits, so a level-1 node
    going leaf would silently drop its rows from the oracle — ADVICE
    r9).  Pin that shape at the graded sf so a future data change is
    diagnosed as STALE ORACLE, not an operator bug."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    model = {r["node_id"]: r for r in entry._tree_model(spark, SF_DIR).collect()}
    for node in (1, 2, 3):
        assert node in model, f"oracle assumes node {node} exists"
        assert model[node]["split_feature"] is not None, (
            f"tree_train/tree_eval oracles assume node {node} SPLITS at "
            f"the graded sf; it became a leaf — update the oracles"
        )
