"""Round-5 operator unit tests: rolling windows, sweep-line concurrency,
grid-binned range join, transition counts, resample/gap-fill, mixture
sampling, stratified split, exact-moment correlations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.quality import corr_matrix
from bigdata_etl_customer360_spark.operators.sampling import (
    mixture_sample,
    stratified_split,
)
from bigdata_etl_customer360_spark.operators.temporal import (
    interval_concurrency,
    range_join,
    resample_timeseries,
    rolling_agg,
    transition_counts,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(days=0, hours=0, seconds=0):
    return T0 + dt.timedelta(days=days, hours=hours, seconds=seconds)


# ---------------------------------------------------------------- rolling


def test_rolling_agg_boundary_inclusive(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(0), v=1.0),
            Row(k="a", ts=_ts(90), v=2.0),   # exactly 90d later: IN frame
            Row(k="a", ts=_ts(181), v=4.0),  # 91d after row 2: row 2 out
        ]
    )
    out = rolling_agg(
        df, ["k"], "ts", 90 * 86400, [("s", F.sum(F.col("v").cast("decimal(10,2)")))]
    )
    got = {r["ts"]: float(r["s"]) for r in out.collect()}
    assert got[_ts(0)] == 1.0
    assert got[_ts(90)] == 3.0   # inclusive lower bound
    assert got[_ts(181)] == 4.0  # window slid past both


def test_rolling_agg_equal_ts_peers(spark):
    # equal timestamps are frame peers: both rows see both values
    df = spark.createDataFrame(
        [Row(k="a", ts=_ts(0), v=1.0), Row(k="a", ts=_ts(0), v=2.0)]
    )
    out = rolling_agg(df, ["k"], "ts", 3600, [("s", F.sum("v"))])
    assert [r["s"] for r in out.collect()] == [3.0, 3.0]


# ------------------------------------------------------- sweep-line


def test_interval_concurrency_keyed_half_open(spark):
    df = spark.createDataFrame(
        [
            Row(g="x", s=_ts(0), e=_ts(2)),
            Row(g="x", s=_ts(1), e=_ts(3)),
            Row(g="y", s=_ts(0), e=_ts(1)),
        ]
    )
    out = interval_concurrency(df, "s", "e", keys=["g"])
    got = {(r["g"], r["ts"]): r["n_open"] for r in out.collect()}
    assert got[("x", _ts(0))] == 1
    assert got[("x", _ts(1))] == 2
    assert got[("x", _ts(2))] == 1  # first interval closed AT its end (half-open)
    assert got[("x", _ts(3))] == 0
    assert got[("y", _ts(0))] == 1 and got[("y", _ts(1))] == 0


def test_interval_concurrency_keyless_prefix_sum(spark):
    # 40 staggered intervals; keyless path must equal a single running sum
    rows = [Row(s=_ts(i), e=_ts(i + 5)) for i in range(40)]
    df = spark.createDataFrame(rows)
    out = interval_concurrency(df, "s", "e").orderBy("ts").collect()
    running = 0
    for r in out:
        running += r["net_change"]
        assert r["n_open"] == running
    assert running == 0  # all intervals closed at the end


# ------------------------------------------------------- range join


def test_range_join_multi_bin_exactly_once(spark):
    # interval spans 3 bins; point inside must appear EXACTLY once
    points = spark.createDataFrame([Row(pid=1, ts=_ts(0, hours=30))])
    ivs = spark.createDataFrame([Row(iid=10, s=_ts(0), e=_ts(2))])
    out = range_join(points, ivs, "ts", "s", "e", bin_seconds=86400)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["iid"] == 10


def test_range_join_bounds_inclusive_and_keys(spark):
    points = spark.createDataFrame(
        [
            Row(k=1, pid=1, ts=_ts(0)),          # at start: in
            Row(k=1, pid=2, ts=_ts(1)),          # at end: in
            Row(k=1, pid=3, ts=_ts(1, seconds=1)),  # past end: out
            Row(k=2, pid=4, ts=_ts(0, hours=12)),   # wrong key: out
        ]
    )
    ivs = spark.createDataFrame([Row(k=1, iid=10, s=_ts(0), e=_ts(1))])
    out = range_join(points, ivs, "ts", "s", "e", keys=["k"], bin_seconds=3600)
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_range_join_span_guard(spark):
    points = spark.createDataFrame([Row(ts=_ts(0))])
    ivs = spark.createDataFrame([Row(s=_ts(0), e=_ts(500))])
    out = range_join(points, ivs, "ts", "s", "e", bin_seconds=86400,
                     max_bins_per_interval=100)
    with pytest.raises(Exception, match="range_join"):
        out.collect()


# ------------------------------------------------------- transitions


def test_transition_counts_sequence_and_ties(spark):
    # user 1: a(t0,id1) -> b(t0,id2) tie broken by seq -> a(t1,id3)
    df = spark.createDataFrame(
        [
            Row(u=1, ts=_ts(0), st="a", i=1),
            Row(u=1, ts=_ts(0), st="b", i=2),
            Row(u=1, ts=_ts(1), st="a", i=3),
            Row(u=2, ts=_ts(0), st="b", i=4),
        ]
    )
    out = transition_counts(df, "u", "ts", "st", "i")
    got = {(r["prev_state"], r["state"]): (r["n"], r["p"]) for r in out.collect()}
    assert got[(None, "a")][0] == 1 and got[(None, "b")][0] == 1
    assert got[("a", "b")] == (1, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    # session starts: p = n / total-per-prev over the NULL partition
    assert got[(None, "a")][1] == 0.5


# ------------------------------------------------------- resample


def test_resample_zero_fill_and_ffill(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(0), v=1.0),
            Row(k="a", ts=_ts(3), v=5.0),  # days 1,2 are gaps
        ]
    )
    zero = resample_timeseries(df, ["k"], "ts", 86400, value_col="v").orderBy("cell")
    rows = zero.collect()
    assert [r["n_rows"] for r in rows] == [1, 0, 0, 1]
    assert [r["val_sum"] for r in rows] == [1.0, 0.0, 0.0, 5.0]
    ff = resample_timeseries(
        df, ["k"], "ts", 86400, value_col="v", fill="ffill"
    ).orderBy("cell")
    assert [r["val_sum"] for r in ff.collect()] == [1.0, 1.0, 1.0, 5.0]


def test_resample_rejects_bad_fill(spark):
    df = spark.createDataFrame([Row(k="a", ts=_ts(0), v=1.0)])
    with pytest.raises(ValueError, match="fill"):
        resample_timeseries(df, ["k"], "ts", 86400, value_col="v", fill="bogus")


# ------------------------------------------------------- sampling


def test_mixture_sample_scarcest_domain_kept_whole(spark):
    rows = [Row(d="big", i=n) for n in range(400)] + [
        Row(d="rare", i=1000 + n) for n in range(20)
    ] + [Row(d="unlisted", i=2000 + n) for n in range(50)]
    df = spark.createDataFrame(rows)
    out = mixture_sample(df, "d", {"big": 0.5, "rare": 0.5}, id_col="i").collect()
    by = {}
    for r in out:
        by.setdefault(r["d"], 0)
        by[r["d"]] += 1
    # T = min(400/0.5, 20/0.5) = 40 -> rare keeps all 20, big thins to ~20
    assert by["rare"] == 20
    assert "unlisted" not in by
    assert 10 <= by["big"] <= 32  # binomial around 20 with md5 coins
    # determinism: identical second run
    out2 = mixture_sample(df, "d", {"big": 0.5, "rare": 0.5}, id_col="i").collect()
    assert sorted(r["i"] for r in out) == sorted(r["i"] for r in out2)


def test_stratified_split_exact_counts(spark):
    rows = [Row(s="s1", i=n) for n in range(25)] + [Row(s="s2", i=100 + n) for n in range(10)]
    df = spark.createDataFrame(rows)
    out = stratified_split(df, ["s"], (0.8, 0.1, 0.1), id_col="i").collect()
    cnt = {}
    for r in out:
        cnt[(r["s"], r["split"])] = cnt.get((r["s"], r["split"]), 0) + 1
    assert cnt[("s1", "train")] == 20 and cnt[("s1", "val")] == 2 and cnt[("s1", "test")] == 3
    assert cnt[("s2", "train")] == 8 and cnt[("s2", "val")] == 1 and cnt[("s2", "test")] == 1
    # assignment is per-row deterministic
    again = stratified_split(df, ["s"], (0.8, 0.1, 0.1), id_col="i").collect()
    assert {(r["i"], r["split"]) for r in out} == {(r["i"], r["split"]) for r in again}


# ------------------------------------------------------- corr


def test_corr_matrix_perfect_and_anti(spark):
    df = spark.createDataFrame(
        [Row(x=float(i), y=float(2 * i), z=float(-i)) for i in range(1, 20)]
    )
    out = corr_matrix(df, ["x", "y", "z"], scale=2)
    got = {(r["col_x"], r["col_y"]): r["corr"] for r in out.collect()}
    assert got[("x", "y")] == pytest.approx(1.0)
    assert got[("x", "z")] == pytest.approx(-1.0)
    assert got[("y", "z")] == pytest.approx(-1.0)
    assert out.count() == 3


def test_corr_matrix_null_rows_excluded_and_guard(spark):
    df = spark.createDataFrame(
        [Row(x=1.0, y=1.0), Row(x=2.0, y=2.0), Row(x=3.0, y=None), Row(x=4.0, y=4.0)]
    )
    out = corr_matrix(df, ["x", "y"], scale=2).collect()
    assert out[0]["n"] == 3
    with pytest.raises(ValueError, match="two columns"):
        corr_matrix(df, ["x"])


def test_corr_matrix_zero_variance_null_and_snake_case(spark):
    df = spark.createDataFrame(
        [Row(a=float(i), b_c=5.0, a_b=float(2 * i), c=float(i % 3)) for i in range(10)]
    )
    out = {(r["col_x"], r["col_y"]): r["corr"]
           for r in corr_matrix(df, ["a", "b_c", "a_b", "c"]).collect()}
    assert out[("a", "b_c")] is None          # constant column: NULL, not NaN
    assert out[("a", "a_b")] == pytest.approx(1.0)
    assert len(out) == 6                      # snake_case aliases don't collide


# ------------------------------------------------------- triangles


def test_count_triangles_k4_and_noise(spark):
    from bigdata_etl_customer360_spark.operators.graph import count_triangles

    # K4 (4 triangles), given as duplicated, mixed-direction edges
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(k4 + k4[:3], "src long, dst long")
    row = count_triangles(df).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)


def test_count_triangles_star_and_chain_have_none(spark):
    from bigdata_etl_customer360_spark.operators.graph import count_triangles

    star = [(0, i) for i in range(1, 30)]           # hub, zero triangles
    chain = [(100 + i, 101 + i) for i in range(20)]  # path, zero triangles
    df = spark.createDataFrame(star + chain, "src long, dst long")
    assert count_triangles(df).collect()[0]["n_triangles"] == 0


# ------------------------------------------------------- rolling z


def test_rolling_zscore_outlier_and_guards(spark):
    from bigdata_etl_customer360_spark.operators.temporal import rolling_zscore

    # 30 baseline points so the in-window spike clears |z| > 3 despite
    # the window including the spike itself (z is bounded ~ sqrt(n))
    rows = [Row(k="a", ts=_ts(0, seconds=60 * i), v=10.0) for i in range(30)]
    rows.append(Row(k="a", ts=_ts(0, seconds=1800), v=1000.0))  # spike
    rows += [Row(k="b", ts=_ts(0, hours=h), v=5.0) for h in range(6)]  # zero var
    df = spark.createDataFrame(rows)
    out = rolling_zscore(df, ["k"], "ts", "v", 86400, min_n=5)
    got = {(r["k"], r["ts"], r["v"]): r for r in out.collect()}
    spike = got[("a", _ts(0, seconds=1800), 1000.0)]
    assert spike["is_anomaly"] and spike["z"] > 3.0
    # early rows: window smaller than min_n -> z null, flag False (not null)
    early = got[("a", _ts(0, seconds=60), 10.0)]
    assert early["z"] is None and early["is_anomaly"] is False
    # constant series: std == 0 -> never anomalous
    assert all(
        got[("b", _ts(0, hours=h), 5.0)]["is_anomaly"] is False for h in range(6)
    )


# ------------------------------------------------------- hll


def test_hll_segment_distinct_merge_lossless(spark):
    from bigdata_etl_customer360_spark.operators.quality import hll_segment_distinct

    rows = [Row(seg=f"s{i % 7}", uid=i % 400) for i in range(3000)]
    df = spark.createDataFrame(rows)
    r = hll_segment_distinct(df, "seg", "uid", lg_k=12).collect()[0]
    assert r["n_exact"] == 400
    # union promotes coupon-mode sketches to dense HLL: merged may differ
    # from the single-pass estimate (393 vs 400 measured) but both sit
    # inside the sketch error bound — the certified contract
    assert r["merged_within_5pct"] is True
    assert r["global_within_5pct"] is True
    assert abs(r["merged_estimate"] - 400) <= 20


# ------------------------------------------------------- sharding


def test_shard_corpus_balanced_contiguous_deterministic(spark):
    from bigdata_etl_customer360_spark.operators.sampling import shard_corpus

    df = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    out = shard_corpus(df, "doc_id", 8).collect()
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert len(out) == 500
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # contiguous ranks
        assert len(poss) > 20  # roughly balanced (expected 62.5)
    again = shard_corpus(df, "doc_id", 8).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in out} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in again
    }


def test_clustering_coefficient_k4_star(spark):
    from bigdata_etl_customer360_spark.operators.graph import clustering_coefficient

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    star = [(100, 100 + i) for i in range(1, 5)]
    df = spark.createDataFrame(k4 + star, "src long, dst long")
    got = {r["id"]: r for r in clustering_coefficient(df).collect()}
    for n in range(4):  # K4: every neighbor pair connected
        assert got[n]["degree"] == 3 and got[n]["n_tri"] == 3 and got[n]["coeff"] == 1.0
    assert got[100]["degree"] == 4 and got[100]["n_tri"] == 0 and got[100]["coeff"] == 0.0
    assert got[101]["degree"] == 1 and got[101]["coeff"] is None  # undefined, not 0


def test_asof_join_forward(spark):
    from bigdata_etl_customer360_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [
            Row(k=1, lts=_ts(0, hours=1), lid=1),
            Row(k=1, lts=_ts(0, hours=5), lid=2),   # no future right
            Row(k=2, lts=_ts(0, hours=1), lid=3),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts(0, hours=1), rv=10.0),  # equal ts: inclusive
            Row(k=1, rts=_ts(0, hours=2), rv=20.0),
            Row(k=2, rts=_ts(0, hours=3), rv=30.0),
        ]
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        value_cols=["rv"], direction="forward",
    )
    got = {r["lid"]: (r["rts_asof"], r["rv_asof"]) for r in out.collect()}
    assert got[1] == (_ts(0, hours=1), 10.0)   # at-or-after, inclusive
    assert got[2] == (None, None)              # nothing after -> nulls
    assert got[3] == (_ts(0, hours=3), 30.0)   # earliest after
    import pytest
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "lts", "rts", ["rv"], direction="sideways")


def test_chunk_documents_windows_and_tail(spark):
    from bigdata_etl_customer360_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10))),
            Row(doc_id=2, text="one two"),  # shorter than one chunk
        ]
    )
    out = chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    by = {(r["doc_id"], r["chunk_idx"]): r for r in out}
    # doc 1: starts 0,3,6,9 -> 4 chunks, last is the 1-token tail
    assert by[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert by[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"   # overlap of 1
    assert by[(1, 3)]["chunk_text"] == "w9" and by[(1, 3)]["chunk_n_tokens"] == 1
    assert by[(2, 0)]["chunk_text"] == "one two"
    assert len([k for k in by if k[0] == 2]) == 1
    import pytest
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(docs, chunk_tokens=4, stride=0)


def test_match_event_pattern_order_ties_and_unmapped(spark):
    from bigdata_etl_customer360_spark.operators.temporal import match_event_pattern

    rows = [
        Row(u=1, ts=_ts(0), i=2, st="click"),     # tie at t0: i orders c after v
        Row(u=1, ts=_ts(0), i=1, st="view"),
        Row(u=1, ts=_ts(1), i=3, st="error"),     # unmapped: dropped from path
        Row(u=1, ts=_ts(2), i=4, st="purchase"),
        Row(u=2, ts=_ts(0), i=5, st="error"),     # only unmapped: key absent
    ]
    out = match_event_pattern(
        spark.createDataFrame(rows), "u", "ts", "i", "st",
        {"view": "v", "click": "c", "purchase": "p"}, r"v.*c.*p",
    ).collect()
    got = {r["u"]: (r["path"], r["matched"]) for r in out}
    assert got == {1: ("vcp", True)}


def test_histogram_empty_bins_clamp_and_conservation(spark):
    from bigdata_etl_customer360_spark.operators.quality import histogram

    df = spark.createDataFrame(
        [Row(v=float(x)) for x in (-5.0, 0.0, 0.5, 9.99, 10.0, 55.0, 120.0)]
        + [Row(v=None)]
    )
    out = {r["bin"]: r for r in histogram(df, "v", 0.0, 100.0, num_bins=10).collect()}
    assert len(out) == 10                       # every bin present
    assert out[0]["n"] == 4                     # -5 clamps in; 0.0, 0.5, 9.99
    assert out[1]["n"] == 1                     # 10.0 in [10,20)
    assert out[9]["n"] == 1                     # 120 clamps into the last bin
    assert out[5]["n"] == 1
    assert sum(r["n"] for r in out.values()) == 7   # nulls dropped, rest conserved
    assert out[3]["n"] == 0                     # empty bin emitted as 0
    import pytest
    with pytest.raises(ValueError, match="hi"):
        histogram(df, "v", 5.0, 5.0)


def test_strip_html_blocks_entities_escaped_markup(spark):
    from bigdata_etl_customer360_spark.operators.curation import strip_html

    df = spark.createDataFrame(
        [
            Row(
                text='<p>Hi <b>there</b></p><script>var s="<p>gone</p>";</script>'
                "<style>a{}</style><!-- no -->&lt;b&gt;kept&lt;/b&gt; &amp; done"
            ),
            Row(text="no markup  at\tall"),
        ]
    )
    got = [r["text"] for r in strip_html(df).collect()]
    assert got[0] == "Hi there <b>kept</b> & done"  # escaped markup stays TEXT
    assert got[1] == "no markup at all"             # whitespace collapsed


def test_strip_html_double_escaped_entities(spark):
    from bigdata_etl_customer360_spark.operators.curation import strip_html

    # author wrote the literal text "&lt;b&gt;": one decode level only
    df = spark.createDataFrame([Row(text="&amp;lt;b&amp;gt; and &amp;amp;")])
    got = strip_html(df).collect()[0]["text"]
    assert got == "&lt;b&gt; and &amp;"


def test_canonicalize_urls_pins(spark):
    from bigdata_etl_customer360_spark.operators.curation import canonicalize_urls

    df = spark.createDataFrame(
        [
            Row(i=1, u="HTTPS://WWW.Ex.COM:443/a/b/?z=1&utm_medium=m&a=2#f"),
            Row(i=2, u="http://ex.com:80/a/b?a=2&z=1"),
            Row(i=3, u="https://ex.com/CaseKept/Path"),
            Row(i=4, u="garbage"),
        ]
    )
    got = {r["i"]: r["url_canonical"] for r in canonicalize_urls(df, "u").collect()}
    # 1 and 2 collapse to the same key modulo scheme; tracking/order/port/www die
    assert got[1] == "https://ex.com/a/b?a=2&z=1"
    assert got[2] == "http://ex.com/a/b?a=2&z=1"
    assert got[3] == "https://ex.com/CaseKept/Path"  # path case preserved
    assert got[4] is None


def test_canonicalize_urls_cross_scheme_port_preserved(spark):
    from bigdata_etl_customer360_spark.operators.curation import canonicalize_urls

    df = spark.createDataFrame(
        [Row(i=1, u="http://ex.com:443/x"), Row(i=2, u="https://ex.com:80/x")]
    )
    got = {r["i"]: r["url_canonical"] for r in canonicalize_urls(df, "u").collect()}
    # only the scheme's OWN default port strips; these are distinct resources
    assert got[1] == "http://ex.com:443/x"
    assert got[2] == "https://ex.com:80/x"


def test_empty_input_behaviors(spark):
    """Empty frames flow through the round-5 operators without errors and
    with sane shapes (no IndexError-style regressions à la profile_table)."""
    from bigdata_etl_customer360_spark.operators.quality import corr_matrix, histogram
    from bigdata_etl_customer360_spark.operators.temporal import (
        interval_concurrency,
        resample_timeseries,
        transition_counts,
    )

    empty_ev = spark.createDataFrame(
        [], "k string, ts timestamp, v double, i long, st string"
    )
    assert resample_timeseries(empty_ev, ["k"], "ts", 86400, value_col="v").count() == 0
    assert transition_counts(empty_ev, "k", "ts", "st", "i").count() == 0
    assert interval_concurrency(
        empty_ev.select(F.col("ts").alias("s"), F.col("ts").alias("e")), "s", "e"
    ).count() == 0
    hist = histogram(empty_ev, "v", 0.0, 10.0, num_bins=5).collect()
    assert len(hist) == 5 and all(r["n"] == 0 for r in hist)  # dense even when empty
    cm = corr_matrix(empty_ev.select("v", F.col("v").alias("w")), ["v", "w"]).collect()
    assert len(cm) == 1 and cm[0]["n"] == 0 and cm[0]["corr"] is None


def test_range_join_drops_inverted_intervals(spark):
    from bigdata_etl_customer360_spark.operators.temporal import range_join

    points = spark.createDataFrame([Row(pid=1, ts=_ts(0, hours=1))])
    ivs = spark.createDataFrame(
        [
            Row(iid=1, s=_ts(0), e=_ts(0, hours=2)),       # valid: matches
            Row(iid=2, s=_ts(0, hours=2), e=_ts(0)),       # inverted: no crash, no match
        ]
    )
    got = range_join(points, ivs, "ts", "s", "e", bin_seconds=3600).collect()
    assert [r["iid"] for r in got] == [1]


def test_sampling_validations(spark):
    from bigdata_etl_customer360_spark.operators.sampling import (
        mixture_sample,
        shard_corpus,
    )

    df = spark.createDataFrame([Row(d="a", i=1)])
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, "d", {}, id_col="i")
    with pytest.raises(ValueError, match="> 0"):
        mixture_sample(df, "d", {"a": 0.0}, id_col="i")
    with pytest.raises(ValueError, match="num_shards"):
        shard_corpus(df, "i", 0)


def test_partition_independence_round5(spark):
    """Determinism contract: identical results under 1-partition and
    17-partition layouts for the md5/window/decimal round-5 operators."""
    from bigdata_etl_customer360_spark.operators.sampling import (
        mixture_sample,
        shard_corpus,
        stratified_split,
    )
    from bigdata_etl_customer360_spark.operators.temporal import (
        rolling_zscore,
        transition_counts,
    )

    rows = [
        Row(k=f"k{i % 7}", ts=_ts(0, seconds=37 * i), v=float(i % 13), i=i)
        for i in range(500)
    ]
    base = spark.createDataFrame(rows)

    def runs(fn):
        outs = []
        for parts in (1, 17):
            df = base.repartition(parts)
            rows_ = [tuple(r) for r in fn(df).collect()]
            outs.append(sorted(rows_, key=lambda t: tuple(map(repr, t))))
        return outs

    for fn in (
        lambda d: mixture_sample(d, "k", {f"k{j}": 1 / 7 for j in range(7)}, id_col="i"),
        lambda d: stratified_split(d, ["k"], id_col="i").select("i", "split"),
        lambda d: shard_corpus(d, "i", 8).select("i", "shard", "pos"),
        lambda d: transition_counts(d, "k", "ts", "v", "i"),
        lambda d: rolling_zscore(d, ["k"], "ts", "v", 3600, min_n=3).select(
            "i", "z", "is_anomaly"
        ),
    ):
        a, b = runs(fn)
        assert a == b


def test_snapshot_diff_null_safety_and_attribution(spark):
    from bigdata_etl_customer360_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),
            Row(k=2, a=None, b=2.0),   # null -> value = changed
            Row(k=3, a="z", b=None),   # null -> null = NOT changed
            Row(k=4, a="w", b=4.0),    # removed
            Row(k=6, a="u", b=6.0),    # unchanged -> dropped
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.5),        # b changed
            Row(k=2, a="y", b=2.0),        # a changed (from NULL)
            Row(k=3, a="z", b=None),       # identical incl. null
            Row(k=5, a="v", b=5.0),        # added
            Row(k=6, a="u", b=6.0),
        ]
    )
    got = {r["k"]: (r["change"], r["changed_cols"]) for r in
           snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: ("changed", "b"),
        2: ("changed", "a"),
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_link_records_cross_table(spark):
    from bigdata_etl_customer360_spark.operators.dedup import link_records

    left = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely different content here entirely"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(doc_id=10, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=11, text="unrelated text with no overlap whatsoever at all"),
        ]
    )
    got = link_records(left, right, threshold=0.5).collect()
    assert [(r["left_id"], r["right_id"]) for r in got] == [(1, 10)]
    assert got[0]["jaccard"] > 0.7
    # no self-pairs, no within-table pairs by construction (two-sided join)


def test_count_triangles_materialize_off_same_result(spark):
    from bigdata_etl_customer360_spark.operators.graph import count_triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(k4, "src long, dst long")
    on = count_triangles(df).collect()[0]
    off = count_triangles(df, materialize=False).collect()[0]
    assert tuple(on) == tuple(off) == (4, 6, 4)


def test_rolling_zscore_negative_rounded_variance_not_nan(spark):
    """Regression (ADVICE r5): a constant window whose double-rounded
    variance lands slightly NEGATIVE must emit z NULL / flag FALSE.
    Pre-fix the guard was `std > 0` and sqrt(negative) = NaN sorts ABOVE
    all doubles in Spark, so the NaN z leaked out with is_anomaly=TRUE.
    v=7.580489 is chosen so nd*s2d - sd*sd < 0 exactly at window n=7
    (and <= 0 for every other n <= 12)."""
    from bigdata_etl_customer360_spark.operators.temporal import rolling_zscore

    rows = [Row(k="c", ts=_ts(0, seconds=60 * i), v=7.580489) for i in range(12)]
    out = rolling_zscore(
        spark.createDataFrame(rows), ["k"], "ts", "v", 86400, min_n=5
    ).collect()
    assert len(out) == 12
    for r in out:
        assert r["z"] is None, r
        assert r["is_anomaly"] is False, r


def test_mixture_sample_empty_weighted_domain_bounds_T(spark):
    """A domain named in weights but ABSENT from the data participates in
    T = min(n_i / w_i) with n_i = 0, so T = 0 and the sample is empty —
    never a silently different composition (ADVICE r5)."""
    from bigdata_etl_customer360_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [Row(d="web", i=n) for n in range(40)] + [Row(d="code", i=100 + n) for n in range(10)]
    )
    out = mixture_sample(df, "d", {"web": 0.5, "ghost": 0.5}, id_col="i")
    assert out.count() == 0
    # sanity: the same mix over PRESENT domains is non-empty
    ok = mixture_sample(df, "d", {"web": 0.5, "code": 0.5}, id_col="i")
    assert ok.count() > 0


def test_chunk_documents_stride_exceeding_chunk_raises(spark):
    """stride > chunk_tokens would silently gap-sample the document
    (ADVICE r5) — rejected up front."""
    from bigdata_etl_customer360_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame([Row(doc_id=1, text="a b c d e f")])
    with pytest.raises(ValueError, match="gap-sample"):
        chunk_documents(docs, chunk_tokens=4, stride=5)


def test_group_split_leakage_safe_and_append_stable(spark):
    from bigdata_etl_customer360_spark.operators.sampling import group_split

    rows = [Row(d=f"g{i % 40}", i=i) for i in range(400)]
    df = spark.createDataFrame(rows)
    out = group_split(df, "d").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["d"], set()).add(r["split"])
    # leakage-safe: every group sits wholly in one split
    assert all(len(s) == 1 for s in by_group.values())
    assert set().union(*by_group.values()) <= {"train", "val", "test"}
    # append-stable: adding rows/groups never reassigns existing ones
    df2 = spark.createDataFrame(rows + [Row(d=f"h{i}", i=1000 + i) for i in range(20)])
    out2 = {(r["d"], r["i"]): r["split"] for r in group_split(df2, "d").collect()}
    for r in out:
        assert out2[(r["d"], r["i"])] == r["split"]
    with pytest.raises(ValueError, match="sum to 1"):
        group_split(df, "d", fractions=(0.5, 0.2, 0.2))


def test_dedup_incremental_fold_equals_global(spark):
    from bigdata_etl_customer360_spark.operators.dedup import (
        dedup_exact,
        dedup_incremental,
        doc_fingerprints,
    )

    rows = [
        (0, "alpha beta"), (1, "gamma delta"), (2, "ALPHA   beta"),  # dup of 0
        (3, "epsilon"), (4, "gamma  DELTA"),  # dup of 1, later batch
        (5, "zeta"), (6, "zeta"),             # within-batch dup
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    batches = [df.filter(F.col("doc_id") < 3),
               df.filter((F.col("doc_id") >= 3) & (F.col("doc_id") < 5)),
               df.filter(F.col("doc_id") >= 5)]
    seen, got = None, []
    for b in batches:
        s = dedup_incremental(b, seen)
        got += [r["doc_id"] for r in s.collect()]
        fps = doc_fingerprints(s)
        seen = fps if seen is None else seen.unionByName(fps).distinct()
    want = sorted(r["doc_id"] for r in dedup_exact(df).collect())
    assert sorted(got) == want == [0, 1, 3, 5]


def test_dedup_incremental_null_texts_dedupe_across_batches(spark):
    """NULL-text docs must obey the same fold == one-pass invariant as
    real texts (r13): text_fingerprint maps NULL to a sentinel instead
    of a NULL key, because groupBy collapses NULL-text docs WITHIN a
    batch while the seen anti-join's equality (NULL != NULL) would keep
    one per batch ACROSS batches — a silent invariant break the
    synthetic corpus (no NULL texts) never exercised. Also pins the
    sentinel against the bucketed seen lake: a NULL key would re-append
    on every fold; the sentinel folds once and stays distinct."""
    from bigdata_etl_customer360_spark.operators.dedup import (
        dedup_exact,
        dedup_incremental,
        doc_fingerprints,
        text_fingerprint,
    )
    from bigdata_etl_customer360_spark.sources.bucketed import seen_fold_bucketed

    rows = [(0, "alpha"), (1, None), (2, None), (3, "beta"), (4, None), (5, None)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    batches = [df.filter(F.col("doc_id") < 3), df.filter(F.col("doc_id") >= 3)]
    seen, got = None, []
    for b in batches:
        s = dedup_incremental(b, seen)
        got += [r["doc_id"] for r in s.collect()]
        fps = doc_fingerprints(s)
        seen = fps if seen is None else seen.unionByName(fps).distinct()
    want = sorted(r["doc_id"] for r in dedup_exact(df).collect())
    # one NULL-text survivor total (doc 1), not one per batch
    assert sorted(got) == want == [0, 1, 3]
    # the sentinel is a real key: no NULL fingerprints anywhere
    assert df.select(text_fingerprint("text").alias("fp")).filter(
        F.col("fp").isNull()
    ).count() == 0
    # bucketed lake: re-folding the same fingerprints appends nothing
    spark.sql("DROP TABLE IF EXISTS null_fp_lake_t")
    try:
        seen_fold_bucketed(spark, "null_fp_lake_t", doc_fingerprints(df), buckets=4)
        n1 = spark.table("null_fp_lake_t").count()
        seen_fold_bucketed(spark, "null_fp_lake_t", doc_fingerprints(df), buckets=4)
        n2 = spark.table("null_fp_lake_t").count()
        assert n1 == n2 == 3  # alpha, beta, sentinel — distinct, stable
    finally:
        spark.sql("DROP TABLE IF EXISTS null_fp_lake_t")


def test_boolean_search_modes_and_token_boundaries(spark):
    from bigdata_etl_customer360_spark.operators.textstats import boolean_search

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Spark JOIN window fun"),
            Row(doc_id=2, text="spark only here"),
            Row(doc_id=3, text="sparkly joinery windows"),  # substrings must NOT hit
            Row(doc_id=4, text="join window no s-word"),
        ]
    )
    got_and = {r["doc_id"]: r["n_hits"] for r in
               boolean_search(df, ["spark", "join", "window"], mode="and").collect()}
    assert got_and == {1: 3}
    got_or = {r["doc_id"]: r["n_hits"] for r in
              boolean_search(df, ["spark", "join", "window"], mode="or").collect()}
    assert got_or == {1: 3, 2: 1, 4: 2}
    with pytest.raises(ValueError, match="mode"):
        boolean_search(df, ["x"], mode="not")
    with pytest.raises(ValueError, match="at least one"):
        boolean_search(df, [])


def test_cooccur_stats_counts_and_cap(spark):
    from bigdata_etl_customer360_spark.operators.textstats import cooccur_stats

    rows = [Row(doc_id=i, text="alpha beta hub") for i in range(4)]
    rows += [Row(doc_id=10 + i, text="zz hub") for i in range(2)]
    rows += [Row(doc_id=20, text="gamma delta")]
    df = spark.createDataFrame(rows)
    out = {(r["term_a"], r["term_b"]): r for r in
           cooccur_stats(df, min_pair_docs=2).collect()}
    r = out[("alpha", "beta")]
    # distinct-doc counts: alpha in 4 docs, beta in 4, together in 4, corpus 7
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_docs"]) == (4, 4, 4, 7)
    assert ("gamma", "delta") not in out  # a < b ordering
    assert ("delta", "gamma") not in out  # below min_pair_docs
    # df-cap kills the hub term's pairs
    capped = {(r["term_a"], r["term_b"]) for r in
              cooccur_stats(df, min_pair_docs=2, max_df=5).collect()}
    assert capped == {("alpha", "beta")}


def test_scd2_snapshot_at_one_version_per_key_and_ties(spark):
    from bigdata_etl_customer360_spark.operators.temporal import (
        scd2_history,
        scd2_snapshot_at,
    )

    rows = [
        Row(k=1, seq=1, ts=_ts(0), v="a"),
        Row(k=1, seq=2, ts=_ts(2), v="b"),
        Row(k=1, seq=3, ts=_ts(2), v="c"),   # same-ts stack: last wins
        Row(k=1, seq=4, ts=_ts(5), v="d"),
        Row(k=2, seq=5, ts=_ts(3), v="x"),
    ]
    hist = scd2_history(
        spark.createDataFrame(rows), key="k", ts="ts", seq_col="seq"
    )

    def snap(at):
        return {r["k"]: r["v"] for r in scd2_snapshot_at(hist, at).collect()}

    assert snap(_ts(1)) == {1: "a"}                # before k=2 exists
    assert snap(_ts(2)) == {1: "c"}                # tie stack -> last version
    assert snap(_ts(4)) == {1: "c", 2: "x"}
    assert snap(_ts(9)) == {1: "d", 2: "x"}        # open-ended current rows
    assert snap(_ts(0, seconds=-1)) == {}          # before any history


# ---------------------------------------------------------------- ewma


def test_ewma_level_matches_pandas_ewm(spark):
    """ewma_level == pandas ewm(adjust=False).mean() last value per key,
    for a non-trivial series and several alphas."""
    import pandas as pd

    from bigdata_etl_customer360_spark.operators.temporal import ewma_level

    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0]
    rows = [Row(user_id="u", ts=_ts(days=i), value=v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows)
    for alpha in (0.25, 0.5, 0.125):
        got = ewma_level(df, keys=("user_id",), alpha=alpha).collect()[0]
        want = pd.Series(vals).ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        assert got["n_points"] == len(vals)
        assert got["ewma"] == pytest.approx(want, abs=1e-8)


def test_ewma_level_tie_order_null_handling_and_single_point(spark):
    """Equal timestamps fold in value order (pinned tie-break); NULL
    ts/value rows are excluded; a single-point key returns its value;
    keys with no surviving rows are absent."""
    from bigdata_etl_customer360_spark.operators.temporal import ewma_level

    rows = [
        # u1: tie at t0 -> folds 1.0 then 5.0: s = 1.0 -> 0.5*1 + 0.5*5 = 3.0
        Row(user_id="u1", ts=_ts(0), value=5.0),
        Row(user_id="u1", ts=_ts(0), value=1.0),
        # u2: single point + one NULL value (excluded)
        Row(user_id="u2", ts=_ts(0), value=7.5),
        Row(user_id="u2", ts=_ts(1), value=None),
        # u3: only NULLs -> absent
        Row(user_id="u3", ts=None, value=2.0),
        Row(user_id="u3", ts=_ts(0), value=None),
    ]
    out = {r["user_id"]: r for r in ewma_level(
        spark.createDataFrame(rows), alpha=0.5).collect()}
    assert set(out) == {"u1", "u2"}
    assert out["u1"]["ewma"] == pytest.approx(3.0)
    assert out["u1"]["n_points"] == 2
    assert out["u2"]["ewma"] == pytest.approx(7.5)
    assert out["u2"]["n_points"] == 1


def test_ewma_level_rejects_bad_alpha(spark):
    from bigdata_etl_customer360_spark.operators.temporal import ewma_level

    df = spark.createDataFrame([Row(user_id="u", ts=_ts(0), value=1.0)])
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            ewma_level(df, alpha=bad)


def test_holt_smooth_matches_pure_python_and_degenerates(spark):
    """holt_smooth == the textbook recursion run in pure Python
    (l2=x2, b2=x2-x1 init); n=1 pins (x, 0); n=2 returns the init; a
    perfect linear series locks level on the line and trend on the
    slope."""
    import pytest as _pt

    from bigdata_etl_customer360_spark.operators.temporal import holt_smooth

    series = {
        "u1": [53.37, 5.12, 2.59, 9.77, 30.49, 12.0, 44.5],
        "u2": [7.5],
        "u3": [2.0, 6.0],
        "lin": [1.0, 3.0, 5.0, 7.0, 9.0],
    }
    rows = [
        (k, _ts(days=i), v) for k, vs in series.items() for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    got = {r["user_id"]: r for r in holt_smooth(df, alpha=0.5, beta=0.25).collect()}

    def ref(vs, a=0.5, b=0.25):
        if len(vs) == 1:
            return vs[0], 0.0
        l, t = vs[1], vs[1] - vs[0]
        for x in vs[2:]:
            nl = a * x + (1 - a) * (l + t)
            t = b * (nl - l) + (1 - b) * t
            l = nl
        return l, t

    for k, vs in series.items():
        wl, wt = ref(vs)
        assert got[k]["n_points"] == len(vs)
        assert got[k]["level"] == _pt.approx(wl, abs=1e-8)
        assert got[k]["trend"] == _pt.approx(wt, abs=1e-8)
        assert got[k]["forecast"] == _pt.approx(
            round(wl, 8) + round(wt, 8), abs=2e-8
        )
    assert got["lin"]["level"] == 9.0 and got["lin"]["trend"] == 2.0
    assert got["u3"]["level"] == 6.0 and got["u3"]["trend"] == 4.0


def test_merge_intervals_touch_zero_len_null_invalid(spark):
    """Touching half-open intervals merge; zero-length points absorb;
    NULL bounds and end<start rows are excluded; disjoint keys stay
    independent."""
    from bigdata_etl_customer360_spark.operators.temporal import merge_intervals

    rows = [("k", 1, 5), ("k", 4, 8), ("k", 8, 10), ("k", 12, 13),
            ("k", 12, 12), ("k", 20, 21),
            ("j", 1, 2), ("j", 3, 4), ("j", None, 5), ("j", 6, 5)]
    df = spark.createDataFrame(rows, "k string, s int, e int")
    got = sorted(tuple(r) for r in merge_intervals(df, ["k"], "s", "e").collect())
    assert got == [("j", 1, 2, 1), ("j", 3, 4, 1),
                   ("k", 1, 10, 3), ("k", 12, 13, 2), ("k", 20, 21, 1)]


def test_nelson_aalen_matches_hand_computation(spark):
    """H(t) = running sum of d/n on a small censored cohort; exp(-H)
    upper-bounds the KM product (the standard inequality) on the same
    risk table."""
    import math

    from bigdata_etl_customer360_spark.operators.temporal import (
        kaplan_meier,
        nelson_aalen,
    )

    rows = [(2, 1), (3, 0), (4, 1), (4, 1), (5, 0), (7, 1)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    na = {r["t"]: r for r in nelson_aalen(df, "dur", "ev").collect()}
    # t=2: d1/n6; t=4: +2/4; t=7: +1/1
    assert na[2]["cum_hazard"] == pytest.approx(1 / 6)
    assert na[2]["n_risk"] == 6 and na[2]["n_events"] == 1
    assert na[4]["cum_hazard"] == pytest.approx(1 / 6 + 2 / 4)
    assert na[7]["cum_hazard"] == pytest.approx(1 / 6 + 2 / 4 + 1 / 1)
    km = {r["t"]: r["survival"] for r in kaplan_meier(df, "dur", "ev").collect()}
    for t, r in na.items():
        assert math.exp(-r["cum_hazard"]) >= km[t] - 1e-12
