"""Unit tests for the curation operators (redact_pii / decontaminate /
pack_sequences) on crafted micro-corpora — the graded queries cover the
oracle hash-match; these pin the operator semantics edge by edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_etl_customer360_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    redact_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


class TestRedactPii:
    def test_each_rule_fires(self, spark):
        df = _docs(
            spark,
            [
                (1, "mail a@b.io now"),
                (2, "call 555-123-4567 ok"),
                (3, "host 192.168.0.1 up"),
                (4, "card 4111111111111111 used"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in redact_pii(df).select("doc_id", "redacted", "n_redactions").collect()
        }
        assert out[1]["redacted"] == "mail <EMAIL> now"
        assert out[2]["redacted"] == "call <PHONE> ok"
        assert out[3]["redacted"] == "host <IP> up"
        assert out[4]["redacted"] == "card <CARD> used"
        assert all(out[i]["n_redactions"] == 1 for i in (1, 2, 3, 4))

    def test_clean_text_untouched(self, spark):
        df = _docs(spark, [(1, "no pii here at all 12 34")])
        row = redact_pii(df).collect()[0]
        assert row["redacted"] == "no pii here at all 12 34"
        assert row["n_redactions"] == 0

    def test_email_rule_wins_over_digit_rules(self, spark):
        # the email local part contains a 13-digit run; rule order must
        # redact the whole address, not carve out a <CARD>
        df = _docs(spark, [(1, "x 1234567890123@example.com y")])
        row = redact_pii(df).collect()[0]
        assert row["redacted"] == "x <EMAIL> y"
        assert row["n_redactions"] == 1

    def test_multiple_hits_counted(self, spark):
        df = _docs(spark, [(1, "a@b.io and c@d.io from 10.0.0.1")])
        row = redact_pii(df).collect()[0]
        assert row["redacted"] == "<EMAIL> and <EMAIL> from <IP>"
        assert row["n_redactions"] == 3


class TestDecontaminate:
    def test_overlapping_doc_dropped(self, spark):
        bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
        # doc 1 shares 4 distinct 3-grams with the benchmark, doc 2 none
        corpus = _docs(
            spark,
            [
                (1, "alpha beta gamma delta epsilon zeta end"),
                (2, "totally different words in this one here"),
            ],
        )
        kept = decontaminate(corpus, bench, min_overlap=3)
        assert [r["doc_id"] for r in kept.collect()] == [2]

    def test_below_threshold_kept(self, spark):
        bench = _docs(spark, [(100, "alpha beta gamma delta")])
        corpus = _docs(spark, [(1, "alpha beta gamma other words here")])
        # exactly 1 shared shingle ("alpha beta gamma") < min_overlap=2
        kept = decontaminate(corpus, bench, min_overlap=2)
        assert [r["doc_id"] for r in kept.collect()] == [1]

    def test_short_docs_survive(self, spark):
        bench = _docs(spark, [(100, "alpha beta gamma delta")])
        corpus = _docs(spark, [(1, "two words")])  # < n tokens, no shingles
        kept = decontaminate(corpus, bench, min_overlap=1)
        assert [r["doc_id"] for r in kept.collect()] == [1]


class TestPackSequences:
    def _packed(self, spark, rows, capacity):
        df = spark.createDataFrame(
            rows, schema="doc_id long, lang string, n_tokens long"
        )
        return {
            r["doc_id"]: r
            for r in pack_sequences(df, capacity=capacity).collect()
        }

    def test_offsets_and_windows(self, spark):
        out = self._packed(
            spark,
            [(1, "en", 600), (2, "en", 500), (3, "en", 200)],
            capacity=1000,
        )
        assert (out[1]["tok_offset"], out[1]["first_seq"], out[1]["last_seq"]) == (0, 0, 0)
        # doc 2 straddles the first boundary: tokens 600..1099
        assert (out[2]["tok_offset"], out[2]["first_seq"], out[2]["last_seq"]) == (600, 0, 1)
        assert (out[3]["tok_offset"], out[3]["first_seq"], out[3]["last_seq"]) == (1100, 1, 1)

    def test_exact_fit_does_not_leak_into_next_window(self, spark):
        out = self._packed(spark, [(1, "en", 1000), (2, "en", 1)], capacity=1000)
        # doc 1 fills window 0 exactly; its last token is index 999
        assert (out[1]["first_seq"], out[1]["last_seq"]) == (0, 0)
        assert (out[2]["tok_offset"], out[2]["first_seq"]) == (1000, 1)

    def test_shards_pack_independently(self, spark):
        out = self._packed(
            spark, [(1, "en", 700), (2, "de", 700), (3, "en", 700)], capacity=1000
        )
        assert out[2]["tok_offset"] == 0  # de stream starts fresh
        assert out[3]["tok_offset"] == 700  # en stream continues past doc 1

    def test_partition_independent(self, spark):
        rows = [(i, "en" if i % 2 else "de", 100 + i) for i in range(50)]
        df = spark.createDataFrame(rows, schema="doc_id long, lang string, n_tokens long")
        a = sorted(map(tuple, pack_sequences(df, 1000).collect()))
        b = sorted(map(tuple, pack_sequences(df.repartition(7), 1000).collect()))
        assert a == b


class TestCurateCorpusOptionalStages:
    def test_boilerplate_and_repetition_stages(self, spark):
        from bigdata_etl_customer360_spark.plans.pipelines import curate_corpus

        footer = "subscribe to our newsletter for updates today please " \
                 "and follow the channel for more content like this"
        rows = [
            # 6 distinct docs sharing ONLY the footer line — without
            # stripping, the footer's shingles dominate each doc's shingle
            # set and glue them into near-dup pairs; with stripping they
            # stay distinct
            (i, "en", " ".join(f"w{i}x{j}" for j in range(8)) + "\n" + footer)
            for i in range(1, 7)
        ]
        # a degenerate repetitive doc: top bigram covers ~half of all grams
        rows.append((99, "en", "buy now " * 30))
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

        kept = {
            r["doc_id"]
            for r in curate_corpus(
                df,
                sample_n=10,
                min_tokens=5,
                max_stopword_ratio=1.0,
                min_distinct_ratio=0.01,
                jaccard_threshold=0.3,
                boilerplate_min_docs=5,
                max_top_ngram_pct=20,
            ).collect()
        }
        assert kept == {1, 2, 3, 4, 5, 6}  # repetitive doc gated out

        # without the new stages: footer glues docs into one near-dup
        # cluster (only the min id survives) and the repetitive doc stays
        kept_off = {
            r["doc_id"]
            for r in curate_corpus(
                df,
                sample_n=10,
                min_tokens=5,
                max_stopword_ratio=1.0,
                min_distinct_ratio=0.01,
                jaccard_threshold=0.3,
            ).collect()
        }
        assert 99 in kept_off
        assert len(kept_off & {1, 2, 3, 4, 5, 6}) < 6


class TestDedupLinesWithin:
    def test_keep_first_empty_exempt_and_count(self, spark):
        from bigdata_etl_customer360_spark.operators.curation import (
            dedup_lines_within,
        )

        df = spark.createDataFrame(
            [(1, "a\nb\na\n\nb\n\nc"), (2, "solo"), (3, "")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in dedup_lines_within(df).collect()}
        # repeats of a and b dropped; BOTH blanks kept (formatting exempt)
        assert out[1]["cleaned"] == "a\nb\n\n\nc" and out[1]["n_removed"] == 2
        assert out[2]["cleaned"] == "solo" and out[2]["n_removed"] == 0
        assert out[3]["cleaned"] == "" and out[3]["n_removed"] == 0

    def test_partition_independent(self, spark):
        from bigdata_etl_customer360_spark.operators.curation import (
            dedup_lines_within,
        )

        rows = [(i, f"x{i}\ncommon\nx{i}\ncommon") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, dedup_lines_within(df).collect()))
        b = sorted(map(tuple, dedup_lines_within(df.repartition(7)).collect()))
        assert a == b and all(t[-1] == 2 for t in a)


class TestDedupSpans:
    SPAN = "the quick brown fox jumps over the lazy dog today"  # 10 tokens

    def _base(self, spark):
        from bigdata_etl_customer360_spark.operators.curation import dedup_spans

        df = _docs(
            spark,
            [
                (1, "alpha beta " + self.SPAN + " gamma delta"),
                (2, "one two three " + self.SPAN + " four"),
                (3, self.SPAN),
                (4, "totally unique words only here nothing repeated at all ok"),
                (5, "short doc"),
            ],
        )
        return {
            r["doc_id"]: r
            for r in dedup_spans(df, span_tokens=8, min_count=2).collect()
        }

    def test_keep_first_and_overlap_merge(self, spark):
        got = self._base(spark)
        # globally-first occurrence (doc 1, the min (doc_id, start)) intact
        assert got[1]["n_removed"] == 0 and self.SPAN in got[1]["cleaned"]
        # later occurrences: the full 10-token run stripped (overlapping
        # 8-token windows merge), surrounding tokens kept in order
        assert got[2]["n_removed"] == 10
        assert got[2]["cleaned"] == "one two three four"
        assert got[3]["n_removed"] == 10 and got[3]["cleaned"] == ""

    def test_unique_and_short_docs_untouched(self, spark):
        got = self._base(spark)
        assert got[4]["n_removed"] == 0
        assert got[5]["n_removed"] == 0 and got[5]["cleaned"] == "short doc"

    def test_conservation_and_partition_independence(self, spark):
        from bigdata_etl_customer360_spark.operators.curation import dedup_spans

        rows = [
            (i, f"u{i} v{i} " + self.SPAN + f" w{i} x{i} y{i}") for i in range(12)
        ]
        df = _docs(spark, rows)
        out = dedup_spans(df, span_tokens=8, min_count=2)
        got = out.collect()
        # kept + removed == original token count, per doc
        for r in got:
            n_orig = 2 + 10 + 3
            n_kept = len(r["cleaned"].split()) if r["cleaned"] else 0
            assert n_kept + r["n_removed"] == n_orig, r
        # exactly one occurrence (the first) survives
        assert sum(1 for r in got if r["n_removed"] == 0) == 1
        assert {r["n_removed"] for r in got} == {0, 10}
        a = sorted((r["doc_id"], r["cleaned"], r["n_removed"]) for r in got)
        b = sorted(
            (r["doc_id"], r["cleaned"], r["n_removed"])
            for r in dedup_spans(
                df.repartition(7), span_tokens=8, min_count=2
            ).collect()
        )
        assert a == b

    def test_within_doc_repeat_stripped(self, spark):
        from bigdata_etl_customer360_spark.operators.curation import dedup_spans

        # the same 8-token run twice in ONE doc: second occurrence stripped
        run = "a1 a2 a3 a4 a5 a6 a7 a8"
        df = _docs(spark, [(1, run + " mid " + run)])
        (r,) = dedup_spans(df, span_tokens=8, min_count=2).collect()
        assert r["n_removed"] == 8
        assert r["cleaned"] == run + " mid"

    def test_validations(self, spark):
        import pytest

        from bigdata_etl_customer360_spark.operators.curation import dedup_spans

        df = _docs(spark, [(1, "x")])
        with pytest.raises(ValueError, match="span_tokens"):
            dedup_spans(df, span_tokens=1)
        with pytest.raises(ValueError, match="min_count"):
            dedup_spans(df, min_count=1)


class TestChunkNearDup:
    def test_shared_paragraph_found_whole_doc_missed(self, spark):
        """The motivating case: two docs share ONE 32-token paragraph
        inside otherwise-disjoint text — chunk-level LSH pairs them,
        whole-doc minhash at the same threshold cannot."""
        from bigdata_etl_customer360_spark.operators.dedup import (
            chunk_near_dup_pairs,
            minhash_lsh_pairs,
        )

        P = " ".join(f"p{i}" for i in range(32))
        fa = " ".join(f"fa{i}" for i in range(32))
        fb = " ".join(f"fb{i}" for i in range(32))
        fc = " ".join(f"fc{i}" for i in range(32))
        fd = " ".join(f"fd{i}" for i in range(32))
        df = _docs(
            spark,
            [
                (1, P + " " + fa),          # P at chunk 0
                (2, fb + " " + P),          # P at chunk 1 (different offset)
                (3, fc + " " + fd),         # no overlap with anyone
            ],
        )
        got = {
            (r["id_a"], r["id_b"]): r
            for r in chunk_near_dup_pairs(
                df, chunk_tokens=32, threshold=0.6
            ).collect()
        }
        assert set(got) == {(1, 2)}
        assert got[(1, 2)]["n_chunk_pairs"] == 1
        assert got[(1, 2)]["max_jaccard"] == 1.0
        assert minhash_lsh_pairs(df, threshold=0.6).collect() == []

    def test_same_doc_repeats_excluded_and_verify_false(self, spark):
        from bigdata_etl_customer360_spark.operators.dedup import (
            chunk_near_dup_pairs,
        )

        P = " ".join(f"p{i}" for i in range(32))
        fa = " ".join(f"fa{i}" for i in range(32))
        df = _docs(spark, [(1, P + " " + P), (2, fa)])
        out = chunk_near_dup_pairs(df, chunk_tokens=32, threshold=0.6)
        assert out.collect() == []  # within-doc repeat is not a pair
        cols = chunk_near_dup_pairs(
            df, chunk_tokens=32, threshold=0.6, verify=False
        ).columns
        assert cols == ["id_a", "id_b", "n_chunk_pairs"]


class TestDedupSpansChar:
    def test_char_grain_keep_first_whitespace_exact(self, spark):
        from bigdata_etl_customer360_spark.operators.curation import dedup_spans

        SPAN = "the exact same twenty-char run!"  # 31 chars
        df = _docs(
            spark,
            [
                (1, "aaa " + SPAN + " bbb"),
                (2, "cc " + SPAN + " dd\nkeeps  whitespace"),
                (3, "totally different content here"),
            ],
        )
        got = {
            r["doc_id"]: r
            for r in dedup_spans(
                df, span_tokens=20, min_count=2, unit="char"
            ).collect()
        }
        # first occurrence intact, char-exact
        assert got[1]["n_removed"] == 0 and SPAN in got[1]["cleaned"]
        # second occurrence stripped (plus the shared flanking spaces the
        # overlapping windows cover); untouched text keeps its whitespace
        assert SPAN not in got[2]["cleaned"]
        assert "\nkeeps  whitespace" in got[2]["cleaned"]
        assert got[3]["n_removed"] == 0
        import pytest as _pt

        with _pt.raises(ValueError, match="unit"):
            dedup_spans(df, unit="byte")

    def test_token_mode_unchanged_by_unit_param(self, spark):
        from bigdata_etl_customer360_spark.operators.curation import dedup_spans

        SPAN = " ".join(f"p{i}" for i in range(10))
        df = _docs(spark, [(1, SPAN + " x"), (2, "y " + SPAN)])
        a = sorted(map(tuple, dedup_spans(df, span_tokens=8, min_count=2).collect()))
        b = sorted(map(tuple, dedup_spans(
            df, span_tokens=8, min_count=2, unit="token").collect()))
        assert a == b


def test_dsir_weights_matches_pure_python(spark):
    """dsir_weights == an independent pure-Python DSIR (same md5 bucket
    coin, Laplace smoothing, bucket-order fold): target-like docs score
    higher than off-target docs, and a <2-token doc gets (0, 0.0)."""
    import hashlib
    import math

    from bigdata_etl_customer360_spark.operators.curation import dsir_weights

    rows = [
        (1, "the quick brown fox jumps", "en"),
        (2, "the quick brown dog runs", "en"),
        (3, "uno dos tres cuatro cinco", "es"),
        (4, "seis siete ocho nueve diez", "es"),
        (5, "the quick brown fox again", "es"),  # en-like text, es label
        (6, "solo", "es"),  # < 2 tokens -> no bigram
        (7, None, "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = df.filter("lang = 'en'")
    NB = 1024

    def bucket(g):
        return int(hashlib.md5(("c360dsir" + g).encode()).hexdigest()[:8], 16) % NB

    def bigrams(t):
        w = [x for x in (t or "").lower().split() if x]
        return [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]

    src_counts, tgt_counts = {}, {}
    for i, t, lang in rows:
        for g in bigrams(t):
            b = bucket(g)
            src_counts[b] = src_counts.get(b, 0) + 1
            if lang == "en":
                tgt_counts[b] = tgt_counts.get(b, 0) + 1
    S, T = sum(src_counts.values()), sum(tgt_counts.values())

    def ref(t):
        cnt = {}
        for g in bigrams(t):
            b = bucket(g)
            cnt[b] = cnt.get(b, 0) + 1
        out = 0.0
        for b in sorted(cnt):
            lr = math.log((tgt_counts.get(b, 0) + 1.0) / (T + float(NB))) - math.log(
                (src_counts.get(b, 0) + 1.0) / (S + float(NB))
            )
            out += cnt[b] * lr
        return sum(cnt.values()), round(out, 8)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_logweight"])
        for r in dsir_weights(df, target, num_buckets=NB).collect()
    }
    assert got == {i: ref(t) for i, t, _ in rows}
    assert got[6] == (0, 0.0) and got[7] == (0, 0.0)
    # target-like text scores above off-target text regardless of label
    assert got[1][1] > got[3][1] and got[5][1] > got[3][1]

    # target_ids fast path (subset case) must equal the target-frame form
    got_fast = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_logweight"])
        for r in dsir_weights(
            df, target_ids=df.filter("lang = 'en'").select("doc_id"),
            num_buckets=NB,
        ).collect()
    }
    assert got_fast == got

    import pytest as _pt
    with _pt.raises(ValueError, match="num_buckets"):
        dsir_weights(df, target, num_buckets=0)
    with _pt.raises(ValueError, match="exactly one"):
        dsir_weights(df)
    with _pt.raises(ValueError, match="exactly one"):
        dsir_weights(df, target, target_ids=df.select("doc_id"))


def test_extract_entities_types_occurrences_and_nulls(spark):
    """One row per match per rule with a 1-based occurrence index;
    NULL/zero-hit texts emit nothing; all four default rules fire."""
    from bigdata_etl_customer360_spark.operators.curation import extract_entities

    rows = [
        (1, "mail a@b.co and c@d.org see https://x.io/p from 10.0.0.7"),
        (2, "call 555-123-4567 twice 555-123-4567"),
        (3, None),
        (4, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = [
        tuple(r)
        for r in extract_entities(df)
        .orderBy("doc_id", "entity_type", "occurrence")
        .collect()
    ]
    assert got == [
        (1, "email", 1, "a@b.co"),
        (1, "email", 2, "c@d.org"),
        (1, "ipv4", 1, "10.0.0.7"),
        (1, "url", 1, "https://x.io/p"),
        (2, "phone", 1, "555-123-4567"),
        (2, "phone", 2, "555-123-4567"),
    ]


def test_normalize_text_nfc_controls_whitespace_null(spark):
    """NFC composes combining sequences; C0 controls strip; whitespace
    runs collapse; trim; NULL passes through; n_changed flags only real
    changes."""
    from bigdata_etl_customer360_spark.operators.curation import normalize_text

    rows = [
        (1, "café time"),          # decomposed -> composed
        (2, "ab\x01c\td  e "),            # control + tab + runs + trail
        (3, None),
        (4, "already clean"),
        (5, "café"),                  # composed stays, no change
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: (r["normalized"], r["n_changed"])
           for r in normalize_text(df).collect()}
    assert got[1] == ("café time", 1)
    assert got[2] == ("abc d e", 1)
    assert got[3] == (None, 0)
    assert got[4] == ("already clean", 0)
    assert got[5] == ("café", 0)


def test_gopher_rules_flags_and_edges(spark):
    """Each rule trips on its planted violation; NULL text -> passes=0
    with NULL metrics; a clean long doc passes."""
    from bigdata_etl_customer360_spark.operators.curation import gopher_rules

    clean = ("the quick brown fox jumps over and that have with be to of "
             * 10).strip()
    rows = [
        (1, clean),                                   # passes
        (2, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),  # bullets
        (3, "word ..." + ("\nmore text here ..." * 9)),           # ellipsis
        (4, "### " * 30 + clean),                     # symbols
        (5, "12 34 56 " * 20),                        # no alpha words
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert got[1]["passes"] == 1
    assert got[1]["frac_alpha"] == 1.0 and got[1]["stop_hits"] >= 2
    assert got[2]["frac_bullet_lines"] == 1.0 and got[2]["passes"] == 0
    assert got[3]["frac_ellipsis_lines"] == 1.0 and got[3]["passes"] == 0
    assert got[4]["symbol_ratio"] > 0.1 and got[4]["passes"] == 0
    assert got[5]["frac_alpha"] == 0.0 and got[5]["passes"] == 0
    assert got[6]["passes"] == 0 and got[6]["n_words"] is None
