"""Corpus-curation operators a pretraining pipeline runs besides dedup:
PII redaction, benchmark decontamination, and sequence packing.

All three stay JVM-side (Catalyst regex / array expressions / window
cumsums) — no Python in the per-row path — and every output is an exact
integer or string, so each hash-matches a SQL oracle bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_etl_customer360_spark.operators.dedup import with_shingles
from bigdata_etl_customer360_spark.operators.util import fan_out, scoped_cache

# Ordered (name, pattern, replacement) rules. Patterns are restricted to
# the RE2 ∩ java.util.regex common subset (no backreferences, no
# lookaround) so the exact same pattern string runs in Spark and in a
# RE2-based oracle engine. Order matters: the email rule must fire before
# the digit-run rules can eat its local part.
DEFAULT_PII_RULES: Sequence[tuple[str, str, str]] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("card", r"\b[0-9]{13,19}\b", "<CARD>"),
)


def redact_pii(
    df: DataFrame,
    col: str = "text",
    out_col: str = "redacted",
    count_col: str = "n_redactions",
    rules: Sequence[tuple[str, str, str]] = DEFAULT_PII_RULES,
) -> DataFrame:
    """Scrub PII-shaped spans with typed placeholders and count the hits.

    A chain of ``regexp_replace`` projections — pure whole-stage codegen,
    so at 100 TB this is a map-only pass over the scan with zero shuffle.
    ``n_redactions`` sums per-rule match counts BEFORE replacement (a
    later rule can therefore not double-count text an earlier rule already
    replaced, because counting and replacing advance together rule by
    rule)."""
    out = df.withColumn(out_col, F.col(col)).withColumn(
        count_col, F.lit(0).cast("long")
    )
    for _name, pattern, replacement in rules:
        out = out.withColumn(
            count_col,
            F.col(count_col) + F.regexp_count(F.col(out_col), F.lit(pattern)),
        ).withColumn(
            out_col, F.regexp_replace(F.col(out_col), pattern, replacement)
        )
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 5,
) -> DataFrame:
    """Drop training docs that overlap an evaluation benchmark: any doc
    sharing at least ``min_overlap`` distinct word ``n``-grams with ANY
    benchmark text is removed (the standard test-set-contamination guard a
    pretraining pipeline runs before training).

    Plan: both sides shingle with the dedup ladder's exact formulation
    (``with_shingles`` — let-bound split, distinct n-grams, 64-bit
    hashes); the benchmark's shingle UNION is deduplicated and broadcast
    (eval sets are ~10⁴-10⁶ shingles — driver-side tiny against a 100 TB
    corpus); the corpus posting explode then semi-matches against it and
    per-doc hit counts decide contamination. Shuffle cost: ONE hash
    aggregate over the matched postings (not the full posting list — the
    broadcast join filters first), plus the final broadcast anti-join of
    the (small) contaminated-id set back onto the corpus. No part of the
    corpus is ever collected or broadcast."""
    bench_sh = (
        with_shingles(benchmark, text_col, n)
        .select(F.explode("shingles").alias("_s"))
        .select(F.xxhash64("_s").alias("_sh"))
        .distinct()
    )
    posts = (
        with_shingles(fan_out(docs), text_col, n)
        .select(F.col(id_col).alias("_id"), F.explode("shingles").alias("_s"))
        .select("_id", F.xxhash64("_s").alias("_sh"))
    )
    contaminated = (
        posts.join(F.broadcast(bench_sh), on="_sh")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") >= min_overlap)
        .select("_id")
    )
    return docs.join(
        F.broadcast(contaminated),
        docs[id_col] == contaminated["_id"],
        "left_anti",
    )


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_cols: Sequence[str] = ("lang",),
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    deterministic ``id_col`` order within each shard and the stream is cut
    into fixed-``capacity`` token windows — the standard packing step that
    turns a filtered corpus into dense training sequences (a document may
    straddle two windows; the output says exactly where each doc lands).

    Adds ``tok_offset`` (position of the doc's first token in its shard's
    stream), ``first_seq``/``last_seq`` (window indices the doc touches).
    All integer arithmetic (cumsum + floor division) — hash-exact.

    Scale: ONE shuffle to ``shard_cols`` partitions, then a sort-based
    running sum per shard. Packing is embarrassingly parallel across
    shards and a global order would serialize the cumsum, so shard first —
    on a real cluster add a hash-bucket column (``pmod(hash(id), k)``) to
    ``shard_cols`` sized so each shard's token stream fits one task; the
    per-shard window indices stay deterministic either way."""
    w = (
        Window.partitionBy(*[F.col(c) for c in shard_cols])
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return (
        df.withColumn("_cum", cum)
        .withColumn("tok_offset", (F.col("_cum") - F.col(tokens_col)).cast("long"))
        .withColumn("first_seq", F.expr(f"tok_offset div {int(capacity)}"))
        .withColumn("last_seq", F.expr(f"(_cum - 1) div {int(capacity)}"))
        .drop("_cum")
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
    out_col: str = "cleaned",
    removed_col: str = "n_removed",
) -> DataFrame:
    """Remove corpus-wide boilerplate LINES from every document — the
    RefinedWeb/Gopher-style rule that strips navigation footers, cookie
    banners and license headers repeated across a crawl: any non-empty
    line occurring in at least ``min_docs`` DISTINCT documents is dropped
    from all of them; empty lines and everything else keep their original
    order.

    Output: input columns + ``out_col`` (lines re-joined with \\n) +
    ``removed_col`` (lines dropped from this doc).

    Scale shape (all Catalyst built-ins, no UDFs):
      posexplode lines            [map-only; pos pins re-assembly order]
      distinct (doc,line-hash)    [dedup BEFORE df-count so one doc
                                   repeating its own footer counts once]
      line-hash -> doc-frequency  [shuffle 1 — map-side partials over the
                                   collapsed distinct pairs]
      lines LEFT JOIN heavy set   [shuffle 2, keyed on 64-bit line hash —
                                   the heavy set is NOT broadcast: at
                                   crawl scale "lines seen in >=N docs"
                                   can be millions of rows]
      re-assemble per doc         [shuffle 3 — collect_list(struct(pos,
                                   line)) + array_sort, deterministic]
    The doc's own text never rides shuffles 1-2 — only (hash, pos, flag)
    triples do; the full line text re-joins from the posexploded frame.

    Determinism: array_sort on the unique ``pos`` key pins line order
    under any partitioning; counts are exact integers.

    Pinned trade-off: drop decisions match on the 64-bit xxhash64 of the
    line, not the line text — a hash collision between a rare line and a
    boilerplate line would strip the wrong line (and diverge from a
    string-equality oracle). P(any collision) ~ L²/2⁶⁵ for L distinct
    lines (~3e-7 at a billion lines); accepted deliberately so shuffles
    1-2 carry 8-byte keys instead of full line text.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_pos", "_line"),
    )
    lhash = lines.select(
        "_id", "_pos", "_line", F.xxhash64("_line").alias("_lh")
    )
    heavy = (
        lhash.filter(F.col("_line") != "")
        .select("_id", "_lh")
        .distinct()
        .groupBy("_lh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= F.lit(min_docs))
        .select("_lh")
        .withColumn("_heavy", F.lit(True))
    )
    kept = (
        lhash.join(heavy, on="_lh", how="left")
        .withColumn(
            "_drop", F.coalesce(F.col("_heavy"), F.lit(False)) & (F.col("_line") != "")
        )
    )
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"), F.struct("_pos", "_line")
                        )
                    )
                ),
                lambda s: s["_line"],
            ),
        ).alias(out_col),
        F.sum(F.col("_drop").cast("long")).alias(removed_col),
    )
    return df.join(rebuilt, df[id_col] == rebuilt["_id"]).drop("_id")


def repeated_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition diagnostics — the Gopher quality rule that
    flags degenerate generative/spam text ("buy now buy now buy now ...")
    by how much of the document its single most frequent word ``n``-gram
    covers.

    Output: ``(id_col, total_ngrams, top_ngram_count)`` — both exact
    integers (callers threshold with integer cross-multiplication, e.g.
    ``top*5 >= total`` for the 20% Gopher cutoff, so no float ever enters
    the frame and results hash bit-for-bit). Docs with fewer than ``n``
    words emit ``(0, 0)``.

    Scale shape: tokenize + sliding-window n-grams are map-only array
    expressions (split let-bound — evaluated once per row, not once per
    gram); the (doc, gram) count is ONE hash aggregate with map-side
    partials; the per-doc max/sum is a second aggregate over the already
    collapsed (doc, gram) frame — shuffle 2 carries |distinct grams per
    doc| rows, not token volume. No UDFs, nothing driver-side.
    """
    from bigdata_etl_customer360_spark.operators.util import let1

    def _grams(words: Column) -> Column:
        return F.when(
            F.size(words) >= F.lit(n),
            F.transform(
                F.sequence(F.lit(0), F.size(words) - F.lit(n)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, i + F.lit(j + 1)) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = let1(
        F.split(F.trim(F.lower(F.col(text_col))), r"[ \t\r\n\x0B\f]+"), _grams
    )
    per_gram = (
        df.select(F.col(id_col), F.explode_outer(grams).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.when(F.col("_g").isNotNull(), 1)).alias("_c"))
    )
    return per_gram.groupBy(id_col).agg(
        F.sum("_c").alias("total_ngrams"),
        F.max("_c").alias("top_ngram_count"),
    )


def dedup_lines_within(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "cleaned",
    removed_col: str = "n_removed",
) -> DataFrame:
    """Remove REPEATED lines within each document, keeping the first
    occurrence — the intra-document sibling of the corpus-wide
    ``strip_boilerplate_lines`` (RefinedWeb-style: scraped pages repeat
    their own nav blocks / headings; a doc quoting itself shouldn't train
    the model on the copy). Empty lines are exempt (they are formatting,
    not content, and keep-first would collapse paragraph breaks).

    Scale: a PURE per-row array expression — split, keep-first filter
    (``array_position(arr, x) == i+1`` is true exactly at a value's first
    index), re-join. Zero shuffle, zero state, rides the scan; the split
    is let-bound so the filter's self-references don't re-tokenize.
    Worst-case O(lines²) per row stays local to the row — acceptable for
    documents, not for megabyte single-row blobs (those want the
    corpus-wide operator's explode form instead).
    """
    from bigdata_etl_customer360_spark.operators.util import let1

    def _clean(arr: Column) -> Column:
        kept = F.filter(
            arr,
            lambda x, i: (x == F.lit("")) | (F.array_position(arr, x) == i + 1),
        )
        return F.struct(
            F.array_join(kept, "\n").alias("_cleaned"),
            (F.size(arr) - F.size(kept)).cast("long").alias("_removed"),
        )

    bound = let1(F.split(F.col(text_col), r"\n"), _clean)
    return (
        df.withColumn("_dl", bound)
        .withColumn(out_col, F.col("_dl._cleaned"))
        .withColumn(removed_col, F.col("_dl._removed"))
        .drop("_dl")
    )


# HTML-stripping chain: ORDER MATTERS (block elements before the generic
# tag sweep; entities after tags so '&lt;b&gt;' never becomes a live tag).
# Every pattern sits in the RE2 ∩ java.util.regex subset (no lookaround)
# so the identical chain runs in the SQL oracle.
_HTML_RULES: Sequence[tuple[str, str]] = (
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<[^>]+>", " "),
    # entities: &amp; decodes LAST, or double-escaped text ("&amp;lt;")
    # would double-decode into live-looking markup
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"[ \t\r\n\x0B\f]+", " "),
)


def strip_html(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text",
) -> DataFrame:
    """Web-corpus HTML→text: drop script/style/comment blocks wholesale,
    sweep remaining tags, decode the common entities, collapse
    whitespace — the first stage of every web-crawl curation pipeline
    (the heavier boilerplate problem is :func:`strip_boilerplate_lines`'s
    job; this one is purely syntactic).

    A fixed ordered ``regexp_replace`` chain (like :func:`redact_pii`):
    pure codegen, zero shuffle, pushes into the scan stage. Escaped
    markup stays text (entities decode AFTER the tag sweep, so
    ``&lt;b&gt;`` comes out as the literal ``<b>``, never as a tag).
    """
    expr: Column = F.col(text_col)
    for pat, repl in _HTML_RULES:
        expr = F.regexp_replace(expr, pat, repl)
    return df.withColumn(out_col, F.trim(expr))


_TRACKING_PARAM = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|ref_src)="


def canonicalize_urls(
    df: DataFrame,
    url_col: str,
    out_col: str = "url_canonical",
) -> DataFrame:
    """URL canonicalization for web-corpus dedup: the same page reached
    via tracking links, WWW/no-WWW, default ports, param order, trailing
    slashes or fragments must map to ONE key, or URL-level dedup
    undercounts by whole campaigns.

    Normalization (pinned, engine-portable): lowercase scheme and host;
    strip a leading ``www.``; strip the scheme's own default port
    (http:80 / https:443 — a cross-scheme port stays, it names a
    different resource); drop
    the fragment; drop tracking params (``utm_*``, ``gclid``, ``fbclid``,
    ``msclkid``, ``ref``, ``ref_src``); SORT surviving params (byte
    order); strip trailing slashes from the path. Path and param VALUES
    keep their case (paths are case-sensitive by spec). Rows that don't
    parse as ``scheme://authority...`` get NULL.

    Plan: regexp_extract the four URL parts + a split→filter→sort_array
    →array_join over the query — per-row codegen, zero shuffle.

    Known simplification: a userinfo component (``user@host``) is treated
    as part of the authority and lowercased with it — fine for web-corpus
    URLs (credentials in crawl URLs are junk anyway), documented so nobody
    mistakes this for RFC-3986-complete parsing.
    """
    u = F.col(url_col)
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    authority = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*)", 1)
    # strip only the SCHEME'S OWN default port: http://x:443 is a real
    # non-default-port resource and must not collide with the :80 page
    host0 = F.regexp_replace(F.lower(authority), r"^www\.", "")
    host = (
        F.when(F.lower(scheme) == "http", F.regexp_replace(host0, r":80$", ""))
        .when(F.lower(scheme) == "https", F.regexp_replace(host0, r":443$", ""))
        .otherwise(host0)
    )
    cpath = F.regexp_replace(path, r"/+$", "")
    params = F.array_join(
        F.sort_array(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_PARAM),
            )
        ),
        "&",
    )
    rebuilt = F.concat(
        F.lower(scheme),
        F.lit("://"),
        host,
        cpath,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )
    return df.withColumn(
        out_col, F.when(scheme != "", rebuilt)
    )


def dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    min_count: int = 2,
    out_col: str = "cleaned",
    removed_col: str = "n_removed",
    unit: str = "token",
) -> DataFrame:
    """Corpus-wide EXACT substring dedup — the "Deduplicating Training
    Data Makes Language Models Better" (Lee et al. 2022) ExactSubstr
    granularity, re-expressed as bucketed equi-joins instead of a suffix
    array: any ``span_tokens``-token window whose token sequence occurs
    at least ``min_count`` times across the whole corpus is a duplicated
    span; every occurrence EXCEPT the globally first (min ``(doc_id,
    start)``) has its covered tokens removed. Overlapping duplicated
    windows merge naturally (coverage is a set of token positions), so a
    repeated run of L >= span_tokens tokens is stripped whole — the
    granularity doc-level / line-level / URL-level dedup all miss.

    Output: input columns + ``out_col`` (kept tokens re-joined with
    single spaces — token-space contract, same whitespace normalization
    as :func:`~...textstats.chunk_documents`) + ``removed_col`` (tokens
    removed). Docs shorter than ``span_tokens`` tokens pass through.

    Scale shape (all Catalyst built-ins, no all-pairs, no suffix sort):
      tokenize -> starts          [map-only; shingle hashes built INSIDE the
                                   array world (transform over starts), so no
                                   O(n^2) array copies ride the explode]
      hash -> (count, first-occ)  [shuffle 1 — map-side-combined agg on the
                                   8-byte xxhash64 key; count + min(struct)]
      occurrences JOIN heavy      [shuffle 2, keyed on the 64-bit hash; the
                                   heavy set is NOT broadcast — at crawl
                                   scale repeated shingles are millions]
      covered positions, distinct [explode x span_tokens, shuffle 3 keyed
                                   (doc, pos) — overlap-merged exactly]
      re-assemble per doc         [shuffle 4 — collect_list(struct(pos,tok))
                                   + array_sort, deterministic]
    Token text never rides shuffles 1-3 — only (doc, start, hash) and
    (doc, pos) do; the text re-joins from the posexploded frame.

    Determinism: the canonical occurrence is the lexicographic min of
    (doc_id, start) — a total order, pinned under any partitioning.
    Pinned trade-off (same as :func:`strip_boilerplate_lines`): span
    identity is the 64-bit xxhash64 of the space-joined window, not the
    token sequence itself — a hash collision merges two distinct spans
    (P ~ S^2/2^65 for S distinct spans); accepted so shuffles 1-2 carry
    8-byte keys instead of w-token strings.

    ``unit="char"``: the Lee-et-al granularity proper — spans are
    ``span_tokens`` CHARACTERS, shingles come straight off the string
    (``substr``, no array slicing), coverage is char positions, and the
    rebuilt text is CHARACTER-exact (original whitespace preserved —
    unlike token mode's single-space normalization). Same plan shape;
    position volume is chars instead of tokens (~5x for prose — size
    ``span_tokens`` accordingly, e.g. 50 chars ~ the paper's setting).
    """
    if span_tokens < 2:
        raise ValueError("span_tokens must be >= 2")
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 would strip everything)")
    if unit not in ("token", "char"):
        raise ValueError("unit must be 'token' or 'char'")
    w = int(span_tokens)
    if unit == "char":
        # shingles straight off the STRING: posexplode the start positions
        # and compute substr+hash in the SAME whole-stage-codegen stage —
        # the Generate's output is consumed as local variables (the text is
        # referenced, not copied per position), and compiled evaluation
        # beats the interpreted per-element HOF ~7x at 1.3M positions
        # (measured 4.4s -> 0.6s at sf0.1)
        # fan_out BEFORE the explode: a single-row-group corpus plans as ONE
        # partition and the ~L positions/doc explode+hash (the dominant
        # stage) serializes on one core (r16 profile: 2x 2.2s single-task
        # stages at sf0.1); at real scale the scan is already parallel and
        # this no-ops (operators.util.fan_out contract)
        occ = (
            fan_out(
                df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
                .filter(F.length(F.col("_t")) >= F.lit(w))
            )
            .select(
                "_id",
                "_t",
                F.explode(
                    F.sequence(F.lit(0), F.length(F.col("_t")) - F.lit(w))
                ).alias("_start"),
            )
            .select(
                "_id",
                "_start",
                F.xxhash64(
                    F.col("_t").substr(F.col("_start") + F.lit(1), F.lit(w))
                ).alias("_h"),
            )
        )
    else:
        join_sep = " "
        toks = F.split(F.trim(F.col(text_col)), r"[ \t\r\n\x0B\f]+")
        # (doc, pos, tok) — the re-assembly side (token mode only; char
        # mode rebuilds by string splice and never explodes per unit)
        tokens = df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(toks).alias("_pos", "_tok"),
        )
        # one struct per shingle, built inside the array world so the
        # token array is never replicated per start
        sh = F.transform(
            F.sequence(F.lit(0), F.size(F.col("_tk")) - F.lit(w)),
            lambda i: F.struct(
                i.alias("s"),
                F.xxhash64(
                    F.concat_ws(" ", F.slice(F.col("_tk"), i + F.lit(1), F.lit(w)))
                ).alias("h"),
            ),
        )
        # same fan_out-before-explode rationale as char mode above
        occ = (
            fan_out(
                df.select(F.col(id_col).alias("_id"), toks.alias("_tk"))
                .filter(F.size(F.col("_tk")) >= F.lit(w))
            )
            .select("_id", F.explode(sh).alias("_sh"))
            .select(
                "_id", F.col("_sh.s").alias("_start"), F.col("_sh.h").alias("_h")
            )
        )
    # consumed by both the heavy-agg branch and the join-back: cache
    # against constraint-inference re-computation below the exchange
    # (see verify SKILL gotchas); scoped so a cache_scope caller releases it
    occ = scoped_cache(occ)
    heavy = (
        occ.groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col("_id"), F.col("_start"))).alias("_first"),
        )
        .filter(F.col("_c") >= F.lit(int(min_count)))
        .select("_h", "_first")
    )
    marked = occ.join(heavy, on="_h", how="inner").filter(
        ~(
            (F.col("_id") == F.col("_first._id"))
            & (F.col("_start") == F.col("_first._start"))
        )
    )
    if unit == "char":
        # Only TOUCHED docs (any covered position — typically a few percent
        # of a crawl) pay reconstruction; everyone else passes the ORIGINAL
        # string through, which char mode's whitespace-exact contract makes
        # identical to a rebuild (token mode must normalize every doc, so
        # it keeps the full re-assembly below). The splice is Arrow-batched
        # per-doc string work over the covered-position set — no
        # per-char structs or array_sorts riding the rebuild shuffle
        # (measured: full-row bench 6.8s -> ~1s at sf0.1).
        import pandas as pd

        # ship duplicated-span STARTS, not exploded covered positions: the
        # old shape multiplied every marked span into w position rows and
        # paid a corpus-wide distinct to overlap-merge them; the splice can
        # take the union of [start, start+w) intervals itself (a set union —
        # identical covered set, identical n_removed = |union|), so the
        # rebuild shuffle carries |marked| rows instead of w x |marked| and
        # the distinct Exchange disappears (r16, guide §2.3 "shuffle keys
        # and metadata instead of payloads")
        cov_arr = marked.select("_id", "_start").groupBy("_id").agg(
            F.collect_list("_start").alias("_ss")  # order-free: splice unions
        )

        def _splice(batches):
            for pdf in batches:
                outs = []
                removed = []
                for text, ss in zip(pdf["_text"], pdf["_ss"]):
                    drop = set()
                    for s in ss:
                        drop.update(range(int(s), int(s) + w))
                    outs.append(
                        "".join(ch for i, ch in enumerate(text) if i not in drop)
                    )
                    removed.append(len(drop))
                yield pd.DataFrame(
                    {
                        "_id": pdf["_id"],
                        out_col: outs,
                        removed_col: removed,
                    }
                )

        id_type = df.schema[id_col].dataType.simpleString()
        touched = (
            df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
            .join(cov_arr, on="_id")
            .mapInPandas(
                _splice,
                schema=f"_id {id_type}, {out_col} string, {removed_col} long",
            )
        )
        return (
            df.join(touched, df[id_col] == touched["_id"], how="left")
            .drop("_id")
            .withColumn(
                out_col,
                F.coalesce(F.col(out_col), F.col(text_col), F.lit("")),
            )
            .withColumn(
                removed_col,
                F.coalesce(F.col(removed_col), F.lit(0).cast("long")),
            )
        )
    # token mode rebuilds by joining per-position coverage onto the
    # posexploded token frame (char mode never materializes per-unit rows)
    covered = (
        marked.select(
            "_id",
            F.explode(
                F.sequence(F.col("_start"), F.col("_start") + F.lit(w - 1))
            ).alias("_pos"),
        )
        .distinct()
        .withColumn("_cov", F.lit(True))
    )
    kept = tokens.join(covered, on=["_id", "_pos"], how="left").withColumn(
        "_drop", F.coalesce(F.col("_cov"), F.lit(False))
    )
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("_drop"), F.struct("_pos", "_tok"))
                    )
                ),
                lambda s: s["_tok"],
            ),
        ).alias(out_col),
        F.sum(F.col("_drop").cast("long")).alias(removed_col),
    )
    # LEFT join + coalesce: a NULL-text doc posexplodes to zero token rows
    # and would otherwise vanish from the output entirely — it passes
    # through with cleaned='' / 0 removed (matching the SQL oracle's
    # LEFT JOIN shape)
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_id"], how="left")
        .drop("_id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
        .withColumn(removed_col, F.coalesce(F.col(removed_col), F.lit(0).cast("long")))
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame | None = None,
    num_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "c360dsir",
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169): score
    every doc in ``df`` (the raw SOURCE pool) by how target-like its
    hashed-bigram distribution is — the standard domain-selection signal
    a pretraining pipeline feeds into :func:`sampling.weighted_sample`
    (resample sources with probability ∝ exp(weight)).

    Features are word bigrams hashed into ``num_buckets`` buckets with
    the engine-portable md5 coin (the :func:`sampling.group_split`
    construction, so an oracle replays the hash exactly). Per-bucket
    unigram-of-bigram models with Laplace smoothing:
    ``p(b) = (count_b + 1) / (total + num_buckets)``, and a doc's log
    weight is ``Σ_b cnt_{d,b} · (ln p_target(b) − ln p_source(b))``,
    folded IN BUCKET ORDER (the in-order-float-fold contract) and
    rounded 1e-8. Docs with no bigram (< 2 tokens) get ``(0, 0.0)`` —
    importance 1 under exp().

    The target is given EITHER as ``target`` (an arbitrary corpus frame
    — gets its own bigram scan) OR as ``target_ids`` (ids of a SUBSET of
    ``df`` — the common "target slice of the source pool" case, e.g. a
    language or license slice): the target model then derives from the
    cached per-doc counts with a semi-join, saving two full corpus
    scans. Exactly one of the two must be provided; both forms produce
    identical models for a true subset.

    Scale shape: bigrams are let-bound sliding-window array expressions
    (map-only, the repeated_ngram_stats shape); each corpus collapses to
    (doc, bucket) exact counts [one map-side-combined shuffle], then to
    <= num_buckets model rows [tiny second shuffle]; the two models join
    as a BROADCAST (2·num_buckets rows) onto the per-doc counts; one
    more shuffle on the doc id folds the score. Nothing driver-side,
    no UDFs, cost linear in token volume.
    """
    from bigdata_etl_customer360_spark.operators.textstats import (
        word_bigrams_expr,
    )

    if (target is None) == (target_ids is None):
        raise ValueError("provide exactly one of target / target_ids")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    nb = int(num_buckets)

    def grams(frame: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if with_id else []
        g = frame.select(
            *cols, F.explode(word_bigrams_expr(text_col)).alias("_g")
        )
        bucket = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt), F.col("_g"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % F.lit(nb)
        ).alias("_b")
        return g.select(*cols, bucket)

    # per-doc bucket counts over the source pool (feeds the source model
    # AND the per-doc fold — cache per the multi-consumer rule).
    # fan_out: the bigram explode + per-gram md5 is the dominant map work
    # and a single-row-group corpus runs it on one core (r16)
    doc_counts = scoped_cache(
        grams(fan_out(df), with_id=True)
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    if target_ids is not None:
        # subset fast path: the target's bucket counts are already inside
        # the cached per-doc counts — no second corpus scan. BOTH models
        # come from ONE aggregation pass (r16): a left join marks target
        # docs and a conditional sum splits the counts — same exact
        # integers as the old src-agg + semi-join-agg pair, one shuffle
        # and one job instead of two branch aggregates.
        marked = doc_counts.join(
            F.broadcast(
                target_ids.select(F.col(id_col)).distinct()
                .withColumn("_is_t", F.lit(1))
            ),
            id_col,
            "left",
        )
        models = marked.groupBy("_b").agg(
            F.sum("_cnt").alias("_sc"),
            F.sum(F.when(F.col("_is_t") == 1, F.col("_cnt"))).alias("_tc"),
        )
    else:
        src_model = doc_counts.groupBy("_b").agg(F.sum("_cnt").alias("_sc"))
        tgt_model = grams(target, with_id=False).groupBy("_b").agg(
            F.count(F.lit(1)).alias("_tc")
        )
        models = src_model.join(tgt_model, "_b", "full")
    # dense bucket table 0..nb-1 (unseen buckets still carry smoothing
    # mass); corpus totals fold as unpartitioned window sums over the
    # <= nb model rows (exact longs, order-independent) instead of two
    # 1-row aggregate branches broadcast separately (r16: -2 jobs,
    # -2 broadcast exchanges; the window's single task sees nb rows)
    buckets = df.sparkSession.range(nb).select(F.col("id").alias("_b"))
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ratio = (
        buckets.join(F.broadcast(models), "_b", "left")
        .withColumn("_S", F.sum("_sc").over(w_all))
        .withColumn("_T", F.sum("_tc").over(w_all))
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce(F.col("_tc"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.coalesce(F.col("_T"), F.lit(0)).cast("double") + F.lit(float(nb)))
                )
                - F.log(
                    (F.coalesce(F.col("_sc"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.coalesce(F.col("_S"), F.lit(0)).cast("double") + F.lit(float(nb)))
                )
            ).alias("_lr"),
        )
    )
    scored = (
        doc_counts.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("n_bigrams"),
            F.sort_array(
                F.collect_list(F.struct(F.col("_b"), F.col("_cnt"), F.col("_lr")))
            ).alias("_fs"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.aggregate(
                    F.col("_fs"),
                    F.lit(0.0),
                    lambda acc, s: acc + s["_cnt"].cast("double") * s["_lr"],
                ),
                8,
            ).alias("dsir_logweight"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("dsir_logweight"), F.lit(0.0)).alias(
                "dsir_logweight"
            ),
        )
    )


DEFAULT_ENTITY_RULES: Sequence[tuple[str, str]] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[^ \t\r\n]+"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"),
)


def extract_entities(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rules: Sequence[tuple[str, str]] = DEFAULT_ENTITY_RULES,
) -> DataFrame:
    """Typed span extraction — :func:`redact_pii`'s read-side sibling:
    instead of scrubbing PII-shaped spans, SURFACE every match with its
    type and occurrence index (the audit/inventory step a curation
    pipeline runs before deciding to redact, and the generic
    entity-harvest for URL/contact mining from a crawl).

    One row per match occurrence:
    ``(id_col, entity_type, occurrence, entity)`` — ``occurrence`` is
    the 1-based index of the match among ITS rule's matches in the
    document, so repeated extraction is order-stable and the output is
    fully deterministic. Rows with no matches for a rule emit nothing
    for that rule; NULL text emits nothing.

    Patterns must stay in the RE2 ∩ java.util.regex subset (the repo
    regex contract — no backreferences/lookaround).

    Plan: map-only — ``regexp_extract_all`` per rule inside one
    projection, one explode over the per-rule struct array, one
    posexplode over the match list. No UDFs, no shuffle; at 100 TB this
    is a pure scan whose cost is the regex engine, exactly like
    redact_pii's replace chain.
    """
    matches = F.array(
        *[
            F.struct(
                F.lit(name).alias("_etype"),
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")), F.lit(pat), F.lit(0)
                ).alias("_ms"),
            )
            for name, pat in rules
        ]
    )
    per_rule = df.select(
        F.col(id_col), F.explode(matches).alias("_r")
    ).select(id_col, F.col("_r._etype").alias("entity_type"), F.col("_r._ms").alias("_ms"))
    return per_rule.select(
        id_col,
        "entity_type",
        F.posexplode("_ms").alias("_i", "entity"),
    ).select(
        id_col,
        "entity_type",
        (F.col("_i") + F.lit(1)).cast("long").alias("occurrence"),
        "entity",
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "normalized",
) -> DataFrame:
    """Unicode canonicalization — the cleanup pass that runs BEFORE any
    fingerprint/dedup/tokenize step so that byte-different, render-equal
    strings collapse ("café" composed vs decomposed, stray control
    bytes, ragged whitespace):

    1. NFC normalization (combining sequences -> precomposed forms) —
       Spark has no built-in, so this single step is an Arrow-batched
       pandas UDF over ``unicodedata.normalize``;
    2. control-character strip (C0 minus whitespace, plus DEL) and
    3. whitespace-run collapse to single spaces + trim — both plain
       ``regexp_replace`` (JVM-side, RE2-subset patterns).

    The order is pinned (NFC, strip, collapse, trim) and every step is
    mirrored exactly by the oracle (DuckDB ``nfc_normalize``). NULL
    passes through as NULL. Output keeps every input column and appends
    ``out_col`` plus ``n_changed`` (0/1 — did normalization alter the
    string), the cheap audit counter.

    Scale: map-only; the UDF is the only Python hop and transfers one
    string column through Arrow. At 100 TB this is scan-bound, like
    strip_html.
    """
    def _nfc_series(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    _nfc = F.pandas_udf(_nfc_series, "string")

    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                _nfc(F.col(text_col)),
                r"[\x00-\x08\x0e-\x1f\x7f]",
                "",
            ),
            r"[ \t\r\n\x0b\f]+",
            " ",
        )
    )
    return df.withColumn(out_col, cleaned).withColumn(
        "n_changed",
        F.when(F.col(text_col).isNull(), F.lit(0))
        .when(F.col(out_col) != F.col(text_col), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )


GOPHER_STOPWORDS: Sequence[str] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    stopwords: Sequence[str] = GOPHER_STOPWORDS,
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al., arXiv:2112.11446
    §A1.1) as ONE map-only pass: per document, the seven repetition-free
    heuristics that gate web text before anything expensive —

        word count in [min_words, max_words]
        mean word length in [min_mean_word_len, max_mean_word_len]
        (#'#' + #'...' + #'…') / words       <  max_symbol_ratio
        lines starting with a bullet, frac   <  max_bullet_frac
        lines ending in an ellipsis, frac    <  max_ellipsis_frac
        words containing >= 1 [a-zA-Z], frac >= min_alpha_frac
        occurrences of the 8 Gopher stopwords >= min_stop_hits

    — plus the combined ``passes`` verdict. The repetition rules
    (duplicate-line / repeated-ngram mass) live in
    :func:`repeated_ngram_stats` / :func:`dedup_lines_within`; compose
    for the full Gopher gate.

    Determinism: every metric is a ratio of exact integers (one double
    division, identical across engines); words are the repo-standard
    whitespace split, lines a '\\n' split, both evaluated ONCE via the
    ``inline1`` generator (projection collapse would re-split per
    metric). NULL text yields NULL metrics and ``passes = 0``.

    Output: ``(*, n_words, mean_word_len, frac_alpha, symbol_ratio,
    frac_bullet_lines, frac_ellipsis_lines, stop_hits, passes)``.
    """
    sw = F.array(*[F.lit(w) for w in stopwords])

    def word_feats(tk: Column) -> Column:
        n = F.size(tk)
        sum_len = F.aggregate(
            F.transform(tk, F.length),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        n_alpha = F.size(F.filter(tk, lambda t: t.rlike("[a-zA-Z]")))
        n_stop = F.size(F.filter(tk, lambda t: F.array_contains(sw, t)))
        return F.struct(
            n.cast("long").alias("n_words"),
            (sum_len.cast("double") / n.cast("double")).alias("mean_word_len"),
            (n_alpha.cast("double") / n.cast("double")).alias("frac_alpha"),
            n_stop.cast("long").alias("stop_hits"),
        )

    def line_feats(ln: Column) -> Column:
        n = F.size(ln)
        bullet = F.size(
            F.filter(
                ln,
                lambda s: F.ltrim(s).startswith("- ")
                | F.ltrim(s).startswith("* ")
                | F.ltrim(s).startswith("•"),
            )
        )
        ell = F.size(
            F.filter(
                ln,
                lambda s: F.rtrim(s).endswith("...")
                | F.rtrim(s).endswith("…"),
            )
        )
        return F.struct(
            (bullet.cast("double") / n.cast("double")).alias(
                "frac_bullet_lines"
            ),
            (ell.cast("double") / n.cast("double")).alias(
                "frac_ellipsis_lines"
            ),
        )

    from bigdata_etl_customer360_spark.operators.textstats import tokens_expr
    from bigdata_etl_customer360_spark.operators.util import inline1

    n_sym = (
        F.regexp_count(F.col(text_col), F.lit("#"))
        + F.regexp_count(F.col(text_col), F.lit(r"\.\.\."))
        + F.regexp_count(F.col(text_col), F.lit("…"))
    ).cast("long")

    # one generator per select: two inline() calls in a single
    # projection mangle the first generator's output field names
    staged = df.select(
        "*",
        inline1(tokens_expr(text_col), word_feats),
        n_sym.alias("_n_sym"),
    ).select("*", inline1(F.split(F.col(text_col), "\n"), line_feats))
    symbol_ratio = F.col("_n_sym").cast("double") / F.col("n_words").cast(
        "double"
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (symbol_ratio < max_symbol_ratio)
        & (F.col("frac_bullet_lines") < max_bullet_frac)
        & (F.col("frac_ellipsis_lines") < max_ellipsis_frac)
        & (F.col("frac_alpha") >= min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return staged.select(
        *df.columns,
        "n_words",
        "mean_word_len",
        "frac_alpha",
        symbol_ratio.alias("symbol_ratio"),
        "frac_bullet_lines",
        "frac_ellipsis_lines",
        "stop_hits",
        F.when(F.col(text_col).isNull(), F.lit(0))
        .when(passes, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("passes"),
    )
