"""Scale stress for dedup_incremental: three 500k-doc ingest batches with
planted cross-batch duplication — per-batch cost must track |batch| +
|seen| (never raw history), and the fold must equal one-pass dedup_exact
over the concatenated 1.5M-doc history.

Batch construction (deterministic, md5-free — ids drive everything):
  batch 0: 500k docs, ids 0..499,999, text unique per id
  batch 1: 250k exact re-crawls of batch-0 ids (same text) + 250k new
  batch 2: 250k re-crawls of batch-1-new + 250k new
Expected survivors: 500k + 250k + 250k = 1,000,000 (every re-crawl dropped
by the accumulated fingerprint set).

Run: PYTHONPATH=/root/repo python scripts/stress_incremental.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_etl_customer360_spark.operators.dedup import (  # noqa: E402
    dedup_incremental,
    doc_fingerprints,
)
from bigdata_etl_customer360_spark.session import get_session  # noqa: E402

N = 500_000


def text_of(id_col):
    return F.concat_ws(
        " ", F.lit("doc body token stream number"), id_col.cast("string"),
        F.lit("with a few shared filler words"),
    )


def main():
    spark = get_session(app_name="stress-incremental", master="local[32]")

    def mk(lo, n, id_base):
        """Docs whose TEXT is a pure function of the content-id range
        lo..lo+n (so re-using a range with a new id_base is an exact
        re-crawl of that content) under fresh doc ids."""
        return spark.range(lo, lo + n).select(
            (F.col("id") - lo + id_base).alias("doc_id"),
            text_of(F.col("id")).alias("text"),
        )

    batches = [
        mk(0, N, 0).repartition(32),
        # re-crawl of batch-0 content 0..N/2 + N/2 fresh
        mk(0, N // 2, 1_000_000)
        .unionByName(mk(N, N // 2, 1_000_000 + N // 2))
        .repartition(32),
        # re-crawl of batch-1-fresh content + N/2 fresh
        mk(N, N // 2, 2_000_000)
        .unionByName(mk(N + N // 2, N // 2, 2_000_000 + N // 2))
        .repartition(32),
    ]

    seen = None
    report = []
    total_survivors = 0
    for i, b in enumerate(batches):
        b = b.localCheckpoint(eager=True)  # pin the batch out of the timing
        t0 = time.time()
        survivors = dedup_incremental(b, seen).localCheckpoint(eager=True)
        n_s = survivors.count()
        fps = doc_fingerprints(survivors)
        seen = (
            fps if seen is None else seen.unionByName(fps).distinct()
        ).localCheckpoint(eager=True)
        n_seen = seen.count()
        dt = round(time.time() - t0, 1)
        report.append({"batch": i, "survivors": n_s, "seen_after": n_seen,
                       "sec": dt})
        total_survivors += n_s

    assert [r["survivors"] for r in report] == [N, N // 2, N // 2], report
    assert report[-1]["seen_after"] == 1_000_000, report
    assert total_survivors == 1_000_000
    print(json.dumps({"batches": report, "total_survivors": total_survivors}))
    spark.stop()


if __name__ == "__main__":
    main()
