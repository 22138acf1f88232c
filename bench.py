"""Benchmark harness — runs the engine's declared queries at a scale
factor and prints ONE JSON line with per-query wall-clock seconds.

Usage:  python bench.py
Env:    SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
        SPARK_GRAFT_CPUS    (default 32 -> master local[N])
        BENCH_QUERIES       (optional comma-list to restrict)

Each query is materialized with a noop-datasource write: unlike
``df.count()`` (which lets Catalyst prune every unreferenced projection,
timing map-only queries as an empty scan), writing to the ``noop``
format evaluates EVERY output column on every row while still skipping
driver-side transfer — the measured time is plan + full execution.

Each query runs in TWO full passes and reports the per-query BEST time
(hyperfine/JMH-style min-of-N): single-shot wall clocks on a shared host
fold in CPU-steal noise an order of magnitude larger than the engine
differences being measured (observed: the same map-only query at 1.4s
and 21.9s across runs with zero code change). The min is the
least-noise estimator of the plan's actual cost; both raw passes go to
stderr for inspection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from bigdata_etl_customer360_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session(
        app_name="c360-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    only = os.environ.get("BENCH_QUERIES")
    if only:
        keep = {k.strip() for k in only.split(",")}
        qs = {k: v for k, v in qs.items() if k in keep}

    # untimed warmup: JIT/codegen/shuffle machinery, so the first measured
    # query reflects the engine, not JVM startup
    spark.range(0, 1_000_000).groupBy((F.col("id") % 32).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    ).count()

    timings: dict[str, float] = {}
    failed: set[str] = set()
    for pass_no in (1, 2):
        for name, fn in qs.items():
            if name in failed:
                continue
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
            except Exception as exc:  # record failures, keep benching
                dt = time.perf_counter() - t0
                print(f"# {name} FAILED after {dt:.2f}s: {exc}", file=sys.stderr)
                timings[name] = -1.0
                failed.add(name)
                continue
            best = min(timings.get(name, dt), dt)
            timings[name] = round(best, 3)
            print(f"# pass{pass_no} {name}: {dt:.2f}s (best {best:.2f}s)",
                  file=sys.stderr)
            # dedup/similarity operators cache twice-consumed intermediates;
            # release them so the query loop doesn't accumulate storage blocks
            spark.catalog.clearCache()
    total = sum(t for t in timings.values() if t > 0)

    result = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Full per-query detail always lands on disk for BASELINE.md / auditing.
    # A BENCH_QUERIES-restricted run must never clobber the full recording
    # (the r8 lesson, now mechanical): it writes BENCH_RESTRICTED.json.
    detail_name = "BENCH_RESTRICTED.json" if only else "BENCH_FULL.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           detail_name), "w") as fh:
        json.dump(result, fh, indent=1)

    # The driver captures only the LAST ~2000 chars of stdout and parses the
    # final JSON line from that window; with 89+ queries the full dict
    # overflows it and the round's bench records as unparsed (BENCH_r03).
    # Emit a line guaranteed to fit: keep the slowest queries inline, drop
    # the fastest until under budget, and say how many were elided.
    line_budget = 1800
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    keep = dict(ranked)
    # fallback covers both the timings-empty case and a single oversized
    # entry draining `keep` without ever fitting the budget
    line = json.dumps(
        {**result, "queries": {}, "queries_elided": len(timings),
         "full": detail_name},
        separators=(",", ":"),
    )
    while keep:
        out = dict(result)
        out["queries"] = {k: timings[k] for k in timings if k in keep}
        if len(keep) < len(timings):
            out["queries_elided"] = len(timings) - len(keep)
            out["full"] = detail_name
        candidate = json.dumps(out, separators=(",", ":"))
        if len(candidate) <= line_budget:
            line = candidate
            break
        keep.pop(ranked[len(keep) - 1][0])
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
