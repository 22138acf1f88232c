"""Per-query profiler for the r16 optimization round (guide §1).

For each named query: noop-sink timed run (best-of-N wall), then per-job
and per-stage wall/task/shuffle metrics from the UI REST API, so the
"which stage is slow" question is answered with measurements instead of
plan guesses. Optionally dumps .explain("formatted") to plans/r16/.

Usage: python scripts/profile_query.py [--plans SUFFIX] [--passes N] query [query ...]
       (--plans before  -> writes plans/r16/<query>_before.txt)
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdata_etl_customer360_spark.session import get_session  # noqa: E402


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    args = sys.argv[1:]
    plans_suffix = None
    passes = 2
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_suffix = args[1]
            args = args[2:]
        elif args[0] == "--passes":
            passes = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_session(
        app_name="profile-query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warmup: JIT/codegen/shuffle machinery
    spark.range(0, 1_000_000).groupBy((F.col("id") % 32).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    ).count()

    for name in names:
        if name not in qs:
            print(f"## {name}: NOT IN REGISTRY", flush=True)
            continue
        fn = qs[name]
        best = None
        for p in range(passes):
            jobs_before = {j["jobId"] for j in _rest(spark, "/jobs")}
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            if best is None or dt < best[0]:
                best = (dt, t_build, jobs_before)
            print(f"## {name} pass{p}: {dt:.2f}s (build {t_build:.2f}s)",
                  flush=True)
            spark.catalog.clearCache()
        dt, t_build, jobs_before = best
        jobs = [j for j in _rest(spark, "/jobs") if j["jobId"] not in jobs_before]
        # stages of the best pass's jobs only if identifiable; simpler: all
        # stages from the LAST pass (jobs_before of last pass)
        print(f"== {name}: best {dt:.2f}s, build {t_build:.2f}s, "
              f"{len(jobs)} jobs since first profiled pass")
        stages = {s["stageId"]: s for s in _rest(spark, "/stages")}
        rows = []
        for j in sorted(jobs, key=lambda x: x["jobId"]):
            for sid in j.get("stageIds", []):
                s = stages.get(sid)
                if not s or s.get("status") == "SKIPPED":
                    continue
                t_sub = s.get("submissionTime")
                t_done = s.get("completionTime")
                rows.append((j["jobId"], sid, s.get("status"),
                             s.get("numCompleteTasks", 0),
                             s.get("executorRunTime", 0) / 1000.0,
                             s.get("shuffleWriteBytes", 0),
                             s.get("shuffleReadBytes", 0),
                             (s.get("name") or "")[:60],
                             t_sub, t_done))
        for r in rows:
            print(f"  job{r[0]:>4} stage{r[1]:>4} {r[2]:<9} tasks={r[3]:<4} "
                  f"execRun={r[4]:7.2f}s shufW={r[5]:>10} shufR={r[6]:>10} {r[7]}")
        if plans_suffix:
            os.makedirs(os.path.join(REPO, "plans", "r16"), exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(
                    REPO, "plans", "r16", f"{name}_{plans_suffix}.txt"),
                    "w") as f:
                f.write(txt)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
