"""Bench gate: recompute driver-bench vs committed-canonical per-query
ratios and FAIL on any query above the 2x gate (VERDICT r11 task 6a — the
check the judge runs by hand each round, now runnable locally).

Canonical side: the per-query table in ``git show HEAD:BASELINE.md`` (the
LAST ``| query | sec`` table — the committed canonical recording). NOT
BENCH_FULL.json: bench.py regenerates that file on every run and the
driver commits it at round end, so at HEAD it usually IS the candidate
run. Candidate side: the newest ``BENCH_r*.json`` driver artifact by
default (its elided stdout line is completed from the committed
BENCH_FULL.json of the SAME commit when needed), or any path given on the
command line — a raw bench.py JSON dict or a driver wrapper whose
``tail`` embeds the JSON line.

Host-noise discipline (BASELINE.md r8, hardened per ADVICE r13): absolute
seconds drift with the host, so a raw >2x ratio alone is not a verdict.
A crossing (ratio > ``--max-ratio``) is classified:

- ``noise?``   — absolute regression under ``--min-delta`` (default
  0.25s): a converged streaming re-read at 0.04s canonical trips 2x on
  any one-off scheduling hiccup (measured r12: agg_stream 0.15s inside a
  227-query session, 0.05-0.07s across three fresh-JVM re-runs).
- ``envelope`` — above the floor, but the MEDIAN-NORMALIZED ratio
  (raw / max(healthy-median, 1.0), healthy-median = median over the
  non-crossing queries so offenders can't drag their own yardstick) is
  under the gate: ordinary host-state drift after a canonical recorded
  at a faster host state (ADVICE r13 — the r13 artifact ran at median
  1.09 and four untouched queries crossed raw-2x).
- ``SUSPECT``  — above the floor AND standing out of the envelope, but
  first-time: the operating discipline (VERDICT r13) is a fresh-JVM
  re-measure, not an immediate FAIL — a single 229-query session can
  produce one-off 2.5x anomalies (ridge_price 2.47x in-artifact, 0.94x
  fresh). ``--strict`` restores immediate FAIL for local pre-commit use.
- ``FAIL``     — ANY crossing (noise/envelope/suspect) whose raw ratio
  ALSO crossed the gate in the previous driver artifact: persistent,
  not jitter — must be fixed, not re-adjudicated.

Persistence yardstick (ADVICE r14, made explicit): the PREVIOUS
artifact's ratio is recomputed against the CURRENT canonical table, not
the table committed beside it — "persistent" means the query reads slow
against what the repo NOW claims it costs, twice running. A canonical
re-recording between rounds can therefore flip a crossing persistent or
non-persistent by design: re-recording IS the adjudication act (it
asserts the new numbers are the healthy state), so a query still over
2x the fresh canonical in two consecutive artifacts is exactly the
signal we want, while parsing the historical BASELINE.md per artifact
would grandfather regressions the re-recording already absorbed.

Exit 1 on any FAIL or a >2x common total; 0 otherwise (suspects print
loudly but exit 0 unless ``--strict``). ``--strict`` escalates BOTH
SUSPECT and envelope-class crossings to FAIL (ADVICE r14: at a local
pre-commit there is no "prior artifact" to wait for, and a real
regression can ride the drift envelope for a full round — the sub-floor
``noise?`` class alone stays exit 0, its absolute delta being under the
significance floor).

Usage: python scripts/bench_gate.py [candidate.json]
           [--max-ratio 2.0] [--min-delta 0.25] [--strict]
"""
from __future__ import annotations

import glob
import json
import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_payload(raw: str) -> dict:
    """Raw bench.py output dict, from either a plain JSON file or a driver
    wrapper whose 'tail' embeds the one-line JSON."""
    doc = json.loads(raw)
    if "queries" in doc:
        return doc
    tail = doc.get("tail", "")
    lines = [l for l in tail.splitlines() if l.startswith('{"metric"')]
    if not lines:
        m = re.search(r'\{"metric".*\}', tail)
        if not m:
            raise SystemExit("no bench JSON line found in candidate file")
        lines = [m.group(0)]
    return json.loads(lines[-1])


def _git_show(spec: str) -> str:
    out = subprocess.run(
        ["git", "-C", REPO, "show", spec], capture_output=True, text=True
    )
    if out.returncode != 0:
        raise SystemExit(f"cannot read {spec}: " + out.stderr)
    return out.stdout


def _canonical() -> dict:
    """Per-query seconds from the LAST canonical table in committed
    BASELINE.md (rows ``| name | 1.234 |`` under a ``| query | sec`` header)."""
    text = _git_show("HEAD:BASELINE.md")
    tables: list[dict[str, float]] = []
    cur: dict[str, float] | None = None
    for line in text.splitlines():
        if re.match(r"\|\s*query\s*\|\s*sec", line):
            cur = {}
            tables.append(cur)
            continue
        if cur is not None:
            m = re.match(r"\|\s*([\w.-]+)\s*\|\s*([\d.]+)\s*\|", line)
            if m:
                cur[m.group(1)] = float(m.group(2))
            elif line.strip() and not line.startswith("|--") and not line.startswith("| ---") and not line.startswith("|---"):
                cur = None
    tables = [t for t in tables if t]
    if not tables:
        raise SystemExit("no canonical per-query table found in HEAD:BASELINE.md")
    return {"queries": tables[-1]}


def _complete_elided(cand: dict, cand_path: str) -> dict:
    """A driver artifact's stdout line elides most queries; the full map is
    the BENCH_FULL.json committed ALONGSIDE that artifact — or, in the
    post-driver working tree where the artifact is still UNtracked, the
    on-disk BENCH_FULL.json the same run just wrote (provably the same
    run iff the total seconds match exactly; bench.py writes both from
    one timings dict)."""
    if not cand.get("queries_elided"):
        return cand
    rev = subprocess.run(
        ["git", "-C", REPO, "log", "-1", "--format=%H", "--",
         os.path.basename(cand_path)],
        capture_output=True,
        text=True,
    ).stdout.strip()
    if not rev:
        disk = os.path.join(REPO, "BENCH_FULL.json")
        try:
            with open(disk) as f:
                full = json.load(f)
        except (OSError, ValueError):
            full = None
        # "same run" needs more than total equality (bench.py rounds the
        # total to 3 decimals — two different runs could collide, and
        # None == None is vacuously true): require the total present on
        # BOTH sides AND at least one inline (non-elided) candidate
        # timing, every one exactly equal to the disk recording's entry
        # (ADVICE r12; the non-empty requirement is ADVICE r13 — an
        # all-elided candidate would make the all() vacuously true and
        # decide same-run on the 3-decimal total alone).
        same_run = (
            full is not None
            and full.get("value") is not None
            and cand.get("value") is not None
            and full["value"] == cand["value"]
            and len(cand["queries"]) > 0
            and all(
                full.get("queries", {}).get(q) == v
                for q, v in cand["queries"].items()
            )
        )
        if same_run:
            merged = dict(full["queries"])
            merged.update(cand["queries"])
            print(f"note: {os.path.basename(cand_path)} not committed; "
                  f"completed from on-disk BENCH_FULL.json (same run: "
                  f"totals match at {cand.get('value')}s and all "
                  f"{len(cand['queries'])} inline timings match)")
            return {**cand, "queries": merged}
        print(f"warning: {cand_path} not committed and on-disk "
              f"BENCH_FULL.json is a different run; gating its "
              f"{len(cand['queries'])} reported queries only")
        return cand
    full = json.loads(_git_show(f"{rev}:BENCH_FULL.json"))
    merged = dict(full["queries"])
    merged.update(cand["queries"])
    return {**cand, "queries": merged}


def gate(
    bq: dict, cq: dict, max_ratio: float = 2.0, min_delta: float = 0.25
) -> dict:
    """Pure gate math over canonical/candidate per-query seconds maps.
    Crossings (ratio > max_ratio) are split into: noise (absolute delta
    under the significance floor), envelope (above the floor but within
    the median-normalized host-drift envelope — ADVICE r13), offenders
    (above the floor AND standing out of the envelope). The envelope
    divisor is max(healthy_median, 1.0) where healthy_median is the
    median ratio over NON-crossing queries — offenders must not drag
    their own yardstick, and a fast host (median < 1) never widens the
    gate. Also returns watch (above 1.5x the median but under the gate)
    and the common-total and median ratios."""
    common = sorted(set(bq) & set(cq))
    if not common:
        raise SystemExit("no common queries between candidate and canonical")
    ratios = {q: cq[q] / bq[q] for q in common if bq[q] > 0}
    zero_canonical = [q for q in common if bq[q] <= 0]
    if zero_canonical:
        # excluded from per-query ratio gating (no meaningful ratio) but
        # still in the common total; say so instead of silently dropping
        print(
            f"note: {len(zero_canonical)} common queries have a 0s "
            f"canonical time and are excluded from ratio gating: "
            + ", ".join(zero_canonical[:10])
        )
    if not ratios:
        raise SystemExit("every common query has a 0s canonical time")
    med = statistics.median(ratios.values())
    healthy = [r for r in ratios.values() if r <= max_ratio]
    env = max(statistics.median(healthy), 1.0) if healthy else 1.0
    canon_total = sum(bq[q] for q in common)
    if canon_total <= 0:
        raise SystemExit("canonical common total is 0s")
    total_ratio = sum(cq[q] for q in common) / canon_total
    offenders, noise, envelope = [], [], []
    for q, r in ratios.items():
        if r <= max_ratio:
            continue
        if cq[q] - bq[q] <= min_delta:
            noise.append((r, q))
        elif r / env <= max_ratio:
            envelope.append((r, q))
        else:
            offenders.append((r, q))
    watch = sorted(
        ((r, q) for q, r in ratios.items() if med * 1.5 < r <= max_ratio),
        reverse=True,
    )[:10]
    return {
        "common": common,
        "ratios": ratios,
        "median": med,
        "envelope_median": env,
        "total_ratio": total_ratio,
        "offenders": sorted(offenders, reverse=True),
        "noise": sorted(noise, reverse=True),
        "envelope": sorted(envelope, reverse=True),
        "watch": watch,
    }


def _driver_artifacts() -> list:
    """BENCH_r{N}.json driver artifacts sorted by round number; names
    whose suffix is not purely numeric (e.g. a stray BENCH_rerun.json)
    are skipped instead of crashing the sort key (ADVICE r13)."""
    found = []
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"r(\d+)\.json$", p)
        if m:
            found.append((int(m.group(1)), p))
    return [p for _, p in sorted(found)]


def failing_verdict(g: dict, persistent: list, max_ratio: float, strict: bool) -> bool:
    """Exit-1 decision: persistent crossings and a >gate common total
    always fail; ``--strict`` (local pre-commit) additionally fails
    SUSPECT and envelope-class crossings (ADVICE r14 — locally there is
    no next driver artifact to arm persistence against, and a real
    regression can ride the drift envelope for a full round); sub-floor
    ``noise?`` crossings never fail on their own."""
    return bool(persistent) or g["total_ratio"] > max_ratio or (
        strict and bool(g["offenders"] or g["envelope"])
    )


def main() -> None:
    argv, args, max_ratio, min_delta = sys.argv[1:], [], 2.0, 0.25
    strict = False
    i = 0
    while i < len(argv):
        if argv[i] == "--max-ratio":
            max_ratio = float(argv[i + 1])
            i += 2
        elif argv[i] == "--min-delta":
            min_delta = float(argv[i + 1])
            i += 2
        elif argv[i] == "--strict":
            strict = True
            i += 1
        else:
            args.append(argv[i])
            i += 1
    if args:
        cand_path = args[0]
    else:
        drivers = _driver_artifacts()
        if not drivers:
            raise SystemExit("no BENCH_r*.json driver artifact found")
        cand_path = drivers[-1]
    cand = _complete_elided(_bench_payload(open(cand_path).read()), cand_path)
    base = _canonical()

    bq, cq = base["queries"], cand["queries"]
    g = gate(bq, cq, max_ratio=max_ratio, min_delta=min_delta)

    # Persistence escalation (ADVICE r12, widened r14): ANY crossing —
    # sub-floor noise, envelope-drift, or first-time suspect — whose raw
    # ratio was ALSO over the gate in the PREVIOUS driver artifact is a
    # persistent regression, not jitter: escalate to FAIL.
    crossings = g["noise"] + g["envelope"] + g["offenders"]
    persistent: list = []
    g["persistent"] = {}
    if crossings:
        prior = [
            p for p in _driver_artifacts()
            if os.path.abspath(p) != os.path.abspath(cand_path)
        ]
        prev_q: dict = {}
        if prior:
            try:
                prev_q = _complete_elided(
                    _bench_payload(open(prior[-1]).read()), prior[-1]
                )["queries"]
            except SystemExit:
                prev_q = {}
        persistent = [
            (r, q) for r, q in crossings
            if q in prev_q and bq.get(q, 0) > 0
            and prev_q[q] / bq[q] > max_ratio
        ]
        if persistent:
            for key in ("noise", "envelope", "offenders"):
                g[key] = [t for t in g[key] if t not in persistent]
            g["persistent"] = {
                q: (prev_q[q] / bq[q], os.path.basename(prior[-1]))
                for _, q in persistent
            }
    print(
        f"candidate={os.path.basename(cand_path)} canonical=HEAD:BASELINE.md"
        f" common={len(g['common'])} (candidate-only={len(set(cq)-set(bq))},"
        f" canonical-only={len(set(bq)-set(cq))})"
    )
    print(
        f"common-total ratio {g['total_ratio']:.3f}, median {g['median']:.3f}"
        f" (host-noise envelope; compare queries against THIS, not 1.0)"
    )
    for r, q in g["watch"]:
        print(f"  watch {q}: {r:.2f}x ({bq[q]:.2f}s -> {cq[q]:.2f}s)")
    for r, q in g["noise"]:
        print(
            f"  noise? {q}: {r:.2f}x but only "
            f"{cq[q] - bq[q]:+.2f}s ({bq[q]:.2f}s -> {cq[q]:.2f}s; "
            f"under the {min_delta}s significance floor — re-run "
            f"BENCH_QUERIES={q} in a fresh JVM if in doubt)"
        )
    for r, q in g["envelope"]:
        label = "FAIL  envelope" if strict else "envelope"
        print(
            f"  {label} {q}: {r:.2f}x raw but "
            f"{r / g['envelope_median']:.2f}x median-normalized "
            f"({bq[q]:.2f}s -> {cq[q]:.2f}s; host-state drift envelope "
            f"{g['envelope_median']:.3f} — "
            + ("strict mode fails envelope crossings)" if strict else
               "FAILs if it crosses again in the next driver artifact)")
        )
    for r, q in g["offenders"]:
        label = "FAIL " if strict else "SUSPECT"
        print(
            f"  {label} {q}: {r:.2f}x ({bq[q]:.2f}s -> {cq[q]:.2f}s)"
            + ("" if strict else
               " — first crossing: re-measure with "
               f"BENCH_QUERIES={q} fresh-JVM; FAILs if it crosses again "
               "in the next driver artifact")
        )
    for r, q in sorted(persistent, reverse=True):
        pr, pname = g["persistent"][q]
        print(
            f"  FAIL  {q}: {r:.2f}x ({bq[q]:.2f}s -> {cq[q]:.2f}s) "
            f"[persistent: also {pr:.2f}x in {pname}]"
        )
    if g["total_ratio"] > max_ratio:
        print(f"  FAIL  common-total {g['total_ratio']:.2f}x > {max_ratio}x")
    failing = failing_verdict(g, persistent, max_ratio, strict)
    if failing:
        sys.exit(1)
    n_cross = len(g["noise"]) + len(g["envelope"]) + len(g["offenders"])
    print(
        f"gate PASS: 0 persistent regressions; {n_cross} non-persistent "
        f"crossing(s) of {len(g['ratios'])} queries above {max_ratio}x"
    )


if __name__ == "__main__":
    main()
