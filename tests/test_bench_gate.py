"""scripts/bench_gate.py contract tests — the gate the judge applies by
hand each round (VERDICT r11 task 6a). Pins (a) the canonical per-query
table in committed BASELINE.md stays machine-parseable and complete,
(b) a driver artifact's elided stdout line is completed from the
BENCH_FULL.json committed alongside it, (c) ratio math and exit behavior.
"""
from __future__ import annotations

import glob
import importlib.util
import json
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_gate", os.path.join(REPO, "scripts", "bench_gate.py")
)
bench_gate = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_gate)


def _git_ok() -> bool:
    try:
        return (
            subprocess.run(
                ["git", "-C", REPO, "rev-parse", "HEAD"],
                capture_output=True,
                timeout=10,
            ).returncode
            == 0
        )
    except (OSError, subprocess.SubprocessError):
        return False


def test_canonical_table_parses_and_covers_registry():
    import pytest

    if not _git_ok():
        pytest.skip("git unavailable")
    canon = bench_gate._canonical()["queries"]
    assert len(canon) >= 200, "canonical table lost rows — check BASELINE.md"
    assert all(v > 0 for v in canon.values())
    # every canonical entry must be a registered query (a renamed query
    # whose stale row lingers would silently drop out of the gate)
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    registered = set(entry._query_impls())
    stale = set(canon) - registered
    assert not stale, f"canonical rows for unregistered queries: {sorted(stale)}"


def test_driver_artifact_completes_from_committed_full():
    import pytest

    if not _git_ok():
        pytest.skip("git unavailable")
    # only numeric round artifacts — the driver also drops auxiliary
    # names like BENCH_r16_c8.json (the 8-core scaling run), which are
    # not candidates (the same skip bench_gate itself applies)
    drivers = sorted(
        (
            p
            for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            if re.search(r"r(\d+)\.json$", p)
        ),
        key=lambda p: int(re.search(r"r(\d+)\.json$", p).group(1)),
    )
    if not drivers:
        pytest.skip("no driver bench artifact")
    cand_path = drivers[-1]
    cand = bench_gate._bench_payload(open(cand_path).read())
    if not cand.get("queries_elided"):
        pytest.skip("driver line not elided")
    full = bench_gate._complete_elided(cand, cand_path)
    assert len(full["queries"]) == len(cand["queries"]) + cand["queries_elided"]


def test_gate_math_significance_floor():
    """A >2x ratio fails only with a real absolute regression: 0.04s ->
    0.15s is scheduler jitter (measured r12, agg_stream), 1.0s -> 2.5s is
    a genuine regression; the sub-floor crossing still surfaces as noise."""
    bq = {"tiny": 0.04, "big": 1.0, "steady": 3.0}
    cq = {"tiny": 0.15, "big": 2.5, "steady": 3.1}
    g = bench_gate.gate(bq, cq, max_ratio=2.0, min_delta=0.25)
    assert [q for _, q in g["offenders"]] == ["big"]
    assert [q for _, q in g["noise"]] == ["tiny"]


def test_gate_math_total_and_median():
    bq = {"a": 1.0, "b": 2.0}
    cq = {"a": 1.1, "b": 2.2}
    g = bench_gate.gate(bq, cq)
    assert abs(g["total_ratio"] - 1.1) < 1e-9
    assert abs(g["median"] - 1.1) < 1e-9
    assert not g["offenders"] and not g["noise"]


def test_gate_math_envelope_normalization():
    """ADVICE r13: a raw >2x crossing that is under 2x after dividing by
    the healthy-median host-drift envelope is 'envelope', not an
    offender; one standing out even after normalization stays SUSPECT.
    The envelope median is computed over NON-crossing queries only, and
    clamped at 1.0 so a fast host never widens the gate."""
    # 9 healthy queries drifting ~1.3x (slow host state) + two crossings
    bq = {f"h{i}": 1.0 for i in range(9)}
    cq = {f"h{i}": 1.3 for i in range(9)}
    bq.update({"drift": 1.0, "real": 1.0})
    cq.update({"drift": 2.2, "real": 4.0})
    g = bench_gate.gate(bq, cq, max_ratio=2.0, min_delta=0.25)
    assert abs(g["envelope_median"] - 1.3) < 1e-9
    assert [q for _, q in g["envelope"]] == ["drift"]  # 2.2/1.3 = 1.69x
    assert [q for _, q in g["offenders"]] == ["real"]  # 4.0/1.3 = 3.08x
    # fast host: median 0.8 clamps to 1.0 — raw gate unchanged
    cq2 = {q: v * 0.8 / 1.3 for q, v in cq.items()}
    cq2["real"] = 4.0
    g2 = bench_gate.gate(bq, cq2, max_ratio=2.0, min_delta=0.25)
    assert g2["envelope_median"] == 1.0
    assert [q for _, q in g2["offenders"]] == ["real"]


def test_driver_artifacts_skips_non_numeric(tmp_path, monkeypatch):
    """ADVICE r13: a stray BENCH_rerun.json must not crash the sort key."""
    monkeypatch.setattr(bench_gate, "REPO", str(tmp_path))
    for name in ("BENCH_r2.json", "BENCH_r10.json", "BENCH_rerun.json"):
        (tmp_path / name).write_text("{}")
    got = [os.path.basename(p) for p in bench_gate._driver_artifacts()]
    assert got == ["BENCH_r2.json", "BENCH_r10.json"]


def test_payload_parses_raw_and_wrapped(tmp_path):
    raw = {"metric": "total_query_wall_seconds", "queries": {"q": 1.0}}
    assert bench_gate._bench_payload(json.dumps(raw))["queries"] == {"q": 1.0}
    wrapped = {"tail": "noise\n" + json.dumps(raw) + "\n"}
    assert bench_gate._bench_payload(json.dumps(wrapped))["queries"] == {"q": 1.0}


def test_uncommitted_artifact_completes_from_matching_disk_full(tmp_path, monkeypatch):
    """The post-driver state: BENCH_r{N}.json untracked, but the on-disk
    BENCH_FULL.json came from the same run (totals match exactly) — the
    gate completes from it; a total mismatch falls back to reported-only."""
    cand = {
        "metric": "total_query_wall_seconds",
        "value": 12.345,
        "queries": {"slow": 10.0},
        "queries_elided": 1,
    }
    art = tmp_path / "BENCH_r97.json"  # basename never committed
    art.write_text(json.dumps(cand))
    fake_repo = tmp_path / "repo"
    fake_repo.mkdir()
    monkeypatch.setattr(bench_gate, "REPO", str(fake_repo))
    (fake_repo / "BENCH_FULL.json").write_text(
        json.dumps({"value": 12.345, "queries": {"slow": 10.0, "fast": 2.345}})
    )
    got = bench_gate._complete_elided(cand, str(art))
    assert got["queries"] == {"slow": 10.0, "fast": 2.345}
    (fake_repo / "BENCH_FULL.json").write_text(
        json.dumps({"value": 99.0, "queries": {"slow": 1.0, "fast": 1.0}})
    )
    got = bench_gate._complete_elided(cand, str(art))
    assert got["queries"] == {"slow": 10.0}


def test_all_elided_candidate_never_completes_from_disk(tmp_path, monkeypatch):
    """ADVICE r13: with zero inline timings the per-query all() is
    vacuous — same-run must NOT be decided by the 3-decimal total alone."""
    cand = {
        "metric": "total_query_wall_seconds",
        "value": 12.345,
        "queries": {},
        "queries_elided": 2,
    }
    art = tmp_path / "BENCH_r98.json"
    art.write_text(json.dumps(cand))
    fake_repo = tmp_path / "repo"
    fake_repo.mkdir()
    monkeypatch.setattr(bench_gate, "REPO", str(fake_repo))
    (fake_repo / "BENCH_FULL.json").write_text(
        json.dumps({"value": 12.345, "queries": {"a": 10.0, "b": 2.345}})
    )
    got = bench_gate._complete_elided(cand, str(art))
    assert got["queries"] == {}


def test_strict_fails_envelope_and_suspect_classes():
    """ADVICE r14: --strict escalates BOTH SUSPECT and envelope-class
    crossings (a real regression can ride the host-drift envelope for a
    full round at local pre-commit); sub-floor noise? crossings stay
    exit-0 in every mode."""
    bq = {f"h{i}": 1.0 for i in range(9)}
    cq = {f"h{i}": 1.3 for i in range(9)}
    bq.update({"drift": 1.0, "real": 1.0, "tiny": 0.04})
    cq.update({"drift": 2.2, "real": 4.0, "tiny": 0.15})
    g = bench_gate.gate(bq, cq, max_ratio=2.0, min_delta=0.25)
    assert [q for _, q in g["noise"]] == ["tiny"]
    assert [q for _, q in g["envelope"]] == ["drift"]
    assert [q for _, q in g["offenders"]] == ["real"]
    assert not bench_gate.failing_verdict(g, [], 2.0, strict=False)
    assert bench_gate.failing_verdict(g, [], 2.0, strict=True)
    # strict with ONLY a noise?-class crossing still passes
    g2 = bench_gate.gate(
        {"a": 1.0, "tiny": 0.04}, {"a": 1.0, "tiny": 0.15},
        max_ratio=2.0, min_delta=0.25,
    )
    assert [q for _, q in g2["noise"]] == ["tiny"]
    assert not g2["envelope"] and not g2["offenders"]
    assert not bench_gate.failing_verdict(g2, [], 2.0, strict=True)
    # persistence fails regardless of mode
    assert bench_gate.failing_verdict(g2, [(3.0, "x")], 2.0, strict=False)
