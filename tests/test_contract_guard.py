"""Mechanical contract-change guard (VERDICT r11 task 3, content-hash
variant). Two invariants:

1. CONTRACT_HASHES.json always matches the live registry — any edit to a
   graded query's function or oracle_sql forces a visible sidecar diff
   (run scripts/gen_contract_hashes.py).
2. Any query whose hash differs from the sidecar as of the LAST
   driver-graded commit must be forced into the re-grade window — either
   via a CONTRACT_CHANGES.json entry newer than its last grading, or by
   having no committed grading at all. Forgetting the entry fails here.

Hand-maintained disciplines drift (hand-rotation did, twice); this makes
the CLAUDE.md rule "contract change -> CONTRACT_CHANGES entry in the same
commit" un-forgettable.
"""
from __future__ import annotations

import importlib.util
import json
import os
import re
import subprocess

import pytest

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "gen_contract_hashes", os.path.join(REPO, "scripts", "gen_contract_hashes.py")
)
gen = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gen)


def _git(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["git", "-C", REPO, *args], capture_output=True, text=True, timeout=30
    )


def test_sidecar_matches_live_registry():
    with open(os.path.join(REPO, "CONTRACT_HASHES.json")) as f:
        committed = json.load(f)
    live = gen.compute()
    changed = sorted(
        q for q in set(committed) | set(live) if committed.get(q) != live.get(q)
    )
    assert not changed, (
        f"graded contract changed for {changed} — run "
        "scripts/gen_contract_hashes.py and, for semantic changes, add "
        "CONTRACT_CHANGES.json entries (CLAUDE.md round-12 discipline)"
    )


def _offenders(baseline: dict, current: dict, graded: dict) -> list[str]:
    """Queries whose contract hash changed since the baseline but which the
    rotation still treats as graded (i.e. NOT forced to never-verified)."""
    return sorted(
        q
        for q in current
        if q in baseline and baseline[q] != current[q] and q in graded
    )


def test_offender_logic():
    base = {"a": "h1", "b": "h2", "c": "h3"}
    cur = {"a": "h1", "b": "CHANGED", "c": "CHANGED", "d": "new"}
    graded = {"a": 7, "b": 7}  # c was demoted by the hook, d never graded
    assert _offenders(base, cur, graded) == ["b"]


def test_changed_contracts_are_forced_into_the_window():
    committed_ledgers = entry._committed_ledger_names(REPO)
    if committed_ledgers is None:
        pytest.skip("git unavailable")
    rounds = sorted(
        int(re.search(r"r(\d+)\.json$", n).group(1)) for n in committed_ledgers
    )
    if not rounds:
        pytest.skip("no committed ledger")
    last_round = rounds[-1]
    # the sidecar as of the commit that recorded the last driver grading
    rev = _git(
        "log", "-1", "--format=%H", "--", f"CORRECTNESS_r{last_round:02d}.json"
    ).stdout.strip() or _git(
        "log", "-1", "--format=%H", "--", f"CORRECTNESS_r{last_round}.json"
    ).stdout.strip()
    if not rev:
        pytest.skip("ledger commit not found")
    baseline_raw = _git("show", f"{rev}:CONTRACT_HASHES.json")
    if baseline_raw.returncode != 0:
        pytest.skip("no baseline sidecar at the last graded commit (bootstrap)")
    baseline = json.loads(baseline_raw.stdout)
    with open(os.path.join(REPO, "CONTRACT_HASHES.json")) as f:
        current = json.load(f)
    graded = entry._correctness_last_round()  # contract hook already applied
    offenders = _offenders(baseline, current, graded)
    assert not offenders, (
        f"{offenders} changed since their last driver grading but are not "
        "forced into the re-grade window — add CONTRACT_CHANGES.json entries"
    )
