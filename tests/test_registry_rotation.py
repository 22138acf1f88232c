"""The driver grades only the first 50 entries of ``queries()``; rounds 8 and
9 both shipped a hand-rotated head that drifted from the staleness ledger
(VERDICT r9 defect 1).  ``queries()`` now derives its order from the committed
CORRECTNESS_r*.json artifacts at call time; these tests pin that the
derivation (a) matches an independent re-computation of the ledger and
(b) honors the policy: never-verified first, then ascending last-graded
round, ties by canonical registration order.
"""
from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ledger() -> dict[str, int]:
    # Mirror production sourcing EXACTLY (VERDICT r11 task 1): only
    # git-tracked ledgers count (an untracked CORRECTNESS_r*.json is the
    # state every driver round leaves behind — the glob alone made this
    # test red in precisely that state), and a contract change after the
    # last grading demotes the query to never-verified.
    committed = entry._committed_ledger_names(REPO)
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        if committed is not None and os.path.basename(path) not in committed:
            continue
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        with open(path) as f:
            for q in json.load(f):
                last[q] = max(last.get(q, 0), rnd)
    for q, changed in entry._contract_changes(REPO).items():
        if last.get(q, 0) < changed:
            last.pop(q, None)
    return last


def test_head_50_is_the_stalest_tier():
    qs = list(entry.queries())
    last = _ledger()
    pos = {q: i for i, q in enumerate(entry._query_impls())}
    expected = sorted(qs, key=lambda q: (last.get(q, -1), pos[q]))
    assert qs == expected, "queries() ordering drifted from the staleness ledger"
    # the head must not contain any query graded more recently than a query
    # outside the head (the exact property hand-rotation kept violating)
    head_max = max(last.get(q, -1) for q in qs[:50])
    tail_min = min(last.get(q, -1) for q in qs[50:])
    assert head_max <= tail_min


def test_untracked_ledger_is_ignored():
    """ADVICE r10: a stray CORRECTNESS ledger left in the working tree by
    local pre-verification must NOT change the rotation — only committed
    ledgers are the contract the driver grades."""
    import pytest

    committed = entry._committed_ledger_names(REPO)
    if committed is None:
        pytest.skip("git unavailable — glob fallback in effect")
    assert "CORRECTNESS_r01.json" in committed
    before = list(entry.queries())
    stray = os.path.join(REPO, "CORRECTNESS_r99.json")
    assert not os.path.exists(stray)
    with open(stray, "w") as f:
        json.dump({q: {"hash_match": True} for q in before[:5]}, f)
    try:
        assert list(entry.queries()) == before
        assert max(entry._correctness_last_round().values()) < 99
    finally:
        os.unlink(stray)


def test_ledger_is_invariant_to_untracked_artifacts():
    """The production/test disagreement VERDICT r11 flagged: with an
    UNTRACKED ledger on disk (the post-driver state), _ledger() and
    production must still agree — both read committed ledgers only."""
    committed = entry._committed_ledger_names(REPO)
    if committed is None:
        import pytest

        pytest.skip("git unavailable — glob fallback in effect")
    before = _ledger()
    stray = os.path.join(REPO, "CORRECTNESS_r98.json")
    assert not os.path.exists(stray)
    with open(stray, "w") as f:
        json.dump({q: {"hash_match": True} for q in list(before)[:5]}, f)
    try:
        assert _ledger() == before
        assert _ledger() == entry._correctness_last_round()
    finally:
        os.unlink(stray)


def test_contract_change_forces_regrade():
    """VERDICT r11 task 3: a query whose graded contract changed after its
    last committed grading sorts as never-verified (head of the window);
    the entry self-expires once a grading >= the change round lands."""
    changes = entry._contract_changes(REPO)
    last = entry._correctness_last_round()
    qs = list(entry.queries())
    never = {q for q in qs if q not in last}
    for q, changed in changes.items():
        if q not in qs:
            continue  # sidecar may outlive a renamed query; rotation ignores it
        # recompute the raw (pre-hook) last grading independently
        committed = entry._committed_ledger_names(REPO)
        raw_last = 0
        for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
            if committed is not None and os.path.basename(path) not in committed:
                continue
            rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
            with open(path) as f:
                if q in json.load(f):
                    raw_last = max(raw_last, rnd)
        if raw_last < changed:
            assert q in never, f"{q}: contract changed r{changed} but not demoted"
            assert qs.index(q) < 50, f"{q}: forced re-grade not in the head-50"
        else:
            assert q not in never, f"{q}: contract-change entry should have expired"


def test_registry_and_impls_same_key_set():
    assert set(entry.queries()) == set(entry._query_impls())
    # oracles only for registered queries
    assert set(entry.oracle_sql()) <= set(entry.queries())
