"""Staleness ledger: last-green driver round per graded query.

The driver records a CORRECTNESS row only for the FIRST 50 entries of the
``queries()`` registry, so greens go stale as the registry grows.  This script
computes, for every registered query, the most recent round in which the
driver recorded ANY row for it (and whether that row hash-matched), then
emits:

  1. a ledger table (query, last round, status), and
  2. the recommended next-round window: the 50 stalest queries —
     never-verified first, then ascending last-green round, ties broken by
     current registry position.

Usage:  python scripts/staleness.py [--window-only]

The registry head should be rewritten to match the emitted window each round
(VERDICT r8 task 2: hand-rotation doesn't stick; derive it mechanically).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def status_of(row: dict) -> str:
    if row.get("hash_match") is True:
        return "hash"
    if row.get("err") == "no_oracle" or row.get("hash_match") is None:
        # rows-only check (no oracle) — weaker, still counts as a driver row
        return "rows" if row.get("spark_rows") is not None else "err"
    return "FAIL"


def ledger() -> list[tuple[str, int | None, str, int]]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    registry = list(entry.queries().keys())
    # Ranking round comes from PRODUCTION (committed ledgers only + the
    # CONTRACT_CHANGES.json never-verified demotion) so the emitted window
    # always equals what queries() will actually serve the driver; the
    # status column is display-only and may read uncommitted rows.
    prod_last = entry._correctness_last_round()
    rounds = load_rounds()
    status: dict[str, str] = {}
    for r in sorted(rounds):
        for q, row in rounds[r].items():
            status[q] = status_of(row)

    out = []
    for pos, q in enumerate(registry):
        r = prod_last.get(q)
        st = status.get(q, "never") if r is not None else (
            "CHANGED" if q in status else "never"
        )
        out.append((q, r, st, pos))
    return out


def window(rows, size: int = 50) -> list[str]:
    ranked = sorted(rows, key=lambda t: (t[1] if t[1] is not None else -1, t[3]))
    return [q for q, _, _, _ in ranked[:size]]


def main() -> None:
    rows = ledger()
    win = window(rows)
    if "--window-only" in sys.argv:
        for q in win:
            print(q)
        return
    print(f"{'query':32s} {'last':>4s} {'status':6s} pos")
    for q, r, st, pos in sorted(rows, key=lambda t: (t[1] if t[1] is not None else -1, t[3])):
        print(f"{q:32s} {r if r is not None else '-':>4} {st:6s} {pos}")
    never = sum(1 for _, r, _, _ in rows if r is None)
    fails = [q for q, _, st, _ in rows if st == "FAIL"]
    print(f"\ntotal={len(rows)} never={never} fails={fails}")
    print("\nrecommended next-round window (50 stalest):")
    print(", ".join(win))
    head = [q for q, *_ in sorted(rows, key=lambda t: t[3])][:50]
    drift = [q for q in win if q not in head]
    print(f"\nregistry-head drift vs recommendation: {len(drift)} queries -> {drift}")

    # Staleness histogram vs the documented policy (CLAUDE.md, VERDICT r11
    # task 5): with a 50-query driver window over N registered queries the
    # structural floor on max staleness is ceil(N/50) - 1 rounds; the
    # committed policy target is <= 4, which requires freezing registry
    # growth near 227 queries (ceil(227/50) = 5 windows -> max 4).
    latest = max((r for _, r, _, _ in rows if r is not None), default=0)
    hist: dict[str, int] = {}
    for _, r, _, _ in rows:
        key = "never/forced" if r is None else str(latest - r)
        hist[key] = hist.get(key, 0) + 1
    floor = -(-len(rows) // 50) - 1
    print(f"\nstaleness histogram (rounds behind r{latest}):")
    for k in sorted(hist, key=lambda x: (x != "never/forced", x)):
        print(f"  {k:>12s}: {hist[k]}")
    print(f"policy: max staleness <= 4 (structural floor at {len(rows)} queries: {floor})")


if __name__ == "__main__":
    main()
