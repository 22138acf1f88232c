"""Brute-force cross-checks of the numpy stress mirrors (ADVICE r12).

The scale stress scripts (scripts/stress_bfs.py, stress_lpa.py,
stress_hits.py) validate the Spark iterative graph operators against
vectorized numpy mirrors — at 1M+ edges the mirror IS the correctness
reference, so the mirror itself needs an independent check. These tests
pin each mirror against the most naive possible per-node/per-edge Python
implementation of the SAME documented contract, on many small random
graphs (the r11/r12 claim "brute-force-checked on random graphs before
use", previously unreproducible, now committed).

No SparkSession involved: this is mirror-vs-naive only; mirror-vs-Spark
is the stress scripts' job (and the sf0.01 oracles').
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from stress_bfs import np_bfs  # noqa: E402
from stress_hits import np_hits  # noqa: E402
from stress_lpa import np_lpa  # noqa: E402

INF = 1 << 62


def _random_graph(rng, n_nodes=50, n_edges=120, weighted=False):
    a = rng.integers(0, n_nodes, size=n_edges)
    b = rng.integers(0, n_nodes, size=n_edges)
    keep = a != b
    edges = np.stack([a[keep], b[keep]], axis=1).astype(np.int64)
    if weighted:
        w = rng.integers(1, 10, size=len(edges)).astype(np.int64)
        return edges, w
    return edges, np.ones(len(edges), dtype=np.int64)


def naive_bfs(edges, weights, sources, max_depth=20):
    """Per-edge Python loop, full synchronous relaxation from the
    PREVIOUS round's distances (np_bfs contract: both directions,
    self-loops dropped, no dedup — multi-edges cannot change a min)."""
    arcs = []
    for (u, v), w in zip(edges.tolist(), weights.tolist()):
        if u != v:
            arcs.append((u, v, int(w)))
            arcs.append((v, u, int(w)))
    dist = {int(s): 0 for s in sources}
    for _ in range(max_depth):
        new = dict(dist)
        for u, v, w in arcs:
            if u in dist:
                nd = dist[u] + w
                if v not in new or nd < new[v]:
                    new[v] = nd
        if new == dist:
            break
        dist = new
    return dist


def naive_lpa(edges, rounds):
    """Per-node Python loop: undirected + deduped edges (each undirected
    edge votes once per endpoint), synchronous rounds, winner = most
    frequent neighbor label with ties to the SMALLEST label."""
    und = set()
    for u, v in edges.tolist():
        if u != v:
            und.add((u, v))
            und.add((v, u))
    neigh: dict[int, list[int]] = {}
    for u, v in und:
        neigh.setdefault(u, []).append(v)
    nodes = sorted({x for e in und for x in e})
    lbl = {u: u for u in nodes}
    for _ in range(rounds):
        new = {}
        for u in nodes:
            counts: dict[int, int] = {}
            for v in neigh[u]:
                counts[lbl[v]] = counts.get(lbl[v], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[u] = best
        lbl = new
    return lbl


def naive_hits(edges, iters):
    """Per-edge Python loop: NO dedup (multi-edges vote per occurrence),
    h0 = 1 on the endpoint union, L1-normalized half-steps."""
    nodes = sorted({int(x) for e in edges.tolist() for x in e})
    h = {u: 1.0 for u in nodes}
    a = {u: 0.0 for u in nodes}
    for _ in range(iters):
        a_raw = {u: 0.0 for u in nodes}
        for s, d in edges.tolist():
            a_raw[d] += h[s]
        tot = sum(a_raw.values())
        a = {u: x / tot for u, x in a_raw.items()}
        h_raw = {u: 0.0 for u in nodes}
        for s, d in edges.tolist():
            h_raw[s] += a[d]
        tot = sum(h_raw.values())
        h = {u: x / tot for u, x in h_raw.items()}
    return {u: (h[u], a[u]) for u in nodes}


def test_np_bfs_matches_naive_on_random_graphs():
    rng = np.random.default_rng(1729)
    for trial in range(30):
        weighted = trial % 2 == 1
        edges, w = _random_graph(rng, weighted=weighted)
        k = int(rng.integers(1, 4))
        sources = [int(s) for s in rng.integers(0, 50, size=k)]
        got = np_bfs(edges, w, sources, max_depth=20)
        want = naive_bfs(edges, w, sources, max_depth=20)
        assert got == want, f"trial {trial}: np_bfs diverges from naive"


def test_np_bfs_respects_depth_cap():
    # chain of 10, source at one end, cap 3: exactly 4 nodes reached
    edges = np.array([[i, i + 1] for i in range(10)], dtype=np.int64)
    w = np.ones(len(edges), dtype=np.int64)
    got = np_bfs(edges, w, [0], max_depth=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    assert naive_bfs(edges, w, [0], max_depth=3) == got


def test_np_lpa_matches_naive_on_random_graphs():
    rng = np.random.default_rng(2718)
    for trial in range(30):
        edges, _ = _random_graph(rng)
        got = np_lpa(edges, rounds=4)
        want = naive_lpa(edges, rounds=4)
        assert got == want, f"trial {trial}: np_lpa diverges from naive"


def test_np_hits_matches_naive_on_random_graphs():
    rng = np.random.default_rng(3141)
    for trial in range(30):
        edges, _ = _random_graph(rng)
        got = np_hits(edges, iters=8)
        want = naive_hits(edges, iters=8)
        assert set(got) == set(want)
        for u in want:
            assert abs(got[u][0] - want[u][0]) < 1e-9, f"trial {trial} hub {u}"
            assert abs(got[u][1] - want[u][1]) < 1e-9, f"trial {trial} auth {u}"
