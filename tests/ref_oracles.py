"""Pure-Python reference-semantics oracles for unit tests.

Each function re-implements (from the documented semantics, with
file:line citations) a reference stage as a tiny in-memory loop, so our
DataFrame operators can be compared row-for-row on small fixtures.
These are test oracles — deliberately naive, driver-side, and slow.
"""

from __future__ import annotations

import numpy as np


def best_threshold_oracle(pairs: list[tuple[float, int]], ascending: bool) -> float:
    """Reference getThreshold (TransConfidence.py:8-26 asc /
    ResourceRankConfidence.py:61-79 desc). ``pairs`` in input order
    (stable sort tie semantics)."""
    lst = sorted(pairs, key=lambda sp: sp[0], reverse=not ascending)
    threshold = lst[0][0] - 0.01 if ascending else lst[0][0] + 0.01
    max_value = 0
    current = 0
    for i in range(1, len(lst)):
        current += 1 if lst[i - 1][1] == 1 else -1
        if current > max_value:
            threshold = (lst[i][0] + lst[i - 1][0]) / 2.0
            max_value = current
    return threshold


def pagerank_oracle(
    edges: dict[tuple[int, int], float],
    nodes: list[int],
    core: int,
    damping: float = 0.85,
    max_iter: int = 500,
    min_delta: float = 1e-5,
) -> dict[int, float]:
    """Reference PRIterator.page_rank (pagerank.py:18-85) including the
    dangling patch and the Gauss-Seidel in-place sweep in node order."""
    edges = dict(edges)
    out_nbrs: dict[int, set] = {n: set() for n in nodes}
    for (s, d) in edges:
        out_nbrs.setdefault(s, set()).add(d)
    for n in nodes:
        if not out_nbrs.get(n):
            edges[(n, n)] = 0.5
            out_nbrs.setdefault(n, set()).add(n)
            if n != core:
                edges[(n, core)] = 0.5
                out_nbrs[n].add(core)
    incidents: dict[int, list] = {n: [] for n in nodes}
    for (s, d), w in edges.items():
        incidents.setdefault(d, []).append((s, w))
    n_nodes = len(nodes)
    pr = {n: 0.0 for n in nodes}
    pr[core] = 1.0
    dv = (1.0 - damping) / n_nodes
    for _ in range(max_iter):
        change = 0.0
        for n in nodes:
            rank = sum(damping * pr[s] * w for s, w in incidents.get(n, [])) + dv
            change += abs(pr[n] - rank)
            pr[n] = rank
        if change < min_delta:
            break
    return pr


def searchpath_oracle(
    adj: dict[int, dict[int, list[int]]], start: int, depth: int = 4
) -> set[tuple[tuple[int, int, int], ...]]:
    """Reference searchpath (SearchPaths2.py:51-90): all simple paths of
    1..depth-1 edges from ``start``, never revisiting a node on the path
    (including the start). Returns the path set."""
    out: set = set()

    def rec(node: int, visited: set, path: tuple, d: int) -> None:
        d -= 1
        if d <= 0:
            return
        for nxt, rels in adj.get(node, {}).items():
            if nxt in visited:
                continue
            for r in rels:
                out.add(path + ((node, nxt, r),))
            for r in rels:
                rec(nxt, visited | {nxt}, path + ((node, nxt, r),), d)

    rec(start, {start}, (), depth)
    return out


def path_rank_oracle(
    paths: list[tuple[tuple[int, int, int], ...]],
    ent: np.ndarray,
    rel: np.ndarray,
    h: int,
    t: int,
    r: int,
) -> list[tuple[float, tuple]]:
    """Reference Rank (SearchPaths2.py:26-48): SD per path, sorted desc."""

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    plist = []
    for path in paths:
        sd_h = sum(cos(ent[h], ent[e[1]]) for e in path)
        sd_t = sum(cos(ent[t], ent[e[0]]) for e in path)
        sd_r = sum(cos(rel[r], rel[e[2]]) for e in path)
        plist.append(((sd_r + sd_h + sd_t) / (3 * len(path)), path))
    return sorted(plist, key=lambda sp: sp[0], reverse=True)
