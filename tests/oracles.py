"""Pure-Python/numpy oracle implementations of the reference semantics.

These are the ground truth for the pytest layer (SURVEY.md §5.2.1): tiny,
obviously-correct, no Spark. Each implements the *reference's* rule, cited.
"""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank_oracle(
    edges: list[tuple[int, int]],
    alpha: float = 0.85,
    eps: float = 1e-3,
    max_iter: int = 100,
    fixed_iterations: int | None = None,
) -> dict[int, float]:
    """sample-hama PageRank.java:107 — rank' = α·Σ(rank/outdeg) + (1−α)/N,
    stop when max|Δ| ≤ ε; no dangling redistribution; N = |src ∪ dst|."""
    edges = sorted(set(edges))
    vs = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(vs)
    outdeg = Counter(u for u, _ in edges)
    rank = {v: 1.0 / n for v in vs}
    iters = max_iter if fixed_iterations is None else fixed_iterations
    for _ in range(iters):
        sums = defaultdict(float)
        for u, v in edges:
            sums[v] += rank[u] / outdeg[u]
        new = {v: alpha * sums[v] + (1 - alpha) / n for v in vs}
        delta = max(abs(new[v] - rank[v]) for v in vs)
        rank = new
        if fixed_iterations is None and delta <= eps:
            break
    return rank


def wcc_oracle(edges: list[tuple[int, int]], vertices=None) -> dict[int, int]:
    """Weak components; label = min vid per component (canonical form of
    ConnectedComponents.java min-label semantics)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    vs = set(vertices or [])
    for u, v in edges:
        vs.add(u)
        vs.add(v)
    for v in vs:
        parent[v] = v
    for u, v in edges:
        union(u, v)
    # compress fully, then label by min member
    roots = defaultdict(list)
    for v in vs:
        roots[find(v)].append(v)
    return {v: min(members) for _, members in roots.items() for v in members}


def lpa_oracle(
    edges: list[tuple[int, int]], max_iter: int = 20, fixed_iterations: int | None = None
) -> dict[int, int]:
    """Synchronous LPA, tie → smallest label (operators/lpa.py semantics)."""
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v))
            und.add((v, u))
    adj = defaultdict(list)
    for u, v in und:
        adj[u].append(v)
    vs = sorted(adj)
    label = {v: v for v in vs}
    iters = max_iter if fixed_iterations is None else fixed_iterations
    for _ in range(iters):
        new = {}
        for v in vs:
            cnt = Counter(label[u] for u in adj[v])
            if not cnt:
                new[v] = label[v]
                continue
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        changed = sum(1 for v in vs if new[v] != label[v])
        label = new
        if fixed_iterations is None and changed == 0:
            break
    return label


def triangle_oracle(edges: list[tuple[int, int]]) -> int:
    """Each unordered triangle once (TriangleCount.java vid1<vid2<vid3)."""
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    count = 0
    for u, v in und:
        count += len({w for w in adj[u] & adj[v] if w > v and u < v})
    return count


def triangles_per_vertex_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    out: dict[int, int] = defaultdict(int)
    for u, v in und:
        for w in adj[u] & adj[v]:
            if u < v < w:
                out[u] += 1
                out[v] += 1
                out[w] += 1
    return dict(out)


def sssp_oracle(
    edges: list[tuple[int, int, float]], source: int, directed: bool = True
) -> dict[int, float]:
    """Dijkstra ground truth (reference semantics:
    sample-hama SingleSourceShortestPath.java — unit or weighted)."""
    import heapq

    adj = defaultdict(list)
    vs = set()
    for u, v, w in edges:
        adj[u].append((v, w))
        vs.add(u)
        vs.add(v)
        if not directed:
            adj[v].append((u, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def kcore_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Core numbers by repeated peeling (Montresor et al. 2013 semantics,
    cf. sample-hama KCore.java:74-89)."""
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    remaining = set(adj)
    k = 0
    while remaining:
        k += 1
        while True:
            peel = [v for v in remaining if deg[v] < k]
            if not peel:
                break
            for v in peel:
                core[v] = k - 1
                remaining.discard(v)
                for u in adj[v]:
                    if u in remaining:
                        deg[u] -= 1
    return core
