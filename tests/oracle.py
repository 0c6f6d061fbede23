"""Pure-Python / NumPy oracles implementing the reference semantics
literally (SURVEY.md §5 test plan) — no Spark, no code shared with the
operators beyond the leaf hash primitives (which ARE the spec).
"""

from __future__ import annotations

import numpy as np

from metacache_mpi_spark.functions.hashing import shingle_hashes


def shingle_set(text: str, k: int) -> np.ndarray:
    return np.unique(shingle_hashes(text, k))


def jaccard(a: str, b: str, k: int) -> float:
    """EXACT byte-shingle Jaccard — literal k-byte substrings, no
    hashing at all (the engine's 64-bit-hash kernel must agree with
    this, which is the whole point of the oracle)."""
    xa, xb = a.encode("utf-8"), b.encode("utf-8")
    sa = {xa[i : i + k] for i in range(len(xa) - k + 1)}
    sb = {xb[i : i + k] for i in range(len(xb) - k + 1)}
    if not sa and not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def longest_common_substring(a: str, b: str) -> int:
    """O(len_a * len_b) DP oracle (small inputs only)."""
    x, y = a.encode(), b.encode()
    prev = [0] * (len(y) + 1)
    best = 0
    for i in range(1, len(x) + 1):
        cur = [0] * (len(y) + 1)
        for j in range(1, len(y) + 1):
            if x[i - 1] == y[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """node → min-id-of-component for every node appearing in an edge."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    # path-compress fully, then map to min id per root
    roots: dict[int, int] = {}
    for node in list(uf.parent):
        r = uf.find(node)
        roots[r] = min(roots.get(r, r), node)
    return {node: roots[uf.find(node)] for node in uf.parent}
