"""Signature partitioning + hierarchical clustering.

Port of cluster_signatures.py: sort signatures by locus, split into partitions
at >5 kb gaps (signature_partition, cluster_signatures.py:51-66), then
average-linkage cluster each partition with the custom span/position metric and
cut at t=0.3 (cluster_signatures.py:95-121).

The reference delegates to scipy.cluster.hierarchy; cluster membership feeds
every downstream call, so this module re-implements the same algorithms
(Müllner NN-chain average linkage + distance-criterion flat clustering,
identical tie-breaking) with no scipy dependency. Exact agreement with scipy is
covered by tests/test_cluster.py.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from svision_tpu.collect.classes import Cluster, Signature


def span_position_distance(a, b) -> float:
    """Custom metric (cluster_signatures.py:132-141); a, b = (start, end, norm)."""
    normalizer = a[2]
    span1 = a[1] - a[0]
    span2 = b[1] - b[0]
    center1 = (a[0] + a[1]) // 2
    center2 = (b[0] + b[1]) // 2
    position_distance = min(abs(a[0] - b[0]), abs(a[1] - b[1]),
                            abs(center1 - center2)) / normalizer
    span_distance = abs(span1 - span2) / max(span1, span2)
    return position_distance + span_distance


_TRIU_CACHE: dict = {}

# partitions at/below this size take the scalar fast paths (python floats
# are IEEE float64, so results are bit-equal; asserted by tests)
_SMALL_N = 24


def _triu_pairs(n: int):
    """Cached np.triu_indices(n, 1) — partitions repeat the same small n
    thousands of times per window and index generation dominated the
    vectorized pdist there."""
    got = _TRIU_CACHE.get(n)
    if got is None:
        if len(_TRIU_CACHE) > 512:      # bound: distinct n values only
            _TRIU_CACHE.clear()
        got = _TRIU_CACHE[n] = np.triu_indices(n, k=1)
    return got


def span_position_pdist(data: np.ndarray) -> np.ndarray:
    """Condensed distance matrix of span_position_distance, vectorized.

    Bit-identical to scipy pdist(data, span_position_distance): same float64
    elementary operations in the same order. Partitions are overwhelmingly
    tiny (support-sized, n 6-20: one event's signatures), where numpy call
    overhead dominates — a scalar path handles n <= _SMALL_N with the same
    IEEE float64 expressions (python floats ARE float64; equality asserted
    in tests/test_cluster.py)."""
    x = np.asarray(data, dtype=np.float64)
    n = x.shape[0]
    if n <= _SMALL_N:
        rows = x.tolist()
        out = []
        for i in range(n - 1):
            a0, a1, norm = rows[i]
            c1 = (a0 + a1) // 2
            s1 = a1 - a0
            for j in range(i + 1, n):
                b0, b1, _ = rows[j]
                p0 = abs(a0 - b0)
                p1 = abs(a1 - b1)
                p2 = abs(c1 - (b0 + b1) // 2)
                if p1 < p0:
                    p0 = p1
                if p2 < p0:
                    p0 = p2
                s2 = b1 - b0
                out.append(p0 / norm
                           + abs(s1 - s2) / (s1 if s1 > s2 else s2))
        return np.asarray(out, np.float64)
    iu, ju = _triu_pairs(n)
    a, b = x[iu], x[ju]
    span1 = a[:, 1] - a[:, 0]
    span2 = b[:, 1] - b[:, 0]
    center1 = np.floor_divide(a[:, 0] + a[:, 1], 2)
    center2 = np.floor_divide(b[:, 0] + b[:, 1], 2)
    pos = np.minimum(np.minimum(np.abs(a[:, 0] - b[:, 0]),
                                np.abs(a[:, 1] - b[:, 1])),
                     np.abs(center1 - center2)) / a[:, 2]
    span = np.abs(span1 - span2) / np.maximum(span1, span2)
    return pos + span


def _condensed_index(n: int, i: int, j: int) -> int:
    if i > j:
        i, j = j, i
    return n * i - (i * (i + 1) // 2) + (j - i - 1)


class _LinkageUnionFind:
    """Union-find with next-label assignment (scipy label() semantics)."""

    def __init__(self, n: int):
        self.parent = list(range(2 * n - 1))
        self.size = [1] * (2 * n - 1)
        self.next_label = n

    def merge(self, x: int, y: int) -> int:
        self.parent[x] = self.next_label
        self.parent[y] = self.next_label
        size = self.size[x] + self.size[y]
        self.size[self.next_label] = size
        self.next_label += 1
        return size

    def find(self, x: int) -> int:
        p = x
        while self.parent[x] != x:
            x = self.parent[x]
        while self.parent[p] != x:
            p, self.parent[p] = self.parent[p], x
        return x


def _chain_vector(d: np.ndarray, n: int) -> np.ndarray:
    """NN-chain merge loop, numpy rows (n > _SMALL_N)."""
    D = np.full((n, n), np.inf, dtype=np.float64)
    iu, ju = _triu_pairs(n)
    D[iu, ju] = d
    D[ju, iu] = d
    z = np.empty((n - 1, 4), dtype=np.float64)
    size = np.ones(n, dtype=np.int64)
    chain: List[int] = []

    for k in range(n - 1):
        if not chain:
            chain.append(int(np.argmax(size > 0)))
        while True:
            x = chain[-1]
            if len(chain) > 1:
                y = chain[-2]
                current_min = D[x, y]
            else:
                y = -1
                current_min = np.inf
            row = D[x]
            am = int(np.argmin(row))       # inactive/self rows hold +inf
            if row[am] < current_min:
                current_min = row[am]
                y = am
            if len(chain) > 1 and y == chain[-2]:
                break
            chain.append(y)
        del chain[-2:]
        if x > y:
            x, y = y, x
        nx, ny = size[x], size[y]
        z[k] = (x, y, current_min, nx + ny)
        size[x] = 0
        size[y] = nx + ny
        # Lance-Williams average update into slot y; x retires to +inf.
        # Inactive columns are +inf on both sides and stay +inf.
        new_row = (nx * D[x] + ny * D[y]) / (nx + ny)
        new_row[y] = np.inf
        D[y, :] = new_row
        D[:, y] = new_row
        D[x, :] = np.inf
        D[:, x] = np.inf
    return z


def _chain_small(d: List[float], n: int) -> List[List[float]]:
    """The identical NN-chain loop in scalar python — same IEEE float64
    arithmetic in the same order (argmin keeps the FIRST minimum, the
    Lance-Williams expression reads both old rows before either is
    overwritten), minus the numpy per-call overhead that dominates at
    support-sized partitions."""
    inf = float("inf")
    D = [[inf] * n for _ in range(n)]
    k = 0
    for i in range(n - 1):
        Di = D[i]
        for j in range(i + 1, n):
            v = d[k]
            k += 1
            Di[j] = v
            D[j][i] = v
    z = [[0.0, 0.0, 0.0, 0.0] for _ in range(n - 1)]
    size = [1] * n
    chain: List[int] = []

    for step in range(n - 1):
        if not chain:
            chain.append(next(i for i in range(n) if size[i] > 0))
        while True:
            x = chain[-1]
            if len(chain) > 1:
                y = chain[-2]
                current_min = D[x][y]
            else:
                y = -1
                current_min = inf
            row = D[x]
            am = 0
            best = row[0]
            for idx in range(1, n):
                v = row[idx]
                if v < best:
                    best = v
                    am = idx
            if best < current_min:
                current_min = best
                y = am
            if len(chain) > 1 and y == chain[-2]:
                break
            chain.append(y)
        del chain[-2:]
        if x > y:
            x, y = y, x
        nx, ny = size[x], size[y]
        zs = z[step]
        zs[0] = float(x)
        zs[1] = float(y)
        zs[2] = current_min
        zs[3] = float(nx + ny)
        size[x] = 0
        size[y] = nx + ny
        rx = D[x]
        ry = D[y]
        denom = nx + ny
        for idx in range(n):
            nv = (nx * rx[idx] + ny * ry[idx]) / denom
            ry[idx] = nv
            D[idx][y] = nv
            rx[idx] = inf
            D[idx][x] = inf
        # new_row[y] and new_row[x] evaluate to +inf through the same
        # arithmetic (old D[y][y] / D[x][x] are +inf), so no explicit
        # overwrite is needed; x's row/column are fully retired above
    return z


def linkage_average(dists: np.ndarray, n: int) -> np.ndarray:
    """Average-linkage via the NN-chain algorithm. Merge order, tie-breaking
    and output labeling match scipy.cluster.hierarchy.linkage('average')
    exactly: the nearest-neighbor scan prefers chain[-2] on ties (strict <,
    first index wins — np.argmin semantics) and the Lance-Williams update is
    the identical float64 expression, just row-vectorized. The distance
    matrix is held square (8n² bytes) so every chain step is one C-level
    argmin instead of an O(n) Python loop — a 10k-signature partition (dense
    repeat regions; the reference only drops partitions >100k,
    cluster_signatures.py:80-85) runs in seconds instead of minutes."""
    d = np.asarray(dists, dtype=np.float64)
    if n <= _SMALL_N:
        z = np.asarray(_chain_small(d.tolist(), n),
                       dtype=np.float64).reshape(-1, 4)
    else:
        z = _chain_vector(d, n)

    order = np.argsort(z[:, 2], kind="stable")
    z = z[order]
    uf = _LinkageUnionFind(n)
    for i in range(n - 1):
        x, y = int(z[i, 0]), int(z[i, 1])
        xr, yr = uf.find(x), uf.find(y)
        z[i, 0], z[i, 1] = (xr, yr) if xr < yr else (yr, xr)
        z[i, 3] = uf.merge(xr, yr)
    return z


def _max_dists(z: np.ndarray, n: int) -> np.ndarray:
    """maxdists: max cophenetic distance within each merged node."""
    mc = np.zeros(n - 1)
    for i in range(n - 1):
        lc, rc = int(z[i, 0]), int(z[i, 1])
        m = z[i, 2]
        if lc >= n:
            m = max(m, mc[lc - n])
        if rc >= n:
            m = max(m, mc[rc - n])
        mc[i] = m
    return mc


def fcluster_distance(z: np.ndarray, t: float, n: int) -> np.ndarray:
    """Flat clusters with criterion='distance' (scipy cluster_monocrit port:
    DFS from the root, new cluster whenever max-dist drops to <= t)."""
    if n == 1:
        return np.ones(1, dtype=np.int32)
    mc = _max_dists(z, n)
    labels = np.zeros(n, dtype=np.int32)
    visited = np.zeros(2 * n, dtype=bool)
    stack = [2 * n - 2]
    n_cluster = 0
    cluster_leader = -1
    while stack:
        root = stack[-1] - n
        lc, rc = int(z[root, 0]), int(z[root, 1])
        if cluster_leader == -1 and mc[root] <= t:
            cluster_leader = root
            n_cluster += 1
        if lc >= n and not visited[lc]:
            visited[lc] = True
            stack.append(lc)
            continue
        if rc >= n and not visited[rc]:
            visited[rc] = True
            stack.append(rc)
            continue
        if lc < n:
            if cluster_leader == -1:
                n_cluster += 1
            labels[lc] = n_cluster
        if rc < n:
            if cluster_leader == -1:
                n_cluster += 1
            labels[rc] = n_cluster
        if cluster_leader == root:
            cluster_leader = -1
        stack.pop()
    return labels


# ---------------------------------------------------------------------------
# partitioning + clustering drivers (cluster_signatures.py:12-130)
# ---------------------------------------------------------------------------

PARTITION_HARD_LIMIT = 100000  # repeat-region guard (cluster_signatures.py:80-85)


def signature_partition(signatures: Sequence[Signature], options) -> List[List[Signature]]:
    sorted_sigs = sorted(signatures, key=lambda s: s.get_key())
    partitions: List[List[Signature]] = []
    current: List[Signature] = []
    for sig in sorted_sigs:
        if len(current) > options.min_support and \
                current[-1].position_distance_to(sig) > options.patition_max_distance:
            partitions.append(current[:])
            current = []
        current.append(sig)
    if len(current) > options.min_support:
        partitions.append(current[:])
    return partitions


def cluster_partitions(partitions, chrom, coverage_counter, options,
                       logger=None) -> List[Cluster]:
    clusters: List[Cluster] = []
    for partition in partitions:
        if len(partition) > PARTITION_HARD_LIMIT:
            if logger is not None:
                logger.warning(
                    "Partition size large than 100,000, ranging from "
                    f"{chrom}:{partition[0].tstart}-{partition[-1].tstart}")
            continue
        if len(partition) == 1:
            c = Cluster(partition, coverage_counter)
            if c.abandon == 0:
                clusters.append(c)
            continue

        data = np.array([[s.get_source()[1], s.get_source()[2], 1000]
                         for s in partition])
        dists = span_position_pdist(data)
        z = linkage_average(dists, len(partition))
        idx = fcluster_distance(z, options.cluster_max_distance, len(partition))

        groups: List[List[Signature]] = [[] for _ in range(int(idx.max()))]
        for sig_i, cl_i in enumerate(idx):
            groups[cl_i - 1].append(partition[sig_i])
        for group in groups:
            c = Cluster(group, coverage_counter)
            if c.abandon == 0:
                clusters.append(c)

    return sorted(clusters, key=lambda c: (c.contig, (c.cstart + c.cend) / 2))


def partition_and_cluster(signatures, chrom, coverage_counter, options,
                          logger=None) -> List[Cluster]:
    partitions = signature_partition(signatures, options)
    return cluster_partitions(partitions, chrom, coverage_counter, options, logger)
