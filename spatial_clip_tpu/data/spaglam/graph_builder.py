"""Spatial graph utilities (ref: src/spaglam_preproc/core/graph_builder.py:6-49
k-hop BFS over CSR ``obsp['spatial_connectivities']``), plus the graph
construction itself (the reference delegates to squidpy; we build Delaunay/
kNN graphs directly so the dependency stays optional).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import scipy.sparse as sp


def get_k_hop_neighborhood(
    connectivities: sp.spmatrix, start: int, hops: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """BFS up to ``hops`` rings. Returns (node_ids incl. start, hop_distance)."""
    csr = connectivities.tocsr()
    visited = {start: 0}
    frontier = [start]
    for hop in range(1, hops + 1):
        nxt: List[int] = []
        for node in frontier:
            row = csr.indices[csr.indptr[node] : csr.indptr[node + 1]]
            for nbr in row:
                if int(nbr) not in visited:
                    visited[int(nbr)] = hop
                    nxt.append(int(nbr))
        frontier = nxt
        if not frontier:
            break
    nodes = np.fromiter(visited.keys(), dtype=np.int64)
    dists = np.fromiter(visited.values(), dtype=np.int64)
    return nodes, dists


def build_knn_graph(coords: np.ndarray, k: int = 6) -> sp.csr_matrix:
    """Symmetric kNN connectivity over spot coordinates (squidpy-equivalent
    1-ring graph for gridded technologies when k matches the grid degree)."""
    from scipy.spatial import cKDTree

    n = len(coords)
    if n <= 1:
        return sp.csr_matrix((n, n))
    tree = cKDTree(coords)
    kk = min(k + 1, n)
    _, nn = tree.query(coords, k=kk)
    rows = np.repeat(np.arange(n), kk - 1)
    cols = nn[:, 1:].ravel()
    data = np.ones_like(rows, dtype=np.float32)
    g = sp.csr_matrix((data, (rows, cols)), shape=(n, n))
    return ((g + g.T) > 0).astype(np.float32)


def subgraph_edge_list(
    connectivities: sp.spmatrix, nodes: np.ndarray
) -> np.ndarray:
    """Local edge list (2, E) in node-local indices for a BFS neighborhood
    (ref: dataset_writer.py edge_index emission)."""
    csr = connectivities.tocsr()
    pos = {int(n): i for i, n in enumerate(nodes)}
    src, dst = [], []
    for n in nodes:
        row = csr.indices[csr.indptr[int(n)] : csr.indptr[int(n) + 1]]
        for nbr in row:
            if int(nbr) in pos:
                src.append(pos[int(n)])
                dst.append(pos[int(nbr)])
    return np.asarray([src, dst], dtype=np.int64)
