"""Gene-sentence generation (ref: src/spaglam_preproc/core/gene_encoder.py:5-29).

A "gene sentence" is the space-separated list of the top-N expressed gene
symbols for a spot, ordered by descending expression (ties broken by gene
order for determinism). Zero-expression genes never enter the sentence.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def top_k_gene_indices(expression: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k nonzero entries, expression-descending, stable."""
    expression = np.asarray(expression).ravel()
    k = min(k, expression.size)
    # stable argsort on -expr keeps deterministic tie order
    order = np.argsort(-expression, kind="stable")[:k]
    return order[expression[order] > 0]


def generate_gene_sentence(
    expression: np.ndarray, gene_names: Sequence[str], n_top_genes: int = 50
) -> str:
    idx = top_k_gene_indices(expression, n_top_genes)
    return " ".join(str(gene_names[i]) for i in idx)


def batch_gene_sentences(
    X, gene_names: Sequence[str], n_top_genes: int = 50
) -> List[str]:
    """Vectorized sentence generation over a (n_spots, n_genes) matrix."""
    import scipy.sparse as sp

    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X)
    k = min(n_top_genes, X.shape[1])
    order = np.argsort(-X, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(X, order, axis=1)
    names = np.asarray(list(gene_names), dtype=object)
    return [
        " ".join(names[row[v > 0]].tolist())
        for row, v in zip(order, vals)
    ]
