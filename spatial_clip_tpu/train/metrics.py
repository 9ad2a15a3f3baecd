"""Metrics as pure-JAX accumulator state (functional torchmetrics analogue).

- ``recall_at_k`` / ``ContrastiveMetrics``: in-batch retrieval R@k with
  sum-reducible state (ref: src/models/components/metrics.py:7-52).
- ``ZeroShotGeneExpressionMetric``: rank-weighted gene-expression Pearson r
  (ref: src/metrics/zero_shot.py:6-91).
- ``clip_retrieval_metrics``: full-split retrieval suite — mean/median rank,
  R@1/5/10 in both directions (ref: open_clip_train/train.py:383-400
  ``get_clip_metrics``).

State dicts are plain pytrees of scalars, so they can live inside jitted
steps and be cross-device-reduced with ``psum`` (the dist_reduce_fx="sum"
analogue).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def recall_at_k(logits: jnp.ndarray, targets: jnp.ndarray, k: int) -> jnp.ndarray:
    """Fraction of rows whose target column ranks in the top-k
    (ref: metrics.py:22-36, incl. the k_eff=min(k, n_cols) clamp)."""
    k_eff = min(k, logits.shape[1])
    # rank of the target score: #cols strictly greater
    target_scores = jnp.take_along_axis(logits, targets[:, None], axis=1)
    rank = (logits > target_scores).sum(axis=1)
    return (rank < k_eff).astype(jnp.float32).mean()


class ContrastiveMetrics:
    """R@1/5/10 accumulator with sum-reducible state (ref: metrics.py:39-52)."""

    KS = (1, 5, 10)

    def __init__(self, prefix: str = ""):
        self.prefix = prefix

    def init(self) -> Dict[str, jnp.ndarray]:
        state = {f"correct@{k}": jnp.zeros((), jnp.float32) for k in self.KS}
        state["total"] = jnp.zeros((), jnp.float32)
        return state

    def update(
        self, state: Dict[str, jnp.ndarray], logits: jnp.ndarray, targets: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        n = logits.shape[0]
        new = dict(state)
        target_scores = jnp.take_along_axis(logits, targets[:, None], axis=1)
        rank = (logits > target_scores).sum(axis=1)
        for k in self.KS:
            k_eff = min(k, logits.shape[1])
            new[f"correct@{k}"] = state[f"correct@{k}"] + (rank < k_eff).sum()
        new["total"] = state["total"] + n
        return new

    def compute(self, state: Dict[str, jnp.ndarray]) -> Dict[str, float]:
        total = max(float(state["total"]), 1.0)
        return {
            f"{self.prefix}R@{k}": float(state[f"correct@{k}"]) / total for k in self.KS
        }


def rank_weighted_vectors(
    captions: Sequence[str], gene_to_idx: Dict[str, int], num_genes: int
) -> np.ndarray:
    """Caption -> rank-weighted expression target, weight ``1 - 0.8*rank/n``
    (ref: zero_shot.py:27-60). Host-side (string processing)."""
    out = np.zeros((len(captions), num_genes), dtype=np.float32)
    for i, caption in enumerate(captions):
        genes = caption.split()
        n = len(genes)
        for rank, gene in enumerate(genes):
            idx = gene_to_idx.get(gene)
            if idx is not None:
                out[i, idx] = 1.0 - (0.8 * rank / max(n, 1))
    return out


def pearson_rows(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-row Pearson correlation; 0 where either row is constant
    (ref: zero_shot.py:73-86). Jittable."""
    p = preds - preds.mean(axis=1, keepdims=True)
    t = targets - targets.mean(axis=1, keepdims=True)
    num = (p * t).sum(axis=1)
    den = jnp.sqrt((p**2).sum(axis=1)) * jnp.sqrt((t**2).sum(axis=1))
    return jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), 0.0)


class ZeroShotGeneExpressionMetric:
    """Zero-shot gene-expression PCC via a gene-bank of text embeddings.

    Usage mirrors the reference: precompute ``gene_bank_embeddings`` by
    encoding each HVG symbol (ref: spatial_clip_module.py:73-100), then
    ``update(state, image_features @ bank.T, raw_texts)``.
    """

    def __init__(self, global_hvg_path: Optional[str] = None, genes: Optional[List[str]] = None):
        if genes is None and global_hvg_path:
            with open(global_hvg_path) as f:
                genes = [line.strip() for line in f if line.strip()]
        self.genes = genes or []
        self.gene_to_idx = {g: i for i, g in enumerate(self.genes)}
        self.num_global_genes = len(self.genes)

    def init(self) -> Dict[str, jnp.ndarray]:
        return {
            "sum_pcc": jnp.zeros((), jnp.float32),
            "total": jnp.zeros((), jnp.float32),
        }

    def update(
        self,
        state: Dict[str, jnp.ndarray],
        preds_logits: jnp.ndarray,
        captions: Sequence[str],
    ) -> Dict[str, jnp.ndarray]:
        if self.num_global_genes == 0:
            return state
        targets = jnp.asarray(
            rank_weighted_vectors(captions, self.gene_to_idx, self.num_global_genes)
        )
        pcc = pearson_rows(preds_logits.astype(jnp.float32), targets)
        return {
            "sum_pcc": state["sum_pcc"] + pcc.sum(),
            "total": state["total"] + pcc.shape[0],
        }

    def compute(self, state: Dict[str, jnp.ndarray]) -> float:
        total = float(state["total"])
        return float(state["sum_pcc"]) / total if total > 0 else 0.0


def clip_retrieval_metrics(
    image_features: np.ndarray, text_features: np.ndarray, logit_scale: float = 1.0
) -> Dict[str, float]:
    """Full-split retrieval metrics in both directions
    (ref: open_clip_train/train.py:383-400)."""
    logits_i = logit_scale * np.asarray(image_features) @ np.asarray(text_features).T
    out: Dict[str, float] = {}
    n = logits_i.shape[0]
    gt = np.arange(n)
    for name, logits in (("image_to_text", logits_i), ("text_to_image", logits_i.T)):
        target_scores = logits[gt, gt][:, None]
        ranking = (logits > target_scores).sum(axis=1)  # 0-based rank of gt
        out[f"{name}_mean_rank"] = float(ranking.mean() + 1)
        out[f"{name}_median_rank"] = float(np.floor(np.median(ranking)) + 1)
        for k in (1, 5, 10):
            out[f"{name}_R@{k}"] = float((ranking < k).mean())
    return out
