"""Standalone evaluation helpers.

- ``encode_gene_bank``: embed every HVG symbol with the text tower
  (ref: spatial_clip_module.py:73-100 ``on_validation_start`` gene-bank
  precompute — batched, jitted).
- ``zero_shot_gene_expression``: full zero-shot PCC pass over a loader
  (ref: spatial_clip_module.py:116-136 + src/metrics/zero_shot.py).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Iterable, List, Union

import jax
import jax.numpy as jnp
import numpy as np

from spatial_clip_tpu.models.clip import CLIP
from spatial_clip_tpu.models.factory import ModelBundle
from spatial_clip_tpu.models.transforms import normalize_batch
from spatial_clip_tpu.train.metrics import ZeroShotGeneExpressionMetric

log = logging.getLogger(__name__)


def read_gene_list(path: Union[str, Path]) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def encode_gene_bank(
    bundle: ModelBundle,
    params,
    tokenizer: Callable,
    genes: List[str],
    batch_size: int = 256,
) -> np.ndarray:
    """(num_genes, embed_dim) L2-normalized text embeddings, one per symbol."""
    encode = jax.jit(
        lambda p, t: bundle.model.apply({"params": p}, t, True, method=CLIP.encode_text)
    )
    out = []
    pad = (-len(genes)) % batch_size
    padded = genes + ["PAD"] * pad
    for i in range(0, len(padded), batch_size):
        tokens = jnp.asarray(tokenizer(padded[i : i + batch_size]))
        out.append(np.asarray(encode(params, tokens)))
    return np.concatenate(out)[: len(genes)]


def zero_shot_gene_expression(
    bundle: ModelBundle,
    params,
    tokenizer: Callable,
    hvg_path: Union[str, Path],
    loader: Iterable,
    batch_size: int = 256,
) -> float:
    genes = read_gene_list(hvg_path)
    if not genes:
        return 0.0
    bank = encode_gene_bank(bundle, params, tokenizer, genes, batch_size)
    metric = ZeroShotGeneExpressionMetric(genes=genes)
    state = metric.init()

    encode_img = jax.jit(
        lambda p, x: bundle.model.apply({"params": p}, x, True, method=CLIP.encode_image)
    )
    bank_j = jnp.asarray(bank)
    for batch in loader:
        if "raw_text" not in batch:
            continue
        images = batch["images"]
        if images.dtype == np.uint8:
            images = normalize_batch(jnp.asarray(images), dtype=bundle.model.dtype)
        feats = encode_img(params, images)
        logits = feats.astype(jnp.float32) @ bank_j.T
        state = metric.update(state, logits, batch["raw_text"])
    return metric.compute(state)
