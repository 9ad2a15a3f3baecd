"""Zero-shot classification (ref: src/open_clip/zero_shot_classifier.py:21-69
``build_zero_shot_classifier`` + open_clip_train/zero_shot.py:45-86).

Builds a classifier matrix by embedding classname x template prompts with the
text tower (batched under jit), then evaluates top-1/top-5 accuracy of image
features against it.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spatial_clip_tpu.models.clip import CLIP
from spatial_clip_tpu.models.factory import ModelBundle

OPENAI_IMAGENET_TEMPLATES = (
    lambda c: f"a bad photo of a {c}.",
    lambda c: f"a photo of many {c}.",
    lambda c: f"a photo of the hard to see {c}.",
    lambda c: f"a low resolution photo of the {c}.",
    lambda c: f"a bad photo of the {c}.",
    lambda c: f"a cropped photo of the {c}.",
    lambda c: f"a photo of a hard to see {c}.",
    lambda c: f"a bright photo of a {c}.",
    lambda c: f"a photo of a clean {c}.",
    lambda c: f"a photo of a dirty {c}.",
    lambda c: f"a dark photo of the {c}.",
    lambda c: f"a photo of my {c}.",
    lambda c: f"a photo of the cool {c}.",
    lambda c: f"a close-up photo of a {c}.",
    lambda c: f"a black and white photo of the {c}.",
    lambda c: f"a photo of a {c}.",
    lambda c: f"a photo of the {c}.",
    lambda c: f"a good photo of the {c}.",
    lambda c: f"a photo of one {c}.",
    lambda c: f"a photo of a small {c}.",
)

SIMPLE_TEMPLATES = (lambda c: f"a photo of a {c}.",)


def build_zero_shot_classifier(
    bundle: ModelBundle,
    params,
    tokenizer: Callable,
    classnames: Sequence[str],
    templates: Sequence[Callable[[str], str]] = SIMPLE_TEMPLATES,
    num_classes_per_batch: int = 10,
) -> np.ndarray:
    """(embed_dim, n_classes) classifier of template-averaged, L2-normalized
    class embeddings (ref: zero_shot_classifier.py:21-69)."""
    encode = jax.jit(
        lambda p, t: bundle.model.apply({"params": p}, t, True, method=CLIP.encode_text)
    )
    n_t = len(templates)
    cols = []
    for i in range(0, len(classnames), num_classes_per_batch):
        batch_classes = classnames[i : i + num_classes_per_batch]
        texts = [t(c) for c in batch_classes for t in templates]
        tokens = jnp.asarray(tokenizer(texts))
        emb = np.asarray(encode(params, tokens))  # (C*T, D)
        emb = emb.reshape(len(batch_classes), n_t, -1).mean(axis=1)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12
        cols.append(emb)
    return np.concatenate(cols).T  # (D, n_classes)


def accuracy(logits: np.ndarray, target: np.ndarray, topk=(1,)) -> List[float]:
    """Ref: open_clip_train/zero_shot.py accuracy helper."""
    order = np.argsort(-logits, axis=1)
    out = []
    for k in topk:
        out.append(float((order[:, :k] == target[:, None]).any(axis=1).mean()))
    return out


def zero_shot_eval(
    bundle: ModelBundle,
    params,
    classifier: np.ndarray,
    loader: Iterable,
    logit_scale: Optional[float] = None,
) -> dict:
    """Top-1/top-5 over a loader yielding {'images', 'label'} batches
    (ref: zero_shot.py:45-86)."""
    from spatial_clip_tpu.models.transforms import normalize_batch

    encode = jax.jit(
        lambda p, x: bundle.model.apply({"params": p}, x, True, method=CLIP.encode_image)
    )
    clf = jnp.asarray(classifier)
    n = top1 = top5 = 0
    for batch in loader:
        images = batch["images"]
        if images.dtype == np.uint8:
            images = normalize_batch(jnp.asarray(images), dtype=bundle.model.dtype)
        feats = encode(params, images)
        logits = np.asarray(feats.astype(jnp.float32) @ clf)
        target = np.asarray(batch["label"])
        a1, a5 = accuracy(logits, target, topk=(1, min(5, logits.shape[1])))
        bs = len(target)
        top1 += a1 * bs
        top5 += a5 * bs
        n += bs
    return {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}


# ---------------------------------------------------------------------------
# ImageNet metadata (ref: src/open_clip/zero_shot_metadata.py:1-266).
# The classnames + prompt templates are the public OpenAI CLIP data assets
# (same status as the BPE merges file); vendored as JSON data, not code.
# ---------------------------------------------------------------------------

_METADATA_PATH = (
    Path(__file__).parents[1] / "models" / "zero_shot_metadata.json"
)


def load_imagenet_metadata(template_set: str = "openai"):
    """Return (classnames, templates) where templates are callables
    ``t(classname) -> prompt`` (ref: zero_shot_metadata.py, zero_shot.py:66)."""
    import json

    data = json.loads(_METADATA_PATH.read_text())
    key = {
        "openai": "openai_imagenet_templates",
        "simple": "simple_imagenet_templates",
    }[template_set]
    templates = tuple(
        (lambda c, f=fmt: f.format(c)) for fmt in data[key]
    )
    return tuple(data["imagenet_classnames"]), templates


def imagenet_zero_shot_eval(
    bundle: ModelBundle,
    params,
    tokenizer: Callable,
    loader: Iterable,
    template_set: str = "openai",
    classnames: Optional[Sequence[str]] = None,
) -> dict:
    """End-to-end ImageNet zero-shot: build the 1000-way classifier from the
    vendored metadata, evaluate top-1/top-5 (ref: open_clip_train/
    zero_shot.py:45-86, main.py --imagenet-val path)."""
    meta_names, templates = load_imagenet_metadata(template_set)
    names = tuple(classnames) if classnames is not None else meta_names
    clf = build_zero_shot_classifier(bundle, params, tokenizer, names, templates)
    res = zero_shot_eval(bundle, params, clf, loader)
    return {
        "imagenet-zeroshot-val-top1": res["top1"],
        "imagenet-zeroshot-val-top5": res["top5"],
    }
