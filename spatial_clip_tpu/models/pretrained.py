"""Pretrained checkpoint registry (ref: src/open_clip/pretrained.py:40-92,733,880).

Tags map to public checkpoint URLs (open_clip-compatible torch weights, which
``models.convert`` translates to JAX pytrees). Downloads are gated: in
offline/airgapped environments ``download_pretrained`` returns None and the
caller falls back to random init or a local path.
"""
from __future__ import annotations

import hashlib
import logging
import os
import urllib.request
from pathlib import Path
from typing import Dict, Optional

log = logging.getLogger(__name__)

_HF_URL = "https://huggingface.co/{repo}/resolve/main/{filename}"


def _hf(repo: str, filename: str = "open_clip_pytorch_model.bin") -> Dict[str, str]:
    return {"url": _HF_URL.format(repo=repo, filename=filename)}


# tag registry keyed (model_name, tag) — mirrors the reference's most-used entries
_PRETRAINED: Dict[str, Dict[str, Dict[str, str]]] = {
    "ViT-B-32": {
        "openai": _hf("timm/vit_base_patch32_clip_224.openai"),
        "laion2b_s34b_b79k": _hf("laion/CLIP-ViT-B-32-laion2B-s34B-b79K"),
        "laion2b_e16": _hf("laion/CLIP-ViT-B-32-laion2B-e16"),
        "datacomp_xl_s13b_b90k": _hf("laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K"),
    },
    "ViT-B-16": {
        "openai": _hf("timm/vit_base_patch16_clip_224.openai"),
        "laion2b_s34b_b88k": _hf("laion/CLIP-ViT-B-16-laion2B-s34B-b88K"),
    },
    "ViT-L-14": {
        "openai": _hf("timm/vit_large_patch14_clip_224.openai"),
        "laion2b_s32b_b82k": _hf("laion/CLIP-ViT-L-14-laion2B-s32B-b82K"),
    },
    "ViT-H-14": {
        "laion2b_s32b_b79k": _hf("laion/CLIP-ViT-H-14-laion2B-s32B-b79K"),
    },
    "ViT-bigG-14": {
        "laion2b_s39b_b160k": _hf("laion/CLIP-ViT-bigG-14-laion2B-39B-b160k"),
    },
}


def list_pretrained():
    """All (model, tag) pairs (ref: pretrained.py:733)."""
    return [(m, t) for m, tags in _PRETRAINED.items() for t in tags]


def list_pretrained_tags_by_model(model_name: str):
    return sorted(_PRETRAINED.get(model_name, {}))


def get_pretrained_cfg(model_name: str, tag: str) -> Optional[Dict[str, str]]:
    return _PRETRAINED.get(model_name, {}).get(tag)


def _cache_dir() -> Path:
    d = Path(os.environ.get("SPATIAL_CLIP_CACHE", Path.home() / ".cache" / "spatial_clip_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def download_pretrained(
    model_name: str, tag: str, cache_dir: Optional[str] = None
) -> Optional[str]:
    """Resolve a registry tag to a local file, downloading if possible
    (ref: pretrained.py:880). Returns None when offline or unknown."""
    cfg = get_pretrained_cfg(model_name, tag)
    if cfg is None:
        return None
    url = cfg["url"]
    digest = hashlib.sha256(url.encode()).hexdigest()[:16]
    target = Path(cache_dir or _cache_dir()) / f"{model_name}-{tag}-{digest}.bin"
    if target.exists():
        return str(target)
    try:
        log.info("Downloading %s -> %s", url, target)
        urllib.request.urlretrieve(url, target)  # nosec - known registry URLs
        return str(target)
    except Exception as e:  # offline / DNS blocked
        log.warning("Could not download pretrained weights (%s); offline?", e)
        return None
