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


def _openai(name: str) -> Dict[str, str]:
    """OpenAI CLIP TorchScript archives (ref: pretrained.py openai entries;
    load_torch_state_dict falls back to jit.load for these)."""
    return {
        "url": f"https://openaipublic.azureedge.net/clip/models/{name}",
        "format": "openai",
    }


# tag registry keyed (model_name, tag) — mirrors the reference registry's
# public-hub surface (ref: src/open_clip/pretrained.py:430-732). Every URL is
# an open_clip-compatible torch state dict unless format says otherwise;
# models.convert handles open_clip / openai-TorchScript / big_vision /
# MobileCLIP flavors via detect_checkpoint_flavor.
_PRETRAINED: Dict[str, Dict[str, Dict[str, str]]] = {
    "RN50": {
        "openai": _openai("afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt"),
        "yfcc15m": _hf("timm/resnet50_clip.yfcc15m"),
        "cc12m": _hf("timm/resnet50_clip.cc12m"),
    },
    "RN101": {
        "openai": _openai("8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt"),
        "yfcc15m": _hf("timm/resnet101_clip.yfcc15m"),
    },
    "RN50x4": {"openai": _openai("7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt")},
    "RN50x16": {"openai": _openai("52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt")},
    "RN50x64": {"openai": _openai("be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt")},
    "ViT-B-32": {
        "openai": _openai("40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt"),
        "laion2b_s34b_b79k": _hf("laion/CLIP-ViT-B-32-laion2B-s34B-b79K"),
        "laion2b_e16": _hf("laion/CLIP-ViT-B-32-laion2B-e16"),
        "laion400m_e31": _hf("timm/vit_base_patch32_clip_224.laion400m_e31"),
        "laion400m_e32": _hf("timm/vit_base_patch32_clip_224.laion400m_e32"),
        "datacomp_xl_s13b_b90k": _hf("laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K"),
        "datacomp_m_s128m_b4k": _hf("laion/CLIP-ViT-B-32-DataComp.M-s128M-b4K"),
        "datacomp_s_s13m_b4k": _hf("laion/CLIP-ViT-B-32-DataComp.S-s13M-b4K"),
        "commonpool_m_clip_s128m_b4k": _hf("laion/CLIP-ViT-B-32-CommonPool.M.clip-s128M-b4K"),
        "commonpool_s_clip_s13m_b4k": _hf("laion/CLIP-ViT-B-32-CommonPool.S.clip-s13M-b4K"),
    },
    "ViT-B-32-256": {
        "datacomp_s34b_b86k": _hf("laion/CLIP-ViT-B-32-256x256-DataComp-s34B-b86K"),
    },
    "ViT-B-16": {
        "openai": _openai("5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt"),
        "laion400m_e31": _hf("timm/vit_base_patch16_clip_224.laion400m_e31"),
        "laion400m_e32": _hf("timm/vit_base_patch16_clip_224.laion400m_e32"),
        "laion2b_s34b_b88k": _hf("laion/CLIP-ViT-B-16-laion2B-s34B-b88K"),
        "datacomp_xl_s13b_b90k": _hf("laion/CLIP-ViT-B-16-DataComp.XL-s13B-b90K"),
        "datacomp_l_s1b_b8k": _hf("laion/CLIP-ViT-B-16-DataComp.L-s1B-b8K"),
        "dfn2b": _hf("apple/DFN2B-CLIP-ViT-B-16"),
    },
    "ViT-B-16-plus-240": {
        "laion400m_e31": _hf("timm/vit_base_patch16_plus_clip_240.laion400m_e31"),
        "laion400m_e32": _hf("timm/vit_base_patch16_plus_clip_240.laion400m_e32"),
    },
    "ViT-L-14": {
        "openai": _openai("b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt"),
        "laion400m_e31": _hf("timm/vit_large_patch14_clip_224.laion400m_e31"),
        "laion400m_e32": _hf("timm/vit_large_patch14_clip_224.laion400m_e32"),
        "laion2b_s32b_b82k": _hf("laion/CLIP-ViT-L-14-laion2B-s32B-b82K"),
        "datacomp_xl_s13b_b90k": _hf("laion/CLIP-ViT-L-14-DataComp.XL-s13B-b90K"),
        "commonpool_xl_clip_s13b_b90k": _hf("laion/CLIP-ViT-L-14-CommonPool.XL.clip-s13B-b90K"),
        "dfn2b": _hf("apple/DFN2B-CLIP-ViT-L-14"),
    },
    "ViT-L-14-336": {
        "openai": _openai("3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt"),
    },
    "ViT-H-14": {
        "laion2b_s32b_b79k": _hf("laion/CLIP-ViT-H-14-laion2B-s32B-b79K"),
    },
    "ViT-H-14-378": {"dfn5b": _hf("apple/DFN5B-CLIP-ViT-H-14-378")},
    "ViT-g-14": {
        "laion2b_s12b_b42k": _hf("laion/CLIP-ViT-g-14-laion2B-s12B-b42K"),
        "laion2b_s34b_b88k": _hf("laion/CLIP-ViT-g-14-laion2B-s34B-b88K"),
    },
    "ViT-bigG-14": {
        "laion2b_s39b_b160k": _hf("laion/CLIP-ViT-bigG-14-laion2B-39B-b160k"),
    },
    "roberta-ViT-B-32": {
        "laion2b_s12b_b32k": _hf("laion/CLIP-ViT-B-32-roberta-base-laion2B-s12B-b32k"),
    },
    "xlm-roberta-base-ViT-B-32": {
        "laion5b_s13b_b90k": _hf("laion/CLIP-ViT-B-32-xlm-roberta-base-laion5B-s13B-b90k"),
    },
    "xlm-roberta-large-ViT-H-14": {
        "frozen_laion5b_s13b_b90k": _hf("laion/CLIP-ViT-H-14-frozen-xlm-roberta-large-laion5B-s13B-b90k"),
    },
    "convnext_base": {
        "laion400m_s13b_b51k": _hf("laion/CLIP-convnext_base-laion400M-s13B-b51K"),
    },
    "convnext_base_w": {
        "laion2b_s13b_b82k": _hf("laion/CLIP-convnext_base_w-laion2B-s13B-b82K"),
        "laion_aesthetic_s13b_b82k": _hf("laion/CLIP-convnext_base_w-laion_aesthetic-s13B-b82K"),
    },
    "convnext_base_w_320": {
        "laion_aesthetic_s13b_b82k": _hf("laion/CLIP-convnext_base_w_320-laion_aesthetic-s13B-b82K"),
    },
    "convnext_large_d": {
        "laion2b_s26b_b102k_augreg": _hf("laion/CLIP-convnext_large_d.laion2B-s26B-b102K-augreg"),
    },
    "convnext_large_d_320": {
        "laion2b_s29b_b131k_ft": _hf("laion/CLIP-convnext_large_d_320.laion2B-s29B-b131K-ft"),
        "laion2b_s29b_b131k_ft_soup": _hf("laion/CLIP-convnext_large_d_320.laion2B-s29B-b131K-ft-soup"),
    },
    "convnext_xxlarge": {
        "laion2b_s34b_b82k_augreg": _hf("laion/CLIP-convnext_xxlarge-laion2B-s34B-b82K-augreg"),
        "laion2b_s34b_b82k_augreg_soup": _hf("laion/CLIP-convnext_xxlarge-laion2B-s34B-b82K-augreg-soup"),
    },
    "coca_ViT-B-32": {
        "laion2b_s13b_b90k": _hf("laion/CoCa-ViT-B-32-laion2B-s13B-b90k"),
        "mscoco_finetuned_laion2b_s13b_b90k": _hf("laion/mscoco_finetuned_CoCa-ViT-B-32-laion2B-s13B-b90k"),
    },
    "coca_ViT-L-14": {
        "laion2b_s13b_b90k": _hf("laion/CoCa-ViT-L-14-laion2B-s13B-b90k"),
        "mscoco_finetuned_laion2b_s13b_b90k": _hf("laion/mscoco_finetuned_CoCa-ViT-L-14-laion2B-s13B-b90k"),
    },
    "EVA02-B-16": {"merged2b_s8b_b131k": _hf("timm/eva02_base_patch16_clip_224.merged2b_s8b_b131k")},
    "EVA02-L-14": {"merged2b_s4b_b131k": _hf("timm/eva02_large_patch14_clip_224.merged2b_s4b_b131k")},
    "ViT-B-16-SigLIP": {"webli": _hf("timm/ViT-B-16-SigLIP")},
    "ViT-B-16-SigLIP-256": {"webli": _hf("timm/ViT-B-16-SigLIP-256")},
    "ViT-B-16-SigLIP-384": {"webli": _hf("timm/ViT-B-16-SigLIP-384")},
    "ViT-L-16-SigLIP-256": {"webli": _hf("timm/ViT-L-16-SigLIP-256")},
    "ViT-L-16-SigLIP-384": {"webli": _hf("timm/ViT-L-16-SigLIP-384")},
    "ViT-SO400M-14-SigLIP": {"webli": _hf("timm/ViT-SO400M-14-SigLIP")},
    "ViT-SO400M-14-SigLIP-384": {"webli": _hf("timm/ViT-SO400M-14-SigLIP-384")},
    "ViT-B-32-SigLIP2-256": {"webli": _hf("timm/ViT-B-32-SigLIP2-256")},
    "ViT-B-16-SigLIP2": {"webli": _hf("timm/ViT-B-16-SigLIP2")},
    "ViT-L-16-SigLIP2-256": {"webli": _hf("timm/ViT-L-16-SigLIP2-256")},
    "ViT-SO400M-14-SigLIP2": {"webli": _hf("timm/ViT-SO400M-14-SigLIP2")},
    "ViT-gopt-16-SigLIP2-256": {"webli": _hf("timm/ViT-gopt-16-SigLIP2-256")},
    "ViT-L-14-CLIPA": {"datacomp1b": _hf("UCSC-VLAA/ViT-L-14-CLIPA-datacomp1B")},
    "ViT-H-14-CLIPA": {"datacomp1b": _hf("UCSC-VLAA/ViT-H-14-CLIPA-datacomp1B")},
    "ViT-bigG-14-CLIPA-336": {"datacomp1b": _hf("UCSC-VLAA/ViT-bigG-14-CLIPA-336-datacomp1B")},
    "MobileCLIP-S1": {"datacompdr": _hf("apple/MobileCLIP-S1-OpenCLIP")},
    "MobileCLIP-S2": {"datacompdr": _hf("apple/MobileCLIP-S2-OpenCLIP")},
    "MobileCLIP-B": {
        "datacompdr": _hf("apple/MobileCLIP-B-OpenCLIP"),
        "datacompdr_lt": _hf("apple/MobileCLIP-B-LT-OpenCLIP"),
    },
    "ViT-L-14-quickgelu": {
        "metaclip_400m": _hf("timm/vit_large_patch14_clip_224.metaclip_400m"),
        "metaclip_fullcc": _hf("timm/vit_large_patch14_clip_224.metaclip_2pt5b"),
        "dfn2b": _hf("apple/DFN2B-CLIP-ViT-L-14"),
    },
    "ViT-B-32-quickgelu": {
        "metaclip_400m": _hf("timm/vit_base_patch32_clip_224.metaclip_400m"),
        "metaclip_fullcc": _hf("timm/vit_base_patch32_clip_224.metaclip_2pt5b"),
    },
    "ViT-B-16-quickgelu": {
        "metaclip_400m": _hf("timm/vit_base_patch16_clip_224.metaclip_400m"),
        "metaclip_fullcc": _hf("timm/vit_base_patch16_clip_224.metaclip_2pt5b"),
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
