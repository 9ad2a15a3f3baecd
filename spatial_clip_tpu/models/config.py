"""Model architecture configuration.

JSON-config compatible with the reference's ``src/open_clip/model_configs/*.json``
schema (ref: src/open_clip/model.py:34-112 ``CLIPVisionCfg``/``CLIPTextCfg``),
so that existing architecture spec files can drive the JAX towers.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

_CONFIG_DIR = Path(__file__).parent / "model_configs"


def _filter_kwargs(cls, cfg: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in cfg.items() if k in names}
    return known


@dataclass
class VisionCfg:
    """Vision tower spec (ViT). Ref: src/open_clip/model.py:34-71."""

    image_size: Union[int, Tuple[int, int]] = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: Optional[int] = None  # default width // 64
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None  # layer-scale
    patch_dropout: float = 0.0
    attentional_pool: bool = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"  # learnable | sin_cos_2d
    final_ln_after_pool: bool = False
    pool_type: str = "tok"  # tok | avg | none
    qk_norm: bool = False
    scaled_cosine: bool = False
    patchify_impl: str = "reshape"  # reshape (GEMM) | conv
    output_tokens: bool = False
    norm_eps: float = 1e-5
    act_kwargs: Optional[Dict[str, Any]] = None
    # timm-style backbone adapter (ref: src/open_clip/model.py:44-50,
    # timm_model.py:23-145). When timm_model_name is set the tower is a
    # TimmStyleTower over a TPU-native trunk registry.
    timm_model_name: Optional[str] = None
    timm_model_pretrained: bool = False
    timm_pool: str = "avg"  # avg | '' | abs_attn | rot_attn
    timm_proj: str = "linear"  # linear | mlp | none
    timm_proj_bias: bool = False
    timm_drop: float = 0.0
    timm_drop_path: Optional[float] = None

    def __post_init__(self):
        if self.heads is None:
            self.heads = max(1, self.width // 64)

    @property
    def grid_size(self) -> Tuple[int, int]:
        im = self.image_size
        if isinstance(im, (tuple, list)):
            return (im[0] // self.patch_size, im[1] // self.patch_size)
        return (im // self.patch_size, im // self.patch_size)


@dataclass
class TextCfg:
    """Text tower spec. Ref: src/open_clip/model.py:74-112."""

    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    embed_cls: bool = False
    pad_id: int = 0
    no_causal_mask: bool = False
    final_ln_after_pool: bool = False
    pool_type: str = "argmax"  # argmax (EOT) | last | first | avg | none
    qk_norm: bool = False
    proj_bias: bool = False
    norm_eps: float = 1e-5
    hf_tokenizer_name: Optional[str] = None
    # HF text tower (ref: model.py CLIPTextCfg hf_model_name/pooler/proj)
    hf_model_name: Optional[str] = None  # hub id (pretrained; needs network)
    # None -> inferred from hf_model_name (the reference resolves it from the
    # hub AutoConfig.model_type, hf_model.py:109; offline we match the name)
    hf_model_arch: Optional[str] = None
    hf_config: Optional[Dict[str, Any]] = None  # offline local config kwargs
    hf_pooler_type: str = "mean_pooler"
    hf_proj_type: str = "linear"

    def __post_init__(self):
        if self.hf_model_arch is None:
            self.hf_model_arch = (
                infer_hf_arch(self.hf_model_name) if self.hf_model_name
                else "bert"
            )
        # arch-correct pad token (the reference reads config.pad_token_id
        # from the hub config): m2m_100/roberta families pad with 1,
        # bert/t5 with 0. Applies whether the arch was inferred or set
        # explicitly — an explicit arch must not skip the pad fix.
        if (
            (self.hf_model_name or self.hf_config is not None)
            and self.hf_model_arch in ("m2m_100", "roberta", "xlm-roberta")
            and self.pad_id == 0
        ):
            self.pad_id = 1


def infer_hf_arch(name: str) -> str:
    """hub-id -> HF arch family (ref hf_configs.py arch_dict keys), matched
    offline by name: nllb-clip's text tower is the m2m_100 encoder
    (ref: hf_configs.py:57-70)."""
    n = name.lower()
    if "nllb" in n or "m2m" in n:
        return "m2m_100"
    if "xlm-roberta" in n or "xlm_roberta" in n:
        return "xlm-roberta"
    if "roberta" in n:
        return "roberta"
    if "mt5" in n:
        return "mt5"
    if "t5" in n:
        return "t5"
    return "bert"


@dataclass
class GeneCfg:
    """Gene-expression MLP tower spec (TPU-native extension).

    Encodes rank-weighted gene-expression vectors directly with an MLP —
    a faster alternative to running the 77-token text transformer over
    gene sentences (north-star config 1: "gene-MLP tower").
    """

    num_genes: int = 5000
    width: int = 1024
    layers: int = 3
    gene_dropout: float = 0.0  # train-time random gene masking (augmentation)
    norm_eps: float = 1e-5


@dataclass
class MultimodalCfg:
    """CoCa multimodal decoder spec (ref: coca_model.py MultimodalCfg)."""

    layers: int = 6
    caption_queries: int = 64
    caption_loss_weight: float = 2.0
    contrastive_loss_weight: float = 1.0


@dataclass
class CLIPCfg:
    """Top-level two-tower spec."""

    embed_dim: int = 512
    vision_cfg: VisionCfg = field(default_factory=VisionCfg)
    text_cfg: TextCfg = field(default_factory=TextCfg)
    gene_cfg: Optional[GeneCfg] = None  # if set, replaces the text tower
    multimodal_cfg: Optional[MultimodalCfg] = None  # if set, builds CoCa
    # einsum (explicit fp32-softmax) measures ~5% faster than the fused
    # dot_product_attention at CLIP sequence lengths (50/77 tokens) on v5e
    # auto = pallas fused kernel on TPU (measured 103.7 vs 123.1 ms/step on
    # ViT-B-32, docs/experiments.md), einsum elsewhere (interpret-mode pallas
    # is slow on CPU). Other values: einsum | einsum_bf16 | fold | fold_bf16 |
    # xla (fused dot_product_attention) | pallas (force the kernel).
    attn_impl: str = "auto"
    # Zipped dual-tower attention: run image layer-i and text layer-i
    # attention in ONE Pallas custom call (halves the per-step custom-call
    # count; ops/fused_attention.fused_attention_pair). auto = zip when both
    # towers are standard equal-depth transformers and the Pallas kernel is
    # active (TPU); on = force (interpret-mode off-TPU, for tests);
    # off = always separate calls. Default OFF: measured +1.0 ms/step on the
    # parity config (reports/ab_zip_r3.json) — the merged call creates a
    # per-layer cross-tower join, costing XLA more pipelining freedom than
    # the halved invocation count saves (docs/experiments.md round 3).
    zip_towers: str = "off"
    mlp_impl: str = "dense"  # dense | pallas (experimental fused MLP kernel)
    # dense | pallas — fuse each block's pre-LN into its qkv/fc projection
    # (ops/fused_ln_dense; targets the profiled convert_reduce LN family)
    ln_gemm_impl: str = "dense"
    # onepass (default: fp32 E[x^2]-E[x]^2 — both LN stats in a single fused
    # reduction pass over x; measured 101.3 vs 103.5 ms/step on the parity
    # config, reports/ab_hybrid_r2.json; equal math in exact arithmetic,
    # <1e-5 relative difference in fp32) | fp32 (two-pass (x-mean)^2,
    # reference formulation) | compute (bf16 stats experiment).
    # CAVEAT: E[x^2]-E[x]^2 is cancellation-prone when |mean| >> std (e.g.
    # extreme outlier channels in some pretrained ViT late layers), and the
    # max(var, 0) clamp can zero the variance in that regime. The <1e-5
    # bound above was measured on the parity config's activation scales;
    # when importing checkpoints from architectures known for outlier
    # activations, set ln_impl='fp32' to recover the reference's two-pass
    # formulation exactly.
    ln_impl: str = "onepass"
    init_logit_scale: float = 2.6592  # ln(1/0.07)
    init_logit_bias: Optional[float] = None  # SigLIP-style bias
    quick_gelu: bool = False

    @classmethod
    def from_dict(cls, cfg: Dict[str, Any]) -> "CLIPCfg":
        cfg = dict(cfg)
        vision = cfg.pop("vision_cfg", {}) or {}
        text = cfg.pop("text_cfg", {}) or {}
        gene = cfg.pop("gene_cfg", None)
        multimodal = cfg.pop("multimodal_cfg", None)
        known = _filter_kwargs(cls, cfg)
        return cls(
            vision_cfg=VisionCfg(**_filter_kwargs(VisionCfg, vision)),
            text_cfg=TextCfg(**_filter_kwargs(TextCfg, text)),
            gene_cfg=GeneCfg(**_filter_kwargs(GeneCfg, gene)) if gene else None,
            multimodal_cfg=(
                MultimodalCfg(**_filter_kwargs(MultimodalCfg, multimodal))
                if multimodal
                else None
            ),
            **known,
        )


# user-registered configs (ref: factory.py add_model_config) — an overlay
# consulted before the built-in JSON directory
_EXTRA_CONFIGS: Dict[str, Dict[str, Any]] = {}


def register_model_config(name: str, cfg: Dict[str, Any]) -> None:
    """Register an architecture config dict under ``name`` (overlay; wins
    over a built-in of the same name). Ref: src/open_clip/factory.py:62-77
    add_model_config."""
    _EXTRA_CONFIGS[name.replace("/", "-")] = dict(cfg)


def add_model_config(path) -> None:
    """Register every ``*.json`` model config under ``path`` (a file or a
    directory), matching the reference's API (factory.py:62-77)."""
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"add_model_config: {p} does not exist")
    files = [p] if p.is_file() else sorted(p.glob("*.json"))
    if not files or any(f.suffix.lower() != ".json" for f in files):
        raise ValueError(
            f"add_model_config: {p} contains no .json model configs"
        )
    for f in files:
        register_model_config(f.stem, json.loads(f.read_text()))


def list_model_configs() -> list:
    """All architecture names, built-in + registered (ref: factory.py:56)."""
    return sorted(
        {p.stem for p in _CONFIG_DIR.glob("*.json")} | set(_EXTRA_CONFIGS)
    )


def hf_cache_snapshot(repo: str):
    """Newest local HF-hub cache snapshot of ``repo`` that carries an
    ``open_clip_config.json``, or None. Honors $HF_HUB_CACHE (the canonical
    hub-cache variable), $HUGGINGFACE_HUB_CACHE (legacy) and $HF_HOME
    (the standard hub cache layout: hub/models--org--name/snapshots/<rev>/)."""
    import os

    roots = []
    for var in ("HF_HUB_CACHE", "HUGGINGFACE_HUB_CACHE"):
        if os.environ.get(var):
            roots.append(Path(os.environ[var]))
    home = Path(os.environ.get("HF_HOME",
                               Path.home() / ".cache" / "huggingface"))
    roots.append(home / "hub")
    for root in roots:
        snaps = root / ("models--" + repo.replace("/", "--")) / "snapshots"
        if not snaps.is_dir():
            continue
        for snap in sorted(snaps.iterdir(),
                           key=lambda p: p.stat().st_mtime, reverse=True):
            if (snap / "open_clip_config.json").is_file():
                return snap
    return None


def load_model_config(model_name: str) -> Dict[str, Any]:
    """Resolve a model name to its raw JSON config dict.

    Accepts a built-in name (``ViT-B-32``), a path to a ``.json`` file, or a
    ``local-dir:`` prefix pointing at a directory containing
    ``open_clip_config.json`` (ref: src/open_clip/factory.py:251-320).
    """
    if model_name.startswith("hf-hub:"):
        repo = model_name[len("hf-hub:"):]
        snap = hf_cache_snapshot(repo)
        if snap is None:
            raise ValueError(
                f"'{model_name}' resolves through the HF hub "
                f"(ref factory.py:251-320); no cached snapshot with "
                f"open_clip_config.json found under the HF cache and this "
                f"environment has no network. Populate the cache (e.g. "
                f"`huggingface-cli download {repo}`) or pass a local-dir:/"
                f".json config."
            )
        cfg = json.loads((snap / "open_clip_config.json").read_text())
        return cfg.get("model_cfg", cfg)
    name = model_name.replace("/", "-")
    if name in _EXTRA_CONFIGS:
        return dict(_EXTRA_CONFIGS[name])
    builtin = _CONFIG_DIR / f"{name}.json"
    if builtin.exists():
        return json.loads(builtin.read_text())
    p = Path(model_name)
    if p.suffix == ".json" and p.exists():
        return json.loads(p.read_text())
    if model_name.startswith("local-dir:"):
        d = Path(model_name[len("local-dir:"):])
        cfg_file = d / "open_clip_config.json"
        cfg = json.loads(cfg_file.read_text())
        return cfg.get("model_cfg", cfg)
    raise ValueError(
        f"Unknown model '{model_name}'. Built-ins: {list_model_configs()}"
    )


def resolve_clip_cfg(model_name: str, **overrides) -> CLIPCfg:
    raw = load_model_config(model_name)
    for key, value in overrides.items():
        if (
            key in ("vision_cfg", "text_cfg", "gene_cfg", "multimodal_cfg")
            and isinstance(value, dict)
            and isinstance(raw.get(key), dict)
        ):
            raw[key] = {**raw[key], **value}  # merge, don't replace
        else:
            raw[key] = value
    return CLIPCfg.from_dict(raw)
