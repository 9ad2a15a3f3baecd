"""Model/tokenizer/transform factory (ref: src/open_clip/factory.py).

API parity targets: ``create_model`` (factory.py:251), ``create_model_and_
transforms`` (:829-966), ``get_tokenizer`` (:628), ``list_models`` (:56),
``load_checkpoint`` (:181-225) — re-shaped for JAX: a model is an immutable
flax module plus a params pytree, bundled in :class:`ModelBundle`.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from spatial_clip_tpu.models.clip import CLIP
from spatial_clip_tpu.models.config import (
    CLIPCfg,
    list_model_configs,
    resolve_clip_cfg,
)
from spatial_clip_tpu.models.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from spatial_clip_tpu.models.tokenizer import (
    DEFAULT_CONTEXT_LENGTH,
    GeneTokenizer,
    HashTokenizer,
    HFTokenizer,
    SimpleTokenizer,
)
from spatial_clip_tpu.models.transforms import (
    AugmentationCfg,
    HostImageTransform,
    PreprocessCfg,
    image_transform,
)

log = logging.getLogger(__name__)

_PRECISION_DTYPES = {
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "amp_bf16": jnp.bfloat16,
    "pure_bf16": jnp.bfloat16,
}


def list_models():
    """Enumerate built-in architectures (ref: factory.py:56)."""
    return list_model_configs()


@dataclass
class ModelBundle:
    """A flax CLIP module + its params and metadata.

    The JAX-idiomatic analogue of the reference's stateful nn.Module: all
    methods are pure functions of ``params`` so they can be jitted/pjitted
    freely by the caller.
    """

    model: CLIP
    params: Any
    cfg: CLIPCfg
    model_name: str = ""
    preprocess_cfg: PreprocessCfg = field(default_factory=PreprocessCfg)

    def encode_image(self, images, params=None, normalize: bool = True):
        return self.model.apply(
            {"params": self.params if params is None else params},
            images,
            normalize,
            method=type(self.model).encode_image,
        )

    def encode_text(self, text, params=None, normalize: bool = True):
        return self.model.apply(
            {"params": self.params if params is None else params},
            text,
            normalize,
            method=type(self.model).encode_text,
        )

    def __call__(self, images=None, text=None, params=None, deterministic=True, rngs=None):
        return self.model.apply(
            {"params": self.params if params is None else params},
            images,
            text,
            deterministic,
            rngs=rngs,
        )

    def forward_intermediates(self, image=None, text=None, **kwargs):
        """Per-block intermediate features (ref: model.py:356-452). See
        :func:`spatial_clip_tpu.models.intermediates.forward_intermediates`
        for the full argument contract."""
        from spatial_clip_tpu.models.intermediates import forward_intermediates

        return forward_intermediates(self, image=image, text=text, **kwargs)

    @property
    def logit_scale(self):
        return jnp.exp(self.params["logit_scale"])

    def example_inputs(self, batch_size: int = 2) -> Tuple[np.ndarray, np.ndarray]:
        v = self.cfg.vision_cfg
        size = v.image_size if isinstance(v.image_size, int) else v.image_size[0]
        images = np.zeros((batch_size, size, size, 3), dtype=np.uint8)
        if self.cfg.gene_cfg is not None:
            text = np.zeros((batch_size, self.cfg.gene_cfg.num_genes), dtype=np.float32)
        else:
            text = np.zeros(
                (batch_size, self.cfg.text_cfg.context_length), dtype=np.int32
            )
        return images, text


def init_params(model: CLIP, cfg: CLIPCfg, seed: int = 0):
    v = cfg.vision_cfg
    size = v.image_size if isinstance(v.image_size, int) else v.image_size[0]
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    if cfg.gene_cfg is not None:
        text = jnp.zeros((1, cfg.gene_cfg.num_genes), jnp.float32)
    else:
        text = jnp.zeros((1, cfg.text_cfg.context_length), jnp.int32)
    # init on the host CPU backend: avoids a large accelerator compile just
    # for initialization (the trainer jits the real step on device later)
    try:
        # local_devices, not devices: in a multi-process job the global
        # list starts with process 0's devices — init must land on a
        # device THIS process can address (tests/test_multiprocess.py)
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            variables = jax.jit(model.init, static_argnames=())(
                jax.random.PRNGKey(seed), images, text
            )
    else:
        variables = model.init(jax.random.PRNGKey(seed), images, text)
    # keep bundle params host-side (numpy): device placement is the trainer's
    # job, and jitted steps donate their state buffers — a host copy can never
    # be invalidated by donation.
    return jax.tree.map(np.asarray, variables["params"])


def create_model(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "bf16",
    seed: int = 0,
    force_quick_gelu: bool = False,
    remat: bool = False,
    init_logit_scale: Optional[float] = None,
    init_logit_bias: Optional[float] = None,
    **cfg_overrides,
) -> ModelBundle:
    """Build a CLIP model bundle (ref: factory.py:251-430).

    ``pretrained`` may be a path to a checkpoint (.npz / .msgpack / orbax dir /
    torch .pt via models.convert) or a registry tag; remote tags are resolved
    through models.pretrained (download gated on network availability).
    """
    cfg = resolve_clip_cfg(model_name, **cfg_overrides)
    # hf-hub: names carry their weights AND preprocess contract in the same
    # cached snapshot as the config (ref: factory.py:251-320 resolves both
    # from the hub) — when no explicit pretrained was requested, load them.
    hub_pp = {}
    if model_name.startswith("hf-hub:"):
        import json as _json

        from spatial_clip_tpu.models.config import hf_cache_snapshot

        snap = hf_cache_snapshot(model_name[len("hf-hub:"):])
        if snap is not None:
            raw = _json.loads((snap / "open_clip_config.json").read_text())
            hub_pp = {
                k: v for k, v in raw.get("preprocess_cfg", {}).items()
                if k in PreprocessCfg.__dataclass_fields__
            }
            if pretrained is None:
                weight_names = ("open_clip_model.safetensors",
                                "open_clip_pytorch_model.safetensors",
                                "open_clip_pytorch_model.bin")
                for fname in weight_names:
                    if (snap / fname).is_file():
                        pretrained = str(snap / fname)
                        break
                else:
                    raise FileNotFoundError(
                        f"hf-hub snapshot {snap} has open_clip_config.json "
                        f"but none of the expected weight files "
                        f"{weight_names}; refusing to return a randomly "
                        f"initialized model for '{model_name}'. Pass "
                        f"pretrained= explicitly to load other weights."
                    )
    # Registry tags pin checkpoint-specific contracts: QuickGELU activation
    # and preprocessing (mean/std/interpolation/resize_mode — e.g. SigLIP
    # tags require resize_mode='squash'). Ref: factory.py merges
    # pretrained_cfg into the model + preprocess cfgs.
    pp_overrides = {}
    if pretrained:
        from spatial_clip_tpu.models.pretrained import (
            get_pretrained_cfg,
            preprocess_overrides,
        )

        tag_cfg = get_pretrained_cfg(model_name, str(pretrained))
        if tag_cfg is not None:
            pp_overrides = preprocess_overrides(tag_cfg)
            if tag_cfg.get("quick_gelu") and not cfg.quick_gelu:
                log.warning(
                    "Pretrained tag %s:%s was trained with QuickGELU; "
                    "enabling it (use the '-quickgelu' model name to make "
                    "this explicit).", model_name, pretrained)
                cfg.quick_gelu = True
    if force_quick_gelu:
        cfg.quick_gelu = True
    if init_logit_scale is not None:
        cfg.init_logit_scale = init_logit_scale
    if init_logit_bias is not None:
        cfg.init_logit_bias = init_logit_bias
    dtype = _PRECISION_DTYPES.get(precision, jnp.bfloat16)
    if cfg.multimodal_cfg is not None:
        from spatial_clip_tpu.models.coca import CoCa

        model = CoCa(
            cfg=cfg,
            multimodal_layers=cfg.multimodal_cfg.layers,
            caption_queries=cfg.multimodal_cfg.caption_queries,
            dtype=dtype,
            remat=remat,
        )
    else:
        model = CLIP(cfg=cfg, dtype=dtype, remat=remat)
    params = init_params(model, cfg, seed=seed)

    if pretrained:
        params = load_checkpoint(params, pretrained, model_name=model_name)

    pp_kw = dict(
        size=cfg.vision_cfg.image_size,
        mean=OPENAI_DATASET_MEAN,
        std=OPENAI_DATASET_STD,
    )
    # hub snapshot's preprocess_cfg first, registry-tag contract wins
    for k, v in {**hub_pp, **pp_overrides}.items():
        pp_kw[k] = tuple(v) if isinstance(v, list) else v
    pp = PreprocessCfg(**pp_kw)
    return ModelBundle(
        model=model, params=params, cfg=cfg, model_name=model_name, preprocess_cfg=pp
    )


def load_checkpoint(params, checkpoint_path: Union[str, Path], model_name: str = ""):
    """Load weights into an existing params pytree (ref: factory.py:181-225).

    Supports: .npz flat dict, flax .msgpack, orbax directories, and torch
    open_clip state dicts (.pt/.bin/.safetensors) via models.convert.
    """
    path = Path(checkpoint_path)
    if not path.exists():
        from spatial_clip_tpu.models.pretrained import download_pretrained

        resolved = download_pretrained(model_name, str(checkpoint_path))
        if resolved is None:
            raise FileNotFoundError(
                f"Pretrained spec '{checkpoint_path}' is neither a file nor a "
                f"resolvable registry tag (offline?)."
            )
        path = Path(resolved)

    suffix = path.suffix.lower()
    if suffix == ".npz":
        flat = dict(np.load(path))
        if any(k in flat for k in ("params/t", "t", "params/img/embedding/kernel")):
            # big_vision SigLIP checkpoint (ref: convert.py:13)
            from spatial_clip_tpu.models.convert import load_big_vision_npz

            return load_big_vision_npz(path, params)
        from spatial_clip_tpu.train.checkpoints import unflatten_params

        loaded = unflatten_params(flat)
    elif suffix == ".msgpack":
        from flax import serialization

        loaded = serialization.from_bytes(params, path.read_bytes())
    elif suffix in (".pt", ".pth", ".bin", ".safetensors"):
        from spatial_clip_tpu.models.convert import convert_torch_checkpoint

        loaded = convert_torch_checkpoint(path, params)
    elif path.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        loaded = ckptr.restore(path.resolve(), params)
    else:
        raise ValueError(f"Unrecognized checkpoint format: {path}")
    return loaded


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "bf16",
    image_mean: Optional[Tuple[float, ...]] = None,
    image_std: Optional[Tuple[float, ...]] = None,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
    aug_cfg: Optional[Union[dict, AugmentationCfg]] = None,
    seed: int = 0,
    **model_kwargs,
) -> Tuple[ModelBundle, HostImageTransform, HostImageTransform]:
    """Ref: factory.py:829-966. Returns (bundle, preprocess_train, preprocess_val)."""
    bundle = create_model(
        model_name, pretrained=pretrained, precision=precision, seed=seed, **model_kwargs
    )
    pp = bundle.preprocess_cfg
    mean = tuple(image_mean) if image_mean else pp.mean
    std = tuple(image_std) if image_std else pp.std
    interp = image_interpolation or pp.interpolation
    resize_mode = image_resize_mode or pp.resize_mode
    train_t = image_transform(
        pp.size, is_train=True, mean=mean, std=std, interpolation=interp,
        aug_cfg=aug_cfg, seed=seed,
    )
    val_t = image_transform(
        pp.size, is_train=False, mean=mean, std=std, interpolation=interp,
        resize_mode=resize_mode, fill_color=pp.fill_color,
    )
    return bundle, train_t, val_t


def get_tokenizer(
    model_name: str = "",
    context_length: Optional[int] = None,
    gene_vocab: Optional[Union[str, Path, list]] = None,
    bpe_path: Optional[str] = None,
    **kwargs,
):
    """Tokenizer factory (ref: factory.py:628-686).

    Resolution order: HF tokenizer if the text config names one; gene
    tokenizer if a gene vocab is given; byte-BPE SimpleTokenizer if a merges
    file is available; HashTokenizer fallback (standalone default).
    """
    cfg = resolve_clip_cfg(model_name) if model_name else CLIPCfg()
    ctx = context_length or cfg.text_cfg.context_length or DEFAULT_CONTEXT_LENGTH
    if cfg.gene_cfg is not None:
        # gene-MLP tower: the 'tokenizer' is a rank-weighted vectorizer
        from spatial_clip_tpu.models.tokenizer import GeneVectorizer

        if gene_vocab is None:
            raise ValueError(
                f"model '{model_name}' uses the gene-MLP tower; pass "
                "gene_vocab= (e.g. global_hvgs.txt) to build its vectorizer"
            )
        vec = GeneVectorizer(gene_vocab)
        if vec.num_genes != cfg.gene_cfg.num_genes:
            log.warning(
                "gene vocab size %d != model num_genes %d; pad/truncate applies",
                vec.num_genes, cfg.gene_cfg.num_genes,
            )
        return vec
    if cfg.text_cfg.hf_tokenizer_name:
        return HFTokenizer(cfg.text_cfg.hf_tokenizer_name, context_length=ctx, **kwargs)
    if gene_vocab is not None:
        return GeneTokenizer(gene_vocab, context_length=ctx)
    try:
        tok = SimpleTokenizer(bpe_path=bpe_path, context_length=ctx)
        # tiny/test architectures declare a reduced vocab (e.g. ViT-Test's
        # 512): byte-BPE ids would exceed their embedding table, so only
        # return the BPE tokenizer when the model's vocab can hold it
        if cfg.text_cfg.vocab_size and cfg.text_cfg.vocab_size < tok.vocab_size:
            log.info(
                "model vocab %d < BPE vocab %d; using HashTokenizer",
                cfg.text_cfg.vocab_size, tok.vocab_size,
            )
            return HashTokenizer(
                vocab_size=cfg.text_cfg.vocab_size, context_length=ctx
            )
        return tok
    except FileNotFoundError:
        log.info("No BPE vocab available; using HashTokenizer fallback")
        return HashTokenizer(vocab_size=cfg.text_cfg.vocab_size, context_length=ctx)


def create_loss(args) -> Callable:
    """Loss factory keyed the same way as the reference (ref: factory.py:790-827).

    ``args`` may be a namespace/dict with ``use_spatial_loss``, ``siglip``,
    ``local_loss``, etc. Returns a pure loss callable from
    spatial_clip_tpu.losses.
    """
    from spatial_clip_tpu.losses import make_loss

    get = (lambda k, d=None: args.get(k, d)) if isinstance(args, dict) else (
        lambda k, d=None: getattr(args, k, d)
    )
    if get("use_spatial_loss") or get("name") == "spatial":
        kind = "spatial"
    elif get("siglip") or get("name") == "siglip":
        kind = "siglip"
    else:
        kind = "clip"
    return make_loss(
        kind,
        local_loss=bool(get("local_loss", True)),
        cap_logit_scale=get("cap_logit_scale"),
        temp_reg_weight=float(get("temp_reg_weight", 0.0) or 0.0),
        neighbor_alpha_scale=float(get("neighbor_alpha_scale", 1.0) or 1.0),
        float32_logits=bool(get("float32_logits", True)),
        dist_impl=get("loss_dist_impl", "gather"),
    )
