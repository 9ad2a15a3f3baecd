"""torch open_clip state-dict <-> JAX params converters.

The north star requires checkpoint-compatible embeddings, so this module maps
the reference's torch CLIP layout (ref: src/open_clip/model.py:265-479 and
factory.py:153-225 ``load_state_dict``/``load_checkpoint``) onto our flax
pytree, handling the layout differences:

- torch ``nn.Linear.weight`` is (out, in); flax ``Dense.kernel`` is (in, out).
- torch MHA fuses qkv into ``attn.in_proj_weight`` (3W, W); our fused Dense
  ``attn/qkv/kernel`` is its transpose (W, 3W).
- torch ``conv1.weight`` is OIHW; flax Conv kernel is HWIO.
- ``visual.proj`` / ``text_projection`` are raw Parameters used as ``x @ P``
  in both frameworks -> copied as-is.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict

import numpy as np

log = logging.getLogger(__name__)


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_torch_state_dict(path: Path) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy without requiring CUDA."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(path))
    import torch

    try:
        obj = torch.load(str(path), map_location="cpu", weights_only=False)
    except RuntimeError:
        # OpenAI ships TorchScript archives (ref: src/open_clip/openai.py:24
        # load_openai_model) — fall back to jit.load and take its state dict
        obj = torch.jit.load(str(path), map_location="cpu").state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    sd = {}
    for k, v in obj.items():
        # strip DDP / torch.compile prefixes (ref: factory.py:153-179)
        for prefix in ("module.", "_orig_mod."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        sd[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return sd


def _convert_block(sd: Dict[str, np.ndarray], tprefix: str, jprefix: str, out: Dict[str, np.ndarray]):
    """One transformer resblock: torch `{tprefix}.` -> flax `{jprefix}/`."""
    out[f"{jprefix}/ln_1/scale"] = sd[f"{tprefix}.ln_1.weight"]
    out[f"{jprefix}/ln_1/bias"] = sd[f"{tprefix}.ln_1.bias"]
    out[f"{jprefix}/ln_2/scale"] = sd[f"{tprefix}.ln_2.weight"]
    out[f"{jprefix}/ln_2/bias"] = sd[f"{tprefix}.ln_2.bias"]
    out[f"{jprefix}/attn/qkv/kernel"] = sd[f"{tprefix}.attn.in_proj_weight"].T
    out[f"{jprefix}/attn/qkv/bias"] = sd[f"{tprefix}.attn.in_proj_bias"]
    out[f"{jprefix}/attn/out/kernel"] = sd[f"{tprefix}.attn.out_proj.weight"].T
    out[f"{jprefix}/attn/out/bias"] = sd[f"{tprefix}.attn.out_proj.bias"]
    out[f"{jprefix}/mlp/c_fc/kernel"] = sd[f"{tprefix}.mlp.c_fc.weight"].T
    out[f"{jprefix}/mlp/c_fc/bias"] = sd[f"{tprefix}.mlp.c_fc.bias"]
    out[f"{jprefix}/mlp/c_proj/kernel"] = sd[f"{tprefix}.mlp.c_proj.weight"].T
    out[f"{jprefix}/mlp/c_proj/bias"] = sd[f"{tprefix}.mlp.c_proj.bias"]
    for ls_t, ls_j in (("ls_1.gamma", "ls_1"), ("ls_2.gamma", "ls_2")):
        if f"{tprefix}.{ls_t}" in sd:
            out[f"{jprefix}/{ls_j}"] = sd[f"{tprefix}.{ls_t}"]


def _rn_bn(sd: Dict[str, np.ndarray], tkey: str, out: Dict[str, np.ndarray], jkey: str):
    """torch BatchNorm2d -> FrozenBatchNorm params."""
    out[f"{jkey}/scale"] = sd[f"{tkey}.weight"]
    out[f"{jkey}/bias"] = sd[f"{tkey}.bias"]
    out[f"{jkey}/mean"] = sd[f"{tkey}.running_mean"]
    out[f"{jkey}/var"] = sd[f"{tkey}.running_var"]


def _convert_rn_visual(sd: Dict[str, np.ndarray], out: Dict[str, np.ndarray]):
    """OpenAI ModifiedResNet vision tower: torch `visual.` -> flax `visual/`
    (ref: src/open_clip/modified_resnet.py:96-236; stem convs + 4 stages of
    Bottlenecks + AttentionPool2d)."""
    conv_t = lambda w: w.transpose(2, 3, 1, 0)  # noqa: E731 OIHW -> HWIO
    for i in (1, 2, 3):
        out[f"visual/conv{i}/kernel"] = conv_t(sd[f"visual.conv{i}.weight"])
        _rn_bn(sd, f"visual.bn{i}", out, f"visual/bn{i}")
    for stage in (1, 2, 3, 4):
        b = 0
        while f"visual.layer{stage}.{b}.conv1.weight" in sd:
            t = f"visual.layer{stage}.{b}"
            j = f"visual/layer{stage}_{b}"
            for c in (1, 2, 3):
                out[f"{j}/conv{c}/kernel"] = conv_t(sd[f"{t}.conv{c}.weight"])
                _rn_bn(sd, f"{t}.bn{c}", out, f"{j}/bn{c}")
            if f"{t}.downsample.0.weight" in sd:
                out[f"{j}/downsample_conv/kernel"] = conv_t(sd[f"{t}.downsample.0.weight"])
                _rn_bn(sd, f"{t}.downsample.1", out, f"{j}/downsample_bn")
            b += 1
    ap = "visual.attnpool"
    out["visual/attnpool/positional_embedding"] = sd[f"{ap}.positional_embedding"]
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        out[f"visual/attnpool/{p}/kernel"] = sd[f"{ap}.{p}.weight"].T
        out[f"visual/attnpool/{p}/bias"] = sd[f"{ap}.{p}.bias"]


def _export_rn_visual(flat: Dict[str, np.ndarray], out: Dict[str, np.ndarray]):
    """Inverse of :func:`_convert_rn_visual` (flax `visual/` -> torch keys)."""
    conv_t = lambda w: w.transpose(3, 2, 0, 1)  # noqa: E731 HWIO -> OIHW

    def put_bn(jkey: str, tkey: str):
        out[f"{tkey}.weight"] = flat[f"{jkey}/scale"]
        out[f"{tkey}.bias"] = flat[f"{jkey}/bias"]
        out[f"{tkey}.running_mean"] = flat[f"{jkey}/mean"]
        out[f"{tkey}.running_var"] = flat[f"{jkey}/var"]

    for i in (1, 2, 3):
        out[f"visual.conv{i}.weight"] = conv_t(flat[f"visual/conv{i}/kernel"])
        put_bn(f"visual/bn{i}", f"visual.bn{i}")
    for stage in (1, 2, 3, 4):
        b = 0
        while f"visual/layer{stage}_{b}/conv1/kernel" in flat:
            j = f"visual/layer{stage}_{b}"
            t = f"visual.layer{stage}.{b}"
            for c in (1, 2, 3):
                out[f"{t}.conv{c}.weight"] = conv_t(flat[f"{j}/conv{c}/kernel"])
                put_bn(f"{j}/bn{c}", f"{t}.bn{c}")
            if f"{j}/downsample_conv/kernel" in flat:
                out[f"{t}.downsample.0.weight"] = conv_t(flat[f"{j}/downsample_conv/kernel"])
                put_bn(f"{j}/downsample_bn", f"{t}.downsample.1")
            b += 1
    out["visual.attnpool.positional_embedding"] = flat["visual/attnpool/positional_embedding"]
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        out[f"visual.attnpool.{p}.weight"] = flat[f"visual/attnpool/{p}/kernel"].T
        out[f"visual.attnpool.{p}.bias"] = flat[f"visual/attnpool/{p}/bias"]


def _convert_text_tower(sd: Dict[str, np.ndarray], out: Dict[str, np.ndarray]):
    """CLIP text tower -> flax `text/`. Handles both the classic top-level
    layout (CLIP) and the ``text.``-prefixed CustomTextCLIP/SigLIP layout
    (ref: model.py CustomTextCLIP), including the Linear-with-bias
    text_projection flavor (proj_bias)."""
    p = "text." if "text.token_embedding.weight" in sd else ""
    n_txt = max(
        (int(k.split(".")[2 + (p != "")])
         for k in sd if k.startswith(f"{p}transformer.resblocks.")),
        default=-1,
    ) + 1
    out["text/token_embedding/embedding"] = sd[f"{p}token_embedding.weight"]
    out["text/positional_embedding"] = sd[f"{p}positional_embedding"]
    out["text/ln_final/scale"] = sd[f"{p}ln_final.weight"]
    out["text/ln_final/bias"] = sd[f"{p}ln_final.bias"]
    if f"{p}text_projection.weight" in sd:  # nn.Linear projection (SigLIP)
        out["text/text_projection/kernel"] = sd[f"{p}text_projection.weight"].T
        if f"{p}text_projection.bias" in sd:
            out["text/text_projection/bias"] = sd[f"{p}text_projection.bias"]
    else:
        out["text/text_projection"] = sd[f"{p}text_projection"]
    if f"{p}cls_emb" in sd:
        out["text/cls_emb"] = sd[f"{p}cls_emb"].reshape(-1)
    for i in range(n_txt):
        _convert_block(
            sd, f"{p}transformer.resblocks.{i}", f"text/transformer/resblocks_{i}", out
        )


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight -> flax HWIO kernel (depthwise included:
    (C,1,k,k) -> (k,k,1,C))."""
    return w.transpose(2, 3, 1, 0)


def _lin(sd, tkey: str, out: Dict[str, np.ndarray], jkey: str):
    out[f"{jkey}/kernel"] = sd[f"{tkey}.weight"].T
    if f"{tkey}.bias" in sd:
        out[f"{jkey}/bias"] = sd[f"{tkey}.bias"]


def _ln(sd, tkey: str, out: Dict[str, np.ndarray], jkey: str):
    out[f"{jkey}/scale"] = sd[f"{tkey}.weight"]
    out[f"{jkey}/bias"] = sd[f"{tkey}.bias"]


def _convert_timm_vit_block(sd, tprefix: str, jprefix: str, out):
    """timm ViT block (blocks.{i}.norm1/attn.qkv/attn.proj/norm2/mlp.fc*)
    -> our resblock tree (ref: open_clip torch ckpts for timm trunks,
    factory.py:181-225 + timm vision_transformer naming)."""
    _ln(sd, f"{tprefix}.norm1", out, f"{jprefix}/ln_1")
    _ln(sd, f"{tprefix}.norm2", out, f"{jprefix}/ln_2")
    # torch qkv.weight rows are [q; k; v] (3D, D); our fused qkv kernel is
    # (D, 3D) with [q|k|v] columns — a plain transpose preserves the order
    _lin(sd, f"{tprefix}.attn.qkv", out, f"{jprefix}/attn/qkv")
    _lin(sd, f"{tprefix}.attn.proj", out, f"{jprefix}/attn/out")
    _lin(sd, f"{tprefix}.mlp.fc1", out, f"{jprefix}/mlp/c_fc")
    _lin(sd, f"{tprefix}.mlp.fc2", out, f"{jprefix}/mlp/c_proj")


def _convert_timm_vit_visual(sd, out):
    """timm ViT trunk under ``visual.trunk.`` (the SigLIP/SigLIP2 and
    vit-*-gap torch flavors) -> TimmStyleTower tree. Mirrors the proven
    big_vision .npz mapping (load_big_vision_npz) so both converters land
    on identical trees — cross-checked by tests/test_torch_parity.py."""
    tr = "visual.trunk"
    out["visual/trunk/patch_embed/kernel"] = _conv_w(sd[f"{tr}.patch_embed.proj.weight"])
    if f"{tr}.patch_embed.proj.bias" in sd:
        out["visual/trunk/patch_embed/bias"] = sd[f"{tr}.patch_embed.proj.bias"]
    pe = sd[f"{tr}.pos_embed"]
    out["visual/trunk/pos_embed"] = pe.reshape(-1, pe.shape[-1])
    if f"{tr}.cls_token" in sd:
        out["visual/trunk/cls"] = sd[f"{tr}.cls_token"].reshape(-1)
    i = 0
    while f"{tr}.blocks.{i}.norm1.weight" in sd:
        _convert_timm_vit_block(
            sd, f"{tr}.blocks.{i}", f"visual/trunk/blocks/resblocks_{i}", out
        )
        i += 1
    _ln(sd, f"{tr}.norm", out, "visual/trunk/norm")
    # MAP pooling head (timm AttentionPoolLatent; global_pool='map')
    if f"{tr}.attn_pool.latent" in sd:
        ap = f"{tr}.attn_pool"
        D = sd[f"{ap}.latent"].shape[-1]
        out["visual/attn_pool/probe"] = sd[f"{ap}.latent"].reshape(1, D)
        _lin(sd, f"{ap}.q", out, "visual/attn_pool/q")
        kv_w, kv_b = sd[f"{ap}.kv.weight"], sd[f"{ap}.kv.bias"]
        out["visual/attn_pool/k/kernel"] = kv_w[:D].T
        out["visual/attn_pool/k/bias"] = kv_b[:D]
        out["visual/attn_pool/v/kernel"] = kv_w[D:].T
        out["visual/attn_pool/v/bias"] = kv_b[D:]
        _lin(sd, f"{ap}.proj", out, "visual/attn_pool/out")
        _ln(sd, f"{ap}.norm", out, "visual/attn_pool/ln")
        _lin(sd, f"{ap}.mlp.fc1", out, "visual/attn_pool/mlp_fc")
        _lin(sd, f"{ap}.mlp.fc2", out, "visual/attn_pool/mlp_proj")
    # projection head (timm_proj='linear'/'mlp'; absent for proj='none')
    if "visual.head.proj.weight" in sd:
        _lin(sd, "visual.head.proj", out, "visual/head_proj")
    if "visual.head.mlp.fc1.weight" in sd:
        _lin(sd, "visual.head.mlp.fc1", out, "visual/head_mlp_fc")
        _lin(sd, "visual.head.mlp.fc2", out, "visual/head_mlp_proj")


def _convert_convnext_visual(sd, out):
    """timm ConvNeXt trunk under ``visual.trunk.`` -> ConvNeXtTrunk tree
    (ref: open_clip convnext_* torch ckpts; timm convnext naming:
    stem.0/1, stages.{s}.downsample.0/1, stages.{s}.blocks.{b}.conv_dw/
    norm/mlp.fc1/mlp.fc2/gamma, head.norm)."""
    tr = "visual.trunk"
    out["visual/trunk/stem_conv/kernel"] = _conv_w(sd[f"{tr}.stem.0.weight"])
    out["visual/trunk/stem_conv/bias"] = sd[f"{tr}.stem.0.bias"]
    _ln(sd, f"{tr}.stem.1", out, "visual/trunk/stem_norm")
    s = 0
    while f"{tr}.stages.{s}.blocks.0.conv_dw.weight" in sd:
        if s > 0:
            _ln(sd, f"{tr}.stages.{s}.downsample.0", out,
                f"visual/trunk/ds_norm_{s}")
            out[f"visual/trunk/ds_conv_{s}/kernel"] = _conv_w(
                sd[f"{tr}.stages.{s}.downsample.1.weight"])
            out[f"visual/trunk/ds_conv_{s}/bias"] = sd[
                f"{tr}.stages.{s}.downsample.1.bias"]
        b = 0
        while f"{tr}.stages.{s}.blocks.{b}.conv_dw.weight" in sd:
            tb = f"{tr}.stages.{s}.blocks.{b}"
            jb = f"visual/trunk/stage{s}_block{b}"
            out[f"{jb}/dwconv/kernel"] = _conv_w(sd[f"{tb}.conv_dw.weight"])
            out[f"{jb}/dwconv/bias"] = sd[f"{tb}.conv_dw.bias"]
            _ln(sd, f"{tb}.norm", out, f"{jb}/norm")
            _lin(sd, f"{tb}.mlp.fc1", out, f"{jb}/pwconv1")
            _lin(sd, f"{tb}.mlp.fc2", out, f"{jb}/pwconv2")
            out[f"{jb}/gamma"] = sd[f"{tb}.gamma"]
            b += 1
        s += 1
    # trunk head norm (timm keeps head.norm after reset_classifier(0));
    # our avg-pool path names it head_norm
    if f"{tr}.head.norm.weight" in sd:
        _ln(sd, f"{tr}.head.norm", out, "visual/head_norm")
    if "visual.head.proj.weight" in sd:
        _lin(sd, "visual.head.proj", out, "visual/head_proj")
    if "visual.head.mlp.fc1.weight" in sd:
        _lin(sd, "visual.head.mlp.fc1", out, "visual/head_mlp_fc")
        _lin(sd, "visual.head.mlp.fc2", out, "visual/head_mlp_proj")


def torch_to_jax_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert an open_clip CLIP state dict to our flax params tree."""
    out: Dict[str, np.ndarray] = {}
    if "visual.layer1.0.conv1.weight" in sd:  # ModifiedResNet vision tower
        _convert_rn_visual(sd, out)
        if "token_embedding.weight" in sd:
            _convert_text_tower(sd, out)
        out["logit_scale"] = sd["logit_scale"].reshape(())
        return _unflatten(out)
    if "visual.trunk.stem.0.weight" in sd:  # timm ConvNeXt tower
        _convert_convnext_visual(sd, out)
        if "text.token_embedding.weight" in sd or "token_embedding.weight" in sd:
            _convert_text_tower(sd, out)
        out["logit_scale"] = sd["logit_scale"].reshape(())
        if "logit_bias" in sd:
            out["logit_bias"] = sd["logit_bias"].reshape(())
        return _unflatten(out)
    if "visual.trunk.patch_embed.proj.weight" in sd:  # timm ViT (SigLIP etc.)
        _convert_timm_vit_visual(sd, out)
        if "text.token_embedding.weight" in sd or "token_embedding.weight" in sd:
            _convert_text_tower(sd, out)
        out["logit_scale"] = sd["logit_scale"].reshape(())
        if "logit_bias" in sd:
            out["logit_bias"] = sd["logit_bias"].reshape(())
        return _unflatten(out)
    n_vis = max(
        (int(k.split(".")[3]) for k in sd if k.startswith("visual.transformer.resblocks.")),
        default=-1,
    ) + 1
    out["visual/class_embedding"] = sd["visual.class_embedding"]
    out["visual/positional_embedding"] = sd["visual.positional_embedding"]
    out["visual/conv1/kernel"] = sd["visual.conv1.weight"].transpose(2, 3, 1, 0)
    if "visual.ln_pre.weight" in sd:
        out["visual/ln_pre/scale"] = sd["visual.ln_pre.weight"]
        out["visual/ln_pre/bias"] = sd["visual.ln_pre.bias"]
    out["visual/ln_post/scale"] = sd["visual.ln_post.weight"]
    out["visual/ln_post/bias"] = sd["visual.ln_post.bias"]
    out["visual/proj"] = sd["visual.proj"]
    for i in range(n_vis):
        _convert_block(
            sd, f"visual.transformer.resblocks.{i}", f"visual/transformer/resblocks_{i}", out
        )

    if "token_embedding.weight" in sd or "text.token_embedding.weight" in sd:
        _convert_text_tower(sd, out)

    out["logit_scale"] = sd["logit_scale"].reshape(())
    if "logit_bias" in sd:
        out["logit_bias"] = sd["logit_bias"].reshape(())
    return _unflatten(out)


def jax_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping, for exporting checkpoints the reference stack can load."""
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}

    def put_block(jprefix: str, tprefix: str):
        out[f"{tprefix}.ln_1.weight"] = flat[f"{jprefix}/ln_1/scale"]
        out[f"{tprefix}.ln_1.bias"] = flat[f"{jprefix}/ln_1/bias"]
        out[f"{tprefix}.ln_2.weight"] = flat[f"{jprefix}/ln_2/scale"]
        out[f"{tprefix}.ln_2.bias"] = flat[f"{jprefix}/ln_2/bias"]
        out[f"{tprefix}.attn.in_proj_weight"] = flat[f"{jprefix}/attn/qkv/kernel"].T
        out[f"{tprefix}.attn.in_proj_bias"] = flat[f"{jprefix}/attn/qkv/bias"]
        out[f"{tprefix}.attn.out_proj.weight"] = flat[f"{jprefix}/attn/out/kernel"].T
        out[f"{tprefix}.attn.out_proj.bias"] = flat[f"{jprefix}/attn/out/bias"]
        out[f"{tprefix}.mlp.c_fc.weight"] = flat[f"{jprefix}/mlp/c_fc/kernel"].T
        out[f"{tprefix}.mlp.c_fc.bias"] = flat[f"{jprefix}/mlp/c_fc/bias"]
        out[f"{tprefix}.mlp.c_proj.weight"] = flat[f"{jprefix}/mlp/c_proj/kernel"].T
        out[f"{tprefix}.mlp.c_proj.bias"] = flat[f"{jprefix}/mlp/c_proj/bias"]

    if "visual/layer1_0/conv1/kernel" in flat:  # ModifiedResNet tower
        _export_rn_visual(flat, out)
        if "text/token_embedding/embedding" in flat:
            i = 0
            while f"text/transformer/resblocks_{i}/ln_1/scale" in flat:
                put_block(f"text/transformer/resblocks_{i}", f"transformer.resblocks.{i}")
                i += 1
            out["token_embedding.weight"] = flat["text/token_embedding/embedding"]
            out["positional_embedding"] = flat["text/positional_embedding"]
            out["ln_final.weight"] = flat["text/ln_final/scale"]
            out["ln_final.bias"] = flat["text/ln_final/bias"]
            out["text_projection"] = flat["text/text_projection"]
        out["logit_scale"] = flat["logit_scale"]
        return out

    i = 0
    while f"visual/transformer/resblocks_{i}/ln_1/scale" in flat:
        put_block(f"visual/transformer/resblocks_{i}", f"visual.transformer.resblocks.{i}")
        i += 1
    out["visual.class_embedding"] = flat["visual/class_embedding"]
    out["visual.positional_embedding"] = flat["visual/positional_embedding"]
    out["visual.conv1.weight"] = flat["visual/conv1/kernel"].transpose(3, 2, 0, 1)
    if "visual/ln_pre/scale" in flat:
        out["visual.ln_pre.weight"] = flat["visual/ln_pre/scale"]
        out["visual.ln_pre.bias"] = flat["visual/ln_pre/bias"]
    out["visual.ln_post.weight"] = flat["visual/ln_post/scale"]
    out["visual.ln_post.bias"] = flat["visual/ln_post/bias"]
    out["visual.proj"] = flat["visual/proj"]

    if "text/token_embedding/embedding" in flat:
        i = 0
        while f"text/transformer/resblocks_{i}/ln_1/scale" in flat:
            put_block(f"text/transformer/resblocks_{i}", f"transformer.resblocks.{i}")
            i += 1
        out["token_embedding.weight"] = flat["text/token_embedding/embedding"]
        out["positional_embedding"] = flat["text/positional_embedding"]
        out["ln_final.weight"] = flat["text/ln_final/scale"]
        out["ln_final.bias"] = flat["text/ln_final/bias"]
        out["text_projection"] = flat["text/text_projection"]

    out["logit_scale"] = flat["logit_scale"]
    if "logit_bias" in flat:
        out["logit_bias"] = flat["logit_bias"]
    return out


def resize_pos_embed(
    pe: np.ndarray, target_len: int, num_prefix_tokens: int = 1
) -> np.ndarray:
    """Bilinear-resize a ViT positional embedding grid to a new sequence
    length (ref: src/open_clip/model.py:792-856, pos_embed.py)."""
    if pe.shape[0] == target_len:
        return pe
    prefix, grid = pe[:num_prefix_tokens], pe[num_prefix_tokens:]
    old = int(np.sqrt(grid.shape[0]))
    new = int(np.sqrt(target_len - num_prefix_tokens))
    import jax

    g = grid.reshape(1, old, old, -1)
    g = jax.image.resize(g, (1, new, new, g.shape[-1]), method="bilinear")
    g = np.asarray(g).reshape(new * new, -1)
    return np.concatenate([prefix, g], axis=0)


def convert_torch_checkpoint(path: Path, reference_params: Dict[str, Any]) -> Dict[str, Any]:
    """Load a torch open_clip checkpoint and fit it to ``reference_params``,
    resizing pos-embeds and verifying shapes (ref: factory.py:181-225)."""
    import jax

    sd = load_torch_state_dict(path)
    converted = torch_to_jax_params(sd)
    ref_flat = _flatten(reference_params)
    conv_flat = _flatten(converted)
    out: Dict[str, np.ndarray] = {}
    missing, unexpected = [], []
    for k, ref in ref_flat.items():
        if k not in conv_flat:
            missing.append(k)
            out[k] = np.asarray(ref)
            continue
        v = conv_flat[k]
        if k.endswith("positional_embedding") and v.shape != ref.shape and v.ndim == 2:
            prefix = 1 if "visual" in k else 0
            v = resize_pos_embed(v, ref.shape[0], num_prefix_tokens=prefix)
        if tuple(v.shape) != tuple(ref.shape):
            raise ValueError(f"Shape mismatch for {k}: ckpt {v.shape} vs model {ref.shape}")
        out[k] = v.astype(np.asarray(ref).dtype)
    unexpected = [k for k in conv_flat if k not in ref_flat]
    if missing:
        log.warning("Missing keys kept at init: %s", missing[:8])
    if unexpected:
        log.warning("Unexpected checkpoint keys ignored: %s", unexpected[:8])
    return jax.tree.map(lambda x: x, _unflatten(out))


# ---------------------------------------------------------------------------
# big_vision (.npz) SigLIP converter
# (ref: src/open_clip/convert.py:13-196 ``load_big_vision_weights``)
# ---------------------------------------------------------------------------


def _bv_attn(w, prefix: str, out: Dict[str, np.ndarray], jprefix: str):
    """Map one big_vision encoderblock to a flax resblock."""
    # sub-module numbering differs across big_vision versions; probe both
    def find(*cands):
        for c in cands:
            if f"{prefix}{c}/query/kernel" in w or f"{prefix}{c}/scale" in w or f"{prefix}{c}/Dense_0/kernel" in w:
                return c
        return cands[0]

    mha = find("MultiHeadDotProductAttention_0", "MultiHeadDotProductAttention_1")
    ln2 = find("LayerNorm_1", "LayerNorm_2")
    mlp = find("MlpBlock_0", "MlpBlock_3")
    out[f"{jprefix}/ln_1/scale"] = w[f"{prefix}LayerNorm_0/scale"]
    out[f"{jprefix}/ln_1/bias"] = w[f"{prefix}LayerNorm_0/bias"]
    out[f"{jprefix}/ln_2/scale"] = w[f"{prefix}{ln2}/scale"]
    out[f"{jprefix}/ln_2/bias"] = w[f"{prefix}{ln2}/bias"]
    D = w[f"{prefix}{mha}/query/kernel"].shape[0]
    qkv_k = np.concatenate(
        [w[f"{prefix}{mha}/{n}/kernel"].reshape(D, -1) for n in ("query", "key", "value")],
        axis=1,
    )
    qkv_b = np.concatenate(
        [w[f"{prefix}{mha}/{n}/bias"].reshape(-1) for n in ("query", "key", "value")]
    )
    out[f"{jprefix}/attn/qkv/kernel"] = qkv_k
    out[f"{jprefix}/attn/qkv/bias"] = qkv_b
    out[f"{jprefix}/attn/out/kernel"] = w[f"{prefix}{mha}/out/kernel"].reshape(-1, D)
    out[f"{jprefix}/attn/out/bias"] = w[f"{prefix}{mha}/out/bias"].reshape(-1)
    out[f"{jprefix}/mlp/c_fc/kernel"] = w[f"{prefix}{mlp}/Dense_0/kernel"]
    out[f"{jprefix}/mlp/c_fc/bias"] = w[f"{prefix}{mlp}/Dense_0/bias"]
    out[f"{jprefix}/mlp/c_proj/kernel"] = w[f"{prefix}{mlp}/Dense_1/kernel"]
    out[f"{jprefix}/mlp/c_proj/bias"] = w[f"{prefix}{mlp}/Dense_1/bias"]


def load_big_vision_npz(path: Path, reference_params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a big_vision SigLIP .npz into our param tree.

    Target model shape: TimmStyleTower with a siglip ViT trunk + MAP pooling
    (timm_pool='map') and a TextTransformer with proj_bias — i.e. the
    ViT-*-SigLIP* model configs. big_vision stores flax-layout kernels, so
    most tensors copy without transposition (unlike the torch converters).
    """
    w = dict(np.load(path))
    root = "params/" if "params/b" in w else ""
    out: Dict[str, np.ndarray] = {}

    # image tower (TimmStyleTower: trunk + MAP head)
    img = f"{root}img/"
    out["visual/trunk/patch_embed/kernel"] = w[f"{img}embedding/kernel"]
    out["visual/trunk/patch_embed/bias"] = w[f"{img}embedding/bias"]
    out["visual/trunk/pos_embed"] = w[f"{img}pos_embedding"].reshape(
        -1, w[f"{img}pos_embedding"].shape[-1]
    )
    i = 0
    while f"{img}Transformer/encoderblock_{i}/LayerNorm_0/scale" in w:
        _bv_attn(
            w, f"{img}Transformer/encoderblock_{i}/", out,
            f"visual/trunk/blocks/resblocks_{i}",
        )
        i += 1
    out["visual/trunk/norm/scale"] = w[f"{img}Transformer/encoder_norm/scale"]
    out["visual/trunk/norm/bias"] = w[f"{img}Transformer/encoder_norm/bias"]

    mp = f"{img}MAPHead_0/"
    if f"{mp}probe" in w:
        D = w[f"{mp}probe"].shape[-1]
        out["visual/attn_pool/probe"] = w[f"{mp}probe"].reshape(1, D)
        mha = f"{mp}MultiHeadDotProductAttention_0/"
        for src, dst in (("query", "q"), ("key", "k"), ("value", "v")):
            out[f"visual/attn_pool/{dst}/kernel"] = w[f"{mha}{src}/kernel"].reshape(D, -1)
            out[f"visual/attn_pool/{dst}/bias"] = w[f"{mha}{src}/bias"].reshape(-1)
        out["visual/attn_pool/out/kernel"] = w[f"{mha}out/kernel"].reshape(-1, D)
        out["visual/attn_pool/out/bias"] = w[f"{mha}out/bias"].reshape(-1)
        out["visual/attn_pool/ln/scale"] = w[f"{mp}LayerNorm_0/scale"]
        out["visual/attn_pool/ln/bias"] = w[f"{mp}LayerNorm_0/bias"]
        out["visual/attn_pool/mlp_fc/kernel"] = w[f"{mp}MlpBlock_0/Dense_0/kernel"]
        out["visual/attn_pool/mlp_fc/bias"] = w[f"{mp}MlpBlock_0/Dense_0/bias"]
        out["visual/attn_pool/mlp_proj/kernel"] = w[f"{mp}MlpBlock_0/Dense_1/kernel"]
        out["visual/attn_pool/mlp_proj/bias"] = w[f"{mp}MlpBlock_0/Dense_1/bias"]

    # text tower
    txt = f"{root}txt/"
    out["text/token_embedding/embedding"] = w[f"{txt}Embed_0/embedding"]
    out["text/positional_embedding"] = w[f"{txt}pos_embedding"].reshape(
        -1, w[f"{txt}pos_embedding"].shape[-1]
    )
    i = 0
    while f"{txt}Encoder_0/encoderblock_{i}/LayerNorm_0/scale" in w:
        _bv_attn(
            w, f"{txt}Encoder_0/encoderblock_{i}/", out,
            f"text/transformer/resblocks_{i}",
        )
        i += 1
    out["text/ln_final/scale"] = w[f"{txt}Encoder_0/encoder_norm/scale"]
    out["text/ln_final/bias"] = w[f"{txt}Encoder_0/encoder_norm/bias"]
    out["text/text_projection/kernel"] = w[f"{txt}head/kernel"]
    out["text/text_projection/bias"] = w[f"{txt}head/bias"]

    out["logit_scale"] = np.asarray(w[f"{root}t"]).reshape(())
    out["logit_bias"] = np.asarray(w[f"{root}b"]).reshape(())

    ref_flat = _flatten(reference_params)
    fitted: Dict[str, np.ndarray] = {}
    missing = []
    for k, ref in ref_flat.items():
        if k in out:
            v = out[k]
            if tuple(v.shape) != tuple(np.asarray(ref).shape):
                raise ValueError(
                    f"big_vision shape mismatch {k}: {v.shape} vs {np.asarray(ref).shape}"
                )
            fitted[k] = v.astype(np.asarray(ref).dtype)
        else:
            missing.append(k)
            fitted[k] = np.asarray(ref)
    unexpected = [k for k in out if k not in ref_flat]
    if missing:
        log.warning("big_vision: %d keys kept at init e.g. %s", len(missing), missing[:5])
    if unexpected:
        log.warning("big_vision: %d unmapped keys e.g. %s", len(unexpected), unexpected[:5])
    return _unflatten(fitted)


def convert_mobileclip_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remap an Apple MobileCLIP checkpoint's keys to open_clip layout
    (ref: src/open_clip/convert.py:199-252 ``convert_mobile_clip_state_dict``).

    The text encoder is a standard CLIP text transformer under renamed keys
    and maps exactly; the image trunk (FastViT/MCi) is returned under
    ``visual.trunk.*`` for the caller to adapt (our fastvit trunks are
    capability-equivalent, not parameter-compatible, so image weights are
    surfaced but not auto-fitted).
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("text_encoder."):
            k = k[len("text_encoder."):]
            k = k.replace("projection_layer", "text_projection")
            k = k.replace("embedding_layer", "token_embedding")
            if k.startswith("positional_embedding.pos_embed.pos_embed"):
                k = k.replace(
                    "positional_embedding.pos_embed.pos_embed",
                    "positional_embedding",
                )
                v = np.squeeze(v)
            k = k.replace("final_layer_norm", "ln_final")
            k = k.replace("pre_norm_mha.0", "ln_1")
            k = k.replace("pre_norm_mha.1", "attn")
            k = k.replace("pre_norm_ffn.0", "ln_2")
            k = k.replace("pre_norm_ffn.1", "mlp.c_fc")
            k = k.replace("pre_norm_ffn.4", "mlp.c_proj")
            k = k.replace("qkv_proj.weight", "in_proj_weight")
            k = k.replace("qkv_proj.bias", "in_proj_bias")
            k = k.replace("transformer.", "transformer.resblocks.")
            out["text." + k] = v
        elif k.startswith("image_encoder."):
            out["visual.trunk." + k[len("image_encoder."):]] = v
        elif k == "logit_scale":
            out[k] = v
    return out


def detect_checkpoint_flavor(sd: Dict[str, np.ndarray]) -> str:
    """Classify a loaded state dict (ref: convert.py:199-207 detection)."""
    if "image_encoder.model.patch_embed.0.rbr_conv.0.conv.weight" in sd or \
            "image_encoder.model.patch_emb.0.block.conv.weight" in sd:
        return "mobileclip"
    if any(k.startswith("visual.transformer.resblocks.") for k in sd):
        return "open_clip"
    if "visual.trunk.stem.0.weight" in sd or \
            "visual.trunk.patch_embed.proj.weight" in sd:
        return "open_clip"  # timm trunk flavors (convnext / vit-siglip / gap)
    if any(k.startswith("text_encoder.") for k in sd):
        return "mobileclip"
    return "unknown"
