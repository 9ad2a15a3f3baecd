"""Two-tower CLIP model (ref: src/open_clip/model.py:265-662 CLIP/CustomTextCLIP).

The JAX model is a pure function of params; ``logit_scale`` is exposed
un-exponentiated in params (like the reference) and returned exp'd from
``__call__`` (ref: model.py:464-479). ``forward`` returns the same dict schema
as the reference's ``output_dict=True`` path:
``{image_features, text_features, logit_scale[, logit_bias]}``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from spatial_clip_tpu.models.config import CLIPCfg
from spatial_clip_tpu.models.transformer import (
    GeneMLPTower,
    TextTransformer,
    VisionTransformer,
    quick_gelu,
)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # normalize in fp32 for stable unit vectors under bf16 compute
    x32 = x.astype(jnp.float32)
    return x32 / jnp.maximum(jnp.linalg.norm(x32, axis=axis, keepdims=True), eps)


class CLIP(nn.Module):
    """Contrastive two-tower model.

    ``text`` input is token ids (B, L) for the transformer tower, or a
    rank-weighted gene-expression vector (B, num_genes) when the config sets
    ``gene_cfg`` (GeneMLP tower).
    """

    cfg: CLIPCfg
    dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        v = self.cfg.vision_cfg
        act = quick_gelu if self.cfg.quick_gelu else nn.gelu
        image_size = v.image_size if isinstance(v.image_size, int) else v.image_size[0]
        if v.timm_model_name:
            from spatial_clip_tpu.models.timm_model import TimmStyleTower

            self.visual = TimmStyleTower(
                model_name=v.timm_model_name,
                embed_dim=self.cfg.embed_dim,
                image_size=image_size,
                pool=v.timm_pool,
                proj=v.timm_proj,
                proj_bias=v.timm_proj_bias,
                drop=v.timm_drop,
                dtype=self.dtype,
            )
        elif isinstance(v.layers, (list, tuple)):
            # a list of stage depths selects the modified ResNet tower
            # (ref: model.py:133-206 _build_vision_tower)
            from spatial_clip_tpu.models.modified_resnet import ModifiedResNet

            self.visual = ModifiedResNet(
                layers=tuple(v.layers),
                width=v.width,
                image_size=image_size,
                heads=v.width * 32 // 64,
                output_dim=self.cfg.embed_dim,
                dtype=self.dtype,
            )
        else:
            self.visual = VisionTransformer(
                image_size=image_size,
                patch_size=v.patch_size,
                width=v.width,
                layers=v.layers,
                heads=v.heads,
                mlp_ratio=v.mlp_ratio,
                output_dim=self.cfg.embed_dim,
                ls_init_value=v.ls_init_value,
                patch_dropout=v.patch_dropout,
                attentional_pool=v.attentional_pool,
                attn_pooler_queries=v.attn_pooler_queries,
                attn_pooler_heads=v.attn_pooler_heads,
                no_ln_pre=v.no_ln_pre,
                pos_embed_type=v.pos_embed_type,
                final_ln_after_pool=v.final_ln_after_pool,
                pool_type=v.pool_type,
                qk_norm=v.qk_norm,
                scaled_cosine=v.scaled_cosine,
                patchify_impl=v.patchify_impl,
                norm_eps=v.norm_eps,
                dtype=self.dtype,
                act=act,
                remat=self.remat,
                attn_impl=self.cfg.attn_impl,
                mlp_impl=self.cfg.mlp_impl,
                ln_stats=self.cfg.ln_impl,
                ln_gemm_impl=self.cfg.ln_gemm_impl,
            )
        if self.cfg.gene_cfg is not None:
            g = self.cfg.gene_cfg
            self.text = GeneMLPTower(
                num_genes=g.num_genes,
                width=g.width,
                layers=g.layers,
                output_dim=self.cfg.embed_dim,
                gene_dropout=g.gene_dropout,
                norm_eps=g.norm_eps,
                ln_stats=self.cfg.ln_impl,
                dtype=self.dtype,
            )
        elif self.cfg.text_cfg.hf_config is not None or self.cfg.text_cfg.hf_model_name:
            from spatial_clip_tpu.models.hf_model import HFTextTower

            t = self.cfg.text_cfg
            self.text = HFTextTower(
                output_dim=self.cfg.embed_dim,
                arch=t.hf_model_arch,
                hf_config=t.hf_config,
                pooler_type=t.hf_pooler_type,
                proj_type=t.hf_proj_type,
                pad_id=t.pad_id,
                dtype=self.dtype,
            )
        else:
            t = self.cfg.text_cfg
            self.text = TextTransformer(
                context_length=t.context_length,
                vocab_size=t.vocab_size,
                width=t.width,
                heads=t.heads,
                layers=t.layers,
                mlp_ratio=t.mlp_ratio,
                output_dim=self.cfg.embed_dim,
                ls_init_value=t.ls_init_value,
                embed_cls=t.embed_cls,
                no_causal_mask=t.no_causal_mask,
                pad_id=t.pad_id,
                pool_type=t.pool_type,
                qk_norm=t.qk_norm,
                final_ln_after_pool=t.final_ln_after_pool,
                proj_bias=t.proj_bias,
                norm_eps=t.norm_eps,
                dtype=self.dtype,
                act=act,
                remat=self.remat,
                attn_impl=self.cfg.attn_impl,
                mlp_impl=self.cfg.mlp_impl,
                ln_stats=self.cfg.ln_impl,
                ln_gemm_impl=self.cfg.ln_gemm_impl,
            )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(self.cfg.init_logit_scale),
            (),
            jnp.float32,
        )
        if self.cfg.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias",
                nn.initializers.constant(self.cfg.init_logit_bias),
                (),
                jnp.float32,
            )
        else:
            self.logit_bias = None

    def _zip_ready(self) -> bool:
        """Static (trace-time) eligibility of the zipped dual-tower path.

        zip_towers='auto' zips only when both towers are standard
        equal-depth transformers whose attention resolves to the Pallas
        kernel (TPU backend); 'on' forces it (interpret mode off-TPU, for
        parity tests); 'off' never zips. Any exotic block feature
        (qk-norm, scaled-cosine, fused-LN, remat) falls back to the
        sequential towers, which support everything.
        """
        z = getattr(self.cfg, "zip_towers", "off")
        if z == "off" or self.remat:
            return False
        v, t = self.cfg.vision_cfg, self.cfg.text_cfg
        if (
            v.timm_model_name
            or isinstance(v.layers, (list, tuple))
            or self.cfg.gene_cfg is not None
            or t.hf_config is not None
            or t.hf_model_name
        ):
            return False
        if v.layers != t.layers:
            return False
        if v.qk_norm or v.scaled_cosine or t.qk_norm:
            return False
        if self.cfg.ln_gemm_impl != "dense":
            return False
        if self.cfg.attn_impl not in ("auto", "pallas"):
            return False
        from spatial_clip_tpu.ops import fused_attention as fa

        if not fa.pair_supported(v.heads, v.width, t.heads, t.width):
            return False
        if z == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return True

    def encode_pair(
        self,
        images: jnp.ndarray,
        text: jnp.ndarray,
        normalize: bool = True,
        deterministic: bool = True,
    ):
        """Both towers with layer-i attentions zipped into ONE Pallas call.

        Exact same math as encode_image + encode_text (tests enforce
        parity); only the custom-call count differs (2 per layer -> 1).
        See ops/fused_attention.fused_attention_pair for the motivation
        (per-invocation boundary tax dominates the attention family).
        """
        import jax

        from spatial_clip_tpu.ops import fused_attention as fa

        interp = jax.default_backend() != "tpu"
        xa = self.visual.embed(images, deterministic=deterministic)
        xb, mask_b = self.text.embed(text)
        blocks_a = self.visual.transformer.resblocks
        blocks_b = self.text.transformer.resblocks
        for ba, bb in zip(blocks_a, blocks_b):
            qa = ba.attn_qkv(xa)
            qb = bb.attn_qkv(xb)
            ca, cb = fa.fused_attention_pair(
                qa, None, qb, mask_b, ba.heads, bb.heads, interp
            )
            xa = ba.attn_finish(xa, ca)
            xb = bb.attn_finish(xb, cb)
        img = self.visual.head(xa)
        txt = self.text.head(xb, text)
        if normalize:
            img, txt = l2_normalize(img), l2_normalize(txt)
        return img, txt

    def encode_image(
        self, images: jnp.ndarray, normalize: bool = True, deterministic: bool = True
    ) -> jnp.ndarray:
        feats = self.visual(images, deterministic=deterministic)
        return l2_normalize(feats) if normalize else feats

    def encode_text(
        self, text: jnp.ndarray, normalize: bool = True, deterministic: bool = True
    ) -> jnp.ndarray:
        feats = self.text(text, deterministic=deterministic)
        return l2_normalize(feats) if normalize else feats

    def __call__(
        self,
        images: Optional[jnp.ndarray] = None,
        text: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        if images is not None and text is not None and self._zip_ready():
            out["image_features"], out["text_features"] = self.encode_pair(
                images, text, deterministic=deterministic
            )
        elif images is not None and text is not None:
            out["image_features"] = self.encode_image(
                images, deterministic=deterministic
            )
            out["text_features"] = self.encode_text(text, deterministic=deterministic)
        elif images is not None:
            out["image_features"] = self.encode_image(
                images, deterministic=deterministic
            )
        elif text is not None:
            out["text_features"] = self.encode_text(text, deterministic=deterministic)
        out["logit_scale"] = jnp.exp(self.logit_scale)
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias
        return out
