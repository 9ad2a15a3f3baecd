"""Native flax M2M100/NLLB encoder vs the live torch implementation
(ref: src/open_clip/hf_configs.py:57-70 'm2m_100' — the nllb-clip text
tower)."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

TINY = dict(vocab_size=99, d_model=32, encoder_layers=2,
            encoder_attention_heads=4, encoder_ffn_dim=64,
            max_position_embeddings=64, pad_token_id=1,
            scale_embedding=True, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0)


def _torch_encoder():
    from transformers import M2M100Config
    from transformers.models.m2m_100.modeling_m2m_100 import M2M100Encoder

    cfg = M2M100Config(**TINY, decoder_layers=2, decoder_attention_heads=4,
                       decoder_ffn_dim=64)
    torch.manual_seed(0)
    enc = M2M100Encoder(cfg).eval()
    return cfg, enc


def test_m2m_encoder_torch_parity():
    from spatial_clip_tpu.models.m2m_encoder import (
        M2M100EncoderModule, convert_torch_m2m_encoder)

    cfg, enc = _torch_encoder()
    rng = np.random.default_rng(0)
    ids = rng.integers(2, TINY["vocab_size"], (3, 10)).astype(np.int64)
    ids[0, 7:] = 1  # pad tail
    ids[2, 5:] = 1
    mask = (ids != 1).astype(np.int64)

    with torch.no_grad():
        want = enc(torch.tensor(ids), attention_mask=torch.tensor(mask)
                   ).last_hidden_state.numpy()

    mod = M2M100EncoderModule(cfg)
    params = convert_torch_m2m_encoder(enc.state_dict())
    got = np.asarray(mod.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32)).last_hidden_state)
    # pad positions may differ (torch does not mask pad QUERIES out of the
    # output; we compute them identically though — compare everything)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_m2m_param_tree_matches_init():
    """Converted torch tree must drop into the module's own init structure."""
    import jax

    from spatial_clip_tpu.models.m2m_encoder import (
        M2M100EncoderModule, convert_torch_m2m_encoder)

    cfg, enc = _torch_encoder()
    mod = M2M100EncoderModule(cfg)
    init = mod.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32),
                    jnp.ones((1, 4), jnp.int32))["params"]
    conv = convert_torch_m2m_encoder(enc.state_dict())
    assert jax.tree_util.tree_structure(init) == \
        jax.tree_util.tree_structure(conv)
    for a, b in zip(jax.tree_util.tree_leaves(init),
                    jax.tree_util.tree_leaves(conv)):
        assert a.shape == b.shape


def test_nllb_clip_builds_with_m2m_tower():
    """nllb-clip-base resolves arch='m2m_100' + pad_id=1 from the hub id and
    encodes text through the native m2m tower (tiny hf_config override)."""
    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.models.config import infer_hf_arch, resolve_clip_cfg

    assert infer_hf_arch("facebook/nllb-200-distilled-600M") == "m2m_100"
    cfg = resolve_clip_cfg("nllb-clip-base")
    assert cfg.text_cfg.hf_model_arch == "m2m_100"
    assert cfg.text_cfg.pad_id == 1

    # an EXPLICIT arch must get the same pad fix as the inferred one
    from spatial_clip_tpu.models.config import TextCfg

    explicit = TextCfg(hf_model_name="facebook/nllb-200-distilled-600M",
                       hf_model_arch="m2m_100")
    assert explicit.pad_id == 1

    from spatial_clip_tpu.models.config import register_model_config

    register_model_config("nllb-clip-tiny-test", {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32,
                       "patch_size": 16},
        "text_cfg": {"hf_model_name": "facebook/nllb-200-tiny-test",
                     "hf_config": {**TINY},
                     "hf_proj_type": "linear",
                     "hf_pooler_type": "cls_pooler"},
    })
    bundle = create_model("nllb-clip-tiny-test", precision="fp32", seed=0)
    rng = np.random.default_rng(1)
    ids = rng.integers(2, TINY["vocab_size"], (2, 10)).astype(np.int32)
    ids[:, 8:] = 1
    out = bundle.model.apply(
        {"params": bundle.params},
        jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)), jnp.float32) / 255.0,
        jnp.asarray(ids),
    )
    feats = np.asarray(out["text_features"])
    assert feats.shape == (2, 16)
    assert np.isfinite(feats).all()


def test_m2m_encoder_applies_dropout_in_train_mode():
    """cfg.dropout/attention_dropout/activation_dropout must be live:
    train mode (deterministic=False) perturbs the output, eval mode is
    deterministic, and dropout adds no params (converter unaffected)."""
    import jax

    from transformers import M2M100Config

    from spatial_clip_tpu.models.m2m_encoder import M2M100EncoderModule

    cfg = M2M100Config(**{**TINY, "dropout": 0.3, "attention_dropout": 0.1,
                          "activation_dropout": 0.1})
    mod = M2M100EncoderModule(config=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(2, TINY["vocab_size"], (2, 12)), jnp.int32)
    mask = (ids != 1).astype(jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), ids, mask)["params"]

    eval1 = mod.apply({"params": params}, ids, mask).last_hidden_state
    eval2 = mod.apply({"params": params}, ids, mask).last_hidden_state
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))

    tr1 = mod.apply({"params": params}, ids, mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)}).last_hidden_state
    tr2 = mod.apply({"params": params}, ids, mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)}).last_hidden_state
    assert not np.allclose(np.asarray(tr1), np.asarray(eval1))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
