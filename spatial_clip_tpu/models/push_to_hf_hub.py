"""Push a trained model to the Hugging Face Hub
(ref: src/open_clip/push_to_hf_hub.py:85-318).

Exports an open_clip-compatible torch checkpoint + config so reference-stack
users can consume checkpoints trained here. Gated on huggingface_hub being
installed and network access.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import tempfile
from pathlib import Path
from typing import Optional

log = logging.getLogger(__name__)


def save_for_hf(bundle, params, save_directory: str, model_card: Optional[str] = None):
    """Write the repo layout locally (usable without the hub)."""
    d = Path(save_directory)
    d.mkdir(parents=True, exist_ok=True)
    from spatial_clip_tpu.train.checkpoints import export_torch_state_dict

    export_torch_state_dict(params, str(d / "open_clip_pytorch_model.bin"))
    cfg = {
        "model_cfg": {
            "embed_dim": bundle.cfg.embed_dim,
            "vision_cfg": dataclasses.asdict(bundle.cfg.vision_cfg),
            "text_cfg": dataclasses.asdict(bundle.cfg.text_cfg),
            "quick_gelu": bundle.cfg.quick_gelu,
        },
        "preprocess_cfg": {
            "size": bundle.preprocess_cfg.size,
            "mean": list(bundle.preprocess_cfg.mean),
            "std": list(bundle.preprocess_cfg.std),
        },
    }
    (d / "open_clip_config.json").write_text(json.dumps(cfg, indent=2, default=str))
    if model_card:
        (d / "README.md").write_text(model_card)
    return d


def push_to_hf_hub(
    bundle,
    params,
    repo_id: str,
    commit_message: str = "Add model",
    private: bool = False,
    token: Optional[str] = None,
):
    try:
        from huggingface_hub import HfApi
    except ImportError as e:
        raise ImportError(
            "push_to_hf_hub requires huggingface_hub; "
            "use save_for_hf() for a local export instead"
        ) from e
    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        save_for_hf(bundle, params, tmp)
        api.upload_folder(
            repo_id=repo_id, folder_path=tmp, commit_message=commit_message
        )
    log.info("Pushed to https://huggingface.co/%s", repo_id)


def push_pretrained_to_hf_hub(
    model_name,
    pretrained: str,
    repo_id: str,
    precision: str = "fp32",
    commit_message: str = "Add model",
    token: Optional[str] = None,
    private: bool = False,
    **kwargs,
):
    """Build a pretrained model and push it (ref: push_to_hf_hub.py:156)."""
    from spatial_clip_tpu.models.factory import create_model

    bundle = create_model(
        model_name, pretrained=pretrained, precision=precision, **kwargs
    )
    push_to_hf_hub(
        bundle, bundle.params, repo_id,
        commit_message=commit_message, private=private, token=token,
    )
    return bundle
