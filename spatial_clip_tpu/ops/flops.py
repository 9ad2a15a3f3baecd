"""Model cost analysis via XLA (ref: open_clip_train/profiler.py:85-208,
which uses torch FlopCounterMode/fvcore; here XLA's compiled cost analysis
gives FLOPs + bytes directly from the real computation).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))


def xla_cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """FLOPs / bytes for a jitted function from XLA's cost model."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {k: float(v) for k, v in ca.items() if isinstance(v, (int, float))}
    except Exception:
        return {}


def profile_model(
    bundle, batch_size: int = 1, train: bool = False
) -> Dict[str, Any]:
    """GFLOPs / MParams report for one model bundle
    (ref: profiler.py output schema: image/text/total flops + params)."""
    import jax.numpy as jnp

    images, text = bundle.example_inputs(batch_size)
    images = images.astype(np.float32)

    def fwd_image(params, x):
        return bundle.model.apply(
            {"params": params}, x, method=type(bundle.model).encode_image
        )

    def fwd_text(params, t):
        return bundle.model.apply(
            {"params": params}, t, method=type(bundle.model).encode_text
        )

    def fwd_both(params, x, t):
        return bundle.model.apply({"params": params}, x, t)

    img_cost = xla_cost_analysis(fwd_image, bundle.params, images)
    txt_cost = xla_cost_analysis(fwd_text, bundle.params, text)
    total_cost = xla_cost_analysis(fwd_both, bundle.params, images, text)
    result = {
        "model": bundle.model_name,
        "image_size": bundle.cfg.vision_cfg.image_size,
        "mparams": round(count_params(bundle.params) / 1e6, 2),
        "image_gflops": round(img_cost.get("flops", 0) / batch_size / 1e9, 3),
        "text_gflops": round(txt_cost.get("flops", 0) / batch_size / 1e9, 3),
        "gflops": round(total_cost.get("flops", 0) / batch_size / 1e9, 3),
        "bytes_accessed_mb": round(total_cost.get("bytes accessed", 0) / 1e6, 1),
    }
    if train:

        def train_fwd_bwd(params, x, t):
            def loss_fn(p):
                out = bundle.model.apply({"params": p}, x, t)
                z = out["image_features"] @ out["text_features"].T * out["logit_scale"]
                labels = jnp.arange(z.shape[0])
                return -jax.nn.log_softmax(z, axis=-1)[labels, labels].mean()

            return jax.grad(loss_fn)(params)

        cost = xla_cost_analysis(train_fwd_bwd, bundle.params, images, text)
        result["train_gflops"] = round(cost.get("flops", 0) / batch_size / 1e9, 3)
    return result


def feature_take_indices(num_blocks: int, indices) -> list:
    """Normalize block-index specs (ref: src/open_clip/utils.py:94
    feature_take_indices): None -> all blocks; int n -> last n blocks;
    negatives wrap."""
    if indices is None:
        return list(range(num_blocks))
    if isinstance(indices, int):
        return list(range(num_blocks - indices, num_blocks))
    return [i if i >= 0 else num_blocks + i for i in indices]
