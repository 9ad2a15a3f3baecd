#!/usr/bin/env python
"""Offline pretrained-tag end-to-end rehearsal.

Proves the north-star "checkpoint-compatible embeddings" path as ONE flow
(ref: src/open_clip/factory.py:181-225 create_model(pretrained=...) +
:829-966 tag resolution):

  1. synthesize a torch open_clip state dict locally (jax->torch export of a
     seeded model — torch is installed, the hub is not),
  2. register it as a local-path pretrained TAG (models.pretrained
     .register_pretrained),
  3. create_model(model, pretrained=<tag>): registry resolution -> torch
     checkpoint converter -> params,
  4. assert the restored model's embeddings EQUAL the source model's,
  5. train N steps on synthetic spatial data,
  6. eval (in-batch retrieval),
  7. re-export the trained params to a torch state dict, reload through the
     same tag machinery, and assert embedding parity again.

    python scripts/pretrained_rehearsal.py --model ViT-B-32 --steps 10
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def rehearse(model_name: str = "ViT-B-32", steps: int = 10, batch: int = 8,
             platform: str = "cpu", tol: float = 2e-5) -> dict:
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp
    import torch

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.models.convert import jax_to_torch_state_dict
    from spatial_clip_tpu.models.pretrained import (
        _PRETRAINED,
        register_pretrained,
    )
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    report: dict = {"model": model_name, "steps": steps}
    tag = "local-rehearsal"
    t0 = time.time()

    def embeddings(bundle, params, images, texts):
        out = bundle.model.apply(
            {"params": params}, jnp.asarray(images), jnp.asarray(texts))
        return (np.asarray(out["image_features"], np.float32),
                np.asarray(out["text_features"], np.float32))

    rng = np.random.default_rng(0)
    src = create_model(model_name, precision="fp32", seed=7)
    size = src.cfg.vision_cfg.image_size
    probe_img = rng.normal(0, 1, (2, size, size, 3)).astype(np.float32)
    probe_txt = rng.integers(
        0, src.cfg.text_cfg.vocab_size,
        (2, src.cfg.text_cfg.context_length)).astype(np.int32)

    try:
        with tempfile.TemporaryDirectory() as td:
            # 1-2: export + register as a tag
            ckpt = Path(td) / "synth_open_clip.pt"
            sd = {k: torch.tensor(np.asarray(v))
                  for k, v in jax_to_torch_state_dict(src.params).items()}
            torch.save(sd, ckpt)
            register_pretrained(model_name, tag, str(ckpt), quick_gelu=False)

            # 3-4: tag resolution -> converter -> embedding parity
            restored = create_model(
                model_name, pretrained=tag, precision="fp32", seed=0)
            ia, ta = embeddings(src, src.params, probe_img, probe_txt)
            ib, tb = embeddings(restored, restored.params, probe_img, probe_txt)
            report["restore_img_maxdiff"] = float(np.abs(ia - ib).max())
            report["restore_txt_maxdiff"] = float(np.abs(ta - tb).max())
            assert report["restore_img_maxdiff"] < tol, report
            assert report["restore_txt_maxdiff"] < tol, report

            # 5: short synthetic spatial training run from the restored tag
            tr = Trainer(
                restored, loss=make_loss("spatial", cap_logit_scale=50.0),
                config=TrainerConfig(warmup_steps=2, total_steps=steps,
                                     augment=True, color_jitter=0.2,
                                     log_every=10 ** 9, seed=0),
            )
            step = tr.make_train_step()
            state = tr.init_state()
            tid = np.arange(batch, dtype=np.int32)
            db = tr._device_batch({
                "images": rng.integers(0, 255, (batch, size, size, 3),
                                       dtype=np.uint8),
                "texts": rng.integers(
                    0, restored.cfg.text_cfg.vocab_size,
                    (batch, restored.cfg.text_cfg.context_length)
                ).astype(np.int32),
                "image_tile_ids": tid, "text_tile_ids": tid,
                "neighbor_tile_ids": rng.integers(-1, batch, (batch, 4)
                                                  ).astype(np.int32),
                "neighbor_alphas": rng.uniform(0, 1, (batch, 4)
                                               ).astype(np.float32),
            })
            losses = []
            for _ in range(steps):
                state, m = step(state, db)
                losses.append(float(np.asarray(m["loss"])))
            report["first_loss"], report["last_loss"] = losses[0], losses[-1]
            assert np.isfinite(losses).all()

            # 6: eval — in-batch retrieval on the training probe
            trained = jax.tree.map(np.asarray, state.params)
            ic, tc = embeddings(restored, trained, probe_img, probe_txt)
            sim = ic @ tc.T
            report["eval_diag_top1"] = float(
                (sim.argmax(axis=1) == np.arange(len(sim))).mean())

            # 7: re-export trained params -> reload via the SAME tag -> parity
            ckpt2 = Path(td) / "trained_reexport.pt"
            sd2 = {k: torch.tensor(np.asarray(v))
                   for k, v in jax_to_torch_state_dict(trained).items()}
            torch.save(sd2, ckpt2)
            register_pretrained(model_name, tag, str(ckpt2), quick_gelu=False)
            back = create_model(
                model_name, pretrained=tag, precision="fp32", seed=0)
            id_, td_ = embeddings(back, back.params, probe_img, probe_txt)
            report["roundtrip_img_maxdiff"] = float(np.abs(ic - id_).max())
            report["roundtrip_txt_maxdiff"] = float(np.abs(tc - td_).max())
            assert report["roundtrip_img_maxdiff"] < tol, report
            assert report["roundtrip_txt_maxdiff"] < tol, report
    finally:
        _PRETRAINED.get(model_name, {}).pop(tag, None)

    report["wall_s"] = round(time.time() - t0, 1)
    report["ok"] = True
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = rehearse(args.model, args.steps, args.batch, args.platform)
    print(json.dumps(report, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
