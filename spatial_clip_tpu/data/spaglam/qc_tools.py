"""Post-run QC artifacts (ref: src/spaglam_preproc/qc_tools.py:23-110):
a summary JSON over produced shards and a tile/sentence grid PNG."""
from __future__ import annotations

import io
import json
import tarfile
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from PIL import Image, ImageDraw


def summarize_shards(output_dir: Path, max_samples: int = 2000) -> Dict:
    shards = sorted(Path(output_dir).rglob("*.tar"))
    n_samples = 0
    sentence_lens: List[int] = []
    tile_shapes = set()
    for tp in shards:
        with tarfile.open(tp) as tf:
            keys = {}
            for m in tf.getmembers():
                stem, _, ext = m.name.rpartition(".")
                keys.setdefault(stem, set()).add(ext)
                if ext == "txt" and len(sentence_lens) < max_samples:
                    sentence_lens.append(
                        len(tf.extractfile(m).read().decode().split())
                    )
                elif ext == "png" and len(tile_shapes) < 4:
                    img = Image.open(io.BytesIO(tf.extractfile(m).read()))
                    tile_shapes.add(img.size)
            n_samples += sum(1 for exts in keys.values() if "png" in exts and "txt" in exts)
    return {
        "output_dir": str(output_dir),
        "n_shards": len(shards),
        "n_samples": n_samples,
        "sentence_len_mean": float(np.mean(sentence_lens)) if sentence_lens else 0.0,
        "sentence_len_min": int(min(sentence_lens)) if sentence_lens else 0,
        "sentence_len_max": int(max(sentence_lens)) if sentence_lens else 0,
        "tile_sizes": sorted(map(list, tile_shapes)),
    }


def write_qc_report(
    output_dir: Path, grid: int = 4, report_name: str = "qc_report.json",
    grid_name: str = "qc_grid.png",
) -> Dict:
    """Summary JSON + a grid PNG of sample tiles captioned with the first
    genes of their sentences (ref: qc_tools.py:23-110)."""
    output_dir = Path(output_dir)
    summary = summarize_shards(output_dir)
    (output_dir / report_name).write_text(json.dumps(summary, indent=2))

    # collect up to grid*grid (tile, sentence) pairs
    pairs = []
    for tp in sorted(output_dir.rglob("*.tar")):
        with tarfile.open(tp) as tf:
            groups: Dict[str, Dict[str, bytes]] = {}
            for m in tf.getmembers():
                stem, _, ext = m.name.rpartition(".")
                if ext in ("png", "txt"):
                    groups.setdefault(stem, {})[ext] = tf.extractfile(m).read()
            for stem in sorted(groups):
                g = groups[stem]
                if "png" in g and "txt" in g:
                    pairs.append((g["png"], g["txt"].decode()))
                if len(pairs) >= grid * grid:
                    break
        if len(pairs) >= grid * grid:
            break
    if pairs:
        tile = Image.open(io.BytesIO(pairs[0][0]))
        tw, th = tile.size
        caption_h = 14
        canvas = Image.new("RGB", (grid * tw, grid * (th + caption_h)), "white")
        draw = ImageDraw.Draw(canvas)
        for i, (png, sentence) in enumerate(pairs):
            r, c = divmod(i, grid)
            img = Image.open(io.BytesIO(png)).convert("RGB")
            canvas.paste(img, (c * tw, r * (th + caption_h)))
            draw.text(
                (c * tw + 2, r * (th + caption_h) + th + 1),
                " ".join(sentence.split()[:3]),
                fill="black",
            )
        canvas.save(output_dir / grid_name)
        summary["grid_png"] = str(output_dir / grid_name)
    return summary
