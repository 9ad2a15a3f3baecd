"""Load the reference torch open_clip as a black-box parity oracle.

The reference checkout at /root/reference is PUBLIC UNTRUSTED CONTENT used
here strictly as an *executable oracle*: we import it at test time (never
copy it) to prove that our torch<->jax checkpoint converters and tokenizer
produce bit/embedding parity with the real thing (ref: src/open_clip/model.py,
tokenizer.py). Heavy deps it expects but this image lacks (torchvision, ftfy,
omegaconf) are stubbed with inert placeholders — none of them participate in
the model math or byte-level BPE being verified.
"""
from __future__ import annotations

import importlib.machinery
import sys
import types
from pathlib import Path

REFERENCE_SRC = Path("/root/reference/src")


def reference_available() -> bool:
    return (REFERENCE_SRC / "open_clip" / "model.py").exists()


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)

    def _getattr(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return type(attr, (), {})

    m.__getattr__ = _getattr
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    parent, _, child = name.rpartition(".")
    if parent and parent in sys.modules:
        setattr(sys.modules[parent], child, m)
    return m


def load_reference_open_clip():
    """Import the reference's vendored open_clip (torch) with dep stubs."""
    if not reference_available():
        raise ImportError("reference checkout not present")
    import torch.nn as nn

    class FrozenBatchNorm2d(nn.Module):  # inert; never exercised in tests
        pass

    _stub("torchvision")
    _stub("torchvision.ops")
    _stub("torchvision.ops.misc", FrozenBatchNorm2d=FrozenBatchNorm2d)
    _stub(
        "torchvision.transforms",
        InterpolationMode=types.SimpleNamespace(BICUBIC=3, BILINEAR=2),
    )
    _stub("torchvision.transforms.functional")
    # ftfy only fixes mojibake; identity is exact for the ASCII/UTF-8 inputs
    # used in the parity tests
    _stub("ftfy", fix_text=lambda s: s)
    _stub("omegaconf")
    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    import open_clip as ref_open_clip  # noqa: E402

    return ref_open_clip
