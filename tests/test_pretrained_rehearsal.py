"""Offline pretrained-tag end-to-end flow (scripts/pretrained_rehearsal.py):
synthesized torch open_clip checkpoint -> registered local tag -> factory
resolution -> converter -> train -> eval -> torch re-export, with embedding
parity asserted at both conversion boundaries (ref: factory.py:181-225,
829-966)."""
import pytest


def test_pretrained_tag_rehearsal_tiny():
    from scripts.pretrained_rehearsal import rehearse

    # batch divisible by the conftest 8-device virtual mesh
    report = rehearse("ViT-Test", steps=3, batch=8, platform=None)
    assert report["ok"]
    assert report["restore_img_maxdiff"] < 2e-5
    assert report["roundtrip_txt_maxdiff"] < 2e-5


@pytest.mark.slow
def test_pretrained_tag_rehearsal_flagship():
    from scripts.pretrained_rehearsal import rehearse

    report = rehearse("ViT-B-32", steps=4, batch=8, platform=None)
    assert report["ok"]


def test_registry_unpolluted_after_rehearsal():
    """rehearse() must remove its temporary tag (the registry surface is
    pinned at the reference's exact 192 pairs elsewhere in the suite)."""
    from spatial_clip_tpu.models.pretrained import list_pretrained

    assert ("ViT-Test", "local-rehearsal") not in list_pretrained()
    assert ("ViT-B-32", "local-rehearsal") not in list_pretrained()
