"""Config composition system tests (Hydra-equivalent subset)."""
from pathlib import Path

import pytest

from spatial_clip_tpu.config import (
    compose,
    deep_merge,
    instantiate,
    resolve_interpolations,
)

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def test_compose_defaults_groups():
    cfg = compose(CONFIG_DIR, "train")
    assert cfg["data"]["_target_"].endswith("SpatialClipDataModule")
    assert cfg["loss"]["name"] == "spatial"
    assert cfg["optimizer"]["learning_rate"] == 5e-4
    assert cfg["seed"] == 42


def test_group_swap_and_value_overrides():
    cfg = compose(
        CONFIG_DIR,
        "train",
        ["loss=clip", "data=synthetic", "optimizer.learning_rate=0.001", "seed=7",
         "+custom.flag=true"],
    )
    assert cfg["loss"]["name"] == "clip"
    assert cfg["data"]["dataset_format"] == "synthetic"
    assert cfg["optimizer"]["learning_rate"] == 0.001
    assert cfg["seed"] == 7
    assert cfg["custom"]["flag"] is True


def test_experiment_global_package():
    cfg = compose(CONFIG_DIR, "train", ["experiment=smoke_synthetic"])
    assert cfg["model"]["model_name"] == "ViT-Test"
    assert cfg["data"]["dataset_format"] == "synthetic"
    assert cfg["name"] == "smoke_synthetic"


def test_interpolation():
    cfg = resolve_interpolations(
        {"a": {"b": 3}, "c": "${a.b}", "d": "x${a.b}y", "e": "${c}"}
    )
    assert cfg["c"] == 3  # whole-value keeps type
    assert cfg["d"] == "x3y"
    assert cfg["e"] == 3  # chained
    assert compose(CONFIG_DIR, "train", ["paths.root_dir=/tmp/x"])["paths"][
        "data_dir"
    ] == "/tmp/x/data"


def test_interpolation_cycle_detected():
    with pytest.raises(ValueError):
        resolve_interpolations({"a": "${b}", "b": "${a}"})


def test_instantiate_target_and_partial():
    obj = instantiate(
        {"_target_": "collections.OrderedDict", "a": 1, "b": {"c": 2}}
    )
    assert obj["a"] == 1 and obj["b"] == {"c": 2}
    p = instantiate({"_target_": "operator.add", "_partial_": True})
    assert p(2, 3) == 5


def test_deep_merge():
    assert deep_merge({"a": {"x": 1, "y": 2}}, {"a": {"y": 3}, "b": 4}) == {
        "a": {"x": 1, "y": 3},
        "b": 4,
    }


def test_delete_override():
    cfg = compose(CONFIG_DIR, "train", ["~optimized_metric"])
    assert "optimized_metric" not in cfg


def test_all_experiments_compose_and_datamodule_instantiates():
    """Config rot guard (ref pattern: dump tests/test_configs.py instantiates
    every composed config)."""
    from spatial_clip_tpu.config import instantiate

    exp_dir = CONFIG_DIR / "experiment"
    for f in sorted(exp_dir.glob("*.yaml")):
        cfg = compose(CONFIG_DIR, "train", [f"experiment={f.stem}"])
        dm = instantiate(cfg["data"])
        assert hasattr(dm, "train_dataloader"), f.stem
        assert cfg["loss"]["name"] in ("clip", "spatial", "siglip"), f.stem


def test_trainer_device_presets_compose():
    """Device presets (ref: configs/trainer/{cpu,gpu,ddp,ddp_sim}.yaml)."""
    for preset, expect in (
        ("cpu", {"platform": "cpu"}),
        ("tpu", {"platform": "tpu"}),
        ("tpu_pod", {"platform": "tpu", "multihost": True}),
        ("ddp_sim", {"platform": "cpu", "sim_devices": 8}),
    ):
        cfg = compose(CONFIG_DIR, "train", [f"trainer={preset}"])
        for k, v in expect.items():
            assert cfg["trainer"][k] == v, (preset, k)
        # presets inherit the default trainer knobs
        assert cfg["trainer"]["grad_clip_norm"] == 1.0, preset
