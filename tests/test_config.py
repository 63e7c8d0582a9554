"""Config-system tests: reference JSON layout loads into typed dataclasses."""

import json

import pytest

from edgegaussians_tpu.config import (FrameworkConfig, config_from_dict,
                                      load_config, resolve_capacity)


def test_shipped_configs_load():
    for name in ("ABC_DexiNed", "ABC_PidiNet", "DTU", "Replica"):
        cfg = load_config(f"configs/{name}.json")
        assert cfg.training.num_epochs > 0
        assert cfg.model.dup_factor >= 2
        assert cfg.training.optim.means.type == "step"
        assert cfg.parametric_fitting.angle_thresh > 0


def test_unknown_keys_tolerated():
    cfg = config_from_dict({
        "model": {"dup_factor": 5, "bogus_key": 1,
                  "if reset_opacity": False},   # reference's typo'd key
        "training": {"num_epochs": 7},
    })
    assert cfg.model.dup_factor == 5
    assert cfg.training.num_epochs == 7
    # missing keys silently take defaults (dacite-parity)
    assert cfg.model.cull_opacity_value == 0.05


def test_nested_optim_loss_sections():
    cfg = config_from_dict({
        "training": {
            "optim": {"means": {"type": "step", "start_lr": 0.5,
                                "milestones": [1], "gamma": 0.1}},
            "loss": {"projection_losses": {"loss_type": "l2"}},
        }})
    assert cfg.training.optim.means.start_lr == 0.5
    assert cfg.training.optim.scales.start_lr == 1e-4   # default preserved
    assert cfg.training.loss.projection_losses.loss_type == "l2"
    assert cfg.training.loss.orientation_losses.dir_loss_num_nn == 5


def test_resolve_capacity():
    cfg = FrameworkConfig().model
    cfg.max_num_gaussians = 0
    assert resolve_capacity(cfg, 2500) == 16384    # next pow2 >= 4x seeds
    cfg.max_num_gaussians = 999
    assert resolve_capacity(cfg, 10) == 999


def test_fast_config_variant():
    """configs/ABC_DexiNed_fast.json = shipped config with exactly the
    advertised speed knobs changed (and its own output exp_name)."""
    import json

    with open("configs/ABC_DexiNed.json") as f:
        base = json.load(f)
    with open("configs/ABC_DexiNed_fast.json") as f:
        fast = json.load(f)

    assert fast["training"]["num_epochs"] == 300
    assert fast["model"]["dup_threshold_type"] == "top_fraction"
    assert fast["model"]["dup_threshold_value"] == 0.2
    assert fast["output"]["exp_name"] != base["output"]["exp_name"]

    changed = set()
    for section in base:
        if not isinstance(base[section], dict):
            if fast.get(section) != base[section]:
                changed.add((section, ""))
            continue
        for k in base[section]:
            if fast.get(section, {}).get(k) != base[section][k]:
                changed.add((section, k))
    assert changed == {("training", "num_epochs"),
                       ("model", "dup_threshold_type"),
                       ("model", "dup_threshold_value"),
                       ("output", "exp_name")}, changed

    from edgegaussians_tpu.config import load_config
    cfg = load_config("configs/ABC_DexiNed_fast.json")
    assert cfg.model.dup_threshold_type == "top_fraction"
