"""Config system tests: defaults, YAML load (incl. the reference's own
train_config.yaml), CLI overrides, unknown-key rejection."""

import pytest

from vfi_tpu.utils.config import ColorJitterConfig, TrainConfig, load_train_config

REFERENCE_YAML = "/root/reference/config/train_config.yaml"


def test_defaults_match_shipped_yaml_values():
    cfg = TrainConfig()
    assert cfg.batch_size == 4
    assert cfg.learning_rate == 5e-4
    assert cfg.charbonnier_weight == 0.5
    assert cfg.vgg_weight == 0.15  # yaml value, NOT train.py's 0.05 fallback
    assert cfg.color_weight == 0.3
    assert cfg.crop_size == (256, 256)
    assert cfg.color_jitter == ColorJitterConfig(0.2, 0.2, 0.2, 0.1)


def test_loads_reference_yaml_unmodified():
    import os

    if not os.path.exists(REFERENCE_YAML):
        pytest.skip("reference yaml not mounted")
    cfg = load_train_config(REFERENCE_YAML)
    assert cfg.batch_size == 4
    assert cfg.num_epochs == 100
    assert cfg.temporal_weight == 0.15
    assert cfg.random_grayscale == 0.2
    assert cfg.crop_size == (256, 256)
    assert cfg.gradient_order == 1  # dead key accepted


def test_cli_overrides():
    cfg = load_train_config(None, ["--batch_size", "16",
                                   "--color_jitter.hue", "0.3",
                                   "--mesh.data", "4",
                                   "--bf16", "false"])
    assert cfg.batch_size == 16
    assert cfg.color_jitter.hue == 0.3
    assert cfg.mesh.data == 4
    assert cfg.bf16 is False


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("batch_size: 4\nnot_a_key: 1\n")
    with pytest.raises(KeyError):
        load_train_config(str(bad))


def test_override_must_be_pairs():
    with pytest.raises(ValueError):
        load_train_config(None, ["--batch_size"])


def test_cli_override_scientific_notation_coerces_to_float():
    """PyYAML (YAML 1.1) parses '2e-5' as a STRING — the loader must coerce
    to the declared field type. Regression: plateau_min_lr reached the
    scheduler as a str and crashed max(lr*factor, min_lr) at the first
    LR-reduction epoch."""
    cfg = load_train_config(None, ["--plateau_min_lr", "2e-5",
                                   "--learning_rate", "1e-3"])
    assert isinstance(cfg.plateau_min_lr, float) and cfg.plateau_min_lr == 2e-5
    assert isinstance(cfg.learning_rate, float) and cfg.learning_rate == 1e-3


def test_cli_override_bool_and_optional_coercion():
    cfg = load_train_config(None, [
        "--target_unit_range", "true",
        "--random_rotation", "false",
        "--dcn_max_offset", "2",
        "--warp_max_flow", "none",
    ])
    assert cfg.target_unit_range is True
    assert cfg.random_rotation is False
    assert cfg.dcn_max_offset == 2 and isinstance(cfg.dcn_max_offset, int)
    assert cfg.warp_max_flow is None


def test_cli_override_dcn_tile_w():
    """--dcn_tile_w threads the column-tile knob (docs/PERFORMANCE.md
    "Column-tiled predicates") as Optional[int]: explicit width coerces to
    int, 'none' restores the auto planner."""
    cfg = load_train_config(None, ["--dcn_tile_w", "256"])
    assert cfg.dcn_tile_w == 256 and isinstance(cfg.dcn_tile_w, int)
    cfg = load_train_config(None, ["--dcn_tile_w", "none"])
    assert cfg.dcn_tile_w is None


def test_cli_override_tuple_field():
    cfg = load_train_config(None, ["--crop_size", "[128, 96]"])
    assert cfg.crop_size == (128, 96)
    assert all(isinstance(v, int) for v in cfg.crop_size)


def test_cli_override_rejects_non_numeric_float():
    import pytest

    with pytest.raises((ValueError, TypeError)):
        load_train_config(None, ["--learning_rate", "fast"])


def test_bool_value_rejected_for_numeric_fields():
    # `--learning_rate true` must raise, not silently store True in a float
    # field (bools are ints in Python).
    import pytest

    from vfi_tpu.utils.config import load_train_config

    with pytest.raises(ValueError):
        load_train_config(overrides=["--learning_rate", "true"])
    with pytest.raises(ValueError):
        load_train_config(overrides=["--num_epochs", "false"])
    # bool fields still accept the usual spellings
    cfg = load_train_config(overrides=["--bf16", "false", "--resume", "1"])
    assert cfg.bf16 is False and cfg.resume is True
