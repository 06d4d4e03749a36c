"""Config-schema validation: corpus decks pass; malformed decks fail with the
offending key path in the error message (SURVEY.md §5 typed/validated config)."""

import copy
import glob
import os

import pytest
import yaml

from tsadar_tpu.utils.config import merge_configs
from tsadar_tpu.utils.schema import ConfigError, validate_config

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")


def _load_pair(defaults, inputs):
    with open(defaults) as f:
        d = yaml.safe_load(f)
    with open(inputs) as f:
        i = yaml.safe_load(f)
    return merge_configs(d, i)


def _corpus():
    pairs = []
    for d in sorted(glob.glob(os.path.join(ROOT, "configs", "*", ""))):
        dp, ip = os.path.join(d, "defaults.yaml"), os.path.join(d, "inputs.yaml")
        if os.path.exists(dp) and os.path.exists(ip):
            pairs.append((dp, ip, "forward" if "series" in d else "fit"))
    tc = os.path.join(ROOT, "tests", "configs")
    pairs.append((os.path.join(tc, "time_test_defaults.yaml"), os.path.join(tc, "time_test_inputs.yaml"), "fit"))
    pairs.append((os.path.join(tc, "arts2v_test_defaults.yaml"), os.path.join(tc, "arts2d_test_inputs.yaml"), "fit"))
    return pairs


@pytest.mark.parametrize("defaults,inputs,mode", _corpus())
def test_reference_corpus_validates(defaults, inputs, mode):
    validate_config(_load_pair(defaults, inputs), mode=mode)


@pytest.fixture()
def good_config():
    tc = os.path.join(ROOT, "tests", "configs")
    return _load_pair(os.path.join(tc, "time_test_defaults.yaml"), os.path.join(tc, "time_test_inputs.yaml"))


def _expect_error(cfg, path_fragment):
    with pytest.raises(ConfigError) as exc:
        validate_config(cfg, mode="fit")
    assert path_fragment in str(exc.value), str(exc.value)


def test_typo_in_fe_type_names_key_and_suggests(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["parameters"]["electron"]["fe"]["type"] = "dlmm"
    with pytest.raises(ConfigError) as exc:
        validate_config(cfg, mode="fit")
    msg = str(exc.value)
    assert "parameters.electron.fe.type" in msg and "dlm" in msg


def test_bad_spectype_enum(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["other"]["extraoptions"]["spectype"] = "tempral"
    _expect_error(cfg, "other.extraoptions.spectype")


def test_bad_background_type(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["data"]["background"]["type"] = "pixle"
    _expect_error(cfg, "data.background.type")


def test_bad_optimizer_method(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["optimizer"]["method"] = "adamm"
    _expect_error(cfg, "optimizer.method")


def test_optax_methods_accepted(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["optimizer"]["method"] = "adamw"  # any optax optimizer is valid (ARTS loop)
    validate_config(cfg, mode="fit")


def test_non_numeric_val(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["parameters"]["electron"]["Te"]["val"] = "hot"
    _expect_error(cfg, "parameters.electron.Te.val")


def test_inverted_bounds_on_active_param(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["parameters"]["electron"]["Te"].update({"active": True, "lb": 2.0, "ub": 1.0})
    _expect_error(cfg, "parameters.electron.Te")


def test_inverted_bounds_on_inactive_param_allowed(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["parameters"]["electron"]["Te"].update({"active": False, "lb": 1.0, "ub": 1.0})
    validate_config(cfg, mode="fit")


def test_missing_sections_required_for_fit(good_config):
    cfg = copy.deepcopy(good_config)
    del cfg["optimizer"]
    _expect_error(cfg, "optimizer")
    cfg = copy.deepcopy(good_config)
    del cfg["data"]
    _expect_error(cfg, "data")


def test_forward_mode_does_not_require_fit_sections(good_config):
    cfg = copy.deepcopy(good_config)
    del cfg["optimizer"]
    validate_config(cfg, mode="forward")


def test_bad_batch_size(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["optimizer"]["batch_size"] = -4
    _expect_error(cfg, "optimizer.batch_size")


def test_bad_ccdsize_shape(good_config):
    cfg = copy.deepcopy(good_config)
    cfg["other"]["CCDsize"] = [1024]
    _expect_error(cfg, "other.CCDsize")
