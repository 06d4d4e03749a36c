"""Data-pipeline tests: HDF4 reader, loader orientations, prepare round trip,
and the CV feature detector (mirrors reference tests/test_inverse/test_feature_detector.py)."""

import os

import numpy as np
import pytest
import yaml

from tsadar_tpu.utils.data_handling.hdf4 import read_sds
from tsadar_tpu.utils.data_handling.load_ts_data import loadData
from tsadar_tpu.utils.config import merge_configs

DATA = os.path.join(os.path.dirname(__file__), "..", "..", "tsadar_tpu", "external", "data")
CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_hdf4_reader_all_files():
    files = sorted(f for f in os.listdir(DATA) if f.endswith(".hdf"))
    assert len(files) == 11
    for f in files:
        arr = read_sds(os.path.join(DATA, f))
        assert arr.shape == (2, 1024, 1024)
        assert arr.dtype.kind == "u"
        # CCD counts: sane dynamic range
        assert 100 < arr.mean() < 10000


def test_load_data_temporal():
    loadspecs = {"load_ion_spec": True, "load_ele_spec": True, "absolute_timing": False}
    eDat, iDat, xlab, t0, specType = loadData(101675, False, loadspecs)
    assert specType == "temporal"
    assert eDat.shape == (1024, 1024)
    assert iDat.shape == (1024, 1024)
    assert xlab == "Time (ps)"


def test_load_data_imaging_and_angular():
    loadspecs = {"load_ion_spec": True, "load_ele_spec": True, "absolute_timing": False}
    eDat, iDat, xlab, t0, specType = loadData(112059, False, loadspecs)
    assert specType == "imaging"
    assert eDat.shape == (1024, 1024)

    loadspecs = {"load_ion_spec": False, "load_ele_spec": True, "absolute_timing": False}
    eDat, iDat, xlab, t0, specType = loadData(94475, False, loadspecs)
    assert specType == "angular"
    assert eDat.shape == (1024, 1024)


def test_prepare_data_temporal():
    from tsadar_tpu.utils.process.prepare import prepare_data

    with open(os.path.join(CONFIGS, "time_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(CONFIGS, "time_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    config = merge_configs(defaults, inputs)
    config["data"]["lineouts"]["val"] = list(
        range(config["data"]["lineouts"]["start"], config["data"]["lineouts"]["end"], config["data"]["lineouts"]["skip"])
    )

    all_data, sa, all_axes = prepare_data(config, config["data"]["shotnum"])
    n = len(config["data"]["lineouts"]["val"])
    assert all_data["e_data"].shape == (n, 1024)
    assert np.all(np.isfinite(all_data["e_data"]))
    assert all_data["e_amps"].shape == (n,)
    assert (all_data["e_amps"] > 0).all()
    assert all_data["noiseE"].shape[0] == n
    assert config["other"]["npts"] == 1024 * config["other"]["points_per_pixel"]
    assert len(sa["sa"]) == 10
    assert sa["weights"].shape == (n, 10)


@pytest.mark.parametrize("bg_type", ["ps", "auto"])
def test_prepare_data_background_aliases(bg_type):
    """'ps'/'um'/'auto' background types are documented aliases for 'pixel'
    (reference evaluate_background.py:99-100) whose column is resolved by
    lineouts.py — the full prepare path must accept them (the reference's own
    get_lineout_bg rejects them, making the aliases dead on arrival there)."""
    from tsadar_tpu.utils.process.prepare import prepare_data

    with open(os.path.join(CONFIGS, "time_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(CONFIGS, "time_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    config = merge_configs(defaults, inputs)
    config["data"]["lineouts"]["val"] = list(
        range(config["data"]["lineouts"]["start"], config["data"]["lineouts"]["end"], config["data"]["lineouts"]["skip"])
    )
    config["data"]["background"]["type"] = bg_type
    if bg_type == "ps":
        config["data"]["background"]["slice"] = 4000.0  # a time, not a pixel

    all_data, sa, all_axes = prepare_data(config, config["data"]["shotnum"])
    n = len(config["data"]["lineouts"]["val"])
    assert all_data["e_data"].shape == (n, 1024)
    assert np.all(np.isfinite(all_data["e_data"]))
    assert np.all(np.isfinite(np.asarray(all_data["noiseE"], dtype=float)))


def test_feature_detector():
    """Port of reference tests/test_inverse/test_feature_detector.py:13-51."""
    from numpy.testing import assert_allclose
    from tsadar_tpu.utils.process.prepare import prepare_data

    with open(os.path.join(CONFIGS, "detector_inputs.yaml")) as fi:
        config = yaml.safe_load(fi)

    prepare_data(config, config["data"]["shotnum"])

    known_values = {
        "lineout_start": -900,
        "lineout_end": 402,
        "iaw_min": 526.23,
        "iaw_max": 526.58,
        "iaw_cf_min": 526.33,
        "iaw_cf_max": 526.47,
        "blue_min": 588,
        "blue_max": 598,
        "red_min": 454,
        "red_max": 439,
    }
    assert_allclose(config["data"]["lineouts"]["start"], known_values["lineout_start"], rtol=1e-1)
    assert_allclose(config["data"]["lineouts"]["end"], known_values["lineout_end"], rtol=1e-1)
    for k in ("iaw_min", "iaw_max", "iaw_cf_min", "iaw_cf_max", "blue_min", "blue_max", "red_min", "red_max"):
        assert_allclose(config["data"]["fit_rng"][k], known_values[k], rtol=1e-1)


def test_notch_target_row_is_shot_ranged():
    """The dewarp's absolute spectral anchor must come from the shot-ranged
    wavelength calibration — 528 nm sits at DIFFERENT rows for shots in
    different calibration ranges, so a constant would mis-register one of
    them (warpcorr.py docstring; values validated against the fitted amp1)."""
    from tsadar_tpu.utils.data_handling.load_ts_data import _notch_target_row

    r1 = _notch_target_row(101675, (1024, 1024))
    r2 = _notch_target_row(111411, (1024, 1024))
    assert abs(r1 - 507.53) < 0.1
    assert abs(r2 - 512.16) < 0.1
    assert abs(r1 - r2) > 3.0  # the per-shot difference a constant would lose
