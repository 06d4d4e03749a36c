"""Multiplexed two-shot angular fitting: the second dataset is fit with the EDF
rotated by shot_rot (reference loss_function.py:287-317, fitter.py:91-110).

Uses the two shipped ATS shots (94475 / 94477) at reduced resolution.
"""

import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from tsadar_tpu.utils.config import merge_configs, set_forward_ranges
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles, get_calibrations
from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition, combine
from tsadar_tpu.inverse.loss import LossFunction

HERE = os.path.dirname(__file__)
CONFIGS = os.path.join(HERE, "..", "configs")


@pytest.mark.slow
def test_multiplexed_angular_loss_and_grad():
    with open(os.path.join(CONFIGS, "arts2v_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(CONFIGS, "arts2d_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    config = set_forward_ranges(merge_configs(defaults, inputs))
    config["other"]["npts"] = 256
    config["other"]["CCDsize"] = [256, 256]
    config["data"]["shotnum"] = [94475, 94477]
    config["data"]["shot_rot"] = 25.0
    fe_cfg = config["parameters"]["electron"]["fe"]
    fe_cfg["type"] = "arbitrary"
    fe_cfg["dim"] = 2
    fe_cfg["nvx"] = 32
    fe_cfg.setdefault("params", {})
    fe_cfg["params"].setdefault("init_m", 2.5)
    fe_cfg["params"].setdefault("learn_log", True)

    # lineout window in resolution units (angular_optax divides by ang_res_unit)
    config["data"]["lineouts"]["start"] = 5
    config["data"]["lineouts"]["end"] = 15

    sas = get_scattering_angles(config)
    axisxE, *_ = get_calibrations(104000, config["other"]["extraoptions"]["spectype"], 0.0, config["other"]["CCDsize"])
    config["other"]["extraoptions"]["spectype"] = "angular_full"
    sas["angAxis"] = axisxE

    n_units = config["data"]["lineouts"]["end"] - config["data"]["lineouts"]["start"]
    rng = np.random.default_rng(0)
    b = {
        "e_data": rng.uniform(0.1, 1.0, (n_units, 256)),
        "e_amps": np.ones((n_units, 1)),
        "i_data": np.ones((1, 256)),
        "i_amps": np.ones((1, 1)),
        "noise_e": np.zeros((n_units, 256)),
        "noise_i": np.zeros((1, 256)),
    }
    batch = {"b1": b, "b2": dict(b)}

    loss_fn = LossFunction(config, sas, b)
    assert loss_fn.multiplex_ang

    ts_params = ThomsonParams.create(config["parameters"], num_params=1, batch=False, activate=True)
    diff, static = partition(ts_params, get_filter_spec(config["parameters"], ts_params))

    (value, aux), grad = loss_fn._vg_func_(diff, static, batch)
    assert np.isfinite(float(value))
    gleaves = jax.tree_util.tree_leaves(grad)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in gleaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in gleaves)
