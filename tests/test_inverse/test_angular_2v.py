"""ARTS 2V inverse smoke tests: gradient descent improves 2D-EDF reconstructions.

Port of ``/root/reference/tests/test_inverse/test_angular_2v.py`` (GPU-gated and
parametrized over dist_type upstream).  Runs at reduced resolution on CPU via the
table-mode 2V path; gate: finite loss that decreases under optimization for both
the arbitrary and spherical-harmonic EDF parameterizations.
"""

import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp
import optax

from tsadar_tpu.utils.config import merge_configs, set_forward_ranges
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles, get_calibrations
from tsadar_tpu.core.diagnostic import ThomsonScatteringDiagnostic
from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition, combine

HERE = os.path.dirname(__file__)
CONFIGS = os.path.join(HERE, "..", "configs")


def _setup(dist_type):
    with open(os.path.join(CONFIGS, "arts2v_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(CONFIGS, "arts2d_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    config = set_forward_ranges(merge_configs(defaults, inputs))
    config["other"]["npts"] = 256
    config["other"]["CCDsize"] = [256, 256]
    fe_cfg = config["parameters"]["electron"]["fe"]
    fe_cfg["type"] = dist_type
    fe_cfg["dim"] = 2
    fe_cfg["nvx"] = 32
    fe_cfg.setdefault("params", {})
    fe_cfg["params"].setdefault("init_m", 2.5)
    fe_cfg["params"].setdefault("learn_log", True)
    if "sph" in dist_type:
        fe_cfg["params"].setdefault("nvr", 32)
        fe_cfg["params"].setdefault("Nl", 1)
        fe_cfg["params"].setdefault("flm_type", "arbitrary")

    sas = get_scattering_angles(config)
    axisxE, *_ = get_calibrations(104000, config["other"]["extraoptions"]["spectype"], 0.0, config["other"]["CCDsize"])
    config["other"]["extraoptions"]["spectype"] = "angular_full"
    sas["angAxis"] = axisxE

    batch = {
        "i_data": np.ones(tuple(config["other"]["CCDsize"])),
        "e_data": np.ones(tuple(config["other"]["CCDsize"])),
        "noise_e": np.array([0]),
        "noise_i": np.array([0]),
        "e_amps": np.array([1]),
        "i_amps": np.array([1]),
    }
    return config, sas, batch


@pytest.mark.slow
@pytest.mark.parametrize("dist_type", ["arbitrary", "sphericalharmonic"])
def test_angular_2v_inverse(dist_type):
    config, sas, batch = _setup(dist_type)
    ts_diag = ThomsonScatteringDiagnostic(config, scattering_angles=sas, mode_2v="table")

    # ground truth: different super-Gaussian order
    config["parameters"]["electron"]["fe"]["params"]["init_m"] = 3.0
    gt = ThomsonParams.create(config["parameters"], num_params=1, batch=False, activate=True)
    ThryE_gt, *_ = ts_diag(gt, batch)
    assert np.all(np.isfinite(np.asarray(ThryE_gt)))

    config["parameters"]["electron"]["fe"]["params"]["init_m"] = 2.0
    fit = ThomsonParams.create(config["parameters"], num_params=1, batch=False, activate=True)
    spec = get_filter_spec(config["parameters"], fit)
    diff0, static = partition(fit, spec)

    def loss_fn(dp):
        ThryE, *_ = ts_diag(combine(dp, static), batch)
        return jnp.mean(jnp.square(ThryE - ThryE_gt))

    lr = 2e-3 if dist_type == "arbitrary" else 3e-2
    opt = optax.adam(lr)
    state = opt.init(diff0)

    @jax.jit
    def step(dp, st):
        value, grad = jax.value_and_grad(loss_fn)(dp)
        updates, st = opt.update(grad, st)
        return optax.apply_updates(dp, updates), st, value

    dp = diff0
    losses = []
    for _ in range(20 if dist_type == "arbitrary" else 45):
        dp, state, value = step(dp, state)
        losses.append(float(value))

    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
