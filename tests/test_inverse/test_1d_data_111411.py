"""Second real-data fit regression: OMEGA shot 111411 (>=105000 calibration range).

Broadens the real-data regression surface beyond shot 101675
(test_1d_data.py): 111411 sits in a DIFFERENT spectral-calibration branch
(reference calibration.py:216-462 dispatches on shot ranges; e.g. the 528 nm
anchor row the dewarp pins is 507.5 for 101675 but 512.2 for 111411 —
computed per shot by the loader), so it exercises the other dispersion/IRF
constants, the per-shot fiducial dewarp anchor, and a different plasma state.

No upstream-validated values exist for this shot; the pins are
SELF-VALIDATED from the deterministic CPU-f64 L-BFGS-B fit (fixed init, two
lineouts) and guarded by physical-consistency checks that would catch a fit
collapsing into a bound corner (the failure mode a mis-centred init produced:
amp1 -> lb, ne -> ub).  The deck init is re-centred to this shot's features
(data blue/red EPW peaks at ~461/606 nm match a forward model near ne=0.5,
Te=0.8; the 101675 deck's ne=0.2 init converges into a corner).
"""

import os

import numpy as np
import pytest
import yaml
from numpy.testing import assert_allclose

from tsadar_tpu.inverse import fitter
from tsadar_tpu.utils import mlflow_shim as mlflow
from tsadar_tpu.utils.config import merge_configs

HERE = os.path.dirname(__file__)
CONFIGS = os.path.join(HERE, "..", "configs")


@pytest.mark.slow
def test_data_111411(tmp_path):
    with open(os.path.join(CONFIGS, "time_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(CONFIGS, "time_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    config = merge_configs(defaults, inputs)
    config["data"]["shotnum"] = 111411
    # basin-matched init (see module docstring)
    config["parameters"]["electron"]["Te"]["val"] = 0.8
    config["parameters"]["electron"]["ne"]["val"] = 0.5
    config["parameters"]["general"]["lam"]["val"] = 526.5

    os.environ["TSADAR_RUNS_DIR"] = str(tmp_path)
    mlflow.set_experiment("tsadar-tpu-tests")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with mlflow.start_run(run_name="test_1d_data_111411"):
            fit_results, loss = fitter.fit(config=config)
    finally:
        os.chdir(cwd)

    # physical-consistency guards (catch bound-corner collapses regardless of
    # the exact pins): amplitudes well inside their [0.01, 3.75] box, the two
    # adjacent lineouts (pixels 500/505) agreeing on the plasma state
    for key in ["amp1_general", "amp2_general"]:
        vals = np.asarray(fit_results[key][:2])
        assert np.all(vals > 0.1) and np.all(vals < 3.0), f"{key} at bound: {vals}"
    Te = np.asarray(fit_results["Te_electron"][:2])
    ne = np.asarray(fit_results["ne_electron"][:2])
    assert abs(Te[0] - Te[1]) / Te.mean() < 0.05, f"adjacent lineouts disagree on Te: {Te}"
    assert abs(ne[0] - ne[1]) / ne.mean() < 0.05, f"adjacent lineouts disagree on ne: {ne}"
    assert float(np.asarray(loss).sum()) < 5e-3, f"poor fit: loss {loss}"

    # self-validated pins (deterministic CPU-f64 L-BFGS-B from the fixed init;
    # fitted loss at the pins: 5.3e-4)
    pinned = {
        "amp1_general": [0.8623, 0.8476],
        "amp2_general": [1.0648, 0.9956],
        "lam_general": [525.40, 525.47],
        "Te_electron": [0.7363, 0.7381],
        "ne_electron": [0.5371, 0.5337],
        "m_electron": [2.414, 2.416],
    }
    for key, vals in pinned.items():
        rtol = 5e-3 if key == "lam_general" else 3e-2
        assert_allclose(fit_results[key][:2], vals, rtol=rtol, err_msg=key)
