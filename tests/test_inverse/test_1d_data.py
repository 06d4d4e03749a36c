"""Real-data end-to-end fit regression: OMEGA shot 101675, one EPW lineout batch.

Port of ``/root/reference/tests/test_inverse/test_1d_data.py``.  Asserts the
fitted parameters against the reference's historically-validated values
(validated 3/22/25 upstream).  Note: the reference's streak-camera dewarp maps
are missing from the public snapshot, so the temporal EPW data here is fit
without dewarping; the tolerances below account for that (see assertions).
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
def test_data(tmp_path):
    with open(os.path.join(CONFIGS, "time_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(CONFIGS, "time_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    config = merge_configs(defaults, inputs)

    os.environ["TSADAR_RUNS_DIR"] = str(tmp_path)
    mlflow.set_experiment("tsadar-tpu-tests")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with mlflow.start_run(run_name="test_1d_data"):
            fit_results, loss = fitter.fit(config=config)
    finally:
        os.chdir(cwd)

    # best values as of 3/22/25 upstream (test_1d_data.py:50-58)
    real_values = {
        "amp1_general": 0.733,
        "amp2_general": 0.520,
        "lam_general": 523.855,
        "Te_electron": 0.641,
        "ne_electron": 0.228,
        "m_electron": 3.20,
    }

    # The upstream-validated values were produced WITH the streak dewarp,
    # whose maps are absent from the public snapshot
    # (.MISSING_LARGE_BLOBS:15-16).  The fiducial-based reconstruction
    # (warpcorr.reconstruct_warp_from_fiducials, default-on) rebuilds a
    # low-order approximation from the in-frame timing comb + notch tracers;
    # with it, every parameter fits within the REFERENCE's own tolerances
    # (test_1d_data.py:60-84 upstream): amp1 7.2% (was 9.1% with the noisy
    # notch-center tracer, 10.7% undewarped), Te 1.0%, ne 0.5%, m 1.4%,
    # lam 0.14%, amp2 2.4%.  The residual amp1 excess is the warp component
    # the in-frame tracers cannot see — the 2D curvature between the comb
    # band and the notch rows; the two candidate in-frame measurements of it
    # are both noise-dominated (tools/probe_warp_tracers.py, PARITY.md).
    assert_allclose(fit_results["amp1_general"][0], real_values["amp1_general"], rtol=1e-1)
    assert_allclose(fit_results["amp2_general"][0], real_values["amp2_general"], rtol=1e-1)
    assert_allclose(fit_results["lam_general"][0], real_values["lam_general"], rtol=5e-3)
    assert_allclose(fit_results["Te_electron"][0], real_values["Te_electron"], rtol=1e-1)
    assert_allclose(fit_results["ne_electron"][0], real_values["ne_electron"], rtol=5e-2)
    assert_allclose(fit_results["m_electron"][0], real_values["m_electron"], rtol=15e-2)

    # Self-validated pins for BOTH fitted lineouts (pixels 500 and 505; CPU-f64
    # L-BFGS-B from the deck's fixed init is deterministic).  These widen the
    # regression surface beyond the single upstream-validated lineout.
    pinned = {
        "amp1_general": [0.7855, 0.7621],
        "amp2_general": [0.5073, 0.5169],
        "lam_general": [524.57, 524.45],
        "Te_electron": [0.6476, 0.6282],
        "ne_electron": [0.2291, 0.2295],
        "m_electron": [3.155, 3.079],
    }
    for key, vals in pinned.items():
        assert_allclose(fit_results[key][:2], vals, rtol=3e-2, err_msg=key)
