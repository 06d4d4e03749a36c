"""Imaging-spectype e2e fit: OMEGA CCD shot 112059.

Third real-data surface (temporal EPW and IAW are covered elsewhere): runs the
imaging branch of the loader/calibration/lineout pipeline end-to-end through a
short deterministic adam fit, pins the partially-converged parameters, and
asserts the imaging artifact set — including the reference-parity
``plot_2D_data_vs_fit`` two-panel image and the ``.nc`` dataset
(reference plotters.py:524-569, 450-522).
"""

import glob
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
def test_imaging_data(tmp_path):
    with open(os.path.join(CONFIGS, "time_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(CONFIGS, "time_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    config = merge_configs(defaults, inputs)
    config["data"]["shotnum"] = 112059  # EPW_CCD imaging shot
    config["data"]["lineouts"].update({"type": "pixel", "start": 500, "end": 510, "skip": 5})
    config["optimizer"].update({"method": "adam", "num_epochs": 30, "batch_size": 2})
    # exercise the spectrum_breakdown path (per-component + IRF-only spectra)
    config.setdefault("plotting", {})["detailed_breakdown"] = True

    os.environ["TSADAR_RUNS_DIR"] = str(tmp_path)
    mlflow.set_experiment("tsadar-tpu-tests")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with mlflow.start_run(run_name="test_imaging_data") as run:
            fit_results, loss = fitter.fit(config=config)
            run_dir = run.run_dir
    finally:
        os.chdir(cwd)

    # deterministic partial-convergence pins (CPU-f64 adam, fixed init)
    assert float(np.asarray(loss).ravel()[0]) < 2.5e-2
    assert_allclose(fit_results["Te_electron"][:2], [0.413, 0.417], rtol=5e-2)
    assert_allclose(fit_results["ne_electron"][:2], [0.170, 0.173], rtol=5e-2)

    artifacts = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(run_dir, "artifacts", "**", "*"), recursive=True)
    }
    # the imaging data-vs-fit artifact set (2D two-panel plot + netCDF + npz)
    assert "fit_and_data_ele.png" in artifacts
    assert "ele_fit_and_data.nc" in artifacts
    assert "ele_fit_and_data.npz" in artifacts
    assert "learned_parameters.csv" in artifacts
    # component-breakdown figures from the spectrum_breakdown path
    assert any(a.startswith("breakdown_ele_lineout") for a in artifacts), sorted(artifacts)
