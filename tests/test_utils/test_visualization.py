"""Smoke tests for the offline visualization utilities (untested elsewhere)."""

import os
import pickle

import numpy as np

from tsadar_tpu.utils import mlflow_shim as mlflow
from tsadar_tpu.utils.data_handling.data_visualizer import launch_data_visualizer
from tsadar_tpu.utils.plotting.edf_movie import make_edf_movie


def test_edf_movie_1v_and_2v(tmp_path):
    v = np.linspace(-6, 6, 64)
    snapshots_1v = {
        epoch: {"electron": {"fe": np.exp(-(v**2) / (2 * (1 + 0.1 * i)))}}
        for i, epoch in enumerate([0, 10, 20])
    }
    path_1v = tmp_path / "state_weights_1v.txt"
    path_1v.write_bytes(pickle.dumps(snapshots_1v))
    out = make_edf_movie(str(path_1v), str(tmp_path / "edf_1v.gif"), fps=2)
    assert os.path.getsize(out) > 0

    f2 = np.exp(-(v[None, :] ** 2 + v[:, None] ** 2) / 2)
    snapshots_2v = {0: {"electron": {"f": f2}}, 5: {"electron": {"f": f2 * 1.1}}}
    path_2v = tmp_path / "state_weights_2v.txt"
    path_2v.write_bytes(pickle.dumps(snapshots_2v))
    out2 = make_edf_movie(str(path_2v), str(tmp_path / "edf_2v.gif"), fps=2)
    assert os.path.getsize(out2) > 0


def test_edf_movie_rejects_empty_snapshots(tmp_path):
    import pytest

    path = tmp_path / "state_weights.txt"
    path.write_bytes(pickle.dumps({0: {"electron": {}}}))
    with pytest.raises(ValueError, match="no distribution snapshots"):
        make_edf_movie(str(path), str(tmp_path / "nope.gif"))


def test_data_visualizer_writes_overlay_images(tmp_path, monkeypatch):
    monkeypatch.setenv("TSADAR_RUNS_DIR", str(tmp_path))
    rng = np.random.default_rng(0)
    elec = rng.uniform(0, 100, (128, 96))
    ion = rng.uniform(0, 100, (128, 96))
    all_axes = {
        "epw_x": np.arange(96.0),
        "epw_y": np.linspace(700, 400, 128),
        "iaw_x": np.arange(96.0),
        "iaw_y": np.linspace(529, 524, 128),
        "x_label": "px",
    }
    config = {
        "data": {
            "fit_rng": {
                "blue_min": 450.0, "blue_max": 510.0,
                "red_min": 540.0, "red_max": 625.0,
                "iaw_min": 525.5, "iaw_max": 527.5,
            },
            "lineouts": {"type": "pixel", "val": list(range(10, 90, 10))},
        }
    }
    mlflow.set_experiment("viz-test")
    with mlflow.start_run(run_name="viz") as run:
        launch_data_visualizer(elec, ion, all_axes, config)
        artifacts = os.path.join(run.run_dir, "artifacts")
    names = set(os.listdir(artifacts))
    assert "electron_raw_data.png" in names and "ion_raw_data.png" in names


def test_save_sigmas_fe_writes_nc_and_npz(tmp_path):
    from tsadar_tpu.utils.plotting.plotters import save_sigmas_fe
    from tsadar_tpu.utils.ncwriter import read_dataset

    os.makedirs(tmp_path / "binary")
    sig = np.abs(np.random.default_rng(0).standard_normal(64))
    out = save_sigmas_fe({}, None, sig, str(tmp_path))
    assert out.shape == (64,)
    assert (tmp_path / "binary" / "sigmas_fe.npz").exists()
    variables, coords = read_dataset(str(tmp_path / "binary" / "sigma-fe.nc"))
    np.testing.assert_allclose(np.asarray(variables["sigma_fe"], np.float64), sig, rtol=1e-6)
