"""Runner resume paths: queued-run resume (run_job) and hosted-app (run_for_app).

Both read their configuration back from the run's stored artifacts rather than
the filesystem cwd (reference runner.py:79-113, 150-182); neither was covered
by the CLI-driven tests.  Uses the file-backed tracker and shrunk decks so each
fit is a ~1-minute CPU run.
"""

import os
import shutil

import numpy as np
import pytest
import yaml

from tsadar_tpu import runner
from tsadar_tpu.utils import mlflow_shim as mlflow

HERE = os.path.dirname(__file__)
CONFIGS = os.path.join(HERE, "..", "configs")
DATA_DIR = os.path.join(HERE, "..", "..", "tsadar_tpu", "external", "data")


def _small_decks():
    with open(os.path.join(CONFIGS, "time_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(CONFIGS, "time_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    defaults["data"]["lineouts"].update({"start": 500, "end": 504, "skip": 2})
    defaults["optimizer"].update({"method": "adam", "num_epochs": 10, "batch_size": 2})
    defaults["other"]["calc_sigmas"] = False
    return defaults, inputs


@pytest.mark.slow
def test_run_job_resumes_from_stored_decks(tmp_path, monkeypatch):
    monkeypatch.setenv("TSADAR_RUNS_DIR", str(tmp_path / "runs"))
    defaults, inputs = _small_decks()
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    with open(cfg_dir / "defaults.yaml", "w") as fi:
        yaml.dump(defaults, fi)
    with open(cfg_dir / "inputs.yaml", "w") as fi:
        yaml.dump(inputs, fi)

    # queue-time registration stores the decks as artifacts...
    run_id, _ = runner.load_and_make_folders(str(cfg_dir))

    # ...and a later process resumes purely from the run id
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        runner.run_job(run_id, mode="fit", nested=False)
    finally:
        os.chdir(cwd)

    run_dirs = [
        d for d in (tmp_path / "runs").rglob("run.json") if run_id in str(d.parent)
    ]
    assert run_dirs, "resumed run not recorded"
    import json

    meta = json.loads(run_dirs[0].read_text())
    assert meta["tags"]["status"] == "completed"
    assert any("learned_parameters.csv" in str(p) for p in run_dirs[0].parent.rglob("*.csv"))


@pytest.mark.slow
def test_run_for_app_fits_from_artifact_data(tmp_path, monkeypatch):
    monkeypatch.setenv("TSADAR_RUNS_DIR", str(tmp_path / "runs"))
    defaults, inputs = _small_decks()
    from tsadar_tpu.utils.config import merge_configs

    config = merge_configs(defaults, inputs)
    epw_name = "EPW-s101675.hdf"
    config["data"]["filenames"] = {"epw": epw_name, "iaw": None}

    mlflow.set_experiment("app-test")
    with mlflow.start_run(run_name="app") as run:
        artifacts = os.path.join(run.run_dir, "artifacts")
        with open(os.path.join(artifacts, "config.yaml"), "w") as fi:
            yaml.dump(config, fi)
        shutil.copy(os.path.join(DATA_DIR, epw_name), artifacts)
        run_id = run.info.run_id

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        returned = runner.run_for_app(run_id)
    finally:
        os.chdir(cwd)
    assert returned == run_id

    run_dirs = [
        d for d in (tmp_path / "runs").rglob("run.json") if run_id in str(d.parent)
    ]
    assert run_dirs
    import json

    meta = json.loads(run_dirs[0].read_text())
    assert meta["tags"]["status"] == "completed"


@pytest.mark.slow
def test_sequential_warm_start_across_batches(tmp_path, monkeypatch):
    """optimizer.sequential warm-starts each batch from the previous one
    (reference loops.py:156-162); 4 lineouts / batch 2 -> two batches."""
    monkeypatch.setenv("TSADAR_RUNS_DIR", str(tmp_path / "runs"))
    defaults, inputs = _small_decks()
    defaults["data"]["lineouts"].update({"start": 500, "end": 508, "skip": 2})
    defaults["optimizer"]["sequential"] = True

    from tsadar_tpu.inverse import fitter
    from tsadar_tpu.utils.config import merge_configs

    config = merge_configs(defaults, inputs)
    mlflow.set_experiment("seq-test")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with mlflow.start_run(run_name="seq"):
            fit_results, loss = fitter.fit(config=config)
    finally:
        os.chdir(cwd)
    assert np.isfinite(float(np.asarray(loss).ravel()[0]))
    # all four lineouts produced physical values
    te = np.asarray(fit_results["Te_electron"]).ravel()
    assert te.shape[0] == 4 and np.all((te > 0.01) & (te < 1.5))


def test_configure_jax_enables_cache_and_respects_override(monkeypatch, tmp_path):
    """Library entry points must enable the persistent compile cache (without
    it, runner.run/run_job/run_for_app paid the full multi-minute axon remote
    compile on EVERY invocation — the r4 E2E finding) while never clobbering
    a user-configured cache dir."""
    import jax

    from tsadar_tpu.runner import _configure_jax

    prior = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("TSADAR_COMPILE_CACHE", str(tmp_path / "cache"))
        jax.config.update("jax_compilation_cache_dir", None)
        _configure_jax()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")

        # a user-set dir wins: _configure_jax must be a no-op
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "user"))
        _configure_jax()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "user")
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)
