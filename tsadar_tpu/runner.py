"""Run orchestration: config merge, experiment tracking, fit/forward/series modes.

Behavioral port of ``/root/reference/tsadar/runner.py``.
"""

import multiprocessing as mp
import os
import tempfile
import time
from typing import Dict, Tuple

import yaml

from .forward import calc_series
from .inverse import fitter
from .utils import mlflow_shim as mlflow
from .utils.config import merge_configs
from .utils.schema import validate_config
from .utils.console import log_info

BASE_TEMPDIR = os.environ.get("BASE_TEMPDIR", None)


def _configure_jax():
    """Persistent compile cache + x64-on-CPU for library-level entry points.

    cli.main applies the same configuration before its first backend use, but
    runner.run / run_job / run_for_app are importable APIs (the app path, the
    e2e harness, notebooks) — without this, those paths silently pay the full
    multi-minute axon remote compile on EVERY invocation.  No-ops if the user
    already configured a cache dir.
    """
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "TSADAR_COMPILE_CACHE",
                os.path.join(os.path.expanduser("~"), ".tsadar_jax_cache"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    if jax.default_backend() == "cpu" and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)

# multi-host TPU slices: processes coordinate over DCN; lineout-batch data
# parallelism then spans all hosts' devices (SURVEY.md §5 distributed backend)
if os.environ.get("TSADAR_MULTIHOST"):
    import jax

    jax.distributed.initialize()


def load_and_make_folders(cfg_path: str) -> Tuple[str, Dict]:
    """Register a run and store the config decks as artifacts (reference :18-55)."""
    all_configs = {}
    basedir = os.path.join(os.getcwd(), f"{cfg_path}")
    for k in ["defaults", "inputs"]:
        with open(f"{os.path.join(basedir, k)}.yaml", "r") as fi:
            all_configs[k] = yaml.safe_load(fi)

    if "mlflow" in all_configs["inputs"]:
        experiment = all_configs["inputs"]["mlflow"]["experiment"]
        run_name = all_configs["inputs"]["mlflow"]["run"]
    else:
        experiment = all_configs["defaults"]["mlflow"]["experiment"]
        run_name = all_configs["defaults"]["mlflow"]["run"]

    mlflow.set_experiment(experiment)
    with mlflow.start_run(run_name=run_name) as mlflow_run:
        with tempfile.TemporaryDirectory(dir=BASE_TEMPDIR) as td:
            for k in ["defaults", "inputs"]:
                with open(os.path.join(td, f"{k}.yaml"), "w") as fi:
                    yaml.dump(all_configs[k], fi)
            mlflow.log_artifacts(td)
    return mlflow_run.info.run_id, all_configs


def run(cfg_path: str, mode: str) -> str:
    if mode.casefold() not in ("fit", "forward", "series"):
        raise NotImplementedError(f"Mode {mode} not implemented (use fit, forward, or series)")
    _configure_jax()
    run_id, all_configs = load_and_make_folders(cfg_path)
    config = merge_configs(all_configs["defaults"], all_configs["inputs"])
    validate_config(config, mode=mode)
    with mlflow.start_run(run_id=run_id, log_system_metrics=True):
        _run_(config, mode=mode)
    return run_id


def _run_(config: Dict, mode: str = "fit"):
    import contextlib

    mlflow.log_config(config)
    t0 = time.time()

    # device-level profiling (the reference logs only coarse wall-clock stage
    # timings, SURVEY.md §5); set other.profile: true to capture a full
    # jax.profiler trace viewable in TensorBoard/Perfetto
    profile_ctx = contextlib.nullcontext()
    if config.get("other", {}).get("profile", False):
        import jax

        trace_dir = os.path.join(os.getcwd(), "jax_trace")
        profile_ctx = jax.profiler.trace(trace_dir)
        log_info(f"profiling to {trace_dir}")

    with profile_ctx:
        if mode.casefold() == "fit":
            fit_results, loss = fitter.fit(config=config)
        elif mode in ("forward", "series"):
            calc_series.forward_pass(config=config)
        else:
            raise NotImplementedError(f"Mode {mode} not implemented")

    if config.get("other", {}).get("profile", False):
        mlflow.log_artifacts(os.path.join(os.getcwd(), "jax_trace"))

    mlflow.log_metrics({"total_time": time.time() - t0, "num_cores": int(mp.cpu_count())})
    mlflow.set_tag("status", "completed")


def run_job(run_id: str, mode: str, nested: bool):
    """Resume a queued run whose config decks live in the tracked artifacts."""
    _configure_jax()
    with mlflow.start_run(run_id=run_id, nested=nested) as run:
        artifacts = os.path.join(getattr(run, "run_dir", ""), "artifacts")
        all_configs = {}
        for k in ["defaults", "inputs"]:
            with open(os.path.join(artifacts, f"{k}.yaml")) as fi:
                all_configs[k] = yaml.safe_load(fi)
        config = merge_configs(all_configs["defaults"], all_configs["inputs"])
        validate_config(config, mode=mode)
        _run_(config, mode)


def run_for_app(run_id: str) -> str:
    """Web-app entry: config + data files from the run's artifacts (reference :79-113)."""
    _configure_jax()
    with mlflow.start_run(run_id=run_id, log_system_metrics=True) as mlflow_run:
        artifacts = os.path.join(getattr(mlflow_run, "run_dir", ""), "artifacts")
        with open(os.path.join(artifacts, "config.yaml")) as fi:
            config = yaml.safe_load(fi)
        for spec in ("epw", "iaw"):
            if config["data"]["filenames"].get(spec) is not None:
                config["data"]["filenames"][f"{spec}-local"] = os.path.join(
                    artifacts, config["data"]["filenames"][spec]
                )
        _run_(config, mode="fit")
    return mlflow_run.info.run_id
