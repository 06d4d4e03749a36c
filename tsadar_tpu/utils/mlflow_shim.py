"""Experiment-tracking facade: real MLflow when installed, file-based otherwise.

The reference logs params/metrics/artifacts to MLflow throughout
(``/root/reference/tsadar/utils/misc.py``, ``runner.py``).  MLflow is optional
here: when absent, runs are recorded under ``./tsadar_runs/<experiment>/<run>/``
as JSON metrics/params plus copied artifacts, preserving the same call sites and
metric names so dashboards can be rebuilt later.
"""

import contextlib
import json
import os
import shutil
import time
import uuid

try:  # pragma: no cover - exercised only when mlflow exists
    import mlflow as _mlflow

    HAVE_MLFLOW = True
except ImportError:
    _mlflow = None
    HAVE_MLFLOW = False

_state = {"experiment": "default", "run_dir": None, "metrics": {}, "params": {}, "tags": {}}


def _root():
    return os.environ.get("TSADAR_RUNS_DIR", os.path.join(os.getcwd(), "tsadar_runs"))


def set_experiment(experiment_name=None, **kw):
    if HAVE_MLFLOW:
        return _mlflow.set_experiment(experiment_name, **kw)
    _state["experiment"] = experiment_name or "default"


class _Run:
    def __init__(self, run_dir, run_id):
        self.run_dir = run_dir
        self.info = type("info", (), {"run_id": run_id})()


def _find_run_dir(run_id):
    """Locate an existing ``<experiment>/<name>-<run_id>`` dir across experiments."""
    root = _root()
    if not os.path.isdir(root):
        return None
    for experiment in sorted(os.listdir(root)):
        exp_dir = os.path.join(root, experiment)
        if not os.path.isdir(exp_dir):
            continue
        for name in sorted(os.listdir(exp_dir)):
            if name == run_id or name.endswith(f"-{run_id}"):
                return os.path.join(exp_dir, name)
    return None


@contextlib.contextmanager
def start_run(run_name=None, run_id=None, nested=False, log_system_metrics=False, **kw):
    if HAVE_MLFLOW:
        with _mlflow.start_run(
            run_name=run_name, run_id=run_id, nested=nested, log_system_metrics=log_system_metrics, **kw
        ) as run:
            yield run
        return
    rid = run_id or uuid.uuid4().hex[:16]
    # resuming by id (run_job / run_for_app) must reattach to the original run
    # directory and its recorded state, as real MLflow does
    run_dir = _find_run_dir(rid) if run_id else None
    state = {"metrics": {}, "params": {}, "tags": {}}
    if run_dir is None:
        run_dir = os.path.join(_root(), _state["experiment"], f"{run_name or 'run'}-{rid}")
    else:
        try:
            with open(os.path.join(run_dir, "run.json")) as f:
                prior = json.load(f)
            state = {k: prior.get(k, {}) for k in ("metrics", "params", "tags")}
        except (OSError, ValueError):
            pass
    os.makedirs(os.path.join(run_dir, "artifacts"), exist_ok=True)
    # save ALL of the outer run's accumulated state, not just its directory:
    # a nested run (run_job(..., nested=True)) otherwise leaves its own
    # metrics/params/tags behind after exit, and the outer run's next log
    # call rewrites the outer run.json with the inner run's history
    prev = {k: _state[k] for k in ("run_dir", "metrics", "params", "tags")}
    _state.update(run_dir=run_dir, **state)
    try:
        yield _Run(run_dir, rid)
    finally:
        _flush()
        _state.update(prev)


def _flush():
    if _state["run_dir"] is None:
        return
    with open(os.path.join(_state["run_dir"], "run.json"), "w") as f:
        json.dump(
            {"metrics": _state["metrics"], "params": _state["params"], "tags": _state["tags"]},
            f,
            indent=1,
            default=str,
        )


def log_metrics(metrics, step=0, **kw):
    if HAVE_MLFLOW:
        return _mlflow.log_metrics(metrics, step=step, **kw)
    for k, v in metrics.items():
        _state["metrics"].setdefault(k, []).append({"step": step, "value": float(v), "ts": time.time()})
    _flush()


def log_metric(key, value, step=0, **kw):
    log_metrics({key: value}, step=step, **kw)


def log_params(params, **kw):
    if HAVE_MLFLOW:
        return _mlflow.log_params(params, **kw)
    _state["params"].update({str(k): v for k, v in params.items()})
    _flush()


def set_tag(key, value):
    if HAVE_MLFLOW:
        return _mlflow.set_tag(key, value)
    _state["tags"][str(key)] = value
    _flush()


def set_tags(tags):
    for k, v in tags.items():
        set_tag(k, v)


def log_artifact(path, artifact_path=None):
    if HAVE_MLFLOW:
        return _mlflow.log_artifact(path, artifact_path)
    if _state["run_dir"] is None:
        return
    dst = os.path.join(_state["run_dir"], "artifacts", artifact_path or "")
    os.makedirs(dst, exist_ok=True)
    shutil.copy(path, dst)


def log_artifacts(path, artifact_path=None):
    if HAVE_MLFLOW:
        return _mlflow.log_artifacts(path, artifact_path)
    if _state["run_dir"] is None:
        return
    dst = os.path.join(_state["run_dir"], "artifacts", artifact_path or "")
    shutil.copytree(path, dst, dirs_exist_ok=True)


def active_run():
    if HAVE_MLFLOW:
        return _mlflow.active_run()
    if _state["run_dir"] is None:
        return None
    return _Run(_state["run_dir"], os.path.basename(_state["run_dir"]))


def log_config(config, which="params"):
    """Chunked flattened-config logging (reference misc.py:6-35, log_mlflow)."""
    from .config import flatten

    flat = {".".join(map(str, k)): v for k, v in flatten(config).items()}
    items = list(flat.items())
    if which == "metrics":
        for k, v in items:
            try:
                log_metric(k, float(v))
            except (TypeError, ValueError):
                pass
        return
    for i in range(0, len(items), 100):
        log_params(dict(items[i : i + 100]))
