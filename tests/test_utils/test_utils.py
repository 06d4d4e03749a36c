"""Utility-layer unit tests: config merge, mlflow facade, checkpointing, BO."""

import os

import numpy as np
import pytest

from tsadar_tpu.utils.config import flatten, unflatten, merge_configs
from tsadar_tpu.utils import mlflow_shim as mlflow


def test_flatten_merge_semantics():
    defaults = {"a": {"b": 1, "c": {"d": 2, "e": 3}}, "x": 9}
    inputs = {"a": {"c": {"d": 20}}, "y": 5}
    merged = merge_configs(defaults, inputs)
    # leaf-granularity merge: sibling leaves survive, overridden leaf wins
    assert merged["a"]["c"]["d"] == 20
    assert merged["a"]["c"]["e"] == 3
    assert merged["a"]["b"] == 1
    assert merged["x"] == 9 and merged["y"] == 5
    assert unflatten(flatten(defaults)) == defaults


def test_mlflow_file_backend(tmp_path):
    os.environ["TSADAR_RUNS_DIR"] = str(tmp_path)
    mlflow.set_experiment("exp1")
    with mlflow.start_run(run_name="r1") as run:
        mlflow.log_metrics({"loss": 1.5}, step=0)
        mlflow.log_metrics({"loss": 0.5}, step=1)
        mlflow.log_params({"Te": 0.6})
        mlflow.set_tag("status", "completed")
        art = tmp_path / "thing.txt"
        art.write_text("hello")
        mlflow.log_artifact(str(art))
    import json

    run_json = os.path.join(run.run_dir, "run.json")
    data = json.load(open(run_json))
    assert data["metrics"]["loss"][1]["value"] == 0.5
    assert data["params"]["Te"] == 0.6
    assert data["tags"]["status"] == "completed"
    assert os.path.exists(os.path.join(run.run_dir, "artifacts", "thing.txt"))


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tsadar_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_epoch

    dp = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    state = {"mu": jnp.zeros(4)}
    save_checkpoint(str(tmp_path), dp, state, epoch=7)
    assert latest_epoch(str(tmp_path)) == 7

    dp0 = {"a": jnp.zeros(4), "b": {"c": jnp.zeros((2, 3))}}
    st0 = {"mu": jnp.ones(4)}
    dp1, st1, epoch = restore_checkpoint(str(tmp_path), dp0, st0)
    assert epoch == 7
    np.testing.assert_allclose(np.asarray(dp1["a"]), np.arange(4.0))
    np.testing.assert_allclose(np.asarray(st1["mu"]), np.zeros(4))


def test_simple_bayes_opt_finds_max():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from run_BO import SimpleBayesOpt

    def f(x, y):
        return -((x - 0.3) ** 2) - (y - 0.7) ** 2

    opt = SimpleBayesOpt(f, {"x": (0.0, 1.0), "y": (0.0, 1.0)}, random_state=3)
    res = opt.maximize(init_points=6, n_iter=10)
    assert res["target"] > -0.05, res
