"""Bayesian hyperparameter optimization over full fits.

Parity with ``/root/reference/run_BO.py``: maximize -loss of complete fitting
runs over (dist-fit window length, gradient scalar).  The reference depends on
the ``bayes_opt`` package; here a self-contained GP(RBF) + expected-improvement
optimizer (numpy/scipy only) provides the same maximize(init_points, n_iter)
behavior.
"""

import os
import tempfile
import time
import multiprocessing as mp

import numpy as np
import yaml

from jax import config as jax_config

import jax

if jax.default_backend() == "cpu":
    jax_config.update("jax_enable_x64", True)

from tsadar_tpu.inverse import fitter
from tsadar_tpu.utils import mlflow_shim as mlflow
from tsadar_tpu.utils.config import merge_configs


class SimpleBayesOpt:
    """GP (RBF kernel) + expected improvement on a box-bounded space."""

    def __init__(self, f, pbounds, random_state=42, noise=1e-6):
        self.f = f
        self.keys = sorted(pbounds)
        self.lo = np.array([pbounds[k][0] for k in self.keys])
        self.hi = np.array([pbounds[k][1] for k in self.keys])
        self.rng = np.random.default_rng(random_state)
        self.noise = noise
        self.X, self.y = [], []

    def _kernel(self, A, B, ls=0.2):
        d2 = np.sum((A[:, None, :] - B[None, :, :]) ** 2, axis=-1)
        return np.exp(-0.5 * d2 / ls**2)

    def _ei(self, Xq):
        X = np.array(self.X)
        y = np.array(self.y)
        K = self._kernel(X, X) + self.noise * np.eye(len(X))
        Kinv = np.linalg.inv(K)
        kq = self._kernel(Xq, X)
        mu = kq @ Kinv @ y
        var = np.maximum(1.0 - np.sum(kq @ Kinv * kq, axis=1), 1e-12)
        sd = np.sqrt(var)
        best = y.max()
        from scipy.stats import norm

        z = (mu - best) / sd
        return (mu - best) * norm.cdf(z) + sd * norm.pdf(z)

    def _norm(self, x):
        return (x - self.lo) / (self.hi - self.lo)

    def probe(self, x):
        val = self.f(**dict(zip(self.keys, x)))
        self.X.append(self._norm(np.asarray(x)))
        self.y.append(val)
        return val

    def maximize(self, init_points=2, n_iter=3, candidates=256):
        for _ in range(init_points):
            self.probe(self.lo + self.rng.random(len(self.keys)) * (self.hi - self.lo))
        for _ in range(n_iter):
            Xq = self.rng.random((candidates, len(self.keys)))
            ei = self._ei(Xq)
            xbest = self.lo + Xq[np.argmax(ei)] * (self.hi - self.lo)
            self.probe(xbest)
        i = int(np.argmax(self.y))
        return {"target": self.y[i], "params": dict(zip(self.keys, self.lo + np.array(self.X[i]) * (self.hi - self.lo)))}


def one_run(config):
    mlflow.log_config(config)
    t0 = time.time()
    fit_results, loss = fitter.fit(config=config)
    mlflow.log_metrics({"total_time": time.time() - t0, "num_cores": int(mp.cpu_count())})
    mlflow.set_tag("status", "completed")
    return -loss


def bbf(window_factor, grad_scalar):
    all_configs["defaults"]["dist_fit"]["window"]["len"] = float(window_factor)
    all_configs["defaults"]["optimizer"]["grad_scalar"] = float(grad_scalar)

    with mlflow.start_run(run_name=run_name):
        with tempfile.TemporaryDirectory() as td:
            for k in ["defaults", "inputs"]:
                with open(os.path.join(td, f"{k}.yaml"), "w") as fi:
                    yaml.dump(all_configs[k], fi)
            mlflow.log_artifacts(td)
        config = merge_configs(all_configs["defaults"], all_configs["inputs"])
        return one_run(config)


if __name__ == "__main__":
    all_configs = {}
    for k in ["defaults", "inputs"]:
        with open(f"{k}.yaml", "r") as fi:
            all_configs[k] = yaml.safe_load(fi)

    deck = all_configs["inputs"] if "mlflow" in all_configs["inputs"] else all_configs["defaults"]
    experiment, run_name = deck["mlflow"]["experiment"], deck["mlflow"]["run"]
    mlflow.set_experiment(experiment)

    optimizer = SimpleBayesOpt(f=bbf, pbounds={"window_factor": (0.1, 0.95), "grad_scalar": (0.1, 0.95)})
    print(optimizer.maximize(init_points=2, n_iter=3))
