"""Web-app container entry point (parity with /root/reference/docker/fit_for_app.py)."""

import sys

import jax
from jax import config

if jax.default_backend() == "cpu":
    config.update("jax_enable_x64", True)

from tsadar_tpu.runner import run_for_app

if __name__ == "__main__":
    print("jax devices: ", jax.devices())
    run_for_app(sys.argv[1])
