"""Attest the TSADAR_MULTIHOST DCN-init hook (runner.py import-time block).

Multi-host bring-up cannot run in CI (one host, one chip), but the hook's
contract can: setting ``TSADAR_MULTIHOST`` must call
``jax.distributed.initialize()`` at ``tsadar_tpu.runner`` import time —
i.e. before any entry point touches the backend — and NOT calling it is the
default.  Runs in subprocesses because the hook is module-scope (a fresh
import per case).  The manual bring-up procedure is documented in
docs/parallelism.md ("Multi-host").
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))

_PROBE = """
import jax
jax.config.update("jax_platforms", "cpu")  # env var alone can be overridden by the axon plugin
calls = []
jax.distributed.initialize = lambda *a, **k: calls.append(("init", a, k))
import tsadar_tpu.runner
print("INIT_CALLS", len(calls))
"""


def _run(extra_env):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **extra_env)
    env.pop("TSADAR_MULTIHOST", None)
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], env=env, capture_output=True, text=True,
        cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_multihost_env_calls_distributed_initialize():
    assert "INIT_CALLS 1" in _run({"TSADAR_MULTIHOST": "1"})


def test_no_multihost_env_no_initialize():
    assert "INIT_CALLS 0" in _run({})
