"""Benchmark: batched Thomson-scattering forward spectra per second (1k-lambda grid).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the full flagship forward step — batched 1D diagnostic (EPW+IAW
form factors on a 1024-point wavelength grid, 10 scattering angles, instrument
response, amplitude scaling) — i.e. one optimizer-iteration's forward cost for a
batch of lineouts.  ``value`` = lineout-spectra per second on the available
accelerator (f32 on TPU; the reference runs complex128 which TPUs do not support).

``vs_baseline``: the reference repo publishes no performance numbers
(BASELINE.md), and its dependency set (interpax/equinox) is not installed here,
so the recorded baseline is the same computation executed on CPU in float64 —
the reference's guaranteed CI platform and precision — measured once and cached
in .bench_cpu_baseline.json.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = 512  # throughput saturates at B>=512 with the gather-free kernels
NPTS = 1024
WARMUP = 2
ITERS = 10
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")


def build(batch_size):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from __graft_entry__ import _small_config, _make_batch
    from tsadar_tpu.core.diagnostic import ThomsonScatteringDiagnostic
    from tsadar_tpu.core.params import ThomsonParams
    from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles

    cfg = _small_config(batch_size)
    sas = get_scattering_angles(cfg)
    ts_diag = ThomsonScatteringDiagnostic(cfg, scattering_angles=sas)
    ts_params = ThomsonParams.create(cfg["parameters"], num_params=batch_size, batch=True, activate=True)
    batch = _make_batch(batch_size, NPTS)

    @jax.jit
    def fwd(params, b):
        ThryE, ThryI, _, _ = ts_diag(params, b)
        return ThryE, ThryI

    return fwd, ts_params, batch


def measure(batch_size=BATCH, iters=ITERS):
    import jax

    fwd, ts_params, batch = build(batch_size)
    out = fwd(ts_params, batch)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(fwd(ts_params, batch))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(ts_params, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def cpu_baseline():
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["spectra_per_sec"]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_CPU_BASELINE"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True, timeout=1200
    )
    try:
        val = float(out.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        print(out.stdout, file=sys.stderr)
        print(out.stderr, file=sys.stderr)
        return None
    with open(CACHE, "w") as f:
        json.dump({"spectra_per_sec": val}, f)
    return val


def main():
    if os.environ.get("BENCH_CPU_BASELINE"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)  # reference precision
        print(measure(batch_size=8, iters=3))
        return

    import jax

    value = measure()
    base = cpu_baseline()
    vs = round(value / base, 2) if base else None
    print(
        json.dumps(
            {
                "metric": "forward lineout-spectra/sec (1k-lambda grid, batched diagnostic)",
                "value": round(value, 2),
                "unit": "spectra/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
