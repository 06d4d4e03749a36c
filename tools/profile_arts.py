"""Capture a jax.profiler trace of the ARTS 2V value_and_grad step.

Usage: python tools/profile_arts.py [trace_dir]   (default /tmp/arts_trace)

Same workload/shapes as bench_arts.py (1024 lambda x 241 angles, nvx=128
arbitrary 2V EDF, table mode).  Summarize with tools/trace_top_ops.py.
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402
import yaml  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp  # noqa: E402


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/arts_trace"

    from tsadar_tpu.core.diagnostic import ThomsonScatteringDiagnostic
    from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition, combine
    from tsadar_tpu.utils.config import merge_configs, set_forward_ranges
    from tsadar_tpu.utils.data_handling.calibration import (
        get_scattering_angles,
        get_calibrations,
    )

    with open(os.path.join(HERE, "tests/configs/arts2v_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(HERE, "tests/configs/arts2d_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    config = set_forward_ranges(merge_configs(defaults, inputs))
    fe_cfg = config["parameters"]["electron"]["fe"]
    fe_cfg["type"] = "arbitrary"
    fe_cfg["dim"] = 2
    fe_cfg["nvx"] = 128
    fe_cfg.setdefault("params", {})
    fe_cfg["params"].setdefault("init_m", 2.5)
    fe_cfg["params"].setdefault("learn_log", True)

    sas = get_scattering_angles(config)
    axisxE, *_ = get_calibrations(
        104000, config["other"]["extraoptions"]["spectype"], 0.0, config["other"]["CCDsize"]
    )
    config["other"]["extraoptions"]["spectype"] = "angular_full"
    sas["angAxis"] = axisxE

    batch = {
        "e_data": np.ones(tuple(config["other"]["CCDsize"])),
        "i_data": np.ones(tuple(config["other"]["CCDsize"])),
        "e_amps": np.array([1.0]),
        "i_amps": np.array([1.0]),
        "noise_e": np.array([0.0]),
        "noise_i": np.array([0.0]),
    }

    ts_diag = ThomsonScatteringDiagnostic(config, scattering_angles=sas, mode_2v="table")
    ts_params = ThomsonParams.create(config["parameters"], num_params=1, batch=False, activate=True)

    fwd = jax.jit(lambda p, b: ts_diag(p, b)[0])
    out = fwd(ts_params, batch)
    jax.block_until_ready(out)
    target = np.asarray(out)
    spec = get_filter_spec(config["parameters"], ts_params)
    diff, static = partition(ts_params, spec)

    def loss(dp):
        T = ts_diag(combine(dp, static), batch)[0]
        return jnp.mean((T - target * 0.9) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    compiled = vg.lower(diff).compile()
    o = compiled(diff)
    jax.block_until_ready(o[0])
    for _ in range(3):
        o = compiled(diff)
    jax.block_until_ready(o[0])

    t0 = time.perf_counter()
    for _ in range(10):
        o = compiled(diff)
    jax.block_until_ready(o[0])
    print(f"value_and_grad_ms: {(time.perf_counter() - t0) / 10 * 1e3:.2f}")

    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            o = compiled(diff)
        jax.block_until_ready(o[0])
    print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
