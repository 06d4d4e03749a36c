"""ARTS (2V EDF) benchmark on TPU — the workload the reference gates on a GPU
("takes too long without a GPU", reference tests/test_forward/test_angular_2v.py:31).

Full resolution: 1024-point spectrum x 241 fine angles (247k chi evaluation
points), 128x128 arbitrary 2D EDF, 256-angle projection tables.  Reports forward
and value_and_grad times for one fit iteration, plus a convergence gate: a
120-iteration adam fit against a scaled target must cut the loss >4x
(``fit_ok``; exits nonzero otherwise so the driver catches broken gradients).
"""

import json
import os
import time

import numpy as np
import yaml

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp

from tsadar_tpu.core.diagnostic import ThomsonScatteringDiagnostic
from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition, combine
from tsadar_tpu.utils.config import merge_configs, set_forward_ranges
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles, get_calibrations

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
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
    axisxE, *_ = get_calibrations(104000, config["other"]["extraoptions"]["spectype"], 0.0, config["other"]["CCDsize"])
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

    def best_of(fn, *args, windows=3, iters=5):
        # the shared chip shows ±25% contention spread; report the best window
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    fwd = jax.jit(lambda p, b: ts_diag(p, b)[0])
    t0 = time.time()
    out = fwd(ts_params, batch)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    fwd_ms = best_of(fwd, ts_params, batch)

    target = np.asarray(out)
    spec = get_filter_spec(config["parameters"], ts_params)
    diff, static = partition(ts_params, spec)

    def loss(dp):
        T = ts_diag(combine(dp, static), batch)[0]
        return jnp.mean((T - target * 0.9) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    o = vg(diff)
    jax.block_until_ready(o[0])
    vg_compile_s = time.time() - t0
    # NOTE: a per-dispatch value_and_grad timing used to be reported here, but
    # at this small-batch shape each dispatch rides the ~7 ms tunnel RPC and
    # the number varied 4x between otherwise identical runs (10.2 vs 39.7 ms
    # committed/reproduced in round 4) — unstable fields in committed
    # artifacts invite wrong conclusions.  fit_iter_ms below (scanned chunks,
    # the production loop's cost) is the stable per-iteration metric.

    # convergence gate: a short adam run against the 0.9x-scaled target must
    # actually drive the loss down — a broken gradient (the class of bug the
    # 2V table/NUDFT restructures could introduce) fails loudly here
    import optax

    opt = optax.adam(5e-4)

    # mirror the production angular_optax loop: a jitted scan of CHUNK steps
    # per dispatch (loops.py) — also timed, so the recorded fit-iteration cost
    # is the production loop's, not a one-step-per-dispatch approximation
    CHUNK = 8

    def one_step(carry, _):
        dp, state = carry
        value, grad = vg(dp)
        updates, state = opt.update(grad, state)
        return (optax.apply_updates(dp, updates), state), value

    @jax.jit
    def fit_chunk(dp, state):
        (dp, state), vals = jax.lax.scan(one_step, (dp, state), None, length=CHUNK)
        return dp, state, vals

    state = opt.init(diff)
    dp, state, vals = fit_chunk(diff, state)  # compile + first 8 iters
    jax.block_until_ready(vals)
    t0 = time.perf_counter()
    for _ in range(120 // CHUNK - 1):
        dp, state, vals = fit_chunk(dp, state)
    jax.block_until_ready(vals)
    fit_iter_ms = (time.perf_counter() - t0) / (120 - CHUNK) * 1e3
    initial_loss = float(o[0])
    final_loss = float(np.asarray(vals)[-1])
    # initial loss is mean((T - 0.9 T)^2) = 1e-2 mean(T^2), deterministic up to
    # TPU numerics.  The sqrt-log arbitrary-2V parameterization converges
    # slowly: an lr sweep (1e-2..5e-4, 120 iters) measured a best ~10.6x
    # reduction at lr=5e-4 (monotone), so gate at 4x with margin.
    fit_ok = np.isfinite(final_loss) and final_loss < initial_loss / 4.0

    # same-window contention probe (see bench.PROBE_REF_MS): normalizes
    # fit_iter_ms across rounds on the shared chip
    probe_ms = None
    if jax.default_backend() == "tpu":
        try:
            from bench import PROBE_REF_MS, _contention_probe

            probe_ms = _contention_probe()
        except Exception:
            probe_ms = None

    print(
        json.dumps(
            {
                "workload": "ARTS 2V arbitrary EDF, 1024 lambda x 241 angles, nvx=128",
                "platform": jax.default_backend(),
                "forward_ms": round(fwd_ms, 1),
                "fit_iter_ms": round(fit_iter_ms, 1),
                "compile_s": round(compile_s + vg_compile_s, 1),
                "fit120_initial_loss": initial_loss,
                "fit120_final_loss": final_loss,
                "fit_ok": bool(fit_ok),
            }
            | (
                {
                    "probe_matmul_ms": round(probe_ms, 3),
                    "fit_iter_ms_normalized": round(fit_iter_ms * PROBE_REF_MS / probe_ms, 2),
                }
                if probe_ms
                else {}
            )
        )
    )
    if not fit_ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
