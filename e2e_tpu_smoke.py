"""End-to-end TPU smoke: prepare -> fit -> postprocess through the real CLI path.

Runs the full runner on one OMEGA shot (101675, two EPW lineouts at the
historically validated pixels) with a short device-resident adam fit, on
whatever backend is live (the axon TPU chip under the driver).  Asserts finite
losses, the artifact set, and loose physics bounds on the recovered
parameters, then prints ONE JSON line; exits nonzero on any failure.

Warm-cache runtime ~1 min; first run pays the remote TPU compile (~3 min).
Record: E2E_TPU_r{N}.json (per round).
"""

import glob
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import yaml

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    os.environ.setdefault(
        "TSADAR_COMPILE_CACHE", os.path.join(os.path.expanduser("~"), ".tsadar_jax_cache")
    )
    from tsadar_tpu.utils import cache_stats

    cache_dir = os.environ["TSADAR_COMPILE_CACHE"]
    cache_before = cache_stats.snapshot(cache_dir)

    workdir = tempfile.mkdtemp(prefix="tsadar_e2e_")
    runs_dir = os.path.join(workdir, "runs")
    os.environ["TSADAR_RUNS_DIR"] = runs_dir
    cfg_dir = os.path.join(workdir, "cfg")
    os.makedirs(cfg_dir)
    shutil.copy(os.path.join(HERE, "tests/configs/time_test_defaults.yaml"), os.path.join(cfg_dir, "defaults.yaml"))
    with open(os.path.join(HERE, "tests/configs/time_test_inputs.yaml")) as f:
        inputs = yaml.safe_load(f)
    # two lineouts at the validated pixels, short device-resident adam fit
    inputs.setdefault("optimizer", {}).update(
        {"method": "adam", "num_epochs": 60, "learning_rate": 5e-2, "batch_size": 2}
    )
    # uncertainties on: the sigma path (f64 hessian on the CPU backend from
    # the TPU process, postprocess.batch_flat_hessian) regressed silently
    # once — its failure mode is an exception guard that zeroes every sigma
    inputs.setdefault("other", {})["calc_sigmas"] = True
    with open(os.path.join(cfg_dir, "inputs.yaml"), "w") as f:
        yaml.safe_dump(inputs, f)

    cwd = os.getcwd()
    os.chdir(workdir)  # runner drops scratch files (e.g. state pickles) in cwd
    t0 = time.time()
    try:
        from tsadar_tpu.runner import run

        run(cfg_dir, mode="fit")
    finally:
        os.chdir(cwd)
    total_s = time.time() - t0

    import jax

    cache = cache_stats.diff(cache_before, cache_dir)

    checks = {}
    csvs = glob.glob(os.path.join(runs_dir, "**", "learned_parameters.csv"), recursive=True)
    checks["csv_exists"] = len(csvs) == 1
    Te = ne = None
    if csvs:
        import pandas as pd

        df = pd.read_csv(csvs[0])
        Te = [float(v) for v in df["Te_electron"]]
        ne = [float(v) for v in df["ne_electron"]]
        checks["params_finite"] = bool(np.all(np.isfinite(df.select_dtypes("number").to_numpy())))
        # loose physics gates: the validated convergence values are
        # Te=0.641 / ne=0.228 (tests/test_inverse/test_1d_data.py); 60 adam
        # epochs lands nearby but not converged, so bound generously
        checks["Te_plausible"] = all(0.3 < v < 1.2 for v in Te)
        checks["ne_plausible"] = all(0.1 < v < 0.4 for v in ne)
    art_root = os.path.dirname(os.path.dirname(csvs[0])) if csvs else ""
    expected = ["plots", "csv", "binary"]
    checks["artifact_dirs"] = all(os.path.isdir(os.path.join(art_root, d)) for d in expected)
    n_artifacts = len(glob.glob(os.path.join(art_root, "**", "*.*"), recursive=True)) if art_root else 0
    checks["artifact_count"] = n_artifacts >= 10

    # sigma path: all-zero sigmas are the silent-failure signature (the
    # Hessian call is exception-guarded in postprocess)
    sig_csvs = glob.glob(os.path.join(runs_dir, "**", "sigmas.csv"), recursive=True)
    checks["sigmas_exist"] = len(sig_csvs) >= 1
    if sig_csvs:
        import pandas as pd

        sig = pd.read_csv(sig_csvs[0]).select_dtypes("number").to_numpy()
        checks["sigmas_finite_nonzero"] = bool(
            np.all(np.isfinite(sig)) and np.any(np.abs(sig) > 0)
        )

    # stage-resolved wall times from the tracker (mlflow shim run.json):
    # prepare (setup_time), fit split into first-dispatch compile + steps,
    # postprocess, and the unattributed remainder (imports, config, tracing
    # outside the fit jit, artifact writes)
    stages = {}
    run_jsons = glob.glob(os.path.join(runs_dir, "**", "run.json"), recursive=True)
    if run_jsons:
        from tsadar_tpu.utils.e2e_stages import compile_gate, last_metric_reader

        last, _ = last_metric_reader(run_jsons[0])
        setup_s = last("setup_time")
        fit_s = last("fit_time")
        compile_s = last("fit_first_dispatch_time")
        lossfn_s = last("fit_lossfn_init_time")
        param_s = last("fit_param_init_time")
        final_loss_s = last("fit_final_loss_time") or 0.0
        post_s = last("postprocess_time")
        fit_parts = (compile_s, lossfn_s, param_s)
        stages = {
            "prepare_s": setup_s,
            "fit_lossfn_init_s": lossfn_s,
            "fit_param_init_s": param_s,
            "fit_compile_s": compile_s,
            "fit_final_loss_s": final_loss_s,
            "fit_steps_s": round(fit_s - sum(fit_parts) - final_loss_s, 2)
            if None not in (fit_s, *fit_parts)
            else None,
            "postprocess_s": post_s,
            "postprocess_refit_s": last("refitting time"),
            "postprocess_recalc_s": last("postprocessing time"),
            "recalc_arrayloss_s": last("recalc_arrayloss_time"),
            "recalc_hessian_s": last("recalc_hessian_time"),
            "postprocess_plot_s": last("plotting time"),
            "other_s": round(total_s - sum(v for v in (setup_s, fit_s, post_s) if v), 1)
            if None not in (setup_s, fit_s, post_s)
            else None,
        }
        # the fit stage is gated separately from the pipeline stages.
        # fit_steps measures the untimed dispatches' wall: ~1.3 s warm
        # (axon dispatch RPC ~200 ms/chunk), up to ~18 s on cold-cache runs
        # (the host serializes ~15 MB of cache entries between dispatches) —
        # the 25 s ceiling catches step-rate regressions without flaking on
        # cold windows.  fit_compile catches the recompile-every-run failure
        # mode (the r3 cache-key bug measured 437 s; cold one-time compile
        # is 110-140 s, warm cached-executable load 8-594 s measured under tunnel
        # contention).
        checks["stage_metrics_present"] = None not in stages.values()
        if stages.get("fit_steps_s") is not None:
            checks["fit_steps_fast"] = stages["fit_steps_s"] < 25.0
        if stages.get("fit_compile_s") is not None:
            # ceilings keyed on MEASURED cache state; values + rationale in
            # tsadar_tpu/utils/e2e_stages.py
            checks["fit_compile_vs_cache_state"] = compile_gate(stages["fit_compile_s"], cache)

    ok = all(checks.values())
    print(
        json.dumps(
            {
                "workload": "e2e CLI fit: OMEGA 101675, 2 EPW lineouts, 60 adam epochs",
                "platform": jax.default_backend(),
                "ok": ok,
                "total_s": round(total_s, 1),
                "n_artifacts": n_artifacts,
                "Te": Te,
                "ne": ne,
            }
            | stages
            | cache
            | ({} if ok else {"failed_checks": [k for k, v in checks.items() if not v]})
        )
    )
    shutil.rmtree(workdir, ignore_errors=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
