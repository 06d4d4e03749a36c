"""The TRUE north star: whole-shot CLI fit on TPU, sigma-postprocess included.

Drives ``runner.run`` — the exact user-visible pipeline (prepare -> device fit
-> refit/recalculate -> sigma-Hessian -> plots/CSVs, reference
``/root/reference/tsadar/utils/process/postprocess.py:254-287`` driven from
``fitter.py:45-88``) — on OMEGA shot 101675 at 128 lineouts with
``calc_sigmas: true`` and full plotting, on whatever backend is live (the
axon TPU chip under the driver).

Unlike ``bench_whole_shot.py`` (library-level fit stage only), every stage a
user pays for is inside the timed window, stage-resolved from the tracker
metrics, and the artifact records persistent-cache state (``cache_warm`` /
``cache_new_entries``) so compile wall-clocks are gated against the right
ceiling — warm cache-loads and cold compiles differ 25x under the shared
axon compile service.

Prints ONE JSON line; exits nonzero on gate failure.
Record: E2E_WHOLE_SHOT_r{N}.json (per round).
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

N_LINEOUTS = 128
START, END, SKIP = 300, 812, 4


def main():
    os.environ.setdefault(
        "TSADAR_COMPILE_CACHE", os.path.join(os.path.expanduser("~"), ".tsadar_jax_cache")
    )
    workdir = tempfile.mkdtemp(prefix="tsadar_e2e_ws_")
    runs_dir = os.path.join(workdir, "runs")
    os.environ["TSADAR_RUNS_DIR"] = runs_dir
    cfg_dir = os.path.join(workdir, "cfg")
    os.makedirs(cfg_dir)
    shutil.copy(
        os.path.join(HERE, "tests/configs/time_test_defaults.yaml"),
        os.path.join(cfg_dir, "defaults.yaml"),
    )
    with open(os.path.join(HERE, "tests/configs/time_test_inputs.yaml")) as f:
        inputs = yaml.safe_load(f)
    # full-shot lineout sweep, one device-resident batch, production adam loop
    inputs.setdefault("data", {})["lineouts"] = {
        "type": "pixel", "start": START, "end": END, "skip": SKIP,
    }
    inputs.setdefault("optimizer", {}).update(
        {
            "method": "adam",
            "num_epochs": 200,
            "learning_rate": 2e-2,
            "batch_size": N_LINEOUTS,
        }
    )
    inputs.setdefault("other", {})["calc_sigmas"] = True
    with open(os.path.join(cfg_dir, "inputs.yaml"), "w") as f:
        yaml.safe_dump(inputs, f)

    from tsadar_tpu.utils import cache_stats

    cache_dir = os.environ["TSADAR_COMPILE_CACHE"]
    cache_before = cache_stats.snapshot(cache_dir)

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
    quality = {}
    if csvs:
        import pandas as pd

        df = pd.read_csv(csvs[0])
        checks["n_lineouts"] = len(df) == N_LINEOUTS
        checks["params_finite"] = bool(
            np.all(np.isfinite(df.select_dtypes("number").to_numpy()))
        )
        # fit-quality pins at the historically validated lineouts
        # (tests/test_inverse/test_1d_data.py: Te=0.641, ne=0.228, m=3.20
        # at pixels ~500-510), at the reference test's own tolerances
        pix = df["lineout pixel"].to_numpy()
        sel = (pix >= 500) & (pix <= 510)
        Te = df["Te_electron"].to_numpy()[sel]
        ne = df["ne_electron"].to_numpy()[sel]
        m = df["m_electron"].to_numpy()[sel]
        checks["validated_pixels_covered"] = int(np.sum(sel)) > 0
        checks["Te_pin"] = bool(np.all(np.abs(Te - 0.641) / 0.641 <= 0.10))
        checks["ne_pin"] = bool(np.all(np.abs(ne - 0.228) / 0.228 <= 0.05))
        checks["m_pin"] = bool(np.all(np.abs(m - 3.20) / 3.20 <= 0.15))
        quality = {
            "Te_at_500-510": [round(float(v), 4) for v in Te],
            "ne_at_500-510": [round(float(v), 4) for v in ne],
            "m_at_500-510": [round(float(v), 3) for v in m],
        }
    art_root = os.path.dirname(os.path.dirname(csvs[0])) if csvs else ""
    checks["artifact_dirs"] = all(
        os.path.isdir(os.path.join(art_root, d)) for d in ["plots", "csv", "binary"]
    )
    n_artifacts = (
        len(glob.glob(os.path.join(art_root, "**", "*.*"), recursive=True)) if art_root else 0
    )
    checks["artifact_count"] = n_artifacts >= 10

    # sigma path at full scale: finite, nonzero, one row per lineout
    sig_csvs = glob.glob(os.path.join(runs_dir, "**", "sigmas.csv"), recursive=True)
    checks["sigmas_exist"] = len(sig_csvs) >= 1
    if sig_csvs:
        import pandas as pd

        sig = pd.read_csv(sig_csvs[0]).select_dtypes("number").to_numpy()
        checks["sigma_rows"] = sig.shape[0] == N_LINEOUTS
        checks["sigmas_finite_nonzero"] = bool(
            np.all(np.isfinite(sig)) and np.any(np.abs(sig) > 0)
        )

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
        checks["stage_metrics_present"] = None not in stages.values()
        # compile gate split by MEASURED cache state (cache_warm: nothing new
        # was compiled -> the wall is a cache LOAD); ceilings + rationale
        # live in tsadar_tpu/utils/e2e_stages.py.  The committed r5 artifact
        # measured 8.9-15 s warm.
        if stages.get("fit_compile_s") is not None:
            checks["fit_compile_vs_cache_state"] = compile_gate(stages["fit_compile_s"], cache)

    ok = all(checks.values())
    print(
        json.dumps(
            {
                "workload": f"e2e CLI whole-shot fit: OMEGA 101675, {N_LINEOUTS} lineouts,"
                " 200 adam epochs, calc_sigmas on, full plotting",
                "platform": jax.default_backend(),
                "ok": ok,
                "total_s": round(total_s, 1),
                "n_artifacts": n_artifacts,
            }
            | stages
            | cache
            | quality
            | ({} if ok else {"failed_checks": [k for k, v in checks.items() if not v]})
        )
    )
    shutil.rmtree(workdir, ignore_errors=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
