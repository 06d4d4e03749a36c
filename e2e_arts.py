"""ARTS real-data CLI e2e on the accelerator — the reference's flagship workload.

Drives ``fitter.fit`` (the exact CLI fit path) on the shipped real ATS shot
(94475): prepare with resolution-unit downsampling -> ``angular_optax``
(scanned-chunk device loop) -> postprocess (angular sigma-Hessian, EDF plots)
— reference ``/root/reference/tsadar/inverse/loops.py:167-275`` +
``prepare.py:133-177``.  The CPU e2e test (tests/test_inverse/
test_angular_e2e.py) runs this at 8 epochs; this artifact is the
accelerator-scale version with a loss-decrease gate, stage-resolved timings,
and persistent-cache state so compile wall-clocks gate against the right
(warm/cold) ceiling.

Prints ONE JSON line; exits nonzero on gate failure.
Record: E2E_ARTS_r{N}.json (per round).
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

N_EPOCHS = 200


def main():
    os.environ.setdefault(
        "TSADAR_COMPILE_CACHE", os.path.join(os.path.expanduser("~"), ".tsadar_jax_cache")
    )
    workdir = tempfile.mkdtemp(prefix="tsadar_e2e_arts_")
    runs_dir = os.path.join(workdir, "runs")
    os.environ["TSADAR_RUNS_DIR"] = runs_dir
    cfg_dir = os.path.join(workdir, "cfg")
    os.makedirs(cfg_dir)
    shutil.copy(
        os.path.join(HERE, "tests/configs/arts1v_test_defaults.yaml"),
        os.path.join(cfg_dir, "defaults.yaml"),
    )
    with open(os.path.join(HERE, "tests/configs/arts1v_test_inputs.yaml")) as f:
        inputs = yaml.safe_load(f)
    inputs.setdefault("optimizer", {}).update(
        {"method": "adam", "num_epochs": N_EPOCHS, "learning_rate": 5e-3}
    )
    inputs.setdefault("other", {})["calc_sigmas"] = True
    with open(os.path.join(cfg_dir, "inputs.yaml"), "w") as f:
        yaml.safe_dump(inputs, f)

    from tsadar_tpu.utils import cache_stats

    cache_dir = os.environ["TSADAR_COMPILE_CACHE"]
    cache_before = cache_stats.snapshot(cache_dir)

    cwd = os.getcwd()
    os.chdir(workdir)  # runner drops scratch files (state_weights.txt) in cwd
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
    run_jsons = glob.glob(os.path.join(runs_dir, "**", "run.json"), recursive=True)
    checks["run_recorded"] = len(run_jsons) == 1
    stages, losses = {}, {}
    if run_jsons:
        from tsadar_tpu.utils.e2e_stages import compile_gate, last_metric_reader

        last, metrics = last_metric_reader(run_jsons[0])
        epoch_losses = [m["value"] for m in metrics.get("epoch loss", [])]
        checks["epochs_ran"] = len(epoch_losses) >= 20
        if epoch_losses:
            initial, final = epoch_losses[0], min(epoch_losses)
            losses = {
                "initial_loss": round(float(initial), 6),
                "best_loss": round(float(final), 6),
                "n_epochs_ran": len(epoch_losses),
            }
            checks["losses_finite"] = bool(np.all(np.isfinite(epoch_losses)))
            # loss-decrease gate: the fit must actually optimize on real data
            checks["loss_decreased"] = final < 0.7 * initial
        setup_s = last("setup_time")
        fit_s = last("fit_time")
        lossfn_s = last("fit_lossfn_init_time")
        compile_s = last("fit_first_dispatch_time")
        post_s = last("postprocess_time")
        stages = {
            "prepare_s": setup_s,
            "fit_lossfn_init_s": lossfn_s,
            "fit_compile_s": compile_s,
            "fit_steps_s": round(fit_s - (compile_s or 0) - (lossfn_s or 0), 2)
            if None not in (fit_s, compile_s, lossfn_s)
            else None,
            "postprocess_s": post_s,
            "postprocess_recalc_s": last("postprocessing time"),
            "postprocess_plot_s": last("plotting time"),
            "other_s": round(total_s - sum(v for v in (setup_s, fit_s, post_s) if v), 1)
            if None not in (setup_s, fit_s, post_s)
            else None,
        }
        checks["stage_metrics_present"] = None not in stages.values()
        # ceilings + rationale live in tsadar_tpu/utils/e2e_stages.py
        # (committed r5 artifact: 9.5 s warm)
        if stages.get("fit_compile_s") is not None:
            checks["fit_compile_vs_cache_state"] = compile_gate(stages["fit_compile_s"], cache)

    art_dir = os.path.join(os.path.dirname(run_jsons[0]), "artifacts") if run_jsons else ""
    n_artifacts = (
        len(glob.glob(os.path.join(art_dir, "**", "*.*"), recursive=True)) if art_dir else 0
    )
    checks["artifacts_produced"] = n_artifacts >= 8

    # angular sigma path on real data: all-zero sigmas are the silent-failure
    # signature (the Hessian call is exception-guarded in postprocess)
    sig_files = (
        glob.glob(os.path.join(art_dir, "**", "sigmas_fe.npz"), recursive=True)
        if art_dir
        else []
    )
    checks["sigmas_fe_exist"] = len(sig_files) >= 1
    if sig_files:
        sig = np.load(sig_files[0])["sigmas"]
        checks["sigmas_finite_nonzero"] = bool(
            np.all(np.isfinite(sig)) and np.any(np.abs(sig) > 0)
        )

    # the workload's deliverables: fitted parameters + angular fit-vs-data
    # visualizations + the netCDF dataset.  (No distribution_function.png for
    # this deck: its EDF is DLM-parameterized — m is the fitted quantity and
    # plot_dist is a documented no-op without a direct EDF array, matching
    # the reference whose plot_dist would KeyError on a DLM angular fit.)
    checks["learned_parameters_csv"] = bool(
        art_dir and glob.glob(os.path.join(art_dir, "csv", "learned_parameters.csv"))
    )
    checks["angular_plots"] = bool(
        art_dir
        and glob.glob(os.path.join(art_dir, "plots", "angular_data_vs_fit.png"))
        and glob.glob(os.path.join(art_dir, "plots", "angular_lineouts.png"))
    )
    checks["fit_dataset"] = bool(
        art_dir and glob.glob(os.path.join(art_dir, "binary", "fit_and_data.nc"))
    )

    ok = all(checks.values())
    print(
        json.dumps(
            {
                "workload": f"e2e CLI ARTS fit: real ATS shot 94475, angular_optax adam"
                f" x{N_EPOCHS} epochs (scanned chunks), angular sigma-Hessian + fit/data plots",
                "platform": jax.default_backend(),
                "ok": ok,
                "total_s": round(total_s, 1),
                "n_artifacts": n_artifacts,
            }
            | losses
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
