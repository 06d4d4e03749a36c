"""Forward / series spectrum generation.

Behavioral port of ``/root/reference/tsadar/forward/calc_series.py`` with the
series loop actually functional (the reference notes its own series sweep is
broken post-refactor, calc_series.py:34; here ``series.paramN``/``valsN`` sweep
parameter values across electron / general / ion-1 groups).  Outputs are saved
as netCDF3 (matching the reference's xarray artifacts, via ``utils.ncwriter``)
plus .npz + CSV and plots.
"""

import os

import jax
import tempfile
from time import time

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ..core.diagnostic import ThomsonScatteringDiagnostic
from ..core.params import ThomsonParams
from ..utils import mlflow_shim as mlflow
from ..utils.data_handling.calibration import get_calibrations, get_scattering_angles
from ..utils.ncwriter import write_dataset
from ..utils.plotting import plotters


def _write_series_nc(path, sim, series_vals, lam_axis):
    """Simulated spectra as a netCDF over (series, Wavelength) coordinates
    (reference calc_series.py:150-191). Non-numeric series values (fract/Z
    sweeps pass lists) fall back to an index coordinate."""
    sim = np.atleast_2d(np.squeeze(np.asarray(sim)))
    try:
        coord = np.asarray(series_vals, float)
        # multi-species sweeps pass per-entry LISTS (e.g. Z: [[1,2],[3,4]]);
        # a flattened rectangular array would silently mislabel the axis, so
        # anything non-1D falls back to the index coordinate
        if coord.ndim != 1 or coord.size != sim.shape[0]:
            raise ValueError
    except (TypeError, ValueError):
        coord = np.arange(sim.shape[0], dtype=float)
    write_dataset(path, {"Sim": sim}, [("series", coord), ("Wavelength", np.squeeze(lam_axis))])


def _set_series_param(parameters, name, value):
    """Assign a series value; list values distribute across ion species
    (e.g. Z: [Z_ion1, Z_ion2] for multi-species sweeps)."""
    ion_keys = sorted(k for k in parameters if "ion" in k)
    if isinstance(value, (list, tuple)) and ion_keys and name in parameters[ion_keys[0]]:
        for k, v in zip(ion_keys, value):
            parameters[k][name]["val"] = v
        return
    for species in ("electron", "general", *ion_keys):
        if species in parameters and name in parameters[species]:
            parameters[species][name]["val"] = value
            return
    raise KeyError(f"series parameter {name} not found in any species")


def forward_pass(config):
    is_angular = "angular" in config["other"]["extraoptions"]["spectype"]
    config["optimizer"]["batch_size"] = 1

    config["other"]["lamrangE"] = [
        config["data"]["fit_rng"]["forward_epw_start"],
        config["data"]["fit_rng"]["forward_epw_end"],
    ]
    config["other"]["lamrangI"] = [
        config["data"]["fit_rng"]["forward_iaw_start"],
        config["data"]["fit_rng"]["forward_iaw_end"],
    ]
    config["other"]["npts"] = int(config["other"]["CCDsize"][1] * config["other"]["points_per_pixel"])

    sas = get_scattering_angles(config)

    dummy_batch = {
        "i_data": np.array([1]),
        "e_data": np.array([1]),
        "noise_e": np.array([0]),
        "noise_i": np.array([0]),
        "e_amps": np.array([1]),
        "i_amps": np.array([1]),
    }

    if is_angular:
        axisxE, _, _, _, _, _ = get_calibrations(
            104000, config["other"]["extraoptions"]["spectype"], 0.0, config["other"]["CCDsize"]
        )
        config["other"]["extraoptions"]["spectype"] = "angular_full"
        sas["angAxis"] = axisxE
        dummy_batch["i_data"] = np.ones(tuple(config["other"]["CCDsize"]))
        dummy_batch["e_data"] = np.ones(tuple(config["other"]["CCDsize"]))

    serieslen = len(config["series"]["vals1"]) if "series" in config else 1
    ThryE, ThryI, lamAxisE, lamAxisI = ([None] * serieslen for _ in range(4))

    t_start = time()
    ts_params = None
    for i in range(serieslen):
        if "series" in config:
            _set_series_param(config["parameters"], config["series"]["param1"], config["series"]["vals1"][i])
            for p in (2, 3, 4):
                if f"param{p}" in config["series"]:
                    _set_series_param(
                        config["parameters"], config["series"][f"param{p}"], config["series"][f"vals{p}"][i]
                    )

        ts_params = ThomsonParams.create(config["parameters"], num_params=1, batch=not is_angular)
        if i == 0:
            ts_diag = ThomsonScatteringDiagnostic(
                config,
                scattering_angles=sas,
                shard_2v_points=config["other"].get("shard_2v_points", False),
            )
            # params enter as a pytree argument: one compile for the whole series
            # (the axon TPU runtime cannot execute ops eagerly at all)
            ts_diag_jit = jax.jit(lambda tp, b: ts_diag(tp, b))
        ThryE[i], ThryI[i], lamAxisE[i], lamAxisI[i] = jax.device_get(ts_diag_jit(ts_params, dummy_batch))

    spectime = time() - t_start
    ThryE = np.array(ThryE)
    ThryI = np.array(ThryI)
    lamAxisE = np.array(lamAxisE)
    lamAxisI = np.array(lamAxisI)

    with tempfile.TemporaryDirectory() as td:
        for d in ("plots", "binary", "csv"):
            os.makedirs(os.path.join(td, d), exist_ok=True)
        series_vals = config["series"]["vals1"] if "series" in config else [0]

        if is_angular:
            physical_params = ts_params()
            plotters.plot_data_angular(
                config,
                {"ele": np.squeeze(ThryE)},
                {"e_data": np.zeros(tuple(config["other"]["CCDsize"]))},
                {"epw_x": sas["angAxis"], "epw_y": lamAxisE},
                td,
            )
            plotters.plot_dist(
                config,
                "electron",
                {"fe": np.squeeze(np.asarray(physical_params["electron"]["fe"]))},
                None,
                td,
            )
        else:
            def save_feature(axis, sim, lam_axis, name):
                """One spectral feature: series overplot + npz + netCDF artifacts."""
                axis.plot(lam_axis.squeeze().transpose(), sim.squeeze().transpose())
                axis.set_title("Simulated Data", fontsize=14)
                axis.set_ylabel("Amp (arb. units)")
                axis.set_xlabel("Wavelength (nm)")
                axis.grid()
                if "series" in config:
                    axis.legend([str(v) for v in series_vals])
                np.savez(
                    os.path.join(td, "binary", f"{name}_data.npz"),
                    Sim=sim,
                    series=np.asarray(series_vals, dtype=object),
                    Wavelength=lam_axis[0],
                )
                _write_series_nc(os.path.join(td, "binary", f"{name}_data.nc"), sim, series_vals, lam_axis[0])

            fig, ax = plt.subplots(1, 2, figsize=(12, 6), tight_layout=True)
            if config["other"]["extraoptions"]["load_ele_spec"]:
                save_feature(ax[0], ThryE, lamAxisE, "electron")
            if config["other"]["extraoptions"]["load_ion_spec"]:
                save_feature(ax[1], ThryI, lamAxisI, "ion")
            fig.savefig(os.path.join(td, "plots", "simulated_data"), bbox_inches="tight")
            plt.close(fig)

        mlflow.log_artifacts(td)
        mlflow.log_metrics({"spectrum_calc_time": spectime})
