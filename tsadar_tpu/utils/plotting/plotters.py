"""Fit-result outputs: CSVs, parameter/sigma datasets, and diagnostic plots.

Functional port of the reference plotting layer
(``/root/reference/tsadar/utils/plotting/plotters.py``, 958 LoC of matplotlib).
Covers the outputs the pipeline and tests rely on: final-parameter CSVs,
parameter-vs-lineout plots with sigma bands, loss histograms, data-vs-fit images
(both the reference's two-panel pcolormesh layout and a residual panel),
best/worst lineout fits, EDF plots, and sigma datasets. Binary artifacts are
written as netCDF3 (via ``utils.ncwriter``; xarray is not a dependency) for
compatibility with consumers of the reference's ``.nc`` files, alongside ``.npz``.
"""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from matplotlib.colors import ListedColormap

from ..console import log_info
from ..ncwriter import write_dataset


def _white_ramp(to_rgb, n):
    """n RGBA rows blending white -> to_rgb (zero/low values render white)."""
    ramp = np.ones((n, 4))
    ramp[:, :3] = np.linspace([1.0, 1.0, 1.0], np.asarray(to_rgb)[:3], n)
    return ramp


def TScmap():
    """White-footed jet colormap (reference plotters.py:935-957)."""
    upper = plt.get_cmap("jet")(np.arange(256))
    return ListedColormap(np.vstack([_white_ramp(upper[0], 256 // 16), upper]), name="TScmap")


def _spectrum_cmap(foot=20):
    """gist_ncar with its lowest ``foot`` entries ramped from white
    (reference plot_2D_data_vs_fit, plotters.py:544-555)."""
    colors = plt.get_cmap("gist_ncar")(np.linspace(0, 1, 256))
    colors[:foot] = _white_ramp(colors[foot], foot)
    return ListedColormap(colors)


def plot_2D_data_vs_fit(
    config, x, y, data, fit, td, xlabel="Time (ps)", ylabel="Wavelength (nm)", name="fit_and_data.png"
):
    """Side-by-side fit/data pcolormesh images on a shared color scale
    (reference plotters.py:524-569). Color limits come from
    ``config["plotting"]["data_cbar_l"/"data_cbar_u"]`` ("data" = autoscale)."""
    plotting_cfg = config.get("plotting", {})
    lo = plotting_cfg.get("data_cbar_l", "data")
    hi = plotting_cfg.get("data_cbar_u", "data")
    vmin = np.amin(data) if lo == "data" else lo
    vmax = np.amax(data) if hi == "data" else hi

    cmap = _spectrum_cmap()
    fig, ax = plt.subplots(1, 2, figsize=(12, 5), tight_layout=True)
    pc = ax[0].pcolormesh(x, y, fit, shading="nearest", cmap=cmap, vmin=vmin, vmax=vmax)
    ax[1].pcolormesh(x, y, data, shading="nearest", cmap=cmap, vmin=vmin, vmax=vmax)
    ax[0].set_title("fit")
    ax[1].set_title("data")
    for a in ax:
        a.set_xlabel(xlabel)
        a.set_ylabel(ylabel)
    fig.colorbar(pc)
    fig.savefig(os.path.join(td, "plots", name), bbox_inches="tight")
    plt.close(fig)


def get_final_params(config, best_weights, all_axes, td):
    """Format fitted parameters as "{param}_{species}" series + EDF arrays,
    save CSVs, and return the merged dict (reference plotters.py:11-71)."""
    all_params = {}
    dist = {}
    for species in best_weights.keys():
        for k, v in best_weights[species].items():
            arr = np.asarray(v)
            if k in ("fe", "f"):
                dist["fe"] = np.squeeze(arr)
            elif k == "flm":
                flm = v[0] if isinstance(v, list) else v
                if isinstance(flm, dict):
                    for l, sub in flm.items():
                        if isinstance(sub, dict):
                            for m, fv in sub.items():
                                if m in ("fvxvy", "v"):
                                    dist["fe" if m == "fvxvy" else "v"] = np.squeeze(np.asarray(fv))
                                else:
                                    dist[f"flm{l}{m}"] = np.squeeze(np.asarray(fv))
            else:
                all_params[k + "_" + species] = pd.Series(arr.reshape(-1))

    final_params = pd.DataFrame(all_params)
    try:
        if config["other"]["extraoptions"]["load_ion_spec"]:
            final_params.insert(
                0, all_axes["x_label"], np.array(all_axes["iaw_x"][config["data"]["lineouts"]["pixelI"]])
            )
            final_params.insert(0, "lineout pixel", config["data"]["lineouts"]["pixelI"])
        elif config["other"]["extraoptions"]["spectype"] != "angular_full":
            final_params.insert(
                0, all_axes["x_label"], np.array(all_axes["epw_x"][config["data"]["lineouts"]["pixelE"]])
            )
            final_params.insert(0, "lineout pixel", config["data"]["lineouts"]["pixelE"])
    except (KeyError, IndexError, TypeError):
        pass
    final_params.to_csv(os.path.join(td, "csv", "learned_parameters.csv"))

    if "fe" in dist:
        fe = dist["fe"]
        if fe.ndim == 1:
            pd.DataFrame({"fe": list(fe)}).to_csv(os.path.join(td, "csv", "learned_dist.csv"))
        elif fe.ndim == 2:
            pd.DataFrame(data=fe).to_csv(os.path.join(td, "csv", "learned_dist.csv"))
    return all_params | dist


def plot_loss_hist(config, losses_init, losses, reduced_points, td):
    red_losses = np.asarray(losses) / reduced_points
    fig, ax = plt.subplots(1, 2, figsize=(10, 4), tight_layout=True)
    ax[0].hist(np.asarray(losses_init), 32)
    ax[0].set_title("initial losses")
    ax[1].hist(red_losses, 32)
    ax[1].set_title("final losses")
    for a in ax:
        a.set_xlabel("loss")
        a.grid()
    fig.savefig(os.path.join(td, "plots", "loss_histograms.png"), bbox_inches="tight")
    plt.close(fig)
    return red_losses


def plot_ts_data(config, fits, all_data, all_axes, td):
    """Data vs fit images for electron and ion spectra.

    Produces the reference artifact set (``binary/{ele,ion}_fit_and_data.nc``
    netCDFs + ``plots/fit_and_data_{ele,ion}.png`` two-panel pcolormesh,
    reference plotters.py:450-522) plus this repo's residual panel and ``.npz``.
    """
    savedata = {}
    for species, dkey, axis, pixkey in (
        ("ele", "e_data", "epw", "pixelE"),
        ("ion", "i_data", "iaw", "pixelI"),
    ):
        data = np.atleast_2d(np.asarray(all_data[dkey]))
        fit = fits[species]["total_spec"] if isinstance(fits[species], dict) else np.asarray(fits[species])
        fit = np.atleast_2d(np.asarray(fit))
        if data.size <= 1 or np.all(data == 0):
            continue
        fig, ax = plt.subplots(1, 3, figsize=(14, 4), tight_layout=True)
        vmax = np.percentile(data, 99)
        ax[0].imshow(data, aspect="auto", vmin=0, vmax=vmax)
        ax[0].set_title(f"{species} data")
        ax[1].imshow(fit, aspect="auto", vmin=0, vmax=vmax)
        ax[1].set_title("fit")
        ax[2].imshow(data - fit, aspect="auto")
        ax[2].set_title("residual")
        fig.savefig(os.path.join(td, "plots", f"{species}_data_vs_fit.png"), bbox_inches="tight")
        plt.close(fig)
        savedata[species] = {"data": data, "fit": fit}
        np.savez(os.path.join(td, "binary", f"{species}_fit_and_data.npz"), data=data, fit=fit)

        # reference-parity artifacts, skipped when calibrated axes are absent
        # (synthetic runs that never went through prepare_data)
        try:
            pix = np.asarray(config["data"]["lineouts"][pixkey], int)
            xvals = np.squeeze(np.asarray(all_axes[f"{axis}_x"]))[pix]
            yvals = np.squeeze(np.asarray(all_axes[f"{axis}_y"]))
        except (KeyError, IndexError, TypeError):
            continue
        if data.shape != (xvals.size, yvals.size):
            continue
        write_dataset(
            os.path.join(td, "binary", f"{species}_fit_and_data.nc"),
            {"fit": fit, "data": data},
            [(all_axes.get("x_label", "lineout"), xvals), ("Wavelength", yvals)],
        )
        x_grid, y_grid = np.meshgrid(xvals, yvals)
        plot_2D_data_vs_fit(
            config, x_grid, y_grid, data.T, fit.T, td,
            xlabel=all_axes.get("x_label", "lineout"),
            name=f"fit_and_data_{species}.png",
        )
    return savedata


def model_v_actual(config, all_data, all_axes, fits, losses, red_losses, sqdevs, td):
    """Best and worst fitted lineouts (reference plotters.py:617-713)."""
    losses = np.asarray(losses)
    num = min(4, len(losses))
    order = np.argsort(losses)
    picks = {"best": order[:num], "worst": order[-num:]}
    for species, dkey in (("ele", "e_data"), ("ion", "i_data")):
        data = np.atleast_2d(np.asarray(all_data[dkey]))
        fit = fits[species]["total_spec"] if isinstance(fits[species], dict) else np.asarray(fits[species])
        fit = np.atleast_2d(fit)
        if data.size <= 1 or np.all(data == 0):
            continue
        for which, inds in picks.items():
            fig, axs = plt.subplots(1, num, figsize=(4 * num, 3), tight_layout=True, squeeze=False)
            for a, i in zip(axs[0], inds):
                a.plot(data[i], label="data")
                a.plot(fit[i], label="fit")
                a.set_title(f"lineout {i}, loss={losses[i]:.2e}")
                a.legend()
                a.grid()
            fig.savefig(os.path.join(td, "plots", f"{which}_{species}_lineouts.png"), bbox_inches="tight")
            plt.close(fig)


def _component_slices(comps_by_batch, lineout):
    """The stored [B, G, L, A] component stack row for a global lineout index."""
    for inds, stack in comps_by_batch.items():
        if lineout in inds:
            return np.asarray(stack)[list(inds).index(lineout)]
    return None


def _axis_for_lineout(axis_store, lineout):
    """The raw model wavelength axis for a global lineout index.

    ``detailed_axis`` is keyed per batch (like ``spec_comps``) and each entry
    may carry per-lineout rows when lam is fitted per-lineout — index the row
    by the lineout's position in its batch rather than assuming lineout 0's
    axis fits everyone.

    The legacy single-array form (no in-repo producer emits it today) is
    indexed by GLOBAL lineout index: its rows must span all lineouts of the
    run, not one batch's. An out-of-range index means the store doesn't
    actually cover this lineout; return None so the caller skips the overlay
    rather than silently plotting lineout 0's axis."""
    if axis_store is None:
        return None
    if isinstance(axis_store, dict):
        for inds, ax in axis_store.items():
            if lineout in inds:
                ax = np.asarray(ax)
                if ax.ndim > 1:
                    return ax.reshape(-1, ax.shape[-1])[list(inds).index(lineout)]
                return ax
        return None
    ax = np.asarray(axis_store)  # legacy single-array form, global row index
    if ax.ndim > 1:
        rows = ax.reshape(-1, ax.shape[-1])
        if lineout >= rows.shape[0]:
            log_info(
                f"detailed_axis legacy array has {rows.shape[0]} rows, no row for "
                f"global lineout {lineout}; skipping the raw-axis overlay"
            )
            return None
        return rows[lineout]
    return ax


def detailed_lineouts(config, all_data, all_axes, fits, losses, red_losses, sqdevs, td):
    """Best/worst lineouts plus, when the detailed breakdown ran, per-component
    figures: data, total fit, gradient/angle component slices, IRF-only
    spectrum, and a chi^2-per-point residual panel (reference plotters.py:713-933)."""
    model_v_actual(config, all_data, all_axes, fits, losses, red_losses, sqdevs, td)

    losses = np.asarray(losses).ravel()
    order = np.argsort(losses)
    picks = list(dict.fromkeys(np.concatenate([order[:2], order[-2:]])))
    for species, dkey in (("ele", "e_data"), ("ion", "i_data")):
        comps = fits[species].get("spec_comps")
        if not comps:
            continue
        data = np.atleast_2d(np.asarray(all_data[dkey]))
        total = np.atleast_2d(np.asarray(fits[species]["total_spec"]))
        axis_store = fits[species].get("detailed_axis")
        for lineout in picks:
            stack = _component_slices(comps, int(lineout))
            raw_axis = _axis_for_lineout(axis_store, int(lineout))
            if stack is None or data.size <= 1 or data.shape[0] <= lineout:
                continue
            fig, (ax_top, ax_res) = plt.subplots(
                2, 1, figsize=(8, 6), tight_layout=True, sharex=False, height_ratios=[3, 1]
            )
            ax_top.plot(data[lineout], label="data", color="k", lw=1)
            ax_top.plot(total[lineout], label="total fit")
            if raw_axis is not None and stack.ndim == 3 and stack.shape[1] == raw_axis.size:
                # stack is [G, L, A] on the raw model axis; a second x-axis
                # keeps the pre-IRF components honest next to the pixel data
                ax_comp = ax_top.twiny()
                ax_comp.plot(raw_axis, stack[0, :, 0], ls="--", alpha=0.7, label="first grad/angle")
                ax_comp.plot(raw_axis, stack[-1, :, 0], ls="--", alpha=0.7, label="last grad")
                ax_comp.plot(raw_axis, stack[0, :, -1], ls="--", alpha=0.7, label="last angle")
                ax_comp.set_xlabel("Wavelength (nm)")
                ax_comp.legend(loc="upper left", fontsize=8)
            irf = fits[species].get("IRF")
            if irf is not None:
                ax_top.plot(np.atleast_2d(irf)[lineout], label="IRF", alpha=0.7)
            ax_top.set_title(f"{species} lineout {lineout}, loss={losses[lineout]:.2e}")
            ax_top.set_ylabel("Amp (arb. units)")
            ax_top.legend(loc="upper right", fontsize=8)
            ax_top.grid()
            ax_res.plot(np.atleast_2d(np.asarray(sqdevs[species]))[lineout])
            ax_res.set_ylabel(r"$\chi_i^2$")
            ax_res.set_xlabel("pixel")
            fig.savefig(
                os.path.join(td, "plots", f"breakdown_{species}_lineout{lineout}.png"),
                bbox_inches="tight",
            )
            plt.close(fig)


def save_sigmas_params(config, all_params, sigmas, all_axes, td):
    """Sigma dataset: per-lineout uncertainties for each active scalar parameter."""
    sigmas = np.asarray(sigmas)
    names = []
    for species, params in all_params.items():
        for key, val in params.items():
            if np.asarray(val).ndim <= 1:
                names.append(f"{species}.{key}")
    names = names[: sigmas.shape[1]]
    np.savez(os.path.join(td, "binary", "sigmas.npz"), sigmas=sigmas, names=np.array(names, dtype=object))
    df = pd.DataFrame(sigmas, columns=names + [f"p{i}" for i in range(sigmas.shape[1] - len(names))])
    df.to_csv(os.path.join(td, "csv", "sigmas.csv"))

    # reference-parity sigmas.nc: one variable per parameter over the lineout
    # axis, written at the artifact ROOT (not binary/) because that is where
    # the reference puts it (reference plotters.py:406)
    try:
        pix = np.asarray(config["data"]["lineouts"]["pixelE"], int)
        xvals = np.squeeze(np.asarray(all_axes["epw_x"]))[pix]
    except (KeyError, IndexError, TypeError):
        xvals = np.arange(sigmas.shape[0], dtype=float)
    if sigmas.shape[0] == xvals.size:
        write_dataset(
            os.path.join(td, "sigmas.nc"),
            {name.replace(".", "_"): sigmas[:, i] for i, name in enumerate(names)},
            [(all_axes.get("x_label", "lineout"), xvals)],
        )
    return {"sigmas": sigmas, "names": names}


def plot_final_params(config, all_params, sigma_ds, td):
    """Parameter vs lineout with sigma bands (reference plotters.py:73-123)."""
    sigmas = np.asarray(sigma_ds["sigmas"])
    names = sigma_ds["names"]
    col = 0
    for species, params in all_params.items():
        for key, val in params.items():
            arr = np.asarray(val)
            if arr.ndim > 1:
                continue
            fig, ax = plt.subplots(figsize=(6, 3), tight_layout=True)
            x = np.arange(len(arr.reshape(-1)))
            y = arr.reshape(-1)
            ax.plot(x, y, "o-")
            if f"{species}.{key}" in names:
                i = names.index(f"{species}.{key}")
                if sigmas.shape[0] == len(y):
                    s = np.abs(sigmas[:, i])
                    ax.fill_between(x, y - s, y + s, alpha=0.3)
            ax.set_xlabel("lineout")
            ax.set_ylabel(key)
            ax.grid()
            fig.savefig(os.path.join(td, "plots", f"{species}_{key}.png"), bbox_inches="tight")
            plt.close(fig)
            col += 1


def plot_data_angular(config, fits, all_data, all_axes, td):
    data = np.atleast_2d(np.asarray(all_data["e_data"]))
    fit = np.atleast_2d(np.asarray(fits["ele"]))
    fig, ax = plt.subplots(1, 3, figsize=(14, 4), tight_layout=True)
    vmax = np.percentile(data, 99)
    ax[0].imshow(data, aspect="auto", vmin=0, vmax=vmax)
    ax[0].set_title("ARTS data")
    sl = slice(config["data"]["lineouts"]["start"], config["data"]["lineouts"]["end"])
    ax[1].imshow(fit, aspect="auto", vmin=0, vmax=vmax)
    ax[1].set_title("fit")
    ax[2].imshow(data[sl] - fit, aspect="auto")
    ax[2].set_title("residual (fit window)")
    fig.savefig(os.path.join(td, "plots", "angular_data_vs_fit.png"), bbox_inches="tight")
    plt.close(fig)
    np.savez(os.path.join(td, "binary", "angular_fit_and_data.npz"), data=data, fit=fit)

    # reference-parity artifacts (plotters.py:410-447): netCDF over the fit
    # window + the two-panel pcolormesh against the angle axis
    try:
        xvals = np.squeeze(np.asarray(all_axes["epw_x"]))[sl]
        yvals = np.squeeze(np.asarray(all_axes["epw_y"]))
        windowed = data[sl]
        if windowed.shape == fit.shape == (xvals.size, yvals.size):
            write_dataset(
                os.path.join(td, "binary", "fit_and_data.nc"),
                {"fit": fit, "data": windowed},
                [(all_axes.get("x_label", "Scattering angle (degrees)"), xvals), ("Wavelength", yvals)],
            )
            x_grid, y_grid = np.meshgrid(xvals, yvals)
            plot_2D_data_vs_fit(
                config, x_grid, y_grid, windowed.T, fit.T, td, xlabel="Angle (degrees)"
            )
    except (KeyError, IndexError, TypeError):
        pass
    return {"data": data, "fit": fit}


def plot_ang_lineouts(used_points, sqdevs, losses, all_params, all_axes, savedata, td):
    data, fit = savedata["data"], savedata["fit"]
    num = min(4, fit.shape[0])
    fig, axs = plt.subplots(1, num, figsize=(4 * num, 3), tight_layout=True, squeeze=False)
    for k, a in enumerate(axs[0]):
        i = k * max(1, fit.shape[0] // num)
        a.plot(fit[i], label="fit")
        a.set_title(f"res unit {i}")
        a.legend()
        a.grid()
    fig.savefig(os.path.join(td, "plots", "angular_lineouts.png"), bbox_inches="tight")
    plt.close(fig)


def plot_dist(config, elec_species, final_params, sigma_fe, td):
    """EDF plot: 1V curve or 2V image + projections (reference plotters.py:184-347)."""
    fe = None
    for key in ("fe", "f", "fvxvy"):
        if key in final_params:
            fe = np.asarray(final_params[key])
            break
    if fe is None:
        return
    fe = np.squeeze(fe)
    fig, ax = plt.subplots(1, 2 if fe.ndim == 2 else 1, figsize=(9, 4), tight_layout=True, squeeze=False)
    if fe.ndim == 2 and fe.shape[0] == fe.shape[1]:
        im = ax[0][0].imshow(np.log10(np.maximum(fe, 1e-30)), aspect="auto")
        fig.colorbar(im, ax=ax[0][0])
        ax[0][0].set_title("log10 f(vx, vy)")
        ax[0][1].plot(np.log10(np.maximum(fe.sum(0), 1e-30)), label="proj vy")
        ax[0][1].plot(np.log10(np.maximum(fe.sum(1), 1e-30)), label="proj vx")
        ax[0][1].legend()
        ax[0][1].grid()
    else:
        ax[0][0].semilogy(np.atleast_2d(fe).T)
        ax[0][0].set_title("f(v)")
        ax[0][0].grid()
    fig.savefig(os.path.join(td, "plots", "distribution_function.png"), bbox_inches="tight")
    plt.close(fig)


def save_sigmas_fe(final_params, best_weights_std, sigmas, td):
    sigmas = np.asarray(sigmas)
    np.savez(os.path.join(td, "binary", "sigmas_fe.npz"), sigmas=sigmas)
    # reference-parity sigma-fe.nc over the (normalized) velocity coordinate
    # (reference plotters.py:347-380)
    fe_sigma = np.ravel(sigmas)
    write_dataset(
        os.path.join(td, "binary", "sigma-fe.nc"),
        {"sigma_fe": fe_sigma},
        [("v", np.linspace(-7, 7, fe_sigma.size))],
    )
    return sigmas
