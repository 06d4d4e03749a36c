"""Raw-data visualization with lineout/fit-range overlays.

Behavioral port of ``/root/reference/tsadar/utils/data_handling/data_visualizer.py``:
images of the raw electron/ion frames with the selected lineouts and fit windows
drawn on top, logged as artifacts.
"""

import os
import tempfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from .. import mlflow_shim as mlflow


def launch_data_visualizer(elecData, ionData, all_axes, config):
    with tempfile.TemporaryDirectory() as td:
        for name, data, xax, yax, windows in (
            (
                "electron",
                elecData,
                all_axes["epw_x"],
                all_axes["epw_y"],
                [("blue_min", "blue_max"), ("red_min", "red_max")],
            ),
            ("ion", ionData, all_axes["iaw_x"], all_axes["iaw_y"], [("iaw_min", "iaw_max")]),
        ):
            if np.ndim(data) != 2:
                continue
            fig, ax = plt.subplots(figsize=(7, 6), tight_layout=True)
            im = ax.imshow(
                data,
                aspect="auto",
                vmin=0,
                vmax=np.percentile(data, 99),
                extent=[xax[0], xax[-1], yax[-1], yax[0]],
            )
            fig.colorbar(im, ax=ax)
            for lo_key, hi_key in windows:
                fr = config["data"]["fit_rng"]
                if lo_key in fr and hi_key in fr:  # decks may define only one edge
                    ax.axhline(fr[lo_key], color="r", ls="--", lw=0.8)
                    ax.axhline(fr[hi_key], color="r", ls="--", lw=0.8)
            locs = np.atleast_1d(config["data"]["lineouts"].get("val", []))
            for loc in locs[:: max(1, locs.size // 20)]:
                if config["data"]["lineouts"]["type"] == "pixel":
                    ax.axvline(xax[int(loc)], color="w", ls=":", lw=0.5)
                else:
                    ax.axvline(loc, color="w", ls=":", lw=0.5)
            ax.set_title(f"{name} raw data")
            ax.set_xlabel(all_axes.get("x_label", ""))
            ax.set_ylabel("Wavelength (nm)")
            fig.savefig(os.path.join(td, f"{name}_raw_data.png"), bbox_inches="tight")
            plt.close(fig)
        mlflow.log_artifacts(td)
