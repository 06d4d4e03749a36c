"""Data preparation orchestration: load -> calibrate -> correct -> lineouts.

Behavioral port of ``/root/reference/tsadar/utils/process/prepare.py``.
"""

from typing import Dict

import numpy as np

from ..data_handling.load_ts_data import loadData
from ..data_handling.calibration import get_calibrations, get_scattering_angles
from .correct_throughput import correctThroughput
from .evaluate_background import get_shot_bg
from .feature_detector import first_guess
from .lineouts import get_lineouts


def prepare_data(config: Dict, shotNum: int):
    """Returns (all_data, sa, all_axes); mutates config with derived quantities."""
    custom_path = None
    if "filenames" in config["data"]:
        if config["data"]["filenames"].get("epw") is not None:
            import os

            custom_path = os.path.dirname(config["data"]["filenames"]["epw-local"])
        if config["data"]["filenames"].get("iaw") is not None:
            import os

            custom_path = os.path.dirname(config["data"]["filenames"]["iaw-local"])

    elecData, ionData, xlab, t0, config["other"]["extraoptions"]["spectype"] = loadData(
        config["data"]["shotnum"], config["data"]["shotDay"], config["other"]["extraoptions"], custom_path=custom_path
    )

    sa = get_scattering_angles(config)
    axisxE, axisxI, axisyE, axisyI, magE, stddev = get_calibrations(
        shotNum, config["other"]["extraoptions"]["spectype"], t0, config["other"]["CCDsize"]
    )
    all_axes = {"epw_x": axisxE, "epw_y": axisyE, "iaw_x": axisxI, "iaw_y": axisyI, "x_label": xlab}

    if not config["other"]["extraoptions"]["load_ion_spec"]:
        config["other"]["extraoptions"]["fit_IAW"] = 0
        print("IAW data not loaded, omitting IAW fit")
    if not config["other"]["extraoptions"]["load_ele_spec"]:
        config["other"]["extraoptions"]["fit_EPWb"] = 0
        config["other"]["extraoptions"]["fit_EPWr"] = 0
        print("EPW data not loaded, omitting EPW fit")

    if config["other"]["extraoptions"]["load_ele_spec"]:
        elecData = correctThroughput(elecData, config["other"]["extraoptions"]["spectype"], axisyE, shotNum)
        elecData = elecData + 0.1  # avoid exact zeros
    if config["other"]["extraoptions"]["load_ion_spec"]:
        ionData = ionData + 0.1

    BGele, BGion = get_shot_bg(config, shotNum, axisyE, elecData)

    # optional CV-based lineout/fit-range estimation (reference prepare.py:74-121)
    fd = config.get("feature_detector", {"estimate_lineouts_iaw": False, "estimate_lineouts_epw": False})
    lineout_start = lineout_end = None
    if fd["estimate_lineouts_iaw"] and not fd["estimate_lineouts_epw"]:
        lineout_end, lineout_start, iaw_cf_min, iaw_cf_max, iaw_max, iaw_min = first_guess(elecData, ionData, config)
        config["data"]["lineouts"]["start"] = all_axes["iaw_x"][lineout_start]
        config["data"]["lineouts"]["end"] = all_axes["iaw_x"][lineout_end]
        config["data"]["fit_rng"]["iaw_min"] = all_axes["iaw_y"][iaw_min]
        config["data"]["fit_rng"]["iaw_max"] = all_axes["iaw_y"][iaw_max]
        config["data"]["fit_rng"]["iaw_cf_min"] = all_axes["iaw_y"][int(iaw_cf_min)]
        config["data"]["fit_rng"]["iaw_cf_max"] = all_axes["iaw_y"][int(iaw_cf_max)]
    if fd["estimate_lineouts_epw"] and not fd["estimate_lineouts_iaw"]:
        lineout_end, lineout_start, blue_min, blue_max, red_min, red_max = first_guess(elecData, ionData, config)
        config["data"]["lineouts"]["start"] = all_axes["epw_x"][lineout_start]
        config["data"]["lineouts"]["end"] = all_axes["epw_x"][lineout_end]
        config["data"]["fit_rng"]["blue_min"] = all_axes["epw_y"][blue_min]
        config["data"]["fit_rng"]["blue_max"] = all_axes["epw_y"][blue_max]
        config["data"]["fit_rng"]["red_min"] = all_axes["epw_y"][red_min]
        config["data"]["fit_rng"]["red_max"] = all_axes["epw_y"][red_max]
    if fd["estimate_lineouts_epw"] and fd["estimate_lineouts_iaw"]:
        (
            lineout_end, lineout_start, iaw_cf_min, iaw_cf_max, iaw_max, iaw_min,
            ion_t0_shift, blue_min, blue_max, red_min, red_max,
        ) = first_guess(elecData, ionData, config)
        config["data"]["lineouts"]["start"] = all_axes["epw_x"][lineout_start]
        config["data"]["lineouts"]["end"] = all_axes["epw_x"][lineout_end]
        config["data"]["fit_rng"]["iaw_min"] = all_axes["iaw_y"][iaw_min]
        config["data"]["fit_rng"]["iaw_max"] = all_axes["iaw_y"][iaw_max]
        config["data"]["fit_rng"]["iaw_cf_min"] = all_axes["iaw_y"][int(iaw_cf_min)]
        config["data"]["fit_rng"]["iaw_cf_max"] = all_axes["iaw_y"][int(iaw_cf_max)]
        config["data"]["ion_t0_shift"] = all_axes["iaw_x"][ion_t0_shift]
        config["data"]["fit_rng"]["blue_min"] = all_axes["epw_y"][blue_min]
        config["data"]["fit_rng"]["blue_max"] = all_axes["epw_y"][blue_max]
        config["data"]["fit_rng"]["red_min"] = all_axes["epw_y"][red_min]
        config["data"]["fit_rng"]["red_max"] = all_axes["epw_y"][red_max]

    if fd["estimate_lineouts_epw"] or fd["estimate_lineouts_iaw"]:
        if config["data"]["lineouts"]["type"] == "pixel":
            config["data"]["lineouts"]["val"] = list(
                range(int(lineout_start), int(lineout_end), config["data"]["lineouts"]["skip"])
            )
        else:
            config["data"]["lineouts"]["val"] = list(
                range(
                    int(config["data"]["lineouts"]["start"]),
                    int(config["data"]["lineouts"]["end"]),
                    int(config["data"]["lineouts"]["skip"]),
                )
            )

    num_slices = len(config["data"]["lineouts"]["val"])
    batch_size = config["optimizer"]["batch_size"]
    if num_slices % batch_size != 0:
        print(f"total slices: {num_slices}")
        print(f"batch size = {batch_size} is not a round divisor of the number of lineouts")
        config["data"]["lineouts"]["val"] = config["data"]["lineouts"]["val"][: -(num_slices % batch_size)]
        print(f"final {num_slices % batch_size} lineouts have been removed")

    if (config["data"]["lineouts"]["type"] == "range") and (
        config["other"]["extraoptions"]["spectype"] == "angular"
    ):
        # ARTS: downsample the image to resolution units (reference prepare.py:133-177)
        config["other"]["extraoptions"]["spectype"] = "angular_full"
        sa["angAxis"] = axisxE

        ang_res_unit = config["other"]["ang_res_unit"]
        lam_res_unit = config["other"]["lam_res_unit"]

        def block_mean(a, n, axis):
            idx = range(0, a.shape[axis], n)
            return np.array([np.average(np.take(a, range(i, min(i + n, a.shape[axis])), axis=axis), axis=axis) for i in idx])

        data_res_unit = block_mean(elecData, lam_res_unit, 0)
        bg = BGele if np.ndim(BGele) == 2 else np.zeros_like(elecData)
        bg_res_unit = block_mean(bg, lam_res_unit, 0)
        # block_mean over axis 1 stacks blocks as rows -> [n_ang_out, n_lam_out],
        # matching the reference's comprehension orientation (prepare.py:148-159)
        data_res_unit = block_mean(data_res_unit, ang_res_unit, 1)
        bg_res_unit = block_mean(bg_res_unit, ang_res_unit, 1)
        axisyE = np.array([np.average(axisyE[i : i + lam_res_unit]) for i in range(0, axisyE.shape[0], lam_res_unit)])
        all_axes["epw_y"] = axisyE.reshape((-1, 1))
        axisxE = np.array([np.average(axisxE[i : i + ang_res_unit]) for i in range(0, axisxE.shape[0], ang_res_unit)])
        all_axes["epw_x"] = axisxE.reshape((-1, 1))
        all_data = {"e_data": data_res_unit, "e_amps": np.amax(data_res_unit, axis=1, keepdims=True)}
        all_data["i_data"] = all_data["i_amps"] = np.zeros(len(data_res_unit))
        all_data["noiseI"] = np.zeros(np.shape(bg_res_unit))
        all_data["noiseE"] = config["data"]["bgscaleE"] * bg_res_unit + 0.1
        config["other"]["CCDsize"] = np.shape(data_res_unit)
    else:
        all_data = get_lineouts(
            elecData,
            ionData,
            BGele,
            BGion,
            axisxE,
            axisxI,
            axisyE,
            axisyI,
            config["data"]["ele_t0"],
            config["data"]["ion_t0_shift"],
            xlab,
            sa,
            config,
        )

    config["other"]["PhysParams"]["widIRF"] = stddev
    config["other"]["lamrangE"] = [axisyE[0], axisyE[-1]]
    config["other"]["lamrangI"] = [axisyI[0], axisyI[-1]]
    config["other"]["npts"] = int(config["other"]["CCDsize"][1] * config["other"]["points_per_pixel"])

    return all_data, sa, all_axes
