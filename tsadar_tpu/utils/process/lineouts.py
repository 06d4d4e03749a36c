"""Lineout extraction, smoothing, background assembly, amplitude metrics.

Behavioral port of ``/root/reference/tsadar/utils/process/lineouts.py``.
"""

from collections import defaultdict
from typing import Dict

import numpy as np

from .evaluate_background import get_lineout_bg


def get_lineouts(
    elecData, ionData, BGele, BGion, axisxE, axisxI, axisyE, axisyI, shift_zero, IAWtime, xlab, sa, config
) -> Dict:
    lo_type = config["data"]["lineouts"]["type"]
    if lo_type in ("ps", "um"):
        LineoutPixelE = [np.argmin(abs(axisxE - loc - shift_zero)) for loc in config["data"]["lineouts"]["val"]]
        IAWtime = IAWtime / (axisxI[1] - axisxI[0])
        LineoutPixelI = [np.argmin(abs(axisxI - loc - shift_zero)) for loc in config["data"]["lineouts"]["val"]]
    elif lo_type == "pixel":
        LineoutPixelE = config["data"]["lineouts"]["val"]
        LineoutPixelI = config["data"]["lineouts"]["val"]
    else:
        raise NotImplementedError(f"lineout type {lo_type}")
    LineoutPixelI = np.round(np.array(LineoutPixelI) - IAWtime).astype(int)
    config["data"]["lineouts"]["pixelE"] = LineoutPixelE
    config["data"]["lineouts"]["pixelI"] = LineoutPixelI

    bg_type = config["data"]["background"]["type"]
    if bg_type in ("ps", "um"):
        BackgroundPixel = np.argmin(abs(axisxE - config["data"]["background"]["slice"]))
    elif bg_type == "pixel":
        BackgroundPixel = config["data"]["background"]["slice"]
    elif bg_type == "auto":
        BackgroundPixel = LineoutPixelE + 100
    else:
        BackgroundPixel = []

    span = 2 * config["data"]["dpixel"] + 1

    if config["other"]["extraoptions"]["load_ele_spec"]:
        LineoutTSE = [
            np.sum(elecData[:, a - config["data"]["dpixel"] : a + config["data"]["dpixel"]], axis=1)
            for a in LineoutPixelE
        ]
        LineoutTSE_smooth = [
            np.convolve(lo, np.ones(span) / span, "same") for lo in LineoutTSE
        ]
        if config["other"]["extraoptions"]["spectype"] == "angular":
            sa["weights"] = np.array(
                [
                    np.mean(sa["weights"][a - config["data"]["dpixel"] : a + config["data"]["dpixel"], :], axis=0)
                    for a in LineoutPixelE
                ]
            )
            sa["weights"] = sa["weights"][:, np.newaxis, :]
        else:
            sa["weights"] = sa["weights"] * np.ones([len(LineoutPixelE), len(sa["sa"])])
    else:
        LineoutTSE_smooth = []

    if config["other"]["extraoptions"]["load_ion_spec"]:
        LineoutTSI = [
            np.sum(ionData[:, a - config["data"]["dpixel"] : a + config["data"]["dpixel"]], axis=1)
            for a in LineoutPixelI
        ]
        LineoutTSI_smooth = [np.convolve(lo, np.ones(span) / span, "same") for lo in LineoutTSI]

    noiseE, noiseI = get_lineout_bg(
        config, elecData, ionData, BGele, BGion, LineoutTSE_smooth, BackgroundPixel, LineoutPixelE, LineoutPixelI
    )

    gain = config["other"]["gain"]
    fr = config["data"]["fit_rng"]
    if config["other"]["extraoptions"]["load_ion_spec"]:
        noiseI = noiseI / gain
        LineoutTSI_norm = np.array(LineoutTSI_smooth) / gain
        iaw_mask = ((fr["iaw_min"] < axisyI) & (axisyI < fr["iaw_cf_min"])) | (
            (fr["iaw_cf_max"] < axisyI) & (axisyI < fr["iaw_max"])
        )
        ampI = np.amax(LineoutTSI_norm[:, iaw_mask], axis=1)

    if config["other"]["extraoptions"]["load_ele_spec"]:
        noiseE = noiseE / gain
        LineoutTSE_norm = np.array(LineoutTSE_smooth) / gain
        epw_mask = ((fr["blue_min"] < axisyE) & (axisyE < fr["blue_max"])) | (
            (fr["red_min"] < axisyE) & (axisyE < fr["red_max"])
        )
        ampE = np.amax(LineoutTSE_norm[:, epw_mask], axis=1)

    all_data = defaultdict(list)
    all_data["noiseI"] = noiseI
    all_data["noiseE"] = noiseE

    if config["other"]["extraoptions"]["load_ion_spec"]:
        all_data["i_data"] = LineoutTSI_norm
        all_data["i_amps"] = ampI
    else:
        all_data["i_data"] = all_data["i_amps"] = np.zeros(len(config["data"]["lineouts"]["val"]))
    if config["other"]["extraoptions"]["load_ele_spec"]:
        all_data["e_data"] = LineoutTSE_norm
        all_data["e_amps"] = ampE
    else:
        all_data["e_data"] = all_data["e_amps"] = np.zeros(len(config["data"]["lineouts"]["val"]))

    return all_data
