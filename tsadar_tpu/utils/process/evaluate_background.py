"""Shot- and lineout-level background models.

Behavioral port of ``/root/reference/tsadar/utils/process/evaluate_background.py``:
background-shot smoothing (5x3 / 5x5 box conv), polynomial-scaled backgrounds for
angular "Fit" mode, rational/exponential/power edge-fit backgrounds, and
pixel-lineout backgrounds with double-exponential rescaling.
"""

from typing import Tuple

import numpy as np
import scipy.optimize as spopt
from scipy.signal import convolve2d as conv2

from ..data_handling.load_ts_data import loadData
from .correct_throughput import correctThroughput


def get_shot_bg(config, shotNum, axisyE, elecData):
    """Background from a dedicated background shot (reference :13-83)."""
    if config["data"]["background"]["type"] == "Shot":
        BGele, BGion, _, _, _ = loadData(
            config["data"]["background"]["slice"], config["data"]["shotDay"], config["other"]["extraoptions"]
        )
        if config["other"]["extraoptions"]["load_ion_spec"]:
            BGion = conv2(BGion, np.ones([5, 3]) / 15, mode="same")
        else:
            BGion = 0
        if config["other"]["extraoptions"]["load_ele_spec"]:
            BGele = correctThroughput(
                BGele, config["other"]["extraoptions"]["spectype"], axisyE, config["data"]["shotnum"]
            )
            if config["other"]["extraoptions"]["spectype"] == "angular":
                BGele = conv2(BGele, np.ones([5, 5]) / 25, mode="same")
            else:
                BGele = conv2(BGele, np.ones([5, 3]) / 15, mode="same")
        else:
            BGele = 0

    elif config["other"]["extraoptions"]["spectype"] == "angular" and config["data"]["background"]["type"] == "Fit":
        BGele, _, _, _, _ = loadData(
            config["data"]["background"]["slice"], config["data"]["shotDay"], config["other"]["extraoptions"]
        )
        BGele = correctThroughput(BGele, config["other"]["extraoptions"]["spectype"], axisyE, shotNum)
        BGele = conv2(BGele, np.ones([5, 5]) / 25, mode="same")
        xx = np.arange(1024)

        def quadbg(x):
            return np.sum(
                (elecData[1000, :] - ((x[0] * (xx - x[3]) ** 2 + x[1] * (xx - x[3]) + x[2]) * BGele[1000, :])) ** 2
            )

        corrfactor = spopt.minimize(quadbg, [0.1, 0.1, 1.15, 300])
        BGele = (
            corrfactor.x[0] * (xx - corrfactor.x[3]) ** 2 + corrfactor.x[1] * (xx - corrfactor.x[3]) + corrfactor.x[2]
        ) * BGele
        print("Angular background corrected with polynomial model")
        BGion = 0
    else:
        BGele = 0
        BGion = 0

    return BGele, BGion


def _exp2(x, a, b, c, d):
    return a * np.exp(b * x) + c * np.exp(d * x)


def _exp2_decay(x, a, b, c, d):
    return a * np.exp(-b * x) + c * np.exp(-d * x)


def _power2(x, a, b, c):
    return a * x**b + c


def _rat21(x, a, b, c, d):
    return (a * x**2 + b * x + c) / (x + d)


def _rat11(x, a, b, c):
    return (a * x + b) / (x + c)


_BG_MODELS = {"exp2": _exp2, "power2": _power2, "rat21": _rat21, "rat11": _rat11}


def get_lineout_bg(
    config, elecData, ionData, BGele, BGion, LineoutTSE_smooth, BackgroundPixel, LineoutPixelE, LineoutPixelI
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-lineout noise profiles (reference :86-253)."""
    span = 2 * config["data"]["dpixel"] + 1

    if config["data"]["background"]["type"].casefold() not in ["fit", "shot", "pixel"]:
        raise NotImplementedError("Background type must be: 'Fit', 'Shot', or 'Pixel'")

    if config["other"]["extraoptions"]["load_ele_spec"]:
        if config["data"]["background"]["type"].casefold() == "fit":
            if config["other"]["extraoptions"]["spectype"] != "angular":
                dom = config["data"]["background"]["bg_alg_domain"]
                bgfitx = np.hstack([np.arange(dom[0], dom[1]), np.arange(dom[2], dom[3])])
                bgalg = _BG_MODELS[config["data"]["background"]["bg_alg"]]
                LineoutBGE = []
                for i, _ in enumerate(config["data"]["lineouts"]["val"]):
                    pvec, _ = spopt.curve_fit(
                        bgalg, bgfitx, LineoutTSE_smooth[i][bgfitx], config["data"]["background"]["bg_alg_params"]
                    )
                    LineoutBGE.append(bgalg(np.arange(1024), *pvec))
        else:
            LineoutBGE = np.mean(
                (elecData - BGele)[
                    :, BackgroundPixel - config["data"]["dpixel"] : BackgroundPixel + config["data"]["dpixel"]
                ],
                1,
            )
            LineoutBGE = np.convolve(LineoutBGE, np.ones(span) / span, "same")

            if config["other"]["extraoptions"]["spectype"] != "angular":
                # streaked data: avoid fiducials and notch filter regions
                bgfitx = np.hstack([np.arange(250, 480), np.arange(540, 900)])
                bgfitx2 = np.hstack([np.arange(250, 300), np.arange(700, 900)])
                expbg, _ = spopt.curve_fit(_exp2_decay, bgfitx, LineoutBGE[bgfitx], p0=[200, 0.001, 200, 0.001])
                LineoutBGE = config["data"]["bgscaleE"] * _exp2_decay(np.arange(1024), *expbg)

                LineoutBGE_rescaled = []
                for i, _ in enumerate(config["data"]["lineouts"]["val"]):
                    scale = spopt.minimize_scalar(
                        lambda a: np.sum(abs(LineoutTSE_smooth[i][bgfitx2] - a * LineoutBGE[bgfitx2]))
                    )
                    LineoutBGE_rescaled.append(scale.x * LineoutBGE)
                LineoutBGE = np.array(LineoutBGE_rescaled)

        if np.shape(BGele) == tuple(config["other"]["CCDsize"]):
            LineoutBGE2 = [
                np.mean(BGele[:, a - config["data"]["dpixel"] : a + config["data"]["dpixel"]], axis=1)
                for a in LineoutPixelE
            ]
            noiseE = LineoutBGE + np.array(LineoutBGE2)
        else:
            noiseE = np.asarray(LineoutBGE) * np.ones((len(LineoutPixelE), 1))

        noiseE = noiseE + config["other"]["flatbg"]
    else:
        noiseE = np.zeros(len(config["data"]["lineouts"]["val"]))

    if config["other"]["extraoptions"]["load_ion_spec"]:
        if config["data"]["background"]["type"].casefold() == "fit":
            BackgroundPixel = config["data"]["background"]["slice"]

        noiseI = np.mean(
            (ionData - BGion)[
                :, BackgroundPixel - config["data"]["dpixel"] : BackgroundPixel + config["data"]["dpixel"]
            ],
            1,
        )
        noiseI = np.convolve(noiseI, np.ones(span) / span, "same")
        bgfitx = np.hstack([np.arange(200, 400), np.arange(700, 850)])
        noiseI = np.mean(noiseI[bgfitx])
        noiseI = np.ones(1024) * config["data"]["bgscaleI"] * noiseI

        if np.shape(BGion) == tuple(config["other"]["CCDsize"]):
            LineoutBGI = [
                np.mean(BGion[:, a - config["data"]["dpixel"] : a + config["data"]["dpixel"]], axis=1)
                for a in LineoutPixelI
            ]
            noiseI = noiseI + LineoutBGI
        else:
            noiseI = noiseI * np.ones((len(LineoutPixelI), 1))
    else:
        noiseI = np.zeros(len(config["data"]["lineouts"]["val"]))

    return noiseE, noiseI
