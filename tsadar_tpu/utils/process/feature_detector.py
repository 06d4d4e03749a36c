"""CV-based automatic estimation of lineout ranges and fit windows.

Behavioral port of ``/root/reference/tsadar/utils/process/feature_detector.py``:
normalize -> Gaussian blur -> notch split (EPW) -> morphological opening ->
Shi-Tomasi corners -> neighbor filtering -> bounding box + configured buffers.
The O(n^2) corner-neighbor loop is vectorized.
"""

import cv2 as cv
import numpy as np


def _data_processing(data, config, wave_type):
    if config["other"]["extraoptions"]["spectype"] == "temporal":
        a, b = (150, 850) if wave_type == "IAW" else (200, 900)
    else:
        a = 150 if wave_type == "EPW" else 0
        b = 1023
    data = data[a:b, 0:1023]
    lo, hi = data.min(), data.max()
    return (((data - lo) / (hi - lo)) * 255.0).astype(np.uint8)


def _notch_filter(img, config):
    blur = cv.GaussianBlur(img, (21, 21), 0)
    start, end = 516, 540
    off = 200 if config["other"]["extraoptions"]["spectype"] == "temporal" else 150
    start -= off
    end -= off
    return blur[end:, :], blur[:start, :]  # red, blue


def _morphological_opening(img):
    for k in (3, 5, 7):
        kernel = np.ones((k, k), np.uint8)
        img = cv.dilate(cv.erode(img, kernel, iterations=1), kernel, iterations=1)
    return img


def _data_analysis(img, config):
    corners = cv.goodFeaturesToTrack(img, 100, 0.1, 10)
    corners = np.intp(corners).reshape(-1, 2)

    # keep corners with at least one neighbor within max_distance
    max_distance = 100
    d2 = np.sum((corners[:, None, :] - corners[None, :, :]) ** 2, axis=-1).astype(float)
    np.fill_diagonal(d2, np.inf)
    keep = d2.min(axis=1) <= max_distance**2
    filtered = corners[keep]

    min_x, max_x = filtered[:, 0].min(), filtered[:, 0].max()
    min_y, max_y = filtered[:, 1].min(), filtered[:, 1].max()

    buf = config["feature_detector"]["buffer"]
    return (
        min_x - buf["lineout_start"],
        max_x + buf["lineout_end"],
        min_y - buf["spectral_start"],
        max_y + buf["spectral_end"],
    )


def first_guess(elecData, ionData, config):
    def iaw_detector():
        img = _morphological_opening(_data_processing(ionData, config, "IAW"))
        min_x, max_x, min_y, max_y = _data_analysis(img, config)
        lineout_start, lineout_end = min_x, max_x
        if config["other"]["extraoptions"]["spectype"] == "temporal":
            iaw_max, iaw_min = max_y + 150, min_y + 150
        else:
            iaw_max, iaw_min = max_y, min_y
        iaw_cf = (iaw_max - iaw_min) * 0.2
        midpoint = (iaw_max + iaw_min) / 2
        return lineout_end, lineout_start, midpoint - iaw_cf, midpoint + iaw_cf, iaw_max, iaw_min

    def epw_detector():
        img = _data_processing(elecData, config, "EPW")
        red, blue = _notch_filter(img, config)
        rx0, rx1, ry0, ry1 = _data_analysis(_morphological_opening(red), config)
        bx0, bx1, by0, by1 = _data_analysis(_morphological_opening(blue), config)
        a = 200 if config["other"]["extraoptions"]["spectype"] == "temporal" else 150
        b = 540
        return rx1, rx0, by0 + b, by1 + b, ry0 + a, ry1 + a

    fd = config["feature_detector"]
    if fd["estimate_lineouts_iaw"] and not fd["estimate_lineouts_epw"]:
        out = iaw_detector()
        lineout_end, lineout_start, _, _, iaw_max, iaw_min = out
        if lineout_end < lineout_start or iaw_min > iaw_max:
            raise ValueError("IAW feature detector failed (inverted bounds)")
        return out

    if fd["estimate_lineouts_epw"] and not fd["estimate_lineouts_iaw"]:
        out = epw_detector()
        lineout_end, lineout_start, blue_min, blue_max, red_min, red_max = out
        if lineout_end < lineout_start or blue_min > blue_max or red_min > red_max:
            raise ValueError("EPW feature detector failed (inverted bounds)")
        return out

    if fd["estimate_lineouts_epw"] and fd["estimate_lineouts_iaw"]:
        iaw_end, iaw_start, iaw_cf_min, iaw_cf_max, iaw_max, iaw_min = iaw_detector()
        epw_end, epw_start, blue_min, blue_max, red_min, red_max = epw_detector()
        if epw_end < epw_start or blue_min > blue_max or red_min > red_max:
            raise ValueError("EPW feature detector failed (inverted bounds)")
        if iaw_start > iaw_end or iaw_min > iaw_max:
            raise ValueError("IAW feature detector failed (inverted bounds)")
        ion_t0_shift = 0 if iaw_start == epw_start else epw_start - iaw_start
        return (
            epw_end, epw_start, iaw_cf_min, iaw_cf_max, iaw_max, iaw_min,
            ion_t0_shift, blue_min, blue_max, red_min, red_max,
        )
