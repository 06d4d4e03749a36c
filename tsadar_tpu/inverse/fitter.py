"""Fit orchestration (behavioral parity: ``/root/reference/tsadar/inverse/fitter.py``).

Flow: expand the lineout selection, load + calibrate the shot data, dispatch to
the angular (ARTS) or batched-1D optimizer loop, then postprocess (sigmas,
refits, plots, artifacts).  Stage timings and status tags land in the tracker
under the reference's metric names.
"""

import time
from typing import Dict, Tuple

import numpy as np
import pandas as pd

from ..utils import mlflow_shim as mlflow
from ..utils.process import prepare, postprocess
from .loops import angular_optax, one_d_loop
from ..utils.console import log_info


def _lineout_selection(config: Dict) -> Dict:
    """Expand start/end/skip into the pixel list, trimmed to a whole number of
    batches (reference fitter.py:13-42 drops the remainder with a warning)."""
    sel = config["data"]["lineouts"]
    pixels = list(range(sel["start"], sel["end"], sel["skip"]))
    batch_size = config["optimizer"]["batch_size"]
    remainder = len(pixels) % batch_size
    if remainder:
        log_info(
            f"batch size {batch_size} does not divide the {len(pixels)} requested "
            f"lineouts; dropping the final {remainder}"
        )
        pixels = pixels[:-remainder]
    sel["val"] = pixels
    return config


def load_data_for_fitting(config):
    """Prepared data + scattering angles + axes; a two-element shot list loads
    the multiplexed second ARTS shot as *_rot channels (reference :91-110)."""
    shot = config["data"]["shotnum"]
    if not isinstance(shot, list):
        return prepare.prepare_data(config, shot)

    if config["other"]["extraoptions"]["spectype"] != "angular_full":
        raise NotImplementedError("Multiplexed data fitting is only available for angular data")
    ccd_size = config["other"]["CCDsize"]
    all_data, sa, all_axes = prepare.prepare_data(config, shot[0])
    config["other"]["CCDsize"] = ccd_size  # prepare mutates it; restore for shot 2
    second, _, _ = prepare.prepare_data(config, shot[1])
    all_data["e_data_rot"] = second["e_data"]
    all_data["e_amps_rot"] = second["e_amps"]
    all_data["noiseE_rot"] = second["noiseE"]
    all_data["rot_angle"] = config["data"]["shot_rot"]
    return all_data, sa, all_axes


def fit(config) -> Tuple[pd.DataFrame, float]:
    """Fit the spectral density function to data (reference fitter.py:45-88).

    Returns:
        (per-lineout fitted-parameter DataFrame, total loss).
    """
    stage_start = time.time()
    mlflow.set_tag("status", "preprocessing")
    config = _lineout_selection(config)
    all_data, sa, all_axes = load_data_for_fitting(config)

    n_samples = max(len(all_data["e_data"]), len(all_data["i_data"]))
    sample_indices = np.arange(n_samples)
    num_batches = n_samples // config["optimizer"]["batch_size"] or 1
    mlflow.log_metrics({"setup_time": round(time.time() - stage_start, 2)})

    stage_start = time.time()
    mlflow.set_tag("status", "minimizing")
    log_info("minimizing")
    if "angular" in config["other"]["extraoptions"]["spectype"]:
        fitted_weights, overall_loss, loss_fn = angular_optax(config, all_data, sa)
    else:
        fitted_weights, overall_loss, loss_fn = one_d_loop(config, all_data, sa, sample_indices, num_batches)
    mlflow.log_metrics({"overall loss": float(overall_loss)})
    mlflow.log_metrics({"fit_time": round(time.time() - stage_start, 2)})

    stage_start = time.time()
    mlflow.set_tag("status", "postprocessing")
    log_info("postprocessing")
    final_params = postprocess.postprocess(config, sample_indices, all_data, all_axes, loss_fn, sa, fitted_weights)
    mlflow.log_metrics({"postprocess_time": round(time.time() - stage_start, 2)})
    return final_params, float(overall_loss)
