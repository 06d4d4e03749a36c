"""OMEGA shot-data loader (HDF4 streak/CCD frames).

Behavioral port of ``/root/reference/tsadar/utils/data_handling/load_ts_data.py``
using the pure-Python HDF4 reader (pyhdf is not a dependency): signal minus
background frame, orientation fixes per spectrum type, fiducial-based t0
detection, and streak-camera dewarp for temporal EPW data.
"""

import os
from os.path import join

import numpy as np
from scipy.signal import find_peaks

from .hdf4 import read_sds
from ..process.warpcorr import perform_warp_correction

_EXTERNAL = os.path.join(os.path.dirname(__file__), "..", "..", "external")


def loadData(sNum, sDay, loadspecs, custom_path=None):
    """Load electron/ion frames for a shot number; detect spectype from filenames.

    Returns (eDat, iDat, xlab, t0, specType) as the reference does.
    """
    folder = custom_path if custom_path else join(_EXTERNAL, "data")
    file_list = os.listdir(folder)
    files = [name for name in file_list if str(sNum) in name]
    t0 = [0, 0]

    hdfnameE = hdfnameI = None
    xlab = specType = None
    for fl in files:
        low = fl.casefold()
        if "epw" in low:
            hdfnameE = join(folder, fl)
            if "ccd" in low:
                xlab, specType = r"Radius (\mum)", "imaging"
            else:
                xlab, specType = "Time (ps)", "temporal"
        if "iaw" in low:
            hdfnameI = join(folder, fl)
            if "ccd" in low:
                xlab, specType = r"Radius (\mum)", "imaging"
            else:
                xlab, specType = "Time (ps)", "temporal"
        if "ats" in low:
            hdfnameE = join(folder, fl)
            specType, xlab = "angular", "Scattering angle (degrees)"

    iDat = []
    if loadspecs["load_ion_spec"]:
        try:
            frames = read_sds(hdfnameI).astype(float)
            iDat = frames[0, :, :] - frames[1, :, :]
            iDat = np.flipud(iDat)
            if specType == "imaging":
                iDat = np.rot90(np.squeeze(iDat))
            elif loadspecs.get("absolute_timing", False):
                fidu = np.sum(iDat[850:950, :], 0)
                res = find_peaks(fidu, prominence=1000, width=10)
                peak_center = res[1]["left_ips"][0] + (res[1]["right_ips"][0] - res[1]["left_ips"][0]) / 2.0
                t0[0] = round(peak_center - 164)
        except Exception as e:
            print(f"Unable to find IAW ({e})")
            iDat = []
            loadspecs["load_ion_spec"] = False

    eDat = []
    if loadspecs["load_ele_spec"]:
        try:
            frames = read_sds(hdfnameE).astype(float)
            eDat = frames[0, :, :] - frames[1, :, :]
            if specType == "angular":
                eDat = np.fliplr(eDat)
            elif specType == "temporal":
                eDat = perform_warp_correction(eDat)
            elif specType == "imaging":
                eDat = np.rot90(np.squeeze(eDat), 3)
            try:
                if specType == "temporal" and loadspecs.get("absolute_timing", False):
                    fidu = np.sum(eDat[0:100, :], 0)
                    res = find_peaks(fidu, prominence=1000, width=10)
                    peak_center = res[1]["left_ips"][0] + (res[1]["right_ips"][0] - res[1]["left_ips"][0]) / 2.0
                    t0[1] = round(peak_center - 95)
            except Exception:
                print("Fiducial timing encountered an error, default timing is being used")
        except Exception as e:
            print(f"Unable to find EPW ({e})")
            eDat = []
            loadspecs["load_ele_spec"] = False

    if not loadspecs["load_ele_spec"] and not loadspecs["load_ion_spec"]:
        raise LookupError(f"No data found for shotnumber {sNum} in the data folder")

    return eDat, iDat, xlab, t0, specType
