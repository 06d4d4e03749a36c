"""Streak-camera dewarp via forward-splat bilinear remap.

Behavioral port of ``/root/reference/tsadar/utils/process/warpcorr.py`` with the
per-pixel Python double loop replaced by a vectorized numpy scatter-add (same
splat weights).  The precomputed warp maps (``epwtestDW5img1x/y.npy``) are
missing from the reference snapshot (.MISSING_LARGE_BLOBS); when absent the
correction degrades to identity with a warning, preserving pipeline operability.
"""

import os

import numpy as np

_EXTERNAL = os.path.join(os.path.dirname(__file__), "..", "..", "external")


def _load_warp_maps(instrument="EPW", sweepSpeed=5):
    xp = os.path.join(_EXTERNAL, "files", "epwtestDW5img1x.npy")
    yp = os.path.join(_EXTERNAL, "files", "epwtestDW5img1y.npy")
    if not (os.path.exists(xp) and os.path.exists(yp)):
        return None, None
    if sweepSpeed != 5:
        print("no specific data available for this sweep speed - using 5ns dewarp")
    return np.load(xp), np.load(yp)


def perform_warp_correction(warpedData, instrument="EPW", sweepSpeed=5, flatField=True):
    warp1x, warp1y = _load_warp_maps(instrument, sweepSpeed)
    if warp1x is None:
        print(
            "warpcorr: warp maps unavailable (missing from reference snapshot); "
            "returning data without dewarp"
        )
        return warpedData

    n0, n1 = warpedData.shape
    jj, ii = np.meshgrid(np.arange(n1), np.arange(n0))  # (i=row, j=col) as in reference loops
    # reference: for (i, j): value at warpedData[j, i] lands at
    # (typix, txpix) = (j + warp1y[j, i], i + warp1x[j, i])
    typix = jj.T + warp1y  # indexed [j, i]
    txpix = ii.T + warp1x

    val = warpedData  # [j, i] layout matches warp arrays
    xl = np.floor(txpix).astype(int)
    xh = np.ceil(txpix).astype(int)
    yl = np.floor(typix).astype(int)
    yh = np.ceil(typix).astype(int)
    xlf = 1.0 - (txpix - xl)
    ylf = 1.0 - (typix - yl)

    dep = np.zeros_like(warpedData, dtype=float)
    valid = (yl > 0) & (xl > 0) & (yh < n0) & (xh < n1)

    def splat(yy, xx, w):
        np.add.at(dep, (yy[valid], xx[valid]), (val * w)[valid])

    splat(yl, xl, xlf * ylf)
    splat(yl, xh, (1 - xlf) * ylf)
    splat(yh, xl, xlf * (1 - ylf))
    splat(yh, xh, (1 - xlf) * (1 - ylf))
    return dep
