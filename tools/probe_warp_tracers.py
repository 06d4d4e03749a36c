"""Quantify the in-frame warp tracers on shot 101675 (dewarp design record).

Measures, per 16-column block of the EPW streak frame:
  * notch-band TOP and BOTTOM half-depth edge rows (the spectral tracers),
  * comb tooth center columns per 10-row sub-band (the tilt tracer),
and reports each tracer's signal (low-order fit range) against its noise
(fit residual rms + split-half consistency).

Findings (recorded in PARITY.md and warpcorr.py docstrings):
  * top edge: 1.3 px rms noise vs 10.3 px quadratic signal — the clean
    spectral tracer; warpcorr traces it per column.
  * bottom edge: 8.5 px rms — the bottom plateau carries the time-varying
    blue EPW feature; used only through the median band half-width.
  * band width (the would-be row-STRETCH tracer at the signal rows):
    quadratic signal 2.7 px < 8.5 px rms noise -> unrecoverable.
  * comb tooth tilt (the would-be d(col-warp)/d(row) tracer): estimates
    vary 3x across teeth (-0.06..-0.20 px/px over a 50-row lever arm);
    extrapolated to the signal rows (-28..-92 px at row 500) they are
    noise-dominated by two orders of magnitude -> unrecoverable.
The 2D warp curvature between the comb band and the notch rows therefore
stays unobservable from in-frame tracers; the residual amp1 excess (7.2%
of the reference's 10% gate on 101675) lives there.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from tsadar_tpu.utils.data_handling.hdf4 import read_sds  # noqa: E402
from tsadar_tpu.utils.process.warpcorr import (  # noqa: E402
    EPW5_NOTCH_BAND,
    _comb_tooth_centers,
    _notch_edges,
)


def main(shot=101675):
    path = os.path.join(HERE, "tsadar_tpu", "external", "data", f"EPW-s{shot}.hdf")
    frames = np.asarray(read_sds(path), float)
    img = frames[0] - frames[1]  # signal minus background exposure
    n0, n1 = img.shape
    print(f"shot {shot}: frame {img.shape}")

    cols, tops, bots = [], [], []
    for c in range(8, n1 - 8, 16):
        e = _notch_edges(img[:, c - 8 : c + 8].sum(axis=1), EPW5_NOTCH_BAND)
        if e is not None:
            cols.append(c)
            tops.append(e[0])
            bots.append(e[1])
    cols, tops, bots = map(np.asarray, (cols, tops, bots))
    width = bots - tops
    print(f"notch: {len(cols)} valid column blocks over {cols.min()}-{cols.max()}")
    for name, y in (("top edge", tops), ("bottom edge", bots), ("width", width)):
        cf = np.polyfit(cols, y, 2)
        res = y - np.polyval(cf, cols)
        print(
            f"  {name:12s}: quad signal range {np.ptp(np.polyval(cf, cols)):5.2f} px, "
            f"residual rms {res.std():5.2f} px  "
            f"{'SIGNAL > NOISE' if np.ptp(np.polyval(cf, cols)) > 2 * res.std() else 'noise-dominated'}"
        )

    teeth = _comb_tooth_centers(img)
    print(f"comb teeth at cols {np.round(teeth, 1)}")
    from scipy.signal import find_peaks

    per_row = []
    for r in range(10, 100, 10):
        band = img[r : r + 10, :].sum(axis=0)
        _, props = find_peaks(band, prominence=150, width=8)
        per_row.append((r + 5, 0.5 * (props["left_ips"] + props["right_ips"])))
    for t in teeth:
        samples = []
        for r, ctr in per_row:
            if len(ctr) and np.min(np.abs(ctr - t)) < 15:
                samples.append((r, ctr[np.argmin(np.abs(ctr - t))]))
        if len(samples) >= 5:
            rr = np.array([s[0] for s in samples], float)
            cc = np.array([s[1] for s in samples], float)
            slope = np.polyfit(rr, cc, 1)[0]
            print(
                f"  tooth@{t:7.1f}: tilt {slope:+.4f} px-col/px-row "
                f"(rows {rr.min():.0f}-{rr.max():.0f}); extrapolated to row 500: {slope * 450:+.1f} px"
            )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 101675)
