"""Flow (Va) and drift (ud) Doppler physics.

Oracles: a bulk flow Va shifts the ion-acoustic doublet's center by k.Va while
preserving the peak separation (~2 k cs); an electron drift ud asymmetrizes the
electron-feature Landau damping (red/blue EPW peak ratio changes sign with ud).
Reference handling: form_factor.py:201-224.
"""

import numpy as np
from numpy.testing import assert_allclose
from scipy.signal import find_peaks

import jax
from jax import numpy as jnp

from tsadar_tpu.core.physics.form_factor import FormFactor

from tests.test_physics.test_form_factor import _maxwellian_1v, _params


def _iaw_peaks(Va):
    vx, fe = _maxwellian_1v()
    p = _params(fe, vx, Va=Va)
    ff = FormFactor(
        [525.0, 528.0], npts=4096, lam_shift=0.0,
        scattering_angles={"sa": np.array([60.0])}, num_grad_points=1,
    )
    S, lams = jax.jit(ff)(p)
    s = np.squeeze(np.asarray(S))
    lam = np.squeeze(np.asarray(lams)) * 1e7
    peaks, props = find_peaks(s / s.max(), height=0.1, prominence=0.2)
    top2 = np.sort(peaks[np.argsort(props["peak_heights"])[-2:]])
    return lam[top2]


def test_flow_shifts_iaw_center():
    p0 = _iaw_peaks(0.0)
    pv = _iaw_peaks(8.0)  # 8e6 cm/s bulk flow
    c0, cv = p0.mean(), pv.mean()
    sep0, sepv = np.diff(p0)[0], np.diff(pv)[0]
    assert abs(cv - c0) > 0.05, (c0, cv)  # center moves
    assert_allclose(sepv, sep0, rtol=0.1)  # doublet separation preserved


def test_drift_asymmetrizes_epw():
    vx, fe = _maxwellian_1v()
    ff = FormFactor(
        [400, 700], npts=2048, lam_shift=0.0,
        scattering_angles={"sa": np.array([60.0])}, num_grad_points=1,
    )

    def stats(ud):
        p = _params(fe, vx, ud=ud)
        S, lams = jax.jit(ff)(p)
        s = np.squeeze(np.asarray(S))
        lam = np.squeeze(np.asarray(lams)) * 1e7
        blue = np.where((lam > 430) & (lam < 515), s, 0.0)
        red = np.where((lam > 540) & (lam < 640), s, 0.0)
        return blue.max() / red.max(), lam[np.argmax(blue)]

    r0, b0 = stats(0.0)
    rp, bp = stats(200.0)   # 2e8 cm/s ~ 7% of vTe
    rm, bm = stats(-200.0)
    # the damping asymmetry moves in opposite directions with drift sign
    assert (rp - r0) * (rm - r0) < 0, (r0, rp, rm)
    # and the EPW resonance positions Doppler-shift with the drift
    assert bp < b0 - 1.0 < b0 + 1.0 < bm, (bp, b0, bm)
