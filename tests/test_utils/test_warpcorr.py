"""Fiducial-based streak dewarp reconstruction (warpcorr.py).

The reference's precomputed warp maps are missing from its snapshot
(.MISSING_LARGE_BLOBS:15-16); ``reconstruct_warp_from_fiducials`` rebuilds a
low-order approximation from the in-frame tracers.  These tests validate the
reconstruction on the real shot 101675 EPW frame: after dewarp the comb teeth
must sit at the calibrated pip interval, the notch center must track its
calibration row, counts must be conserved, and the map must be ~identity at
the historically validated lineout (pixel 500), so the validated fits remain
anchored.
"""

import numpy as np
import pytest

from tsadar_tpu.utils.data_handling.load_ts_data import _signal_frame
from tsadar_tpu.utils.process.warpcorr import (
    EPW5_PIP_PX,
    _comb_tooth_centers,
    _forward_splat,
    _notch_edges,
    perform_warp_correction,
    reconstruct_warp_from_fiducials,
)

SHOT_FILE = "tsadar_tpu/external/data/EPW-s101675.hdf"


@pytest.fixture(scope="module")
def frame():
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "..", SHOT_FILE)
    return _signal_frame(path)


def test_tooth_chain_filter_rejects_non_pip_peaks(frame):
    """The comb band contains a bright non-comb feature ~182 px before the
    first pip; the chain filter must drop it (it would shift the whole sweep)."""
    teeth = _comb_tooth_centers(frame)
    spacing = np.diff(teeth)
    assert len(teeth) >= 5
    assert np.all(spacing > 0.6 * EPW5_PIP_PX)
    assert np.all(spacing < 1.4 * EPW5_PIP_PX)


def test_tooth_chain_survives_mid_comb_spur(frame):
    """A bright non-pip feature BETWEEN two teeth must not split the chain:
    the longest-path filter bypasses the spur, keeping the full comb (an
    adjacent-run scan would discard half of it and leave the late sweep to
    extrapolation)."""
    teeth_clean = _comb_tooth_centers(frame)
    mid = 0.5 * (teeth_clean[3] + teeth_clean[4])
    spoiled = frame.astype(float).copy()
    # a comb-like spur: same row band, bright and wide enough to be detected
    cols = np.arange(spoiled.shape[1])
    spoiled[0:100, :] += 4000.0 * np.exp(-0.5 * ((cols - mid) / 6.0) ** 2)[None, :]
    teeth_spur = _comb_tooth_centers(spoiled)
    # the spur itself must be detectable, else the test is vacuous
    comb = spoiled[0:100, :].sum(axis=0)
    from scipy.signal import find_peaks

    _, props = find_peaks(comb, prominence=1000, width=10)
    raw = 0.5 * (props["left_ips"] + props["right_ips"])
    assert np.min(np.abs(raw - mid)) < 3.0
    # full comb retained, spur excluded
    assert len(teeth_spur) == len(teeth_clean)
    np.testing.assert_allclose(teeth_spur, teeth_clean, atol=1.0)


def test_reconstruction_pins_tracers(frame):
    # 507.5 = the shot-101675 calibration row of the 528 nm notch center (the
    # loader computes this per shot via _notch_target_row)
    maps = reconstruct_warp_from_fiducials(frame, notch_target_row=507.5)
    assert maps is not None
    dew = _forward_splat(frame.astype(float), *maps)

    # counts conserved up to frame-edge truncation: the late-sweep stretch
    # (92 -> 109.6 px/pip) pushes the last ~25 columns past the frame edge
    # where the splat drops them, same as the reference's out-of-range guard
    # (measured 4.7% of total counts, all from the stretched frame edges)
    assert abs(dew.sum() - frame.sum()) / frame.sum() < 6e-2
    # ...and exactly within the fitted window, counts are preserved tightly
    assert abs(dew[:, 380:900].sum() / frame[:, 380:900].sum() - 1.0) < 5e-2

    # comb teeth at the calibrated pip interval after dewarp
    teeth = _comb_tooth_centers(dew)
    assert np.all(np.abs(np.diff(teeth) - EPW5_PIP_PX) < 3.0)
    # anchored at the first tooth: fiducial t0 unchanged
    assert abs(teeth[0] - _comb_tooth_centers(frame)[0]) < 2.0

    # notch band straightened AND registered: the raw frame drifts ~12 px
    # across the sweep; after dewarp the band center (estimated the way the
    # map pins it: clean TOP edge + robust median half-width — the bottom
    # edge carries the time-varying blue EPW signal at 8.5 px rms) must sit
    # near its calibration row everywhere
    def _tops_and_widths(img):
        tops, widths = [], []
        for c in range(420, 960, 60):
            e = _notch_edges(img[:, c - 8 : c + 8].sum(axis=1))
            if e is not None:
                tops.append(e[0])
                widths.append(e[1] - e[0])
        return np.asarray(tops), np.asarray(widths)

    raw_tops, _ = _tops_and_widths(frame)
    tops, widths = _tops_and_widths(dew)
    centers = tops + 0.5 * np.median(widths)
    assert len(centers) >= 5
    assert np.ptp(raw_tops) > 6.0  # the drift is real in the raw frame
    assert np.max(np.abs(centers - 507.5)) < 3.0

    # relative anchoring (no calibration available): straightened, not moved
    typix_rel, txpix_rel = reconstruct_warp_from_fiducials(frame)
    dew_rel = _forward_splat(frame.astype(float), typix_rel, txpix_rel)
    rel_tops, _ = _tops_and_widths(dew_rel)
    assert np.ptp(rel_tops) < 4.0

    # ~identity at the validated lineout (pixel 500): the historically
    # validated fit values stay anchored
    typix, txpix = maps
    assert abs(txpix[0, 500] - 500.0) < 1.5
    assert abs(typix[0, 500] - 0.5 - (typix[1, 500] - 1.5)) < 1e-9  # pure shift in rows
    assert abs(typix[0, 500] - 0.0) < 2.5


def test_identity_fallback_when_tracers_absent():
    rng = np.random.default_rng(0)
    noise = rng.normal(0.0, 1.0, (256, 256))
    out = perform_warp_correction(noise, fiducial_fallback=True)
    np.testing.assert_array_equal(out, noise)


def test_background_frame_reuses_signal_maps(frame):
    """A tracer-free frame of the same shape (a background null shot) must be
    dewarped with the maps cached from the signal frame — the reference
    applied the same static maps to both frames.  Reuse requires a MATCHING
    spectral anchor (same calibration range); an unrelated shot from a
    different range must get identity instead of another shot's registration."""
    import tsadar_tpu.utils.process.warpcorr as wc

    # populate the cache from the signal frame, as loadData would
    out_sig = perform_warp_correction(frame, fiducial_fallback=True, notch_target_row=507.5)
    assert not np.array_equal(out_sig, frame)

    rng = np.random.default_rng(1)
    bg = rng.normal(10.0, 2.0, frame.shape)  # no comb, no notch
    # background shot: same calibration range -> same anchor -> maps reused
    out_bg = perform_warp_correction(bg, fiducial_fallback=True, notch_target_row=507.5)
    expected = _forward_splat(bg, *wc._FIDUCIAL_MAPS_CACHE[("EPW", frame.shape)][0])
    np.testing.assert_array_equal(out_bg, expected)
    assert not np.array_equal(out_bg, bg)

    # different calibration range (e.g. shot 111411's anchor): no reuse
    out_other = perform_warp_correction(bg, fiducial_fallback=True, notch_target_row=512.2)
    np.testing.assert_array_equal(out_other, bg)

    # cache is per-prepare: after the reset that opens the NEXT shot's
    # prepare_data, a tracerless frame must get identity even with a matching
    # anchor — shot A's sweep correction must never leak onto shot B
    wc.reset_fiducial_cache()
    out_next = perform_warp_correction(bg, fiducial_fallback=True, notch_target_row=507.5)
    np.testing.assert_array_equal(out_next, bg)


def test_fiducial_t0_anchors_on_first_chain_tooth(frame):
    """EPW t0 must anchor on the first real pip (col ~450), not the bright
    non-pip feature 182 px earlier that find_peaks returns first."""
    from tsadar_tpu.utils.data_handling.load_ts_data import _fiducial_t0

    t0 = _fiducial_t0(frame, "epw")
    assert abs(t0 - (450.3 - 95)) < 5
