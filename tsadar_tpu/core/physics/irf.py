"""Instrument response functions (Gaussian spectral/angular convolutions).

Parity with ``/root/reference/tsadar/core/physics/irf.py``.  TPU-first changes:
* the ATS angular/spectral convolutions are batched (vmap) instead of Python
  loops over columns (reference irf.py:34-37);
* data-dependent boolean indexing (``ThryE[lamAxisE < lam]``) is replaced by
  where-masked reductions so everything jits.
"""

from jax import numpy as jnp
import jax


def _masked_max(x, mask):
    return jnp.max(jnp.where(mask, x, -jnp.inf))


def _conv_same(signal, kernel):
    """'same'-mode convolution via FFT.

    The IRF kernels are as long as the signal (N ~ 1024), for which direct
    convolution lowers to a pathological conv on TPU (and its transpose makes
    reverse-mode compilation explode).  FFT convolution is O(N log N), fast in
    both directions, and matches jnp.convolve(..., "same") to roundoff.
    """
    n = signal.shape[-1]
    k = kernel.shape[-1]
    full_len = n + k - 1
    fft_len = 1 << (full_len - 1).bit_length()
    fa = jnp.fft.rfft(signal, fft_len)
    fb = jnp.fft.rfft(kernel, fft_len)
    full = jnp.fft.irfft(fa * fb, fft_len)[..., :full_len]
    start = (k - 1) // 2
    return full[..., start : start + n]


def add_ion_IRF(config, lamAxisI, modlI, amps, TSins):
    """Ion spectral IRF + 1024-px rebin (reference irf.py:50-87)."""
    stddevI = config["other"]["PhysParams"]["widIRF"]["spect_stddev_ion"]
    if not stddevI:
        return lamAxisI, modlI

    originI = (jnp.amax(lamAxisI) + jnp.amin(lamAxisI)) / 2.0
    inst_funcI = (1.0 / (stddevI * jnp.sqrt(2.0 * jnp.pi))) * jnp.exp(
        -((lamAxisI - originI) ** 2.0) / (2.0 * stddevI**2.0)
    )
    ThryI = _conv_same(modlI, inst_funcI)
    ThryI = (jnp.amax(modlI) / jnp.amax(ThryI)) * ThryI
    ThryI = jnp.average(ThryI.reshape(1024, -1), axis=1)

    if config["other"]["PhysParams"]["norm"] == 0:
        lamAxisI = jnp.average(lamAxisI.reshape(1024, -1), axis=1)
        ThryI = TSins["general"]["amp3"] * amps * ThryI / jnp.amax(ThryI)
    return lamAxisI, ThryI


def add_electron_IRF(config, lamAxisE, modlE, amps, TSins):
    """Electron spectral IRF + rebin + amplitude scaling (reference irf.py:90-132)."""
    stddevE = config["other"]["PhysParams"]["widIRF"]["spect_stddev_ele"]
    originE = (jnp.amax(lamAxisE) + jnp.amin(lamAxisE)) / 2.0
    inst_funcE = (1.0 / (stddevE * jnp.sqrt(2.0 * jnp.pi))) * jnp.exp(
        -((lamAxisE - originE) ** 2.0) / (2.0 * stddevE**2.0)
    )
    ThryE = _conv_same(modlE, inst_funcE)
    ThryE = (jnp.amax(modlE) / jnp.amax(ThryE)) * ThryE

    lam = TSins["general"]["lam"]
    if config["other"]["PhysParams"]["norm"] > 0:
        blue = lamAxisE < lam
        ThryE = jnp.where(
            blue,
            TSins["general"]["amp1"] * (ThryE / _masked_max(ThryE, blue)),
            TSins["general"]["amp2"] * (ThryE / _masked_max(ThryE, ~blue)),
        )

    ThryE = jnp.average(ThryE.reshape(1024, -1), axis=1)
    if config["other"]["PhysParams"]["norm"] == 0:
        lamAxisE = jnp.average(lamAxisE.reshape(1024, -1), axis=1)
        ThryE = amps * ThryE / jnp.amax(ThryE)
        ThryE = jnp.where(
            lamAxisE < lam, TSins["general"]["amp1"] * ThryE, TSins["general"]["amp2"] * ThryE
        )
    return lamAxisE, ThryE


def add_ATS_IRF(config, sas, lamAxisE, modlE, amps, TSins):
    """2D (angular x spectral) Gaussian IRF for ARTS (reference irf.py:5-47).

    modlE: [n_ang_fine, n_lambda].
    """
    stddev_lam = config["other"]["PhysParams"]["widIRF"]["spect_FWHM_ele"] / 2.3548
    stddev_ang = config["other"]["PhysParams"]["widIRF"]["ang_FWHM_ele"] / 2.3548

    origin_lam = (jnp.amax(lamAxisE) + jnp.amin(lamAxisE)) / 2.0
    origin_ang = (jnp.amax(sas["angAxis"]) + jnp.amin(sas["angAxis"])) / 2.0
    inst_func_lam = (1.0 / (stddev_lam * jnp.sqrt(2.0 * jnp.pi))) * jnp.exp(
        -((lamAxisE - origin_lam) ** 2.0) / (2.0 * stddev_lam**2.0)
    )
    inst_func_ang = (1.0 / (stddev_ang * jnp.sqrt(2.0 * jnp.pi))) * jnp.exp(
        -((sas["angAxis"] - origin_ang) ** 2.0) / (2.0 * stddev_ang**2.0)
    )

    # convolve along the angular axis, then along the spectral axis
    ThryE = jax.vmap(lambda col: _conv_same(col, inst_func_ang), in_axes=1, out_axes=1)(modlE)
    ThryE = jax.vmap(lambda row: _conv_same(row, inst_func_lam), in_axes=0, out_axes=0)(ThryE)

    ThryE = jnp.amax(modlE, axis=1, keepdims=True) / jnp.amax(ThryE, axis=1, keepdims=True) * ThryE

    if config["other"]["PhysParams"]["norm"] > 0:
        lam = TSins["general"]["lam"]
        blue = lamAxisE < lam
        ThryE = jnp.where(
            blue,
            TSins["general"]["amp1"] * (ThryE / _masked_max(ThryE, blue)),
            TSins["general"]["amp2"] * (ThryE / _masked_max(ThryE, ~blue)),
        )
    return lamAxisE, ThryE
