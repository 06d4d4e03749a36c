"""Z'(xi) numerics: against scipy's Dawson function, the reference tables, and
the asymptotic xi^-2 behaviour the reference relies on (form_factor.py:40, 247)."""

import os

import numpy as np
import pytest
import scipy.special as sps
from numpy.testing import assert_allclose

import jax
from jax import numpy as jnp

from tsadar_tpu.core.physics import dawsn, zprime

REF_FILES = "/root/reference/tsadar/external/files"


def test_dawsn_vs_scipy():
    # f64 path: the centered Rybicki series is used for ALL x (h = 0.25,
    # discretization error ~7e-18), so demand near machine precision
    x = np.concatenate(
        [np.linspace(-12, 12, 4001), np.linspace(-0.1, 0.1, 101), [0.0, 5.99, 6.01, -6.0, 50.0]]
    )
    got = np.asarray(dawsn(jnp.asarray(x)))
    want = sps.dawsn(x)
    assert_allclose(got, want, rtol=5e-14, atol=1e-16)

    # f32 path (the TPU hot loop): h = 0.36 + asymptotic tail beyond |x|=6;
    # accuracy bounded by f32 resolution, not the series
    got32 = np.asarray(dawsn(jnp.asarray(x, jnp.float32)))
    assert_allclose(got32, want, rtol=0, atol=3e-7)


def test_dawsn_grad_identity():
    # D'(x) = 1 - 2 x D(x), exact via custom_jvp
    x = jnp.linspace(-8.0, 8.0, 101)
    g = jax.vmap(jax.grad(dawsn))(x)
    assert_allclose(
        np.asarray(g), 1.0 - 2.0 * np.asarray(x) * sps.dawsn(np.asarray(x)), rtol=1e-6, atol=1e-7
    )


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_FILES, "rdWT.txt")), reason="no reference tables")
def test_zprime_vs_reference_tables():
    rd = np.loadtxt(os.path.join(REF_FILES, "rdWT.txt"))
    idw = np.loadtxt(os.path.join(REF_FILES, "idWT.txt"))
    xi = rd[:, 0]
    re, im = zprime(jnp.asarray(xi))
    # the tables themselves carry ~1e-3 abs error in Re; our direct evaluation is exact
    assert_allclose(np.asarray(re), rd[:, 1], atol=2e-3)
    assert_allclose(np.asarray(im), idw[:, 1], atol=1e-5)


def test_zprime_asymptote():
    xi = jnp.array([15.0, 30.0, -20.0, 100.0])
    re, im = zprime(xi)
    assert_allclose(np.asarray(re), 1.0 / np.asarray(xi) ** 2, rtol=2e-2)
    assert_allclose(np.asarray(im), 0.0, atol=1e-60)
