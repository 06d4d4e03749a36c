"""Pole-aware integration: analytic principal-value oracles + AD safety.

The integration convention (inherited from the reference, ratintn.py:21-22) uses
intervals (i, i+1) for i = 0..N-3, i.e. integrates over [z[0], z[-2]].
"""

import numpy as np
from numpy.testing import assert_allclose

import jax
from jax import numpy as jnp

from tsadar_tpu.core.physics import ratint, ratintn, pv_integral


def _grid(n=2001, lo=-4.0, hi=4.0, offset=0.0137):
    # offset so poles never land exactly on nodes (as in the reference xi1 grid)
    return jnp.linspace(lo + offset, hi + offset, n)


def test_constant_numerator_analytic():
    z = _grid()
    a, b = float(z[0]), float(z[-2])
    for p in [0.0, 0.5, -1.7, 3.9]:
        got = ratintn(jnp.ones_like(z), z - p, z)
        want = np.log(abs(b - p)) - np.log(abs(a - p))
        assert_allclose(float(got), want, rtol=1e-6, atol=1e-8)


def test_linear_numerator_analytic():
    z = _grid()
    a, b = float(z[0]), float(z[-2])
    f = z  # f(z) = z -> PV = (b - a) + p log|b-p|/|a-p|
    for p in [0.2, -2.3]:
        got = ratintn(f, z - p, z)
        want = (b - a) + p * (np.log(abs(b - p)) - np.log(abs(a - p)))
        assert_allclose(float(got), want, rtol=1e-6)


def test_smooth_numerator_vs_quadrature():
    # PV int exp(-z^2)/(z - p) dz relates to the Dawson function on infinite
    # domain; here just compare against dense trapezoid with symmetric exclusion.
    z = _grid(80001, -8.0, 8.0, offset=0.0)
    p = 0.77
    f = jnp.exp(-(z**2))
    got = float(ratintn(f, z - p, z))
    # analytic (infinite domain): PV = -2 sqrt(pi) D(p) * sqrt(pi)/2 ... use scipy
    import scipy.special as sps

    want = -np.pi * 0  # placeholder replaced by direct formula below
    # PV int_-inf^inf e^{-z^2}/(z-p) dz = -pi * e^{-p^2} * erfi(p) = -2 sqrt(pi) D(p)
    want = -2.0 * np.sqrt(np.pi) * sps.dawsn(p)
    assert_allclose(got, want, rtol=1e-5)


def test_pv_integral_matches_ratintn():
    z = _grid()
    f = jnp.exp(-(z**2)) * (1.0 + 0.3 * z)
    poles = jnp.array([-2.5, -0.31, 0.0, 0.44, 3.1])
    batched = pv_integral(f, z, poles)
    single = jnp.stack([ratintn(f, z - p, z) for p in poles])
    assert_allclose(np.asarray(batched), np.asarray(single), rtol=1e-12)


def test_pv_integral_grad_no_nan():
    z = _grid(501)

    def loss(amp):
        f = amp * jnp.exp(-(z**2))
        return jnp.sum(pv_integral(f, z, jnp.linspace(-3.0, 3.0, 64)) ** 2)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g))

    # pole exactly at a node midpoint / node: still finite
    def loss2(p):
        f = jnp.exp(-(z**2))
        return pv_integral(f, z, jnp.array([p]))[0]

    for p in [float(z[250]), float(0.5 * (z[250] + z[251]))]:
        assert np.isfinite(float(jax.grad(loss2)(p)))


def test_pv_tables_matmul_matches_two_stage():
    """The precombined single-matmul tables must equal the two-stage Toeplitz
    form to f64 roundoff, including batched leading dims."""
    rng = np.random.default_rng(7)
    n = 128
    z = jnp.asarray(np.linspace(-8.2, 8.2, n))
    kmid, knode = ratint.pv_combined_kernels(n - 2)
    tmid = ratint.pv_toeplitz_kernel(n - 2)
    tnode = ratint.pv_node_kernel(n - 2)

    f = jnp.asarray(rng.standard_normal((3, n)))
    mid, node = ratint.pv_tables_matmul(f, kmid, knode)
    for i in range(3):
        _, mref = ratint.pv_integral_uniform(f[i], z, tmid)
        _, nref = ratint.pv_integral_uniform_nodes(f[i], z, tnode)
        np.testing.assert_allclose(mid[i], mref, rtol=1e-11, atol=1e-12)
        np.testing.assert_allclose(node[i], nref, rtol=1e-11, atol=1e-12)
