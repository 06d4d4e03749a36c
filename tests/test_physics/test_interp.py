"""Interpolation kernels: accuracy vs scipy on smooth functions, fill values, edges."""

import numpy as np
from numpy.testing import assert_allclose

import jax
from jax import numpy as jnp

from tsadar_tpu.core.physics import interp1d_cubic, interp2d_cubic


def test_cubic1d_smooth():
    x = jnp.linspace(-3, 3, 201)
    f = jnp.sin(x) * jnp.exp(-0.1 * x**2)
    xq = jnp.linspace(-2.9, 2.9, 777)
    got = interp1d_cubic(xq, x, f)
    want = np.sin(np.asarray(xq)) * np.exp(-0.1 * np.asarray(xq) ** 2)
    assert_allclose(np.asarray(got), want, atol=2e-6)


def test_cubic1d_exact_on_nodes_and_cubics():
    x = jnp.linspace(0, 1, 11)
    f = 2.0 + 3.0 * x  # linear reproduced exactly by Hermite w/ FD slopes
    xq = jnp.linspace(0, 1, 101)
    assert_allclose(np.asarray(interp1d_cubic(xq, x, f)), 2.0 + 3.0 * np.asarray(xq), rtol=1e-12)


def test_cubic1d_fill_values():
    x = jnp.linspace(0, 1, 11)
    f = x**2
    out = interp1d_cubic(jnp.array([-0.5, 0.5, 1.5]), x, f, extrap=(-50.0, -50.0))
    assert out[0] == -50.0 and out[2] == -50.0
    assert_allclose(float(out[1]), 0.25, atol=1e-10)


def test_cubic1d_nonuniform():
    x = jnp.sort(jnp.concatenate([jnp.linspace(0, 1, 40), jnp.array([0.505, 0.91])]))
    f = jnp.cos(3 * x)
    xq = jnp.linspace(0.01, 0.99, 301)
    assert_allclose(np.asarray(interp1d_cubic(xq, x, f)), np.cos(3 * np.asarray(xq)), atol=5e-4)


def test_cubic2d_smooth():
    x = jnp.linspace(-2, 2, 81)
    y = jnp.linspace(-2, 2, 81)
    f = jnp.exp(-(x[:, None] ** 2 + y[None, :] ** 2) / 2)
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.uniform(-1.9, 1.9, 500))
    yq = jnp.asarray(rng.uniform(-1.9, 1.9, 500))
    got = interp2d_cubic(xq, yq, x, y, f)
    want = np.exp(-(np.asarray(xq) ** 2 + np.asarray(yq) ** 2) / 2)
    assert_allclose(np.asarray(got), want, atol=5e-6)


def test_cubic2d_rotation_invariance_of_isotropic():
    # rotating an isotropic function should leave it unchanged (inside the disk)
    n = 96
    vmax = 6.0
    dv = 2 * vmax / n
    vx = jnp.linspace(-vmax + dv / 2, vmax - dv / 2, n)
    f = jnp.exp(-(vx[:, None] ** 2 + vx[None, :] ** 2) / 2)
    ang = 0.63
    c, s = jnp.cos(ang), jnp.sin(ang)
    X, Y = jnp.meshgrid(vx, vx, indexing="ij")
    xq = c * X - s * Y
    yq = s * X + c * Y
    rot = interp2d_cubic(xq.ravel(), yq.ravel(), vx, vx, f).reshape(n, n)
    mask = np.asarray(X**2 + Y**2) < (vmax - 0.5) ** 2
    assert_allclose(np.asarray(rot)[mask], np.asarray(f)[mask], atol=1e-4)


def test_cubic_interp_differentiable():
    x = jnp.linspace(0, 1, 33)

    def loss(a):
        f = jnp.sin(a * x)
        return jnp.sum(interp1d_cubic(jnp.linspace(0.1, 0.9, 50), x, f) ** 2)

    assert np.isfinite(float(jax.grad(loss)(2.0)))
