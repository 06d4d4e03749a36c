"""Plasma gradient profiles: num_grad_points > 1 averages spectra over linspace
ne/Te profiles (reference form_factor.py:182-195, generate_spectra.py:193).

Physics gates: zero-gradient multi-point == single-point; nonzero gradients
broaden the EPW resonance (average over shifted Bohm-Gross peaks)."""

import numpy as np
from numpy.testing import assert_allclose

import jax
from jax import numpy as jnp

from tsadar_tpu.core.physics.form_factor import FormFactor

from tests.test_physics.test_form_factor import _maxwellian_1v, _params


def _ff(num_grad_points):
    return FormFactor(
        [400, 700], npts=2048, lam_shift=0.0,
        scattering_angles={"sa": np.array([60.0])}, num_grad_points=num_grad_points,
    )


def test_zero_gradient_multi_point_matches_single():
    vx, fe = _maxwellian_1v()
    p = _params(fe, vx)
    S1, _ = jax.jit(_ff(1))(p)
    S3, _ = jax.jit(_ff(3))(p)
    assert S3.shape[0] == 3
    assert_allclose(np.asarray(jnp.mean(S3, axis=0)), np.asarray(jnp.mean(S1, axis=0)), rtol=1e-10)


def test_gradient_broadens_epw_feature():
    vx, fe = _maxwellian_1v()
    p0 = _params(fe, vx)
    pg = _params(fe, vx)
    pg["general"]["ne_gradient"] = jnp.asarray(15.0)  # +-7.5% density spread
    pg["general"]["Te_gradient"] = jnp.asarray(10.0)

    ff = _ff(7)
    S0, lams = jax.jit(ff)(p0)
    Sg, _ = jax.jit(ff)(pg)
    lam_nm = np.squeeze(np.asarray(lams)) * 1e7
    # blue EPW feature only, away from the ion feature and range edges
    blue = (lam_nm > 430.0) & (lam_nm < 515.0)
    S0 = np.where(blue, np.squeeze(np.asarray(jnp.mean(S0, axis=0))), 0.0)
    Sg = np.where(blue, np.squeeze(np.asarray(jnp.mean(Sg, axis=0))), 0.0)

    # averaging over shifted Bohm-Gross resonances broadens the EPW peak
    def halfwidth(s):
        return int((s > 0.5 * s.max()).sum())

    assert halfwidth(Sg) > halfwidth(S0), (halfwidth(Sg), halfwidth(S0))
    # total scattered EPW power is comparable (broadening redistributes it)
    assert_allclose(Sg.sum(), S0.sum(), rtol=0.25)
