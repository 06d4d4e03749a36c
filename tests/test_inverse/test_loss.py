"""Loss-layer unit tests: functionals, masked windows, penalties.

Covers the loss functionals the reference defines (l1, l2, log-cosh, poisson —
``/root/reference/tsadar/inverse/loss_function.py:386-418``) and the penalty
terms it computes-but-disconnects (``:420-463``; connectable here via config
flags), none of which the end-to-end fit tests exercise beyond l2.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose

from __graft_entry__ import _make_batch, _small_config
from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition
from tsadar_tpu.inverse.loss import LossFunction
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles

BATCH = 2


def _loss_setup(**cfg_updates):
    cfg = _small_config(BATCH)
    for path, value in cfg_updates.items():
        node = cfg
        *parents, leaf = path.split(".")
        for key in parents:
            node = node[key]
        node[leaf] = value
    sas = get_scattering_angles(cfg)
    batch = _make_batch(BATCH)
    loss_fn = LossFunction(cfg, sas, batch)
    ts_params = ThomsonParams.create(cfg["parameters"], num_params=BATCH, batch=True, activate=True)
    diff, static = partition(ts_params, get_filter_spec(cfg["parameters"], ts_params))
    return loss_fn, diff, static, batch


def test_loss_functional_formulas():
    loss_fn, *_ = _loss_setup()
    d = jnp.asarray([1.0, 2.0, 0.5])
    t = jnp.asarray([0.5, 2.5, 0.5])
    u = jnp.asarray([2.0, 1.0, 1.0])
    assert_allclose(loss_fn.loss_functionals(d, t, u, "l1"), np.abs(d - t) / u)
    assert_allclose(loss_fn.loss_functionals(d, t, u, "l2"), (d - t) ** 2 / u)
    assert_allclose(loss_fn.loss_functionals(d, t, u, "log-cosh"), np.log(np.cosh(d - t)))
    assert_allclose(loss_fn.loss_functionals(d, t, u, "poisson"), t - d * np.log(np.maximum(t, 1e-300)))
    with pytest.raises(NotImplementedError):
        loss_fn.loss_functionals(d, t, u, "huber")


def test_masked_reduce_handles_unbatched_spectra():
    """mean_axis1 must treat a 1-D ([L]) spectrum as a single lineout row —
    calc_ei_error's row init anticipates ndim==1 (zeros(1)) and the scalar
    'mean'/'sum' reducers support it, so the row reducer must too."""
    from tsadar_tpu.inverse.loss import _masked_reduce

    err = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    mask = jnp.asarray([True, True, False, True])
    row = _masked_reduce(err, mask, "mean_axis1")
    assert row.shape == (1,)
    assert_allclose(row, [(1.0 + 2.0 + 4.0) / 3.0])
    # and the batched case is unchanged
    err2 = jnp.stack([err, 2 * err])
    row2 = _masked_reduce(err2, mask, "mean_axis1")
    assert row2.shape == (2,)
    assert_allclose(row2, [(7.0) / 3.0, 14.0 / 3.0])


def test_poisson_functional_survives_zero_theory():
    """The log floor must not underflow in the working dtype (f32 landmine)."""
    loss_fn, *_ = _loss_setup()
    t = jnp.zeros(4, jnp.float32)
    d = jnp.ones(4, jnp.float32)
    out = loss_fn.loss_functionals(d, t, jnp.ones(4), "poisson")
    assert np.all(np.isfinite(out))


@pytest.mark.parametrize("method", ["l1", "l2", "log-cosh", "poisson"])
def test_loss_and_grad_finite_for_every_functional(method):
    loss_fn, diff, static, batch = _loss_setup(**{"optimizer.loss_method": method})
    (value, _), grad = jax.jit(jax.value_and_grad(loss_fn.__loss__, has_aux=True))(diff, static, batch)
    assert np.isfinite(float(value))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grad))
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_moment_penalties_zero_for_normalized_maxwellian():
    loss_fn, diff, static, batch = _loss_setup()
    v = jnp.linspace(-6.0, 6.0, 4001)
    fe = jnp.exp(-(v**2) / 2) / jnp.sqrt(2 * jnp.pi)
    params = {"electron": {"fe": fe[None, :], "v": v[None, :]}}
    density, temperature, momentum = loss_fn.moment_penalties(params)
    # unit density and temperature, zero mean velocity
    assert float(density) < 1e-6
    assert float(temperature) < 1e-5
    assert float(momentum) < 1e-12
    # a hot, over-dense EDF is penalized in all moments
    density2, temperature2, _ = loss_fn.moment_penalties(
        {"electron": {"fe": 2.0 * fe[None, :] , "v": (1.3 * v)[None, :]}}
    )
    assert float(density2) > 1e-1 and float(temperature2) > 1e-1


def test_moment_penalties_2v_zero_for_normalized_isotropic():
    """2V branch (reference loss_function.py:523-576): the moments of a
    normalized unit-variance-per-dim isotropic EDF are exactly on target."""
    loss_fn, *_ = _loss_setup()
    loss_fn.cfg["parameters"]["electron"]["fe"]["dim"] = 2
    n = 401
    dv = 12.0 / n
    v = jnp.linspace(-6.0 + dv / 2, 6.0 - dv / 2, n)
    fe = jnp.exp(-(v[:, None] ** 2 + v[None, :] ** 2) / 2) / (2 * jnp.pi)
    density, temperature, momentum = loss_fn.moment_penalties({"electron": {"fe": fe, "v": v}})
    assert float(density) < 1e-8
    assert float(temperature) < 1e-8
    assert float(momentum) < 1e-20
    # an over-dense anisotropically-shifted EDF is penalized in every moment
    fe_bad = 2.0 * jnp.exp(-((v[:, None] - 1.0) ** 2 + v[None, :] ** 2) / 2) / (2 * jnp.pi)
    density2, temperature2, momentum2 = loss_fn.moment_penalties({"electron": {"fe": fe_bad, "v": v}})
    assert float(density2) > 0.5
    assert float(temperature2) > 0.5
    assert float(momentum2) > 0.5


def test_bound_penalty_fires_out_of_bounds():
    """Log-based bound penalty (reference loss_function.py:436-442): zero for
    normed params inside [0, 1], positive and growing outside."""
    cfg = _small_config(BATCH)
    sas = get_scattering_angles(cfg)
    batch = _make_batch(BATCH)
    loss_fn = LossFunction(cfg, sas, batch)
    # activate=False keeps the normed leaves in plain [0,1] space
    ts = ThomsonParams.create(cfg["parameters"], num_params=BATCH, batch=True, activate=False)
    assert float(loss_fn.bound_penalty(ts)) == pytest.approx(0.0, abs=1e-12)
    ts.electron.params.normed["Te"] = jnp.full(BATCH, 1.7)
    pen_hi = float(loss_fn.bound_penalty(ts))
    assert pen_hi == pytest.approx(BATCH * np.log(1.7), rel=1e-6)
    ts.electron.params.normed["Te"] = jnp.full(BATCH, -0.9)
    assert float(loss_fn.bound_penalty(ts)) == pytest.approx(BATCH * np.log(1.9), rel=1e-6)


def test_bound_penalty_inert_for_activated_params():
    """Production fits use sigmoid activation, which structurally confines
    every scalar param to [0, 1] — the penalty must be *exactly* zero there
    (it is a guard, not a regularizer; docs/configuration.md). Pin that the
    activate=True path yields identically 0 even for extreme logit leaves."""
    cfg = _small_config(BATCH)
    sas = get_scattering_angles(cfg)
    batch = _make_batch(BATCH)
    loss_fn = LossFunction(cfg, sas, batch)
    ts = ThomsonParams.create(cfg["parameters"], num_params=BATCH, batch=True, activate=True)
    assert float(loss_fn.bound_penalty(ts)) == 0.0
    # push a raw logit leaf far out — the activated value saturates inside
    # [0, 1] and the penalty stays exactly zero
    ts.electron.params.normed["Te"] = jnp.full(BATCH, 25.0)
    assert float(loss_fn.bound_penalty(ts)) == 0.0
    ts.electron.params.normed["Te"] = jnp.full(BATCH, -25.0)
    assert float(loss_fn.bound_penalty(ts)) == 0.0


def test_bound_penalty_connects_via_config_flag():
    loss_fn_off, diff, static, batch = _loss_setup()
    loss_fn_on, *_ = _loss_setup(**{"optimizer.bound_penalty": True})
    base = float(jax.jit(loss_fn_off.__loss__)(diff, static, batch)[0])
    with_pen = float(jax.jit(loss_fn_on.__loss__)(diff, static, batch)[0])
    # in-bounds initialization: the penalty engages but contributes ~0
    assert with_pen == pytest.approx(base, rel=1e-10)
    # and the gradient path stays finite with the flag on
    (value, _), grad = jax.jit(jax.value_and_grad(loss_fn_on.__loss__, has_aux=True))(diff, static, batch)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grad))
    assert np.isfinite(float(value)) and np.isfinite(gnorm)


def test_penalties_connect_via_config_flags():
    """The reference computes penalties but hard-disconnects them
    (loss_function.py:337); here the flags actually engage them."""
    loss_fn_off, diff, static, batch = _loss_setup()
    loss_fn_on, *_ = _loss_setup(**{"optimizer.moment_loss": True})
    base = float(jax.jit(loss_fn_off.__loss__)(diff, static, batch)[0])
    with_pen = float(jax.jit(loss_fn_on.__loss__)(diff, static, batch)[0])
    # the dlm EDF at these settings is normalized, so the moment penalty is
    # small but nonzero in f64; it must only ever ADD
    assert with_pen >= base


def test_monotonic_decrease_penalty_sign():
    loss_fn, *_ = _loss_setup(**{"parameters.electron.fe.fe_decrease_strict": True})
    v = jnp.linspace(-6.0, 6.0, 101)
    fe_mono = jnp.exp(-(v**2) / 2)
    params = {"electron": {"fe": fe_mono[None, :], "v": v[None, :]}}
    assert float(loss_fn.penalties(params)) == pytest.approx(0.0, abs=1e-12)
    # a bump on the outgoing tail (|v| increasing) triggers the tan barrier
    fe_bump = fe_mono.at[80].add(0.5)
    params_bump = {"electron": {"fe": fe_bump[None, :], "v": v[None, :]}}
    assert float(loss_fn.penalties(params_bump)) > 0.1
