"""Fused reduced spectrum tail: equivalence vs the composed path.

``form_factor._reduced_tail_cvjp`` collapses kinematics + ion susceptibility +
the df chain + the S(k, omega) assembly + the angle/gradient reduction into
one custom-VJP boundary (residuals = the two lookup outputs + scalars).  Pins:

* the primal equals ``sum(mean(__call__(params)[0], 0) * w, -1)`` exactly;
* every cotangent of the hand-written one-pass backward matches plain
  autodiff of the same primal (f64, near machine precision);
* the SpectrumModel dispatch (FUSED_REDUCED_TAIL) returns the same spectra
  and parameter gradients as the composed path.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
from jax import numpy as jnp

from tsadar_tpu.core.physics import form_factor as ffmod
from tsadar_tpu.core.physics import spectrum as specmod
from tsadar_tpu.core.physics.form_factor import FormFactor, _reduced_tail, _reduced_tail_cvjp


def _maxwellian_1v(nv=512, vmax=6.0):
    dv = 2 * vmax / nv
    vx = jnp.linspace(-vmax + dv / 2, vmax - dv / 2, nv)
    fe = jnp.exp(-(vx**2) / 2)
    fe = fe / jnp.sum(fe) / dv
    return vx, fe


def _params(fe, vx, two_species=False):
    p = {
        "electron": {"Te": jnp.asarray(0.5), "ne": jnp.asarray(0.2), "fe": fe, "v": vx},
        "general": {
            "lam": jnp.asarray(526.5),
            "ne_gradient": jnp.asarray(1.5),
            "Te_gradient": jnp.asarray(2.0),
            "ud": jnp.asarray(0.5),
            "Va": jnp.asarray(-0.3),
        },
        "ion-1": {
            "A": jnp.asarray(40.0),
            "Z": jnp.asarray(8.0),
            "Ti": jnp.asarray(0.2),
            "fract": jnp.asarray(1.0 if not two_species else 0.7),
        },
    }
    if two_species:
        p["ion-2"] = {
            "A": jnp.asarray(1.0),
            "Z": jnp.asarray(1.0),
            "Ti": jnp.asarray(0.15),
            "fract": jnp.asarray(0.3),
        }
    return p


def _ff(num_grad_points=2, angles=(55.0, 60.0, 65.0)):
    return FormFactor(
        [450, 650],
        npts=256,
        lam_shift=0.0,
        scattering_angles={"sa": np.array(list(angles))},
        num_grad_points=num_grad_points,
    )


@pytest.mark.parametrize("two_species", [False, True])
def test_reduced_primal_matches_composition(two_species):
    vx, fe = _maxwellian_1v()
    ff = _ff()
    params = _params(fe, vx, two_species)
    w = jnp.asarray([0.5, 0.3, 0.2])

    skw, lams = jax.jit(ff)(params)
    expected = jnp.sum(jnp.mean(skw, axis=0) * w, axis=1)
    got, lams2 = jax.jit(lambda p: ff.reduced_1v(p, w))(params)

    assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-12)
    assert_allclose(np.asarray(lams2), np.asarray(lams), rtol=0)


@pytest.mark.parametrize("two_species", [False, True])
def test_reduced_cvjp_gradients_match_autodiff(two_species):
    """The hand-written one-pass backward vs plain autodiff of the primal."""
    vx, fe = _maxwellian_1v()
    ff = _ff()
    params = _params(fe, vx, two_species)
    w = jnp.asarray([0.5, 0.3, 0.2])
    sarad = (ff.scattering_angles["sa"] * jnp.pi / 180.0).reshape(1, 1, -1)

    inputs = ff._lookups_1v(params)
    # a non-trivial reduction cotangent via a weighted sum of the output
    cvec = jnp.cos(jnp.linspace(0.0, 3.0, ff.npts))

    def loss_plain(*args):
        return jnp.sum(cvec * _reduced_tail(*args, w, sarad, ff.omgs))

    def loss_cvjp(*args):
        return jnp.sum(cvec * _reduced_tail_cvjp(*args, w, sarad, ff.omgs))

    # UNJITTED on purpose: the Ti gradient is a cancellation of ~1e8-scale
    # vTi contributions down to ~1e-4, so XLA's reassociation under jit moves
    # BOTH formulations by ~5e-5 relative (measured; same shift hits the plain
    # autodiff path).  Eager mode compares the formulas themselves, to 1e-9.
    g_plain = jax.grad(loss_plain, argnums=tuple(range(11)))(*inputs)
    g_cvjp = jax.grad(loss_cvjp, argnums=tuple(range(11)))(*inputs)

    names = ["lf", "chiERraw", "ne", "Te", "lam", "Va", "ud", "A", "Z", "Ti", "fract"]
    gmax_global = max(float(jnp.max(jnp.abs(gp))) for gp in g_plain)
    for name, gp, gc in zip(names, g_plain, g_cvjp):
        if name == "A":  # A is non-trainable by convention: cvjp returns zeros
            continue
        scale = max(float(jnp.max(jnp.abs(gp))), 1e-30)
        if scale < 1e-9 * gmax_global and float(jnp.max(jnp.abs(gc))) < 1e-9 * gmax_global:
            # both paths agree the gradient is ~0 (e.g. ud: the tail sees xie
            # only through differences, so a uniform shift telescopes to an
            # exact zero and both values are pure round-off noise)
            continue
        assert_allclose(
            np.asarray(gc), np.asarray(gp), atol=2e-9 * scale, rtol=2e-9, err_msg=f"grad[{name}]"
        )


def test_reduced_cvjp_under_vmap_and_grad():
    """The fused tail inside a vmapped model with batched scalars (the
    production pattern: grad of a batch-summed loss through vmap)."""
    vx, fe = _maxwellian_1v(nv=128)
    ff = _ff(num_grad_points=1, angles=(60.0,))
    params = _params(fe, vx)
    w = jnp.asarray([1.0])
    sarad = (ff.scattering_angles["sa"] * jnp.pi / 180.0).reshape(1, 1, -1)
    inputs = ff._lookups_1v(params)
    B = 3
    blf = jnp.stack([inputs[0] * (1.0 + 0.01 * i) for i in range(B)])
    bchi = jnp.stack([inputs[1] * (1.0 - 0.01 * i) for i in range(B)])
    bne = jnp.stack([inputs[2] * (1.0 + 0.05 * i) for i in range(B)])

    def loss(tail_fn, blf, bchi, bne):
        red = jax.vmap(
            lambda lf, chi, ne: tail_fn(lf, chi, ne, *inputs[3:], w, sarad, ff.omgs)
        )(blf, bchi, bne)
        return jnp.sum(red**2)

    g_plain = jax.grad(lambda *a: loss(_reduced_tail, *a), argnums=(0, 1, 2))(blf, bchi, bne)
    g_cvjp = jax.grad(lambda *a: loss(_reduced_tail_cvjp, *a), argnums=(0, 1, 2))(blf, bchi, bne)
    for gp, gc in zip(g_plain, g_cvjp):
        scale = max(float(jnp.max(jnp.abs(gp))), 1e-30)
        assert_allclose(np.asarray(gc), np.asarray(gp), atol=2e-9 * scale, rtol=2e-9)


def test_spectrum_model_dispatch_equivalence():
    """SpectrumModel with FUSED_REDUCED_TAIL on vs off: same spectra, same
    parameter gradients (full model-level check of the wiring)."""
    from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles

    cfg = {
        "parameters": {
            "electron": {
                "Te": {"val": 0.6, "active": True, "lb": 0.01, "ub": 1.5},
                "ne": {"val": 0.2, "active": True, "lb": 0.001, "ub": 1.0},
                "fe": {
                    "type": "dlm",
                    "dim": 1,
                    "nvx": 64,
                    "active": True,
                    "params": {"m": {"val": 2.5, "lb": 2.0, "ub": 5.0}},
                },
            },
            "ion-1": {
                "Ti": {"val": 0.2, "active": False, "same": False, "lb": 0.01, "ub": 1.0},
                "Z": {"val": 8.0, "active": False, "lb": 1.0, "ub": 25.0},
                "A": {"val": 40.0, "active": False},
                "fract": {"val": 1.0, "active": False},
            },
            "general": {
                "amp1": {"val": 1.0, "active": True, "lb": 0.01, "ub": 3.75},
                "amp2": {"val": 1.0, "active": True, "lb": 0.01, "ub": 3.75},
                "amp3": {"val": 1.0, "active": False, "lb": 0.01, "ub": 3.75},
                "lam": {"val": 524.0, "active": True, "lb": 523.0, "ub": 528.0},
                "Te_gradient": {"val": 0.0, "active": False, "lb": 0.0, "ub": 10.0, "num_grad_points": 1},
                "ne_gradient": {"val": 0.0, "active": False, "lb": 0.0, "ub": 15.0, "num_grad_points": 1},
                "ud": {"val": 0.0, "angle": 0.0, "active": False, "lb": -10.0, "ub": 10.0},
                "Va": {"val": 0.0, "angle": 0.0, "active": False, "lb": -20.5, "ub": 20.5},
            },
        },
        "other": {
            "extraoptions": {
                "load_ion_spec": True,
                "load_ele_spec": True,
                "spectype": "1d",
            },
            "lamrangE": [450.0, 650.0],
            "lamrangI": [523.0, 527.0],
            "npts": 256,
            "iawoff": True,
            "iawfilter": [1, 4, 24.0, 528.0],
            "CCDsize": [1024, 1024],
        },
        "data": {"ele_lam_shift": 0.0, "probe_beam": "P9"},
    }
    from tsadar_tpu.core.params import ThomsonParams

    sas = get_scattering_angles(cfg)
    ts_params = ThomsonParams.create(cfg["parameters"], num_params=1, batch=False, activate=True)

    def run():
        model = specmod.SpectrumModel(cfg, scattering_angles=sas)

        def loss(tp):
            ele, ion, _, _ = model(tp())
            return jnp.sum(ele**2) + jnp.sum(ion**2), (ele, ion)

        (val, (ele, ion)), grads = jax.jit(
            lambda tp: jax.value_and_grad(loss, has_aux=True)(tp)
        )(ts_params)
        return val, ele, ion, grads

    old_flag = specmod.FUSED_REDUCED_TAIL
    try:
        specmod.FUSED_REDUCED_TAIL = True
        val_f, ele_f, ion_f, grads_f = run()
        specmod.FUSED_REDUCED_TAIL = False
        val_c, ele_c, ion_c, grads_c = run()
    finally:
        specmod.FUSED_REDUCED_TAIL = old_flag

    assert_allclose(np.asarray(ele_f), np.asarray(ele_c), rtol=1e-12)
    assert_allclose(np.asarray(ion_f), np.asarray(ion_c), rtol=1e-12)
    assert_allclose(float(val_f), float(val_c), rtol=1e-12)
    leaves_f = jax.tree_util.tree_leaves(grads_f)
    leaves_c = jax.tree_util.tree_leaves(grads_c)
    assert len(leaves_f) == len(leaves_c)
    for lf_, lc_ in zip(leaves_f, leaves_c):
        scale = max(float(jnp.max(jnp.abs(lc_))), 1e-30)
        assert_allclose(np.asarray(lf_), np.asarray(lc_), atol=1e-11 * scale, rtol=1e-11)
