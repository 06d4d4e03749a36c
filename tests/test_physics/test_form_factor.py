"""Physics-invariant tests of the spectral density function.

Oracles (mirroring the reference test strategy, tests/test_form_factor/):
* EPW spectral peaks satisfy the Bohm-Gross dispersion relation
  omega^2 = omega_pe^2 + 3 k^2 vTe^2                      (rtol 1e-2)
* IAW spectral peaks satisfy the ion-acoustic dispersion
  omega = +- k sqrt((Z Te + 3 Ti)/Mi)                      (rtol 1e-2)
* 2V isotropic EDF reproduces the 1V spectrum (internal consistency of the
  redesigned table-based 2V path), and table mode matches exact mode.
"""

from functools import partial

import numpy as np
import pytest
from numpy.testing import assert_allclose
from scipy.signal import find_peaks

import jax
from jax import numpy as jnp

from tsadar_tpu.core.physics.form_factor import FormFactor
from tsadar_tpu.core.physics.constants import C, ME_KEV, MP_KEV, PLASMA_FREQ_CONST


def _maxwellian_1v(nv=2048, vmax=6.0):
    dv = 2 * vmax / nv
    vx = jnp.linspace(-vmax + dv / 2, vmax - dv / 2, nv)
    fe = jnp.exp(-(vx**2) / 2)
    fe = fe / jnp.sum(fe) / dv
    return vx, fe


def _params(fe, vx, Te=0.5, ne=0.2, Ti=0.2, Z=1.0, A=1.0, lam=526.5, ud=0.0, Va=0.0):
    return {
        "electron": {"Te": jnp.asarray(Te), "ne": jnp.asarray(ne), "fe": fe, "v": vx},
        "general": {
            "lam": jnp.asarray(lam),
            "ne_gradient": jnp.asarray(0.0),
            "Te_gradient": jnp.asarray(0.0),
            "ud": jnp.asarray(ud),
            "Va": jnp.asarray(Va),
        },
        "ion-1": {"A": jnp.asarray(A), "Z": jnp.asarray(Z), "Ti": jnp.asarray(Ti), "fract": jnp.asarray(1.0)},
    }


def test_epw_bohm_gross():
    vx, fe = _maxwellian_1v()
    Te, ne, lam = 0.5, 0.2, 526.5
    ff = FormFactor([400, 700], npts=8192, lam_shift=0.0, scattering_angles={"sa": np.array([60.0])}, num_grad_points=1)
    ThryE, lams = jax.jit(ff)(_params(fe, vx, Te=Te, ne=ne, lam=lam))
    spec = np.squeeze(np.asarray(ThryE))
    lam_axis = np.squeeze(np.asarray(lams))  # cm

    # mask the central ion feature, find the two EPW resonances
    mask = np.abs(lam_axis * 1e7 - lam) > 10.0
    masked = np.where(mask, spec, 0.0)
    peaks, props = find_peaks(masked / masked.max(), height=0.05, prominence=0.03)
    assert len(peaks) >= 2, f"expected 2 EPW peaks, got {len(peaks)}"
    top2 = peaks[np.argsort(props["peak_heights"])[-2:]]

    model_omegas = 2 * np.pi * C / lam_axis[top2]
    omgpe = PLASMA_FREQ_CONST * np.sqrt(ne * 1e20)
    omgL = 2 * np.pi * 1e7 * C / lam
    ks = np.sqrt(model_omegas**2 - omgpe**2) / C
    kL = np.sqrt(omgL**2 - omgpe**2) / C
    k = np.sqrt(ks**2 + kL**2 - 2 * ks * kL * np.cos(np.deg2rad(60.0)))
    vTe = np.sqrt(Te / ME_KEV)
    omg_bg = np.sqrt(omgpe**2 + 3 * k**2 * vTe**2)
    theory = np.where(model_omegas > omgL, omgL + omg_bg, omgL - omg_bg)
    assert_allclose(model_omegas, theory, rtol=1e-2)


def test_iaw_dispersion():
    vx, fe = _maxwellian_1v()
    Te, ne, Ti, Z, A, lam = 0.5, 0.2, 0.2, 1.0, 1.0, 526.5
    ff = FormFactor([525.5, 527.5], npts=8192, lam_shift=0.0, scattering_angles={"sa": np.array([60.0])}, num_grad_points=1)
    ThryI, lams = jax.jit(ff)(_params(fe, vx, Te=Te, ne=ne, Ti=Ti, Z=Z, A=A, lam=lam))
    spec = np.squeeze(np.asarray(ThryI))
    lam_axis = np.squeeze(np.asarray(lams))

    peaks, props = find_peaks(spec / spec.max(), height=0.1, prominence=0.2)
    assert len(peaks) >= 2
    top2 = peaks[np.argsort(props["peak_heights"])[-2:]]
    model_omegas = np.sort(2 * np.pi * C / lam_axis[top2])

    omgpe = PLASMA_FREQ_CONST * np.sqrt(ne * 1e20)
    omgL = 2 * np.pi * 1e7 * C / lam
    kL = np.sqrt(omgL**2 - omgpe**2) / C
    k = 2 * kL * np.sin(np.deg2rad(60.0) / 2)  # |ks| ~ |kL| for the ion feature
    cs = np.sqrt((Z * Te + 3 * Ti) / (A * MP_KEV))
    theory = np.sort([omgL - k * cs, omgL + k * cs])
    assert_allclose(model_omegas, theory, rtol=1e-2)


def test_2v_isotropic_matches_1v():
    # a 2D isotropic Maxwellian must reproduce the 1V spectrum
    nv = 128
    vmax = 6.0
    dv = 2 * vmax / nv
    vx2 = jnp.linspace(-vmax + dv / 2, vmax - dv / 2, nv)
    f2 = jnp.exp(-(vx2[:, None] ** 2 + vx2[None, :] ** 2) / 2)
    f2 = f2 / jnp.sum(f2) / dv**2

    vx1, fe1 = _maxwellian_1v(nv=2048)

    sa = {"sa": np.array([60.0])}
    ff1 = FormFactor([400, 700], npts=1024, lam_shift=0.0, scattering_angles=sa, num_grad_points=1)
    ff2 = FormFactor(
        [400, 700], npts=1024, lam_shift=0.0, scattering_angles=sa, num_grad_points=1,
        ud_ang=0.0, va_ang=0.0, num_beta=64,
    )

    S1, lams = jax.jit(ff1)(_params(fe1, vx1))
    S2, _ = jax.jit(ff2.calc_in_2D)(_params(f2, vx2))

    s1 = np.squeeze(np.asarray(S1))
    s2 = np.squeeze(np.asarray(S2))
    lam_nm = np.squeeze(np.asarray(lams)) * 1e7
    # compare away from the ion feature (1V/2V grids resolve it differently)
    mask = np.abs(lam_nm - 526.5) > 8.0
    assert_allclose(s2[mask], s1[mask], rtol=5e-2, atol=1e-3 * s1.max())


def test_2v_table_matches_exact():
    nv = 64
    vmax = 6.0
    dv = 2 * vmax / nv
    vx2 = jnp.linspace(-vmax + dv / 2, vmax - dv / 2, nv)
    # anisotropic (bi-Maxwellian) EDF to exercise the angle dependence
    f2 = jnp.exp(-(vx2[None, :] ** 2) / 2 - (vx2[:, None] ** 2) / (2 * 1.44))
    f2 = f2 / jnp.sum(f2) / dv**2

    sa = {"sa": np.array([55.0, 60.0, 65.0])}
    kw = dict(lam_shift=0.0, scattering_angles=sa, num_grad_points=1, ud_ang=0.0, va_ang=0.0)
    ff_tab = FormFactor([450, 650], npts=256, num_beta=256, mode="table", **kw)
    ff_ex = FormFactor([450, 650], npts=256, mode="exact", **kw)

    p = _params(f2, vx2)
    St, _ = jax.jit(ff_tab.calc_in_2D)(p)
    Se, _ = jax.jit(ff_ex.calc_in_2D)(p)
    # Tolerance rationale (the two modes differ by DESIGN, not by bug): exact
    # mode interpolates f/df per evaluation point from a bicubic EDF rotation
    # at each of 256 beta angles with its own O(dv^2) error, while table mode
    # projects once per angle via the central-slice NUDFT — measured ~20x
    # closer to the direct-rotation truth than the old FFT+bilinear sampling
    # (test_nudft_projection_matches_rotation pins <5e-4 of projection scale)
    # — then linearly interpolates chi over the (beta, xi) table (rowmix
    # agreement 2.4e-6 of peak, test_interp.py). The dominant residual is
    # therefore exact mode's per-point rotation interpolation on this coarse
    # nv=64 grid, not the table; 2e-2 relative / 2e-3 of peak bounds that
    # discretization gap, and tightening it requires a finer EDF grid, not a
    # better table.
    assert_allclose(np.asarray(St), np.asarray(Se), rtol=2e-2, atol=2e-3 * float(jnp.max(Se)))


def test_form_factor_differentiable():
    vx, fe = _maxwellian_1v(nv=512)
    ff = FormFactor([400, 700], npts=256, lam_shift=0.0, scattering_angles={"sa": np.array([60.0])}, num_grad_points=1)

    def loss(Te):
        p = _params(fe, vx, Te=Te)
        S, _ = ff(p)
        return jnp.sum(S**2) * 1e10

    g = jax.grad(loss)(0.5)
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_zero_edf_tail_stays_finite_in_f32():
    """EDF tails that underflow to exact 0.0 in f32 must not NaN the spectrum.

    Regression: the log-space clamp used a 1e-300 literal, which underflows to
    0.0 in float32 (the TPU working dtype) and silently re-admitted log(0) =
    -inf; one matmul then spread NaN across the whole lineout.  High-m DLM
    EDFs hit exact zeros in their f32 tails during whole-shot fits.
    """
    nv = 512
    dv = 2 * 6.0 / nv
    vx = jnp.linspace(-6.0 + dv / 2, 6.0 - dv / 2, nv, dtype=jnp.float32)
    fe = jnp.exp(-((jnp.abs(vx) / 1.2) ** 5.0))  # super-Gaussian, m=5
    fe = (fe / jnp.sum(fe) / dv).astype(jnp.float32)
    fe = jnp.where(jnp.abs(vx) > 4.0, 0.0, fe)  # force exact zeros in the tail
    assert float(jnp.min(fe)) == 0.0

    ff = FormFactor(
        [400, 700],
        npts=512,
        lam_shift=0.0,
        scattering_angles={"sa": np.array([60.0])},
        num_grad_points=1,
    )
    params = _params(fe, vx.astype(jnp.float32), Te=0.6, ne=0.2)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else a, params)
    spectrum, lams = jax.jit(ff)(params)
    assert bool(jnp.all(jnp.isfinite(spectrum)))


def test_nudft_projection_matches_rotation():
    """_project_all_nudft (TPU table-mode path) == direct Radon projections.

    The exact central-slice NUDFT must agree with per-angle bicubic rotation
    projections at least as well as the FFT+bilinear slice sampler does (it
    has no k-space interpolation error; its backward has no scatter).
    """
    nvx = 96
    dv = 2 * 6.0 / nvx
    vx = jnp.linspace(-6.0 + dv / 2, 6.0 - dv / 2, nvx, dtype=jnp.float64)
    DF = jnp.exp(-(vx[None, :] ** 2 / 2 + vx[:, None] ** 2 / 2.88))
    DF = DF / jnp.sum(DF) / dv**2

    ff = FormFactor(
        [400, 700],
        npts=128,
        num_beta=32,
        mode="table",
        lam_shift=0.0,
        scattering_angles={"sa": np.array([60.0])},
        num_grad_points=1,
        ud_ang=0.0,
        va_ang=0.0,
    )
    betas = jnp.linspace(0, 2 * jnp.pi, 32, endpoint=False)
    p_rot = jnp.stack([ff._project(vx, DF, b) for b in betas])
    # the NUDFT path's angle grid is baked to this canonical linspace
    p_nudft = ff._project_all_nudft(vx, DF)
    p_bilin = ff._project_all_fourier(vx, DF, betas)
    err_nudft = float(jnp.max(jnp.abs(p_nudft - p_rot)))
    err_bilin = float(jnp.max(jnp.abs(p_bilin - p_rot)))
    scale = float(jnp.max(p_rot))
    assert err_nudft < 5e-4 * scale
    assert err_nudft <= err_bilin + 1e-12

    # differentiable, and the EDF cotangent is finite
    g = jax.grad(lambda d: jnp.sum(ff._project_all_nudft(vx, d) ** 2))(DF)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_nudft_quarter_symmetry_matches_full_tables():
    """The quarter-table NUDFT (4x less constant volume + FLOPs; the ARTS
    cold-compile fix) must reproduce the full-table slice evaluation.

    Shared first-quadrant rows are the same table values; mirrored rows
    differ only by cos/sin evaluated at the mirrored f64 grid point vs
    sign-flipped directly (~1 ulp) plus the split partial-sum reassociation
    — roundoff, not approximation.  Values and EDF cotangent both pinned,
    at an anisotropic shifted EDF so no accidental symmetry of DF hides a
    sign error in the recombination."""
    from tsadar_tpu.core.physics import form_factor as ffmod

    nvx = 64
    dv = 2 * 6.0 / nvx
    vx = jnp.linspace(-6.0 + dv / 2, 6.0 - dv / 2, nvx, dtype=jnp.float64)
    DF = jnp.exp(-((vx[None, :] - 0.7) ** 2) / 2 - (vx[:, None] + 0.4) ** 2 / 2.88)
    DF = DF / jnp.sum(DF) / dv**2

    kw = dict(npts=128, mode="table", lam_shift=0.0,
              scattering_angles={"sa": np.array([60.0])}, num_grad_points=1,
              ud_ang=0.0, va_ang=0.0)
    for B in (8, 32, 256):
        ff = FormFactor([400, 700], num_beta=B, **kw)
        p_q = ff._project_all_nudft(vx, DF)
        g_q = jax.grad(lambda d: jnp.sum(ff._project_all_nudft(vx, d) ** 2))(DF)
        old = ffmod._NUDFT_QUARTER
        ffmod._NUDFT_QUARTER = False
        try:
            p_f = ff._project_all_nudft(vx, DF)
            g_f = jax.grad(lambda d: jnp.sum(ff._project_all_nudft(vx, d) ** 2))(DF)
        finally:
            ffmod._NUDFT_QUARTER = old
        scale = float(jnp.max(jnp.abs(p_f)))
        assert_allclose(np.asarray(p_q), np.asarray(p_f), atol=1e-12 * scale, rtol=1e-10,
                        err_msg=f"B={B} projections")
        gscale = float(jnp.max(jnp.abs(g_f))) or 1.0
        assert_allclose(np.asarray(g_q), np.asarray(g_f), atol=1e-12 * gscale, rtol=1e-10,
                        err_msg=f"B={B} grads")


def test_exact_mode_guarded_on_tpu(monkeypatch):
    """mode='exact' on TPU falls back to table mode with a warning.

    Per-point lax.map is the known-pathological lowering on the TPU backend
    (form_factor.py dispatch comment); a user selecting exact mode there
    should not silently eat an orders-of-magnitude slowdown.  The override
    keyword must preserve exact mode, and CPU must be unaffected.
    """
    import warnings

    import tsadar_tpu.core.physics.form_factor as ff_mod

    kw = dict(
        lambda_range=[450, 650], npts=64, lam_shift=0.0,
        scattering_angles={"sa": np.array([60.0])}, num_grad_points=1,
    )

    # CPU (the real backend here): exact stays exact, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert FormFactor(mode="exact", **kw).mode == "exact"

    monkeypatch.setattr(ff_mod.jax, "default_backend", lambda: "tpu")
    with pytest.warns(UserWarning, match="falls back to mode='table'"):
        assert FormFactor(mode="exact", **kw).mode == "table"
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert FormFactor(mode="exact", allow_exact_on_tpu=True, **kw).mode == "exact"
        assert FormFactor(mode="table", **kw).mode == "table"


def test_remat_tail_grad_equivalence(monkeypatch):
    """REMAT_SPECTRUM_TAIL rewires autodiff residuals, never the math.

    The flag is off by default (measured slower on v5e — see the flag
    comment in form_factor.py); this pins that flipping it changes neither
    the forward nor the gradient, so the boundary stays safe to experiment
    behind.
    """
    from tsadar_tpu.core.physics import form_factor as ff_mod

    vx, fe = _maxwellian_1v(nv=512)
    ff = FormFactor(
        [400, 700], npts=256, lam_shift=0.0, scattering_angles={"sa": np.array([60.0])}, num_grad_points=1
    )

    def loss(Te, ud):
        S, _ = ff(_params(fe, vx, Te=Te, ud=ud))
        return jnp.sum(S**2) * 1e10

    vg = jax.value_and_grad(loss, argnums=(0, 1))
    monkeypatch.setattr(ff_mod, "REMAT_SPECTRUM_TAIL", False)
    v0, g0 = jax.jit(vg)(0.5, 0.1)
    jax.clear_caches()
    monkeypatch.setattr(ff_mod, "REMAT_SPECTRUM_TAIL", True)
    v1, g1 = jax.jit(vg)(0.5, 0.1)

    # checkpoint changes the fusion schedule, so allow f64 reassociation ulps
    assert_allclose(float(v0), float(v1), rtol=1e-13)
    assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-12)


def test_kinematics_custom_vjp_matches_autodiff():
    """The analytic kinematics VJP equals plain autodiff (CPU f64).

    The TPU fit step dispatches ``_kinematics_cvjp`` (one fused reduction
    pass) in place of XLA's transposed chain rule; this pins every term of
    the hand-derived rule — all five parameter cotangents, through all six
    output fields — against autodiff of the shared primal, including the
    [G > 1] gradient-profile axis and vmap batching.
    """
    from tsadar_tpu.core.physics import form_factor as ff_mod

    rng = np.random.default_rng(3)
    L, A, G = 64, 3, 2
    sarad = jnp.asarray(np.deg2rad(np.array([40.0, 60.0, 120.0])).reshape(1, 1, -1))
    lamAxis = np.linspace(450.0, 650.0, L)
    omgs = jnp.asarray(2.0e7 * np.pi * C / lamAxis)[None, :, None]
    # random but physical per-lineout scalars (ne in 1e20 cm^-3 units pre-scale)
    ne = jnp.asarray(1.0e20 * rng.uniform(0.1, 0.4, G))
    Te = jnp.asarray(rng.uniform(0.3, 1.2, G))
    lam = jnp.asarray(526.5)
    Va = jnp.asarray(2.0e6)
    ud = jnp.asarray(-1.5e6)
    # random output weights exercise every cotangent path at once
    outs0 = ff_mod._kinematics_fields(sarad, omgs, ne, Te, lam, Va, ud)
    ws = [jnp.asarray(rng.standard_normal(np.shape(o))) for o in outs0]

    def loss(fn, ne, Te, lam, Va, ud):
        outs = fn(sarad, omgs, ne, Te, lam, Va, ud)
        # normalize each field so the summed loss is O(1) per field
        return sum(jnp.sum(w * o) / jnp.max(jnp.abs(jax.lax.stop_gradient(o))) for w, o in zip(ws, outs))

    args = (ne, Te, lam, Va, ud)
    v0, g0 = jax.value_and_grad(partial(loss, ff_mod._kinematics_fields), argnums=(0, 1, 2, 3, 4))(*args)
    v1, g1 = jax.value_and_grad(partial(loss, ff_mod._kinematics_cvjp), argnums=(0, 1, 2, 3, 4))(*args)
    assert_allclose(float(v0), float(v1), rtol=1e-14)
    for a, b, name in zip(g0, g1, ["ne", "Te", "lam", "Va", "ud"]):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-10, err_msg=name)

    # batched (vmap over lineouts), jitted — the production shape
    batch = lambda x, n: jnp.stack([x * (1.0 + 0.01 * i) for i in range(n)])
    bargs = tuple(batch(a, 4) for a in args)

    def bloss(fn, *a):
        outs = jax.vmap(lambda *xa: fn(sarad, omgs, *xa))(*a)
        return sum(jnp.sum(w * o) / jnp.max(jnp.abs(jax.lax.stop_gradient(o))) for w, o in zip(ws, outs))

    gv0 = jax.jit(jax.grad(partial(bloss, ff_mod._kinematics_fields), argnums=(0, 1, 2, 3, 4)))(*bargs)
    gv1 = jax.jit(jax.grad(partial(bloss, ff_mod._kinematics_cvjp), argnums=(0, 1, 2, 3, 4)))(*bargs)
    for a, b, name in zip(gv0, gv1, ["ne", "Te", "lam", "Va", "ud"]):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-10, err_msg=name)


def test_assembly_custom_vjp_matches_autodiff():
    """The analytic spectrum-assembly VJP equals plain autodiff (CPU f64).

    Pins every term of the hand-derived reverse rule for ``_assemble_cvjp``
    — all 15 differentiable inputs, including the species axis (xii, vTi, Z,
    fract, Zbar) and the broadcastable shapes — against autodiff of the
    shared primal, plus vmap batching over lineouts.
    """
    from tsadar_tpu.core.physics import form_factor as ff_mod

    rng = np.random.default_rng(7)
    G, L, A, S = 2, 32, 3, 2
    shp = (G, L, A)

    def mk(*shape, lo=0.5, hi=1.5):
        return jnp.asarray(rng.uniform(lo, hi, shape))

    args = (
        mk(*shp) * 1e5,  # k_mag
        mk(*shp, lo=-0.5, hi=0.5),  # ceR
        mk(*shp, lo=-0.5, hi=0.5),  # ceI
        mk(*shp, lo=-0.5, hi=0.5),  # ciR
        mk(*shp, lo=-0.5, hi=0.5),  # ciI
        mk(*shp) * 1e-7,  # fe_vphi
        mk(G, 1, 1) * 1e9,  # vTe
        mk(G, L, A, S, lo=-2.0, hi=2.0),  # xii
        mk(1, 1, 1, S) * 1e7,  # vTi
        mk(1, 1, 1, S, lo=1.0, hi=7.0),  # Z
        mk(1, 1, 1, S, lo=0.2, hi=0.8),  # fract
        jnp.asarray(3.7),  # Zbar
        mk(*shp, lo=-1.0, hi=1.0) * 1e14,  # omgdop
        jnp.asarray(3.5e15),  # omgL
        mk(G) * 1e20,  # ne
        jnp.asarray(np.linspace(450.0, 650.0, L)).reshape(1, L, 1),  # lams
    )
    w = jnp.asarray(rng.standard_normal(shp))

    def loss(fn, *a):
        out = fn(*a, args[-1])
        return jnp.sum(w * out) / jnp.max(jnp.abs(jax.lax.stop_gradient(out)))

    dn = tuple(range(15))
    diff_args = args[:15]
    v0, g0 = jax.value_and_grad(partial(loss, ff_mod._assemble_fields), argnums=dn)(*diff_args)
    v1, g1 = jax.value_and_grad(partial(loss, ff_mod._assemble_cvjp), argnums=dn)(*diff_args)
    names = "k ceR ceI ciR ciI fe vTe xii vTi Z fract Zbar omgdop omgL ne".split()
    assert_allclose(float(v0), float(v1), rtol=1e-14)
    for a, b, name in zip(g0, g1, names):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-10, atol=1e-300, err_msg=name)

    # vmapped over a lineout batch (the production context), jitted
    B = 3
    batch = lambda x: jnp.stack([x * (1.0 + 0.01 * i) for i in range(B)])
    bargs = tuple(batch(a) for a in diff_args)

    def bloss(fn, *a):
        out = jax.vmap(lambda *xa: fn(*xa, args[-1]))(*a)
        return jnp.sum(w * out) / jnp.max(jnp.abs(jax.lax.stop_gradient(out)))

    gv0 = jax.jit(jax.grad(partial(bloss, ff_mod._assemble_fields), argnums=dn))(*bargs)
    gv1 = jax.jit(jax.grad(partial(bloss, ff_mod._assemble_cvjp), argnums=dn))(*bargs)
    for a, b, name in zip(gv0, gv1, names):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-10, atol=1e-300, err_msg=name)


def test_assembly_real_split_matches_complex():
    """``_assemble_fields`` (real-split) reproduces the complex
    ``_assemble_spectrum`` formulation to f64 rounding, values and grads."""
    from tsadar_tpu.core.physics import form_factor as ff_mod

    vx, fe = _maxwellian_1v(nv=256)
    ff = FormFactor(
        [400, 700], npts=128, lam_shift=0.0, scattering_angles={"sa": np.array([60.0])}, num_grad_points=1
    )

    def loss(use_cvjp, Te, ne, Ti):
        # force the gate rather than the backend so this stays a CPU test
        ff_mod_gate = ff_mod._use_kinematics_vjp
        ff_mod._use_kinematics_vjp = lambda: use_cvjp
        try:
            S, _ = ff(_params(fe, vx, Te=Te, ne=ne, Ti=Ti))
        finally:
            ff_mod._use_kinematics_vjp = ff_mod_gate
        return jnp.sum(S**2) * 1e10

    args = (0.6, 0.25, 0.25)
    v0, g0 = jax.value_and_grad(partial(loss, False), argnums=(0, 1, 2))(*args)
    v1, g1 = jax.value_and_grad(partial(loss, True), argnums=(0, 1, 2))(*args)
    assert_allclose(float(v1), float(v0), rtol=1e-12)
    assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-9)


def test_kinematics_vjp_dispatch_full_model(monkeypatch):
    """Forcing the kinematics custom VJP through the full 1V model changes
    neither the spectrum nor its gradients (dispatch wiring, not just math)."""
    from tsadar_tpu.core.physics import form_factor as ff_mod

    vx, fe = _maxwellian_1v(nv=512)
    ff = FormFactor(
        [400, 700], npts=256, lam_shift=0.0, scattering_angles={"sa": np.array([60.0])}, num_grad_points=1
    )

    def loss(Te, ne, lam, Va, ud):
        S, _ = ff(_params(fe, vx, Te=Te, ne=ne, lam=lam, Va=Va, ud=ud))
        return jnp.sum(S**2) * 1e10

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))
    args = (0.5, 0.22, 526.5, 0.3, 0.1)
    monkeypatch.setattr(ff_mod, "_use_kinematics_vjp", lambda: False)
    v0, g0 = jax.jit(vg)(*args)
    jax.clear_caches()
    monkeypatch.setattr(ff_mod, "_use_kinematics_vjp", lambda: True)
    v1, g1 = jax.jit(vg)(*args)

    assert_allclose(float(v0), float(v1), rtol=1e-13)  # identical primal
    assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-9)
