"""Thomson-scattering spectral density function S(k, omega).

From-scratch TPU-first implementation with feature parity to the reference
``FormFactor`` (``/root/reference/tsadar/core/physics/form_factor.py``):

* 1V electron distribution functions (``__call__``): multi-species ions, ne/Te
  gradient profiles, drift (ud) and flow (Va) Doppler terms, multi-angle.
  Reference: form_factor.py:163-298.
* 2V (ARTS) numerical EDFs (``calc_in_2D``): k as a 2-vector, per-point electron
  susceptibility from the projected, rotated EDF.  Reference: form_factor.py:449-587.

TPU-first design decisions (all semantics-preserving):

1. The plasma dispersion function Z' is evaluated directly (``zprime``) instead of
   interpolating host-loaded tables (reference form_factor.py:20-45, 243-249).
2. The electron chi_R pole sweep — reference: ``vmap(ratintn)`` over 1640 poles
   x 1024 grid points (form_factor.py:263-271) — is a single broadcasted
   ``pv_integral`` with no vmap and no complex arithmetic.
3. The 2V hot loop — reference: ``jax.lax.map`` over ~1e5-1e6 points, each doing an
   O(nvx^2) bicubic rotation of the full EDF (form_factor.py:349-429) — is
   restructured: rotated 1D projections and their chi_R pole tables are built once
   on a dense angle grid (a Radon transform of the EDF), then every evaluation
   point does two bilinear gathers.  This is algorithmically ~nvx^2/4 times less
   work with interpolation error no worse than the reference's per-point bicubic
   resample for the smooth EDFs in play.  ``mode="exact"`` retains per-point
   semantics for validation.
4. No data-dependent control flow, static shapes everywhere, so the whole model
   jits once and shards over a device mesh at the lineout-batch level.
"""

import functools
import math
from functools import partial

import numpy as np
from jax import numpy as jnp
import jax

from . import ratint
from .constants import C, ME_KEV, MP_KEV, RE_CM, PLASMA_FREQ_CONST
from .interp import (
    interp1d_cubic_matmul,
    interp2d_cubic,
    interp1d_linear_uniform,
    interp1d_linear_blocked,
    interp1d_cubic_blocked,
    periodic_linear_rowmix,
    select_columns_linear,
    chi_bilinear_lookup,
    pallas_enabled,
    dispatch_backend,
)
from .zprime import zprime

# EDF-lookup dispatch on TPU: velocity grids LARGER than this take the blocked
# cubic path (Pallas-fused at production query counts).  Before the fused
# cubic kernels the [Q, nvx] Hermite weight-matrix matmul won for nvx <= 128;
# with them the blocked path wins at every production grid (same-window A/B at
# the bench shapes, nvx=64: forward 42.5k -> 48.5k spectra/s, fit step 31.0 ->
# 26.5 ms).  The floor only guards degenerate grids near the stencil width.
_CUBIC_BLOCKED_MIN_NVX = 16

# Rematerialize the chi-combination / spectrum-assembly tail in the backward
# pass (``_spectrum_tail``).  MEASURED NEGATIVE on v5e at bench shapes
# (B=512): fit step 22.5 -> 24.3 ms and XLA's own bytes-accessed estimate
# RISES 9.9 -> 10.8 GB — the rationale (don't store ~21 MB [B, G, L, A]
# residuals, recompute them) fails because the recomputed intermediates are
# materialized for the backward anyway, so checkpointing adds traffic plus
# compute.  XLA's default residual selection is already the better schedule.
# Kept as an off-by-default switch: the clean tail boundary is where any
# future remat-policy experiment plugs in.
REMAT_SPECTRUM_TAIL = False


def _remat_tail_enabled():
    return bool(REMAT_SPECTRUM_TAIL)


@functools.lru_cache(maxsize=4)
def _nudft_trig_tables(B, n, dtype_name="float64"):
    """Host-precomputed NUDFT central-slice trig tables (numpy, ``dtype_name``).

    lru_cache'd (treat the returned arrays as read-only): every jit of a 2V
    program re-traces this build (forward, value_and_grad, and scan-chunk
    programs each pay it — seconds of host numpy per trace on the 1-core box).

    (ex_r, ex_i) [B*P, n] and (ey_r, ey_i) [B, P, n] for P = 2n, with
    theta[b, k, j] = 2pi r_k dir_b (j - c) / P on the dense [0, 2pi) angle
    grid of ``_chi_tables``.  Depends only on static sizes, so the tables
    enter traced code as constants — see ``_project_all_nudft``.

    The trig is always computed in f64 and then rounded, so requesting f32
    gives bitwise the same values as embedding f64 and casting in-graph —
    but at HALF the bytes in the UNOPTIMIZED program (33.5M elements at the
    ARTS production sizes B=256, n=128: 268 MB f64 vs 134 MB f32).  The
    optimized executable is unchanged (XLA constant-folds the converts
    before serialization — cache entries stay ~550 MB either way), but the
    unoptimized HLO is what gets hashed for the compile cache and shipped
    to the axon remote compiler: measured cold-compile for the full ARTS
    bench drops 315.8 -> 152.7 s with bitwise-identical fit losses.
    """
    P = 2 * n
    c = (n - 1) / 2.0
    r = np.fft.fftfreq(P) * P
    idx = np.arange(n, dtype=np.float64) - c
    betas = np.linspace(0.0, 2.0 * np.pi, B, endpoint=False)
    argx = (2.0 * np.pi / P) * np.cos(betas)[:, None, None] * r[None, :, None] * idx[None, None, :]
    argy = (2.0 * np.pi / P) * np.sin(betas)[:, None, None] * r[None, :, None] * idx[None, None, :]
    dt = np.dtype(dtype_name)
    nb = len(betas)
    return (
        np.cos(argx).reshape(nb * P, n).astype(dt),
        np.sin(argx).reshape(nb * P, n).astype(dt),
        np.cos(argy).astype(dt),
        np.sin(argy).astype(dt),
    )


@functools.lru_cache(maxsize=4)
def _nudft_trig_tables_quarter(B, n, dtype_name="float64"):
    """First-quadrant NUDFT trig tables: angle rows k = 0..B/4 inclusive.

    The dense angle grid carries a 4-fold dihedral symmetry — beta -> pi -
    beta flips cos(beta) only, beta -> 2pi - beta flips sin(beta) only — so
    the full-[B] tables are sign recombinations of the first-quadrant rows.
    Emitting only those rows cuts the lowered program's dominant constant
    volume AND the projection matmul FLOPs 4x (``_project_all_nudft``
    reassembles all B slice spectra algebraically).  Same f64-then-round
    construction as ``_nudft_trig_tables``: shared rows are bitwise
    identical; mirrored rows agree to ~1 ulp (cos/sin evaluated at the
    mirrored f64 grid point vs sign-flipped directly).
    """
    assert B % 4 == 0
    P = 2 * n
    c = (n - 1) / 2.0
    r = np.fft.fftfreq(P) * P
    idx = np.arange(n, dtype=np.float64) - c
    betas = np.linspace(0.0, 2.0 * np.pi, B, endpoint=False)[: B // 4 + 1]
    argx = (2.0 * np.pi / P) * np.cos(betas)[:, None, None] * r[None, :, None] * idx[None, None, :]
    argy = (2.0 * np.pi / P) * np.sin(betas)[:, None, None] * r[None, :, None] * idx[None, None, :]
    dt = np.dtype(dtype_name)
    nb = len(betas)
    return (
        np.cos(argx).reshape(nb * P, n).astype(dt),
        np.sin(argx).reshape(nb * P, n).astype(dt),
        np.cos(argy).astype(dt),
        np.sin(argy).astype(dt),
    )


# quarter-symmetry NUDFT table dispatch (tests force the full-table path to
# pin the algebraic recombination against it)
_NUDFT_QUARTER = True

# probe angular-frequency numerator: omgL = OMGL_NUM / lam  (lam in nm, omgL in 1/s)
OMGL_NUM = 2.0 * np.pi * 1.0e7 * C


def _kinematics_fields(sarad, omgs, ne, Te, lam, Va, ud):
    """Scattering kinematics fields [G, L, A] from per-lineout plasma scalars.

    Shared primal for both AD paths (plain autodiff and the analytic custom
    VJP below) so the forward stays bitwise identical whichever is dispatched.
    Physics parity: reference form_factor.py:201-229.
    """
    omgL = OMGL_NUM / lam
    omgpe = PLASMA_FREQ_CONST * jnp.sqrt(ne[..., None, None])  # [G,1,1]
    omg = omgs - omgL

    ks = jnp.sqrt(omgs**2 - omgpe**2) / C
    kL = jnp.sqrt(omgL**2 - omgpe**2) / C
    k = jnp.sqrt(ks**2 + kL**2 - 2.0 * ks * kL * jnp.cos(sarad))  # [G,L,A]

    omgdop = omg - k * Va

    vTe = jnp.sqrt(Te[..., None, None] / ME_KEV)  # [G,1,1]
    klde = (vTe / omgpe) * k
    xie = omgdop / (k * vTe) - ud / vTe  # [G,L,A]
    return omgL, k, omgdop, vTe, klde, xie


@jax.custom_vjp
def _kinematics_cvjp(sarad, omgs, ne, Te, lam, Va, ud):
    """``_kinematics_fields`` with an analytic one-pass reverse rule.

    Why: the kinematics maps 5 per-lineout scalars to six [G, L, A] fields,
    and XLA's transposed chain rule materializes a tuple of [B, G, L, A]
    intermediate cotangents per scalar (measured ~2.3 ms of the ~18 ms bench
    fit step, the largest non-kernel cluster — docs/performance.md).  The
    analytic rule recomputes the cheap fields from the saved scalars and
    reduces the four incoming [G, L, A] cotangents in one fused pass, writing
    only scalar-sized outputs.  Dispatched on TPU only (same gate as the
    Pallas kernels: ``custom_vjp`` has no forward-mode rule, and the CPU-f64
    hessian/golden paths keep plain autodiff).
    """
    return _kinematics_fields(sarad, omgs, ne, Te, lam, Va, ud)


def _kin_fwd(sarad, omgs, ne, Te, lam, Va, ud):
    return _kinematics_fields(sarad, omgs, ne, Te, lam, Va, ud), (sarad, omgs, ne, Te, lam, Va, ud)


def _kin_bwd(res, cts):
    sarad, omgs, ne, Te, lam, Va, ud = res
    gL_in, gk, gd, gv, ge, gx = cts

    # recompute the forward fields (cheap; fuses into the reduction pass)
    omgL = OMGL_NUM / lam
    ne_e = ne[..., None, None]
    omgpe = PLASMA_FREQ_CONST * jnp.sqrt(ne_e)
    ks = jnp.sqrt(omgs**2 - omgpe**2) / C
    kL = jnp.sqrt(omgL**2 - omgpe**2) / C
    costh = jnp.cos(sarad)
    k = jnp.sqrt(ks**2 + kL**2 - 2.0 * ks * kL * costh)
    omgdop = (omgs - omgL) - k * Va
    vTe = jnp.sqrt(Te[..., None, None] / ME_KEV)
    inv_kvTe = 1.0 / (k * vTe)
    xie = omgdop * inv_kvTe - ud / vTe

    # accumulate the total cotangents on the intermediate fields
    gd_tot = gd + gx * inv_kvTe  # xie = omgdop/(k vTe) - ud/vTe
    gk_tot = (
        gk
        - Va * gd_tot  # omgdop = omg - k Va
        - gx * omgdop * inv_kvTe / k  # d xie/d k at fixed omgdop
        + ge * (vTe / omgpe)  # klde = vTe k / omgpe
    )
    # k = sqrt(ks^2 + kL^2 - 2 ks kL cos): dk/dks=(ks-kL c)/k, dk/dkL=(kL-ks c)/k
    dk_dks = (ks - kL * costh) / k
    dk_dkL = (kL - ks * costh) / k

    # ne:  omgpe = Cp sqrt(ne); dks/domgpe = -omgpe/(C^2 ks); dkL likewise;
    #      dklde/domgpe = -vTe k/omgpe^2; domgpe/dne = omgpe/(2 ne)
    g_omgpe = gk_tot * (dk_dks * (-omgpe / (C**2 * ks)) + dk_dkL * (-omgpe / (C**2 * kL))) + ge * (
        -vTe * k / omgpe**2
    )
    g_ne = jnp.reshape(
        jnp.sum(g_omgpe * (omgpe / (2.0 * ne_e)), axis=(-1, -2)), jnp.shape(ne)
    )

    # Te:  vTe = sqrt(Te/me); dvTe/dTe = 1/(2 vTe me); dxie/dvTe = -xie/vTe
    g_vTe = gv + jnp.sum(ge * (k / omgpe) + gx * (-xie / vTe), axis=(-1, -2), keepdims=True)
    g_Te = jnp.reshape(
        jnp.sum(g_vTe / (2.0 * vTe * ME_KEV), axis=(-1, -2)), jnp.shape(Te)
    )

    # lam: omgL = OMGL_NUM/lam; omg = omgs - omgL; dkL/domgL = omgL/(C^2 kL)
    g_omgL = jnp.sum(gL_in) - jnp.sum(gd_tot) + jnp.sum(gk_tot * dk_dkL * (omgL / (C**2 * kL)))
    g_lam = jnp.reshape(g_omgL * (-OMGL_NUM / lam**2), jnp.shape(lam))

    g_Va = jnp.reshape(jnp.sum(gd_tot * (-k)), jnp.shape(Va))
    g_ud = jnp.reshape(jnp.sum(gx * (-1.0 / vTe)), jnp.shape(ud))

    return (jnp.zeros_like(sarad), jnp.zeros_like(omgs), g_ne, g_Te, g_lam, g_Va, g_ud)


_kinematics_cvjp.defvjp(_kin_fwd, _kin_bwd)


def _use_kinematics_vjp():
    """Gate for ALL analytic custom-VJP dispatches in this module (kinematics
    and spectrum assembly): TPU-only, and off inside hessian traces (same gate
    as Pallas dispatch: ``custom_vjp`` cannot be forward-differentiated)."""
    return dispatch_backend() == "tpu" and pallas_enabled()


def _unbroadcast(g, shape):
    """Sum a full-shape cotangent down to a broadcast input's shape."""
    if jnp.shape(g) == tuple(shape):
        return g
    # leading axes that were added by broadcasting
    extra = len(jnp.shape(g)) - len(shape)
    if extra > 0:
        g = jnp.sum(g, axis=tuple(range(extra)))
    # size-1 axes that were stretched
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and jnp.shape(g)[i] != 1)
    if axes:
        g = jnp.sum(g, axis=axes, keepdims=True)
    return jnp.reshape(g, shape)


def _assemble_fields(k_mag, ceR, ceI, ciR, ciI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne, lams):
    """``_assemble_spectrum``'s math on real/imag-split susceptibilities.

    Shared primal for the analytic assembly VJP (``_assemble_cvjp``); the
    non-TPU path keeps the complex formulation in ``_assemble_spectrum``
    (equal up to |z|^2 = sqrt(re^2+im^2)^2 vs re^2+im^2 rounding).
    Physics parity: reference form_factor.py:273-298.
    """
    epsR = 1.0 + ceR + ciR
    epsI = ceI + ciI
    E2 = epsR**2 + epsI**2
    AE2 = ceR**2 + ceI**2  # |chiE|^2
    BI2 = (1.0 + ciR) ** 2 + ciI**2  # |1 + chiI|^2

    icf = jnp.transpose(fract * Z**2 / Zbar / vTi, [1, 0, 2, 3])
    ion_comp = icf * (AE2[..., None] * jnp.exp(-(xii**2)) / jnp.sqrt(2.0 * jnp.pi))
    ele_comp = BI2 * fe_vphi / vTe

    SKW_ion = jnp.sum(1.0 / k_mag[..., None] * ion_comp / E2[..., None], axis=3)
    SKW_ele = 1.0 / k_mag * ele_comp / E2

    PsOmg = (SKW_ion + SKW_ele) * (1.0 + 2.0 * omgdop / omgL) * RE_CM**2 * ne[:, None, None]
    return PsOmg * 2.0 * jnp.pi * C / lams**2


@jax.custom_vjp
def _assemble_cvjp(k_mag, ceR, ceI, ciR, ciI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne, lams):
    """``_assemble_fields`` with an analytic one-pass reverse rule.

    Why: the S(k, omega) assembly is a chain of ~10 elementwise stages over
    [G, L, A](,S) fields, and XLA's transposed chain rule runs it as many
    separate HBM-bound fusions (~2.2 ms/iteration of the bench fit step,
    the largest remaining non-kernel cluster after the kinematics VJP —
    docs/performance.md).  The analytic rule recomputes the cheap forward
    fields from the saved inputs and emits every input cotangent in one
    fused elementwise pass.  Dispatched on TPU only (``_use_kinematics_vjp``
    gate); CPU/hessian paths keep plain autodiff of the complex form.
    Used by both the 1V ``__call__`` and the 2V ``calc_in_2D`` assembly.
    """
    return _assemble_fields(k_mag, ceR, ceI, ciR, ciI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne, lams)


def _asm_fwd(*args):
    return _assemble_fields(*args), args


def _asm_bwd(res, g):
    k_mag, ceR, ceI, ciR, ciI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne, lams = res

    # recompute the forward fields (cheap; fuses into the cotangent pass)
    invk = 1.0 / k_mag
    epsR = 1.0 + ceR + ciR
    epsI = ceI + ciI
    E2 = epsR**2 + epsI**2
    invE2 = 1.0 / E2
    AE2 = ceR**2 + ceI**2
    BI2 = (1.0 + ciR) ** 2 + ciI**2
    G2 = jnp.exp(-(xii**2)) / jnp.sqrt(2.0 * jnp.pi)  # [G,L,A,S]
    icf = jnp.transpose(fract * Z**2 / Zbar / vTi, [1, 0, 2, 3])  # [1,1,1,S]
    SA = jnp.sum(icf * G2, axis=3)  # [G,L,A]
    base = invk * invE2
    ele_over_vTe = BI2 * fe_vphi / vTe
    SKW_ion = AE2 * SA * base
    SKW_ele = ele_over_vTe * base
    S = SKW_ion + SKW_ele
    w2 = 1.0 + 2.0 * omgdop / omgL
    nee = ne[:, None, None]
    wl = 2.0 * jnp.pi * C / lams**2

    # PsLam = S * w2 * RE^2 * nee * wl
    gs = g * wl * RE_CM**2  # cotangent on (S * w2 * nee)
    gS = gs * w2 * nee  # cotangent on both SKW terms
    g_w2 = gs * S * nee
    g_omgdop = g_w2 * (2.0 / omgL)
    g_omgL = jnp.reshape(
        jnp.sum(g_w2 * (-2.0 * omgdop / omgL**2)), jnp.shape(omgL)
    )
    g_ne = jnp.reshape(_unbroadcast(gs * S * w2, jnp.shape(nee)), jnp.shape(ne))

    # SKW_ion = AE2 * SA * base ; SKW_ele = BI2 * fe / vTe * base
    g_AE2 = gS * SA * base
    g_SA = gS * AE2 * base
    g_BI2 = gS * fe_vphi / vTe * base
    g_fe = gS * BI2 / vTe * base
    g_vTe = _unbroadcast(-gS * SKW_ele / vTe, jnp.shape(vTe))
    g_base = gS * (AE2 * SA + ele_over_vTe)
    g_k = -g_base * invE2 * invk**2
    g_E2 = -g_base * invk * invE2**2

    g_epsR = 2.0 * epsR * g_E2
    g_epsI = 2.0 * epsI * g_E2
    g_ceR = g_epsR + 2.0 * ceR * g_AE2
    g_ceI = g_epsI + 2.0 * ceI * g_AE2
    g_ciR = g_epsR + 2.0 * (1.0 + ciR) * g_BI2
    g_ciI = g_epsI + 2.0 * ciI * g_BI2

    # SA = sum_s icf[s] G2[s];  G2 = exp(-xii^2)/sqrt(2pi)
    g_xii = g_SA[..., None] * icf * G2 * (-2.0 * xii)
    g_icf = _unbroadcast(g_SA[..., None] * G2, jnp.shape(icf))
    # icf = transpose(fract Z^2 / (Zbar vTi)); the [1,0,2,3] transpose is its
    # own inverse, so the cotangent transposes straight back
    g_icf_t = jnp.transpose(g_icf, [1, 0, 2, 3])
    pre = fract * Z**2 / Zbar / vTi
    g_fract = _unbroadcast(g_icf_t * Z**2 / Zbar / vTi, jnp.shape(fract))
    g_Z = _unbroadcast(g_icf_t * 2.0 * Z * fract / Zbar / vTi, jnp.shape(Z))
    g_vTi = _unbroadcast(-g_icf_t * pre / vTi, jnp.shape(vTi))
    g_Zbar = jnp.reshape(jnp.sum(-g_icf_t * pre / Zbar), jnp.shape(Zbar))

    return (
        g_k,
        g_ceR,
        g_ceI,
        g_ciR,
        g_ciI,
        g_fe,
        g_vTe,
        g_xii,
        g_vTi,
        g_Z,
        g_fract,
        g_Zbar,
        g_omgdop,
        g_omgL,
        g_ne,
        jnp.zeros_like(lams),  # lams is the constant output axis
    )


_assemble_cvjp.defvjp(_asm_fwd, _asm_bwd)


# --------------------------------------------------------------------------
# Fused reduced tail: lookup outputs -> angle-weighted, gradient-averaged
# spectrum, as ONE custom-VJP boundary.
#
# Why a third (outer) analytic VJP: the per-stage custom VJPs above
# (`_kinematics_cvjp`, `_assemble_cvjp`) save their INPUTS as residuals — a
# dozen computed [G, L, A](,S) fields per form-factor instance (ceR/ceI,
# fe_vphi, xii, omgdop, ...) that XLA must therefore materialize to HBM
# between the forward and backward passes (~21 MB each at bench shapes).
# Treating the whole tail — kinematics + ion susceptibility + df chain +
# S(k, omega) assembly + the angle/gradient reduction — as one differentiable
# unit shrinks the residual set to exactly the two table-lookup outputs plus
# the per-lineout scalars; everything else is recomputed inside the one-pass
# backward, where it fuses with the cotangent math instead of round-tripping
# HBM.  Folding the reduction in also means the incoming cotangent is [L]
# rather than [G, L, A].  Reference semantics: form_factor.py:201-298 +
# generate_spectra.py:194-197 (the non-angular weighted angle sum).
# --------------------------------------------------------------------------


def _ion_fields(omgdop, k_mag, ne, Z, Ti, fract, A):
    """Real/imag-split ion susceptibility fields (reference form_factor.py:231-249).

    The SINGLE implementation: ``FormFactor._ion_susceptibility`` wraps this
    as ``ciR + 1j*ciI`` and the fused reduced-tail path consumes the split
    parts directly, so the two paths stay bitwise-equal by construction."""
    Mi = A * MP_KEV
    Zbar = jnp.sum(Z * fract)
    ni = fract * ne[..., None, None, None] / Zbar  # [G,1,1,S]
    omgpi = PLASMA_FREQ_CONST * Z * jnp.sqrt(ni * ME_KEV / Mi)
    vTi = jnp.sqrt(Ti / Mi)  # [1,1,1,S]
    kldi = (vTi / omgpi) * k_mag[..., None]  # [G,L,A,S]
    xii = (omgdop / k_mag)[..., None] / (jnp.sqrt(2.0) * vTi)
    ZpiR, ZpiI = zprime(xii)
    ciR = jnp.sum(-0.5 / (kldi**2) * ZpiR, axis=3)  # [G,L,A]
    ciI = jnp.sum(-0.5 / (kldi**2) * ZpiI, axis=3)
    return ciR, ciI, xii, vTi, Zbar, kldi, omgpi, ni, Mi


def _reduced_tail(lf, chiERraw, ne, Te, lam, Va, ud, A, Z, Ti, fract, weights, sarad, omgs):
    """Angle-weighted, gradient-averaged spectrum [L] from the two lookups.

    Same operations in the same order as ``_spectrum_tail`` followed by
    ``sum(mean(PsLam, 0) * weights, -1)`` (the SpectrumModel reduction), so the
    forward is bitwise-equal to the composed path on every backend.
    """
    omgL, k, omgdop, vTe, klde, xie = _kinematics_fields(sarad, omgs, ne, Te, lam, Va, ud)
    ciR, ciI, xii, vTi, Zbar = _ion_fields(omgdop, k, ne, Z, Ti, fract, A)[:5]

    fe_vphi = jnp.exp(lf)
    df = jnp.diff(fe_vphi, 1, axis=1) / jnp.diff(xie, 1, axis=1)
    df = jnp.concatenate([df, jnp.zeros_like(df[:, :1, :])], axis=1)
    # Landau sign: see the 1V chiEI comment in _spectrum_tail (KK-consistent minus)
    ceR = -1.0 / (klde**2) * chiERraw
    ceI = -jnp.pi / (klde**2) * df

    lams = 2.0 * jnp.pi * C / omgs
    PsLam = _assemble_fields(
        k, ceR, ceI, ciR, ciI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne, lams
    )
    return jnp.sum(jnp.mean(PsLam, axis=0) * weights, axis=1)


@jax.custom_vjp
def _reduced_tail_cvjp(lf, chiERraw, ne, Te, lam, Va, ud, A, Z, Ti, fract, weights, sarad, omgs):
    """``_reduced_tail`` with a one-pass analytic reverse rule.

    Residuals are the primal INPUTS only (two [G, L, A] fields + scalars); the
    backward recomputes every intermediate and emits all cotangents in one
    fused pass, composing ``_asm_bwd`` and ``_kin_bwd`` with analytic rules
    for the two stages those don't cover (the ion-susceptibility chain through
    Z' and the df spectral-difference chain).  ``A``/``weights``/grid constants
    get zero cotangents (non-trainable by convention).  TPU-only dispatch —
    CPU/f64 and hessian traces use the plain-autodiff ``_reduced_tail``.
    """
    return _reduced_tail(lf, chiERraw, ne, Te, lam, Va, ud, A, Z, Ti, fract, weights, sarad, omgs)


def _rt_fwd(*args):
    return _reduced_tail(*args), args


def _rt_bwd(res, g):
    lf, chiERraw, ne, Te, lam, Va, ud, A, Z, Ti, fract, weights, sarad, omgs = res

    # ---- recompute the forward fields (no HBM residuals; fuses with the
    # cotangent math below, and XLA CSEs the shared subexpressions)
    omgL, k, omgdop, vTe, klde, xie = _kinematics_fields(sarad, omgs, ne, Te, lam, Va, ud)
    ciR, ciI, xii, vTi, Zbar, kldi, omgpi, ni, Mi = _ion_fields(omgdop, k, ne, Z, Ti, fract, A)
    from .zprime import dawsn

    Dx = dawsn(xii)
    exii2 = jnp.exp(-(xii**2))
    ZpiR = -2.0 * (1.0 - 2.0 * xii * Dx)
    ZpiI = -2.0 * jnp.sqrt(jnp.pi) * xii * exii2
    ikldi2 = 1.0 / kldi**2
    iklde2 = 1.0 / klde**2

    fe_vphi = jnp.exp(lf)
    dxie = jnp.diff(xie, 1, axis=1)
    rinv = 1.0 / dxie
    df_core = (fe_vphi[:, 1:, :] - fe_vphi[:, :-1, :]) * rinv  # [G,L-1,A]
    zcol = jnp.zeros_like(df_core[:, :1, :])
    df = jnp.concatenate([df_core, zcol], axis=1)
    ceR = -iklde2 * chiERraw
    ceI = -jnp.pi * iklde2 * df
    lams = 2.0 * jnp.pi * C / omgs

    # ---- broadcast the reduced cotangent back over (grad, angle)
    num_grad = lf.shape[0]
    gPs = (g[None, :, None] * weights) / num_grad  # [1,L,A], broadcasts to [G,L,A]

    # ---- assembly backward (shared with _assemble_cvjp)
    asm_res = (k, ceR, ceI, ciR, ciI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne, lams)
    (
        g_k_asm,
        g_ceR,
        g_ceI,
        g_ciR,
        g_ciI,
        g_fe_asm,
        g_vTe_asm,
        g_xii_asm,
        g_vTi_asm,
        g_Z_asm,
        g_fract_asm,
        g_Zbar_asm,
        g_omgdop_asm,
        g_omgL_asm,
        g_ne_asm,
        _g_lams,
    ) = _asm_bwd(asm_res, gPs)

    # ---- electron chi chain: ceR = -chiERraw/klde^2, ceI = -pi df/klde^2
    g_chiERraw = -g_ceR * iklde2
    g_df = -jnp.pi * iklde2 * g_ceI
    g_iklde2 = -g_ceR * chiERraw - jnp.pi * df * g_ceI
    g_klde = -2.0 * g_iklde2 * iklde2 / klde

    # ---- df spectral-difference chain (along the lambda axis)
    g_df_core = g_df[:, :-1, :]  # df's appended last column is a constant 0
    t = g_df_core * rinv
    u = t * df_core
    g_fv_df = jnp.concatenate([-t, zcol], axis=1) + jnp.concatenate([zcol, t], axis=1)
    g_xie_df = jnp.concatenate([u, zcol], axis=1) - jnp.concatenate([zcol, u], axis=1)
    g_lf = (g_fe_asm + g_fv_df) * fe_vphi

    # ---- ion susceptibility chain: ci{R,I} = sum_s -0.5 Zp{R,I} / kldi^2
    g_ciR_e = g_ciR[..., None]
    g_ciI_e = g_ciI[..., None]
    g_ZpR = -0.5 * ikldi2 * g_ciR_e
    g_ZpI = -0.5 * ikldi2 * g_ciI_e
    g_ikldi2 = -0.5 * (ZpiR * g_ciR_e + ZpiI * g_ciI_e)
    g_kldi = -2.0 * g_ikldi2 * ikldi2 / kldi
    # dZ'/dxi from the Dawson identity D' = 1 - 2 x D (see zprime.py)
    dZpR = 4.0 * Dx + 4.0 * xii * (1.0 - 2.0 * xii * Dx)
    dZpI = -2.0 * jnp.sqrt(jnp.pi) * exii2 * (1.0 - 2.0 * xii**2)
    g_xii = g_xii_asm + g_ZpR * dZpR + g_ZpI * dZpI
    # xii = (omgdop/k) / (sqrt(2) vTi)
    ke = k[..., None]
    g_omgdop_i = jnp.sum(g_xii / (jnp.sqrt(2.0) * vTi * ke), axis=3)
    g_k_i = jnp.sum(-g_xii * xii / ke, axis=3)
    g_vTi = g_vTi_asm + jnp.sum(-g_xii * xii / vTi, axis=(0, 1, 2), keepdims=True)
    # kldi = vTi k / omgpi
    g_k_i = g_k_i + jnp.sum(g_kldi * vTi / omgpi, axis=3)
    g_vTi = g_vTi + jnp.sum(g_kldi * ke / omgpi, axis=(0, 1, 2), keepdims=True)
    g_omgpi = jnp.sum(-g_kldi * kldi / omgpi, axis=(1, 2), keepdims=True)  # [G,1,1,S]
    # omgpi = Cp Z sqrt(ni me/Mi): d/dni = omgpi/(2 ni), d/dZ = omgpi/Z
    g_ni = g_omgpi * omgpi / (2.0 * ni)
    g_Z_i = jnp.sum(g_omgpi * omgpi / Z, axis=0, keepdims=True)  # [1,1,1,S]
    # ni = fract ne / Zbar
    ne_e = ne[..., None, None, None]
    g_fract_i = jnp.sum(g_ni * ne_e / Zbar, axis=0, keepdims=True)
    g_ne_i = jnp.sum(g_ni * fract / Zbar, axis=(1, 2, 3))  # [G]
    g_Zbar_i = jnp.sum(-g_ni * ni / Zbar)
    # vTi = sqrt(Ti/Mi); Zbar = sum_s Z fract
    g_Ti = g_vTi / (2.0 * vTi * Mi)
    g_Zbar = g_Zbar_asm + jnp.reshape(g_Zbar_i, jnp.shape(g_Zbar_asm))
    g_Z = g_Z_asm + g_Z_i + g_Zbar * fract
    g_fract = g_fract_asm + g_fract_i + g_Zbar * Z

    # ---- kinematics backward (shared with _kinematics_cvjp)
    _, _, g_ne_kin, g_Te, g_lam, g_Va, g_ud = _kin_bwd(
        (sarad, omgs, ne, Te, lam, Va, ud),
        (g_omgL_asm, g_k_asm + g_k_i, g_omgdop_asm + g_omgdop_i, g_vTe_asm, g_klde, g_xie_df),
    )
    g_ne = g_ne_kin + g_ne_asm + g_ne_i

    return (
        g_lf,
        g_chiERraw,
        g_ne,
        g_Te,
        g_lam,
        g_Va,
        g_ud,
        jnp.zeros_like(A),
        g_Z,
        g_Ti,
        g_fract,
        jnp.zeros_like(weights),
        jnp.zeros_like(sarad),
        jnp.zeros_like(omgs),
    )


_reduced_tail_cvjp.defvjp(_rt_fwd, _rt_bwd)


# --------------------------------------------------------------------------
# Pallas dispatch of the reduced tail (ops/spectrum_kernel.py): the same
# math as _reduced_tail/_rt_bwd with every intermediate VMEM-resident.
# Array semantics of _tail_kernel_op (per lineout; rows = (grad, angle),
# G-major, wavelengths on lanes):
#   lf, chi [GA, L]; rsc [GA, 8] = (ne, Te, cos sarad, w/G, 0...);
#   scal [8] = (lam, Va, ud, 0...); spp [4, S] = (Z, Ti, fract, A);
#   omgs [L]  ->  reduced [L].
# custom_vmap routes vmapped calls to the kernel's explicit batch grid
# (vmap-lifting an unbatched pallas_call is the known ~300x pathology).
# --------------------------------------------------------------------------

from jax import custom_batching as _custom_batching


@_custom_batching.custom_vmap
def _tail_kernel_fwd_core(lf, chi, rsc, scal, spp, omgs):
    from ...ops.spectrum_kernel import spectrum_tail_pallas

    return spectrum_tail_pallas(
        lf[None], chi[None], rsc[None], scal[None], spp[None], omgs[None]
    )[0]


@_tail_kernel_fwd_core.def_vmap
def _tail_kernel_fwd_vmap(axis_size, in_batched, *args):
    from ...ops.spectrum_kernel import spectrum_tail_pallas

    args = [
        a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    ]
    return spectrum_tail_pallas(*args), True


@_custom_batching.custom_vmap
def _tail_kernel_bwd_core(lf, chi, rsc, scal, spp, omgs, g):
    from ...ops.spectrum_kernel import spectrum_tail_pallas_bwd

    outs = spectrum_tail_pallas_bwd(
        lf[None], chi[None], rsc[None], scal[None], spp[None], omgs[None], g[None]
    )
    return tuple(o[0] for o in outs)


@_tail_kernel_bwd_core.def_vmap
def _tail_kernel_bwd_vmap(axis_size, in_batched, *args):
    from ...ops.spectrum_kernel import spectrum_tail_pallas_bwd

    args = [
        a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    ]
    return spectrum_tail_pallas_bwd(*args), (True,) * 4


@jax.custom_vjp
def _tail_kernel_op(lf, chi, rsc, scal, spp, omgs):
    return _tail_kernel_fwd_core(lf, chi, rsc, scal, spp, omgs)


def _tail_kernel_vjp_fwd(lf, chi, rsc, scal, spp, omgs):
    return _tail_kernel_fwd_core(lf, chi, rsc, scal, spp, omgs), (lf, chi, rsc, scal, spp, omgs)


def _tail_kernel_vjp_bwd(res, g):
    lf, chi, rsc, scal, spp, omgs = res
    g_lf, g_chi, g_rsc, g_misc = _tail_kernel_bwd_core(lf, chi, rsc, scal, spp, omgs, g)
    S = spp.shape[-1]
    g_scal = jnp.concatenate([g_misc[:3], jnp.zeros(5, g_misc.dtype)])
    g_spp = jnp.stack(
        [
            g_misc[8 : 8 + 3 * S : 3],
            g_misc[9 : 9 + 3 * S : 3],
            g_misc[10 : 10 + 3 * S : 3],
            jnp.zeros(S, g_misc.dtype),
        ]
    )
    return g_lf, g_chi, g_rsc, g_scal, g_spp, jnp.zeros_like(omgs)


_tail_kernel_op.defvjp(_tail_kernel_vjp_fwd, _tail_kernel_vjp_bwd)


# Pallas reduced-tail dispatch: MEASURED NEGATIVE, off by default.  Same-window
# A/B on v5e at bench shapes (B=512, L=1024, GA=10): forward 10.57 vs 10.15 ms,
# fit step 22.23 vs 21.87 ms — the kernel LOSES 2-4% to the jnp custom-VJP path
# (`_reduced_tail_cvjp`).  Unlike the interp kernels (which replaced one-hot
# matmuls whose [Q, 27] intermediates round-tripped HBM), this tail is pure
# elementwise math that XLA already fuses into a handful of full-bandwidth loop
# fusions; the Pallas version adds sublane padding (GA=10 -> 16 rows) and
# per-lineout grid overhead with no traffic left to save.  At whole-shot shapes
# (B=128, L=5120) the backward kernel's live set (forward recompute + all
# cotangents, ~22 MB) exceeds Mosaic's 16 MB scoped-VMEM limit and fails to
# compile.  Kept tested-unwired (tests/test_physics/test_spectrum_kernel.py
# pins fwd + every cotangent in interpret mode) as the negative-result record.
TAIL_PALLAS = False


def _reduced_tail_pallas(lf, chiERraw, ne, Te, lam, Va, ud, A, Z, Ti, fract, weights, sarad, omgs):
    """``_reduced_tail`` routed through the fused Pallas kernel.

    Packs the [G, L, A] fields into the kernel's row layout ((g, a) pairs
    G-major on sublanes, wavelengths on lanes) with plain jnp ops, so JAX's
    own AD of the packing maps the kernel's row/slot cotangents back onto
    the original arguments (e.g. the per-row ne cotangent sums over the
    angle sub-axis through the broadcast transpose).  weights/sarad/omgs/A
    get zero cotangents, matching ``_reduced_tail_cvjp``.
    """
    G, L, nA = lf.shape
    dt = lf.dtype
    lf2 = jnp.transpose(lf, (0, 2, 1)).reshape(G * nA, L)
    chi2 = jnp.transpose(chiERraw, (0, 2, 1)).reshape(G * nA, L)
    cols = [
        jnp.broadcast_to(ne[:, None], (G, nA)),
        jnp.broadcast_to(Te[:, None], (G, nA)),
        jnp.broadcast_to(jnp.cos(sarad).reshape(1, nA), (G, nA)),
        # weights may be scalar (the reference's `weights[0]` on a 1-D array
        # indexes one weight), [A], or [1, A] — the wrow slot encodes all three
        jnp.broadcast_to(jnp.asarray(weights).reshape(-1)[None, :].astype(dt) / G, (G, nA))
        if jnp.size(weights) == nA
        else jnp.broadcast_to(jnp.reshape(weights, ()).astype(dt) / G, (G, nA)),
    ] + [jnp.zeros((G, nA), dt)] * 4
    rsc = jnp.stack(cols, axis=-1).reshape(G * nA, 8)
    scal = jnp.concatenate(
        [jnp.stack([jnp.reshape(x, ()) for x in (lam, Va, ud)]).astype(dt), jnp.zeros(5, dt)]
    )
    spp = jnp.stack(
        [jnp.reshape(x, (-1,)).astype(dt) for x in (Z, Ti, fract, A)]
    )
    return _tail_kernel_op(lf2, chi2, rsc, scal, spp, omgs.reshape(L).astype(dt))


def _use_tail_kernel(lf, weights, omgs):
    """Gate for the Pallas reduced-tail: TPU f32, Pallas enabled (hessian /
    sigma traces disable it — pallas_call has no JVP rule), lane-aligned L,
    and a weight shape the kernel's wrow slot encodes (scalar — the
    reference's ``weights[0]`` on a 1-D array indexes ONE weight — or a
    per-angle vector)."""
    G, L, nA = lf.shape
    return (
        TAIL_PALLAS
        and dispatch_backend() == "tpu"
        and pallas_enabled()
        and lf.dtype == jnp.float32
        and L % 128 == 0
        and jnp.size(weights) in (1, nA)
        and omgs.size == L
    )


class FormFactor:
    """Spectral density function calculator.

    Args:
        lambda_range: (start, end) wavelengths [nm] for the spectrum.
        npts: number of wavelength points.
        lam_shift: spectral shift applied to the probe wavelength [nm].
        scattering_angles: dict with "sa" (angles, degrees) and optionally weights.
        num_grad_points: number of plasma-gradient sample points.
        ud_ang: angle of electron drift from x-axis [deg] (2V only).
        va_ang: angle of ion flow from x-axis [deg] (2V only).
        num_beta: angle-grid resolution for the 2V projection tables.
        mode: "table" (fast 2V path) or "exact" (per-point reference semantics).
            On TPU, "exact" falls back to "table" with a warning — per-point
            lax.map lowers pathologically there (~100x); pass
            allow_exact_on_tpu=True to force it anyway.
        allow_exact_on_tpu: opt out of the TPU exact-mode fallback.
    """

    def __init__(
        self,
        lambda_range,
        npts,
        lam_shift,
        scattering_angles,
        num_grad_points,
        ud_ang=None,
        va_ang=None,
        num_beta=256,
        mode="table",
        projection="fourier",
        shard_points=False,
        allow_exact_on_tpu=False,
    ):
        self.npts = npts
        # xi grids for the electron chi_R pole sweep (reference form_factor.py:128-138).
        self.h = 0.01
        minmax = 8.2
        h1 = 1024
        lamAxis = np.linspace(lambda_range[0], lambda_range[1], npts)
        self.omgL_num = OMGL_NUM
        omgs = 2.0e7 * np.pi * C / lamAxis  # scattered frequency axis [1/s]
        self.omgs = jnp.asarray(omgs)[None, :, None]  # [1, L, 1]
        self.lamAxis = jnp.asarray(lamAxis)[None, :, None]

        xi1 = np.linspace(-minmax - math.sqrt(2.0) / h1, minmax + math.sqrt(2.0) / h1, h1)
        self.xi1 = jnp.asarray(xi1)
        self.dxi1 = float(xi1[1] - xi1[0])
        self.xi2 = jnp.asarray(np.arange(-minmax, minmax, self.h))
        # static precombined PV matrices for the chi_R pole sweep (see
        # ratint.pv_combined_kernel): midpoint poles + interleaved node poles
        # give a table spacing of dxi1/2 ~ 0.008, denser than the reference's
        # 0.01 xi2 grid; each table is one [.., h1] @ [h1, h1-2] matmul
        self._pv_kmid, self._pv_knode = ratint.pv_combined_kernels(h1 - 2)
        self._pv_mid_poles = jnp.asarray(0.5 * (xi1[1:-1] + xi1[0:-2]))
        self._pv_node_poles = jnp.asarray(xi1[1 : h1 - 2])

        self.lam_shift = lam_shift
        self.scattering_angles = {k: jnp.asarray(v) for k, v in scattering_angles.items()}
        self.num_grad_points = num_grad_points
        self.ud_angle = ud_ang
        self.va_angle = va_ang
        self.num_beta = num_beta
        if mode == "exact" and jax.default_backend() == "tpu" and not allow_exact_on_tpu:
            # exact mode keeps the reference's per-point lax.map semantics —
            # the exact pattern the TPU compiler lowers pathologically
            # (orders of magnitude slower than table mode; CLAUDE.md).  Table
            # mode agrees with exact to ~2e-3 of peak (tests/test_physics),
            # so silently eating a ~100x slowdown is the worse default.
            import warnings

            warnings.warn(
                "FormFactor(mode='exact') on TPU falls back to mode='table': per-point "
                "lax.map lowers pathologically on this backend.  Pass "
                "allow_exact_on_tpu=True to force exact mode (expect a large slowdown).",
                stacklevel=2,
            )
            mode = "table"
        self.mode = mode
        self.projection = projection  # "fourier" (slice-theorem Radon) | "rotate"
        # multi-device data parallelism over the 2V chi evaluation points
        # (TPU-native equivalent of the reference's NamedSharding device_put,
        # form_factor.py:147-161, 431-447): a sharding constraint lets GSPMD
        # split the per-point gather work across the mesh while the (small)
        # projection/chi tables stay replicated.
        self._point_sharding = None
        if shard_points and jax.device_count() > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            mesh = Mesh(np.array(jax.devices()), axis_names=("points",))
            self._point_sharding = NamedSharding(mesh, P("points"))

    # ------------------------------------------------------------------ common

    def _gradients(self, params):
        """ne [G], Te [G] profiles from gradient percentages (form_factor.py:182-195)."""
        g = jnp.linspace(
            1.0 - params["general"]["ne_gradient"] / 200.0,
            1.0 + params["general"]["ne_gradient"] / 200.0,
            self.num_grad_points,
        )
        ne = 1.0e20 * params["electron"]["ne"] * g
        t = jnp.linspace(
            1.0 - params["general"]["Te_gradient"] / 200.0,
            1.0 + params["general"]["Te_gradient"] / 200.0,
            self.num_grad_points,
        )
        Te = params["electron"]["Te"] * t
        return ne, Te

    @staticmethod
    def _ion_arrays(params):
        """Stack per-species ion params to [1,1,1,S] (form_factor.py:197-200, 231-239)."""
        keys = [k for k in params.keys() if "ion" in k]
        A = jnp.stack([jnp.asarray(params[k]["A"], dtype=jnp.result_type(float)) for k in keys])
        Z = jnp.stack([jnp.asarray(params[k]["Z"], dtype=jnp.result_type(float)) for k in keys])
        Ti = jnp.stack([jnp.asarray(params[k]["Ti"], dtype=jnp.result_type(float)) for k in keys])
        fract = jnp.stack([jnp.asarray(params[k]["fract"], dtype=jnp.result_type(float)) for k in keys])
        rs = lambda x: x.reshape(1, 1, 1, -1)
        return rs(A), rs(Z), rs(Ti), rs(fract)

    def _ion_susceptibility(self, omgdop, k_mag, ne, Z, Ti, fract, A):
        """chi_i summed over species + xii, kldi diagnostics (form_factor.py:231-249).

        Thin complex wrapper over the real/imag-split ``_ion_fields`` — ONE
        set of expressions, so this path and the fused reduced-tail path
        (which needs the split parts) cannot drift apart numerically."""
        ciR, ciI, xii, vTi, Zbar, kldi = _ion_fields(omgdop, k_mag, ne, Z, Ti, fract, A)[:6]
        return ciR + 1j * ciI, xii, kldi, vTi, Zbar

    def _kinematics(self, ne, Te, lam, Va, ud):
        """Scattering kinematics: k, Doppler omega, phase velocities [G, L, A].

        Shared between ``__call__`` (to form the table-lookup queries) and the
        rematerialized ``_spectrum_tail`` (which recomputes them in the
        backward instead of storing them as residuals) — one definition keeps
        the two evaluations bitwise identical.  On TPU (outside hessian
        traces) the analytic custom VJP replaces XLA's transposed chain rule;
        see ``_kinematics_cvjp``.
        """
        sarad = (self.scattering_angles["sa"] * jnp.pi / 180.0).reshape(1, 1, -1)
        if _use_kinematics_vjp():
            return _kinematics_cvjp(sarad, self.omgs, ne, Te, lam, Va, ud)
        return _kinematics_fields(sarad, self.omgs, ne, Te, lam, Va, ud)

    def _spectrum_tail(self, lf, chiERraw, ne, Te, lam, Va, ud, A, Z, Ti, fract):
        """chi combination + S(k, omega) assembly from the two lookup outputs.

        Everything downstream of the two table lookups, behind one clean
        boundary so it can be wrapped in ``jax.checkpoint``
        (``REMAT_SPECTRUM_TAIL``) — which measured NEGATIVE on v5e; see the
        flag comment for the numbers and the reason.
        """
        omgL, k, omgdop, vTe, klde, xie = self._kinematics(ne, Te, lam, Va, ud)
        chiI, xii, kldi, vTi, Zbar = self._ion_susceptibility(omgdop, k, ne, Z, Ti, fract, A)

        fe_vphi = jnp.exp(lf)
        df = jnp.diff(fe_vphi, 1, axis=1) / jnp.diff(xie, 1, axis=1)
        df = jnp.concatenate([df, jnp.zeros_like(df[:, :1, :])], axis=1)
        # electron Landau term: chi_I = -(pi/k^2 lDe^2) f'(xie).  The MINUS sign
        # follows from the same retarded dispersion integral that defines the
        # PV real part (1/(xi' - xi - i0) = P + i pi delta), is required
        # by Kramers-Kronig consistency with chiERrat, and matches the exact
        # Maxwellian Z-function susceptibility (validated against scipy.wofz).
        # DOCUMENTED DEVIATION: the reference uses +pi (form_factor.py:261),
        # i.e. electron Landau ANTI-damping — invisible in the EPW feature
        # (|Im eps| = |chi_I^e| there) but inflating the ion feature ~10-16%
        # where Im chi_e and Im chi_i must add, which the Salpeter sum-rule
        # test catches (tests/test_physics/test_sum_rule.py).
        chiEI = -1j * jnp.pi / (klde**2) * df

        chiE = -1.0 / (klde**2) * chiERraw + chiEI
        return self._assemble_spectrum(
            k, chiE, chiI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne
        )

    def _assemble_spectrum(self, k_mag, chiE, chiI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne):
        """Final S(k,w) assembly (form_factor.py:273-298).

        On TPU (outside hessian traces) the analytic assembly VJP replaces
        XLA's transposed chain rule; see ``_assemble_cvjp``.  The complex
        formulation below is kept for the CPU/f64 and hessian paths.
        """
        lams = 2.0 * jnp.pi * C / self.omgs
        if _use_kinematics_vjp():
            PsLam = _assemble_cvjp(
                k_mag,
                jnp.real(chiE),
                jnp.imag(chiE),
                jnp.real(chiI),
                jnp.imag(chiI),
                fe_vphi,
                vTe,
                xii,
                vTi,
                Z,
                fract,
                Zbar,
                omgdop,
                omgL,
                ne,
                lams,
            )
            return PsLam, lams

        epsilon = 1.0 + chiE + chiI

        ion_comp_fact = jnp.transpose(fract * Z**2 / Zbar / vTi, [1, 0, 2, 3])
        ion_comp = ion_comp_fact * (
            jnp.abs(chiE[..., None]) ** 2.0 * jnp.exp(-(xii**2)) / jnp.sqrt(2.0 * jnp.pi)
        )
        ele_comp = jnp.abs(1.0 + chiI) ** 2.0 * fe_vphi / vTe

        SKW_ion = jnp.sum(
            1.0 / k_mag[..., None] * ion_comp / (jnp.abs(epsilon[..., None]) ** 2), axis=3
        )
        SKW_ele = 1.0 / k_mag * ele_comp / (jnp.abs(epsilon) ** 2)

        PsOmg = (SKW_ion + SKW_ele) * (1.0 + 2.0 * omgdop / omgL) * RE_CM**2 * ne[:, None, None]
        PsLam = PsOmg * 2.0 * jnp.pi * C / lams**2
        return PsLam, lams

    # -------------------------------------------------------------------- 1V

    def _lookups_1v(self, params):
        """Shared 1V front half: kinematics queries + the two table lookups.

        Returns every input of the spectrum tail: (lf, chiERraw, ne, Te, lam,
        Va, ud, A, Z, Ti, fract).  Factored out of ``__call__`` so the fused
        reduced path (``reduced_1v``) reuses it verbatim.
        """
        ne, Te = self._gradients(params)
        lam = params["general"]["lam"] + self.lam_shift
        Va = params["general"]["Va"] * 1e6  # 1e6 cm/s
        ud = params["general"]["ud"] * 1e6
        fe = jnp.squeeze(params["electron"]["fe"])
        vx = jnp.squeeze(params["electron"]["v"])
        A, Z, Ti, fract = self._ion_arrays(params)

        _, _, _, _, _, xie = self._kinematics(ne, Te, lam, Va, ud)

        # electron susceptibility at xie (form_factor.py:253-271)
        # clamp so exact zeros in the EDF tail cannot poison the log-space interp.
        # The floor must be representable in the WORKING dtype: a literal like
        # 1e-300 underflows to 0.0 in f32 (TPU), silently re-admitting log(0)
        # = -inf, which a single matmul then spreads across the whole lineout.
        tiny = jnp.finfo(jnp.result_type(fe)).tiny
        log_fe = jnp.log(jnp.maximum(fe, tiny))
        if dispatch_backend() == "tpu" and vx.shape[0] > _CUBIC_BLOCKED_MIN_NVX:
            # blocked cubic: same Hermite stencil without materializing the
            # [Q, nvx] weight matrix.  With the fused Pallas kernels this
            # path wins at EVERY production grid (bench fwd 42.5k -> 48.5k
            # spectra/s at nvx=64); the weight-matrix form below only won
            # pre-Pallas, and survives as the small-grid/CPU fallback.
            # NOTE f64 (sigma-Hessian trace): a Hermite-GATHER variant
            # (interp1d_cubic) was tried here and won at B=16 (hessian 19.4
            # -> 16.9 s) but lost 2.5x at the whole-shot B=128 (417 vs ~165
            # s) — its plain-AD scatter-add table cotangents scale badly on
            # this host's scatter-averse XLA:CPU.  Blocked stays for every
            # dtype; do not retry the gather form without B=128 numbers.
            lf = interp1d_cubic_blocked(xie, vx, log_fe)
            lf = jnp.where((xie < vx[0]) | (xie > vx[-1]), -50.0, lf)
        else:
            lf = interp1d_cubic_matmul(xie, vx, log_fe, extrap=(-50.0, -50.0))

        ratmod = jnp.exp(interp1d_cubic_matmul(self.xi1, vx, log_fe, extrap=(-50.0, -50.0)))
        ratdf = jnp.gradient(ratmod, self.dxi1)
        # chi_R table on interleaved midpoint + node poles via the precombined
        # PV matmuls (replaces the dense 1640x1022 pole sweep of the reference,
        # form_factor.py:263-271; see ratint.pv_combined_kernel for why the
        # single-matmul form is both 2x cheaper and far better conditioned
        # than per-stage Toeplitz contractions)
        mid_poles, node_poles = self._pv_mid_poles, self._pv_node_poles
        mid_vals, node_vals = ratint.pv_tables_matmul(ratdf, self._pv_kmid, self._pv_knode)
        n_tab = mid_poles.shape[0] + node_poles.shape[0]
        pv_poles = jnp.zeros(n_tab, mid_poles.dtype).at[0::2].set(mid_poles).at[1::2].set(node_poles)
        chiERratprim = jnp.zeros(n_tab, mid_vals.dtype).at[0::2].set(mid_vals).at[1::2].set(node_vals)
        if dispatch_backend() == "tpu":
            # gather-free two-level one-hot contraction: the axon compiler
            # nondeterministically lowers this batched 1D gather ~500x slow
            # (CLAUDE.md "Open performance lead"); the blocked form is pure
            # MXU/VPU work with matmul transposes in the backward pass
            chiERraw = interp1d_linear_blocked(xie, pv_poles, chiERratprim)
        else:
            chiERraw = interp1d_linear_uniform(xie, pv_poles, chiERratprim)

        return lf, chiERraw, ne, Te, lam, Va, ud, A, Z, Ti, fract

    def __call__(self, params):
        """S(k, omega) for 1D EDFs.  Shapes: [G, L, A] (+[S] internally).

        Parity with the reference ``FormFactor.__call__`` (form_factor.py:163-298).
        """
        inputs = self._lookups_1v(params)
        tail = jax.checkpoint(self._spectrum_tail) if _remat_tail_enabled() else self._spectrum_tail
        return tail(*inputs)

    def reduced_1v(self, params, weights):
        """Angle-weighted, gradient-averaged 1V spectrum via the fused tail.

        Returns ``(reduced [L], lam_axis [1, L, 1] in cm)`` — the same values
        as ``sum(mean(__call__(params)[0], 0) * weights, -1)`` (the
        SpectrumModel reduction for non-angular spectypes), computed through
        ONE custom-VJP boundary on TPU so only the two lookup outputs are
        saved as residuals (see ``_reduced_tail_cvjp``).  Off-TPU and inside
        hessian traces the plain-autodiff primal is used (same forward ops).
        """
        inputs = self._lookups_1v(params)
        sarad = (self.scattering_angles["sa"] * jnp.pi / 180.0).reshape(1, 1, -1)
        if _use_kinematics_vjp():
            tail = (
                _reduced_tail_pallas
                if _use_tail_kernel(inputs[0], weights, self.omgs)
                else _reduced_tail_cvjp
            )
        else:
            tail = _reduced_tail
        reduced = tail(*inputs, weights, sarad, self.omgs)
        lams = 2.0 * jnp.pi * C / self.omgs
        return reduced, lams

    # -------------------------------------------------------------------- 2V

    def rotate(self, vx, df, angle_deg):
        """Rotate a 2D EDF grid so the new x-axis lies along ``angle_deg``.

        Output[a, b] = f evaluated at R(angle) @ (vx[a], vx[b]) in the EDF's
        native frame, i.e. index a runs along the rotated direction.
        (Semantics of reference form_factor.py:300-324 with the axis convention
        documented in utils.vector_tools.rotate_edf.)
        """
        beta = jnp.deg2rad(angle_deg)
        c, s = jnp.cos(beta), jnp.sin(beta)
        S, T = jnp.meshgrid(vx, vx, indexing="ij")  # S[a,b]=vx[a] along beta-hat
        xq = c * S - s * T
        yq = s * S + c * T
        # df is indexed [vy, vx] (EDF convention) -> interp rows=y, cols=x
        return interp2d_cubic(yq.ravel(), xq.ravel(), vx, vx, df, extrap=True).reshape(
            (vx.size, vx.size)
        )

    def _project(self, vx, DF, beta):
        """1D projection of the EDF along direction beta (Radon line integral).

        f1D(t) = int f(t beta_hat + s beta_hat_perp) ds, sampled on the vx grid.
        """
        dvx = vx[1] - vx[0]
        f2 = self.rotate(vx, DF, beta * 180.0 / jnp.pi)
        return jnp.sum(f2, axis=1) * dvx  # integrate over the perpendicular axis

    def _project_all_fourier(self, vx, DF, betas):
        """All 1D projections at once via the Fourier slice theorem.

        The Radon projection's 1D spectrum equals the EDF's 2D spectrum sampled
        along the line at angle beta, so the full [n_beta, nvx] projection stack
        is: one zero-padded fft2, a bilinear sample of n_beta x 2nvx k-space
        points, phase factors for the cell-centered grid offsets, and a batch of
        inverse FFTs.  Replaces n_beta full bicubic rotations of the EDF
        (~250x fewer gathers); exact for band-limited EDFs.
        """
        n = vx.shape[0]
        P = 4 * n  # zero padding: wraparound + k-space interpolation density
        dv = vx[1] - vx[0]
        c = (n - 1) / 2.0  # v = (idx - c) dv on both axes

        F = jnp.fft.fft2(DF, s=(P, P))  # DF indexed [y, x]
        # de-ramp: the EDF is centered mid-array, so F carries a phase ramp
        # e^{-2pi i k c / P} that rotates ~pi per sample and would wreck the
        # bilinear interpolation; dividing it out on the grid and re-applying
        # it at the fractional sample coordinates cancels the center phase
        # analytically, leaving a smooth spectrum to interpolate.
        s_idx = jnp.fft.fftfreq(P) * P  # signed frequency per unshifted index
        ramp = jnp.exp(2j * jnp.pi * c * s_idx / P)
        G = F * ramp[:, None] * ramp[None, :]

        r = jnp.fft.fftfreq(P) * P  # signed output frequency indices [P]
        cosb = jnp.cos(betas)[:, None]
        sinb = jnp.sin(betas)[:, None]
        m_y = r[None, :] * sinb  # [B, P] signed fractional k-space coords
        m_x = r[None, :] * cosb

        # bilinear sample of the periodic smooth spectrum
        fy = jnp.floor(m_y)
        fx = jnp.floor(m_x)
        iy0 = fy.astype(jnp.int32) % P
        ix0 = fx.astype(jnp.int32) % P
        wy = m_y - fy
        wx = m_x - fx
        iy1 = (iy0 + 1) % P
        ix1 = (ix0 + 1) % P
        S = (
            G[iy0, ix0] * (1 - wy) * (1 - wx)
            + G[iy0, ix1] * (1 - wy) * wx
            + G[iy1, ix0] * wy * (1 - wx)
            + G[iy1, ix1] * wy * wx
        )

        # remaining phase: output-grid cell-center offset only
        phase = jnp.exp(-2j * jnp.pi * r[None, :] * c / P)
        p = jnp.fft.ifft(S * phase, axis=-1).real * dv  # [B, P]
        return p[:, :n]

    def _project_all_nudft(self, vx, DF):
        """All 1D projections via an EXACT non-uniform DFT of the central slice.

        The angle grid is FIXED to the canonical ``linspace(0, 2pi, num_beta,
        endpoint=False)`` of ``_chi_tables`` — it is baked into the
        host-precomputed trig tables, which is why this takes no ``betas``
        argument (a betas parameter here would be silently ignored).  Callers
        needing a different grid must use ``_project_all_fourier`` /
        ``_project``.

        Same Fourier-slice math as ``_project_all_fourier`` but the slice
        spectrum S[b, k] = sum_{y,x} DF[y,x] e^{-2pi i r_k (sin(b)(y-c) +
        cos(b)(x-c))/P} is evaluated directly — separable into one batched
        [B*K, n] @ [n, n] matmul over x and an elementwise y-contraction —
        instead of bilinearly sampling a zero-padded fft2.  No k-space
        interpolation error, and crucially NO GATHER: the backward pass is
        transposed matmuls, where the bilinear sample's backward is a scatter
        into the [P, P] grid (~50 ms per ARTS iteration on TPU).
        """
        n = vx.shape[0]
        P = 2 * n  # alias-free: projection support spans < P samples
        dv = vx[1] - vx[0]
        c = (n - 1) / 2.0

        r = jnp.fft.fftfreq(P) * P  # [K] signed frequency indices, K = P
        B = self.num_beta
        # The trig tables depend only on the STATIC angle grid and grid sizes
        # (betas is the internal [0, 2pi) linspace; vx enters only through dv
        # below), so they are host-precomputed f64 numpy constants — no
        # per-iteration transcendentals at all.  History: computing them
        # in-graph re-fused the cos/sin into every consumer matmul (~1.9
        # ms/iteration of VPU work) unless explicitly barriered, and even
        # barriered they cost ~0.45 ms/iteration to rebuild.
        if B % 4 == 0 and B >= 8 and _NUDFT_QUARTER:
            # quarter-symmetry path: with a_b = cos(beta_b), s_b = sin(beta_b)
            # and inner[b,k,y] = sum_x DF[y,x] e^{-i w a_b r_k x~}, the angle
            # maps beta -> 2pi-beta (s -> -s) and beta -> pi-beta (a -> -a)
            # turn the four partial contractions
            #   A = sum_y ey_r inner_r   Bm = sum_y ey_i inner_i
            #   C = sum_y ey_r inner_i   D  = sum_y ey_i inner_r
            # of the first-quadrant rows into all B slice spectra:
            #   S[k]        = (A+Bm) + i(C-D)        b = k
            #   S[B/2-k]    = (A-Bm) + i(-C-D)       (a flipped)
            #   S[B/2+k]    = (A+Bm) + i(-C+D)       (both flipped)
            #   S[B-k]      = (A-Bm) + i(C+D)        (s flipped)
            # 4x less table-constant volume in the lowered program (the ARTS
            # cold-compile bottleneck: 135 MB of dense trig literals shipped
            # to the remote compiler) and 4x fewer projection-matmul FLOPs.
            Q = B // 4
            ex_r, ex_i, ey_r, ey_i = (
                jnp.asarray(t)
                for t in _nudft_trig_tables_quarter(B, n, np.dtype(DF.dtype).name)
            )
            inner_r = (ex_r @ DF.T).reshape(Q + 1, P, n)
            inner_i = (-ex_i @ DF.T).reshape(Q + 1, P, n)
            A = jnp.sum(ey_r * inner_r, axis=-1)
            Bm = jnp.sum(ey_i * inner_i, axis=-1)
            C = jnp.sum(ey_r * inner_i, axis=-1)
            D = jnp.sum(ey_i * inner_r, axis=-1)
            apb, amb = A + Bm, A - Bm
            cmd, cpd = C - D, C + D
            flip = lambda x: jnp.flip(x, axis=0)
            S_r = jnp.concatenate(
                [apb[: Q + 1], flip(amb[1:Q]), apb[:Q], flip(amb[1 : Q + 1])]
            )
            S_i = jnp.concatenate(
                [cmd[: Q + 1], flip(-cpd[1:Q]), (-cmd)[:Q], flip(cpd[1 : Q + 1])]
            )
        else:
            ex_r, ex_i, ey_r, ey_i = (
                jnp.asarray(t) for t in _nudft_trig_tables(B, n, np.dtype(DF.dtype).name)
            )
            inner_r = (ex_r @ DF.T).reshape(B, P, n)
            inner_i = (-ex_i @ DF.T).reshape(B, P, n)
            # S[b, k] = sum_y e^{-i argy[b,k,y]} inner[b, k, y]
            S_r = jnp.sum(ey_r * inner_r + ey_i * inner_i, axis=-1)
            S_i = jnp.sum(ey_r * inner_i - ey_i * inner_r, axis=-1)

        # output-grid cell-center phase + inverse transform (parity with
        # _project_all_fourier lines above)
        ph = -2.0 * jnp.pi * r * c / P
        S = (S_r + 1j * S_i) * (jnp.cos(ph) + 1j * jnp.sin(ph))[None, :]
        p = jnp.fft.ifft(S, axis=-1).real * dv  # [B, P]
        return p[:, :n]

    def calc_chi_vals(self, vx, DF, inputs):
        """Per-point susceptibility (exact mode; reference form_factor.py:349-388)."""
        beta, xie_mag_at, klde_mag_at = inputs
        dvx = vx[1] - vx[0]
        fe_1d = self._project(vx, DF, beta)
        df = jnp.gradient(fe_1d, dvx)

        fe_vphi = jnp.interp(xie_mag_at, vx, fe_1d)
        dfe = jnp.interp(xie_mag_at, vx, df)

        # Landau sign: see the 1V chiEI comment (KK-consistent minus)
        chiEI = -jnp.pi / (klde_mag_at**2) * dfe
        chiERrat = -1.0 / (klde_mag_at**2) * ratint.pv_integral(df, vx, xie_mag_at[None])[0]
        return fe_vphi, chiEI, chiERrat

    def _chi_tables(self, vx, DF):
        """Projection + chi tables on a dense periodic angle grid (table mode).

        Returns:
            betas: [B] angle grid on [0, 2pi) (periodic).
            f1d: [B, nvx] projections; df1d: [B, nvx] derivatives.
            pole_grid: [P] positive pole locations.
            chiR_tab: [B, P] principal-value integrals int df/(v - p) dv.
        """
        B = self.num_beta
        betas = jnp.linspace(0.0, 2.0 * jnp.pi, B, endpoint=False)
        dvx = vx[1] - vx[0]

        if self.projection == "fourier":
            if dispatch_backend() == "tpu":
                # exact NUDFT slice evaluation: no k-space gather (its backward
                # is a TPU scatter costing ~50 ms/iteration), no interp error
                f1d = self._project_all_nudft(vx, DF)
            else:
                f1d = self._project_all_fourier(vx, DF, betas)
            df1d = jnp.gradient(f1d, dvx, axis=-1)
        else:  # per-angle bicubic rotation + sum (reference-style projection)
            def one(beta):
                f1d_one = self._project(vx, DF, beta)
                return f1d_one, jnp.gradient(f1d_one, dvx)

            f1d, df1d = jax.lax.map(jax.checkpoint(one), betas, batch_size=32)

        # chi_R tables on the vx midpoint-pole grid via the precombined PV
        # matmul (single [B, N] @ [N, M] contraction; see pv_combined_kernel —
        # half the FLOPs of the two-stage Toeplitz form and ~1000x less f32
        # cancellation because the index weights are folded in on the host)
        kernel = ratint.pv_combined_kernel(vx.shape[0] - 2, 0.0)
        pole_grid = 0.5 * (vx[1:-1] + vx[0:-2])
        chiR_tab = df1d @ kernel.astype(df1d.dtype)  # [B,M]
        return betas, f1d, df1d, pole_grid, chiR_tab

    @staticmethod
    def _interp_beta_v(table, v0, dv, beta_q, v_q):
        """Bilinear interp of table[B, N] at (beta_q, v_q).

        Periodic in beta (grid spacing 2pi/B starting at 0); uniform v axis with
        origin v0 and spacing dv, clamped at the ends (jnp.interp edge behaviour).
        Four scalar gathers per query point — no row materialization.
        """
        B, N = table.shape
        dbeta = 2.0 * jnp.pi / B
        bpos = (beta_q % (2.0 * jnp.pi)) / dbeta
        ib0 = jnp.floor(bpos).astype(jnp.int32) % B
        ib1 = (ib0 + 1) % B
        wb = bpos - jnp.floor(bpos)

        vpos = jnp.clip((v_q - v0) / dv, 0.0, N - 1.0)
        iv0 = jnp.minimum(jnp.floor(vpos).astype(jnp.int32), N - 2)
        iv1 = iv0 + 1
        wv = vpos - iv0

        t00 = table[ib0, iv0]
        t01 = table[ib0, iv1]
        t10 = table[ib1, iv0]
        t11 = table[ib1, iv1]
        return (1.0 - wb) * ((1.0 - wv) * t00 + wv * t01) + wb * ((1.0 - wv) * t10 + wv * t11)

    def calc_all_chi_vals(self, vx, DF, beta, xie_mag, klde_mag):
        """Susceptibility values for all evaluation points.

        Table mode: two bilinear gathers per point into precomputed angle tables.
        Exact mode: reference-parity per-point evaluation via lax.map chunks
        (form_factor.py:419-421).
        """
        if self.mode == "exact":
            flat = (beta.reshape(-1), xie_mag.reshape(-1), klde_mag.reshape(-1))
            fe_vphi, chiEI, chiERrat = jax.lax.map(
                partial(self.calc_chi_vals, vx, jnp.squeeze(DF)), flat, batch_size=128
            )
            reshape = lambda a: a.reshape(beta.shape)
            return reshape(fe_vphi), reshape(chiEI), reshape(chiERrat)

        betas, f1d, df1d, pole_grid, chiR_tab = self._chi_tables(vx, jnp.squeeze(DF))

        if self._point_sharding is not None:
            # split the evaluation-point axis across the mesh (parity with
            # reference parallel_calc_all_chi_vals); tables stay replicated
            shape = beta.shape
            flat = lambda a: jax.lax.with_sharding_constraint(
                a.reshape(-1), self._point_sharding
            )
            beta = flat(beta).reshape(shape)
            xie_mag = flat(xie_mag).reshape(shape)
            klde_mag = flat(klde_mag).reshape(shape)

        dvx = vx[1] - vx[0]
        dpole = pole_grid[1] - pole_grid[0]
        from .interp import pallas_enabled, pallas_interpret_active

        # interpret-forced: CPU test meshes exercise the full TPU table path
        # (rowmix/kernel dispatch incl. the query-sharded partitioning rule).
        # f32-gated like interp._use_pallas2 — the kernels' bf16-split tables
        # would silently degrade an f64 CPU evaluation.
        if dispatch_backend() == "tpu" or (
            pallas_interpret_active() and f1d.dtype == jnp.float32
        ):
            # gather-free: one fractional-two-hot row contraction over the
            # stacked (f1d | df1d | chiR) tables beta-interpolates all three at
            # once; the v-axis selection is elementwise iota-compare work.
            # The TPU compiler lowers the per-point bilinear gathers ~10x slow
            # (CLAUDE.md); this form is pure MXU/VPU.
            nvx = f1d.shape[-1]
            Tcat = jnp.concatenate([f1d, df1d, chiR_tab], axis=-1)  # [B, 2*nvx+M]

            if Tcat.shape[0] % 128 == 0 and pallas_enabled():
                # (kernel path skipped under interp.pallas_disabled(), the
                # hessian/sigma trace context.
                # NOTE: this branch returns zero cotangents for the grid
                # scalars vx[0]/dvx — the module-wide "grids are static"
                # convention — while the composition below propagates them
                # through plain AD; nothing trains the velocity grid, but
                # don't compare d(loss)/d(vx) across the two sub-branches.)
                # fused Pallas bilinear lookup: the [Q, R] two-hot and the
                # [Q, C] row-mixed slice stay in VMEM instead of round-tripping
                # ~0.9 GB of HBM per ARTS iteration (ops/bilinear_kernel.py).
                # Under point sharding the kernel partitions along the query
                # axis (ops/partitioning.py): nshards sets the padding so
                # each device gets whole query tiles; the GSPMD rule keeps
                # the lookups device-local and all-reduces only the table
                # cotangent in the backward.
                nshards = (
                    self._point_sharding.mesh.size
                    if self._point_sharding is not None
                    else 1
                )
                fe_vphi, dfe, chiR_raw = chi_bilinear_lookup(
                    Tcat, beta, xie_mag, vx[0], dvx, pole_grid[0], dpole,
                    nshards=nshards,
                )
            else:
                S = periodic_linear_rowmix(Tcat, beta.reshape(-1))  # [Q, 2*nvx+M]
                xq = xie_mag.reshape(-1)
                fe_vphi = select_columns_linear(S[:, :nvx], vx[0], dvx, xq)
                dfe = select_columns_linear(S[:, nvx : 2 * nvx], vx[0], dvx, xq)
                chiR_raw = select_columns_linear(S[:, 2 * nvx :], pole_grid[0], dpole, xq)
                fe_vphi = fe_vphi.reshape(beta.shape)
                dfe = dfe.reshape(beta.shape)
                chiR_raw = chiR_raw.reshape(beta.shape)
        else:
            fe_vphi = self._interp_beta_v(f1d, vx[0], dvx, beta, xie_mag)
            dfe = self._interp_beta_v(df1d, vx[0], dvx, beta, xie_mag)
            chiR_raw = self._interp_beta_v(chiR_tab, pole_grid[0], dpole, beta, xie_mag)

        # Landau sign: see the 1V chiEI comment (KK-consistent minus)
        chiEI = -jnp.pi / (klde_mag**2) * dfe
        chiERrat = -1.0 / (klde_mag**2) * chiR_raw
        return fe_vphi, chiEI, chiERrat

    def calc_in_2D(self, params):
        """S(k, omega) for a 2D numerical EDF (reference form_factor.py:449-587)."""
        from ...utils.vector_tools import vsub, vdot

        ne, Te = self._gradients(params)
        lam = params["general"]["lam"] + self.lam_shift
        A, Z, Ti, fract = self._ion_arrays(params)
        Va_mag = params["general"]["Va"] * 1e6
        ud_mag = params["general"]["ud"] * 1e6
        fe = params["electron"]["fe"]
        vx = jnp.squeeze(params["electron"]["v"])

        sarad = (self.scattering_angles["sa"] * jnp.pi / 180.0).reshape(1, 1, -1)
        va_ang = 0.0 if self.va_angle is None else self.va_angle
        ud_ang = 0.0 if self.ud_angle is None else self.ud_angle
        Va = (
            Va_mag * jnp.cos(va_ang * jnp.pi / 180.0),
            Va_mag * jnp.sin(va_ang * jnp.pi / 180.0),
        )
        ud = (
            ud_mag * jnp.cos(ud_ang * jnp.pi / 180.0),
            ud_mag * jnp.sin(ud_ang * jnp.pi / 180.0),
        )

        omgL = self.omgL_num / lam
        omgpe = PLASMA_FREQ_CONST * jnp.sqrt(ne[..., None, None])
        omg = self.omgs - omgL

        kL = (jnp.sqrt(omgL**2 - omgpe**2) / C, jnp.zeros_like(omgpe))
        ks_mag = jnp.sqrt(self.omgs**2 - omgpe**2) / C
        ks = (jnp.cos(sarad) * ks_mag, jnp.sin(sarad) * ks_mag)
        k = vsub(ks, kL)
        k_mag = jnp.sqrt(vdot(k, k))  # [G,L,A]

        omgdop = omg - vdot(k, Va)

        vTe = jnp.sqrt(Te[..., None, None] / ME_KEV)
        klde_mag = (vTe / omgpe) * k_mag

        chiI, xii, kldi, vTi, Zbar = self._ion_susceptibility(omgdop, k_mag, ne, Z, Ti, fract, A)

        # electron phase-velocity vectors (form_factor.py:549-558)
        xie = tuple((omgdop / k_mag**2 * kc - uc) / vTe for kc, uc in zip(k, ud))
        xie_mag = jnp.sqrt(vdot(xie, xie))
        beta = jnp.arctan2(xie[1], xie[0])  # angle of xie from x-axis, [-pi, pi)

        fe_vphi, chiEI, chiERrat = self.calc_all_chi_vals(vx, fe, beta, xie_mag, klde_mag)

        if self._point_sharding is not None:
            # gather the chi results back to every device (parity with the
            # reference's device_put round trip, form_factor.py:431-447): the
            # spectrum assembly + IRF tail is cheap relative to chi, and
            # letting the point sharding propagate into it pushes sharded
            # layouts into the FFT convolutions downstream.
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self._point_sharding.mesh, PartitionSpec())
            constrain = lambda a: jax.lax.with_sharding_constraint(a, rep)
            fe_vphi, chiEI, chiERrat = constrain(fe_vphi), constrain(chiEI), constrain(chiERrat)

        chiE = chiERrat + 1j * chiEI
        return self._assemble_spectrum(
            k_mag, chiE, chiI, fe_vphi, vTe, xii, vTi, Z, fract, Zbar, omgdop, omgL, ne
        )
