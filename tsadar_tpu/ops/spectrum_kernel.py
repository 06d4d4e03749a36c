"""Fused Pallas spectrum-tail kernel for the 1V hot path.

Computes everything downstream of the two table lookups — scattering
kinematics, ion susceptibility (with an in-kernel Dawson-function Z'),
the spectral-difference electron Landau term, the S(k, omega) assembly,
and the angle/gradient reduction — as ONE kernel per direction, per
lineout.  This is the Pallas port of ``form_factor._reduced_tail`` /
``_rt_bwd``: the jnp custom-VJP version already shrank the residual set
to the two lookup outputs; the hypothesis here was that keeping every
intermediate VMEM-resident would also beat XLA's ~10 elementwise loop
fusions over the [G, L, A] fields.

MEASURED NEGATIVE — kept tested-unwired (``form_factor.TAIL_PALLAS``
defaults False; see its comment for the full numbers).  Same-window A/B
at bench shapes: forward 10.57 vs 10.15 ms, fit step 22.23 vs 21.87 ms —
the all-elementwise tail is exactly what XLA fuses at full bandwidth, so
there is no HBM round trip left for VMEM residency to save, while the
kernel pays GA=10 -> 16 sublane padding and per-lineout grid overhead.
At whole-shot shapes (L=5120) the backward's live set (~22 MB: forward
recompute + every cotangent) exceeds Mosaic's 16 MB scoped-VMEM limit
outright.  Contrast the WINNING kernels (interp_kernel2, bilinear_kernel):
those replaced one-hot matmul pipelines whose [Q, 27]-shaped intermediates
genuinely round-tripped HBM.  The decision rule this confirms: Pallas pays
on this hardware when XLA's lowering is structurally bad (gathers, scatter
transposes, materialized one-hot intermediates), not when it is a clean
elementwise fusion chain.

Layout: one lineout per grid step.  Rows = (gradient point, angle) pairs
(GA = G*A, G-major) on sublanes, wavelengths on lanes — the same order
the [G, A, L]-oriented queries give the interp kernels, so the lookup
outputs reshape to [GA, L] with no transpose.  Pure VPU (no dots).

Physics parity: reference form_factor.py:201-298 + the non-angular
weighted angle sum of generate_spectra.py:194-197.  Truth oracle:
``form_factor._reduced_tail`` (tests/test_physics/test_spectrum_kernel.py
pins forward and every cotangent in interpret mode).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.physics.constants import C, ME_KEV, MP_KEV, RE_CM, PLASMA_FREQ_CONST

OMGL_NUM = 2.0 * math.pi * 1.0e7 * C

# f32 centered-Rybicki constants (zprime._RYBICKI_H / _RYBICKI_GAUSS): the
# series is evaluated with cumulative powers of exp(4hu) — 3 exps + 15
# divides per point instead of the XLA path's 15 exps.
_H = 0.36
_NJ = 7  # j in [-7, 7]
_GAUSS = [math.exp(-4.0 * _H * _H * j * j) for j in range(-_NJ, _NJ + 1)]
_SQRT_PI = math.sqrt(math.pi)
_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)
_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _dawsn(x):
    """Dawson integral, elementwise f32 (zprime.dawsn semantics)."""
    xr = jnp.clip(x, -6.5, 6.5)
    n0 = 2.0 * jnp.floor(xr / (2.0 * _H)) + 1.0
    u = xr - n0 * _H
    bstep = jnp.exp(4.0 * _H * u)
    bp = jnp.exp((-4.0 * _H * _NJ) * u)  # bstep**(-_NJ)
    series = jnp.zeros_like(x)
    for idx, j in enumerate(range(-_NJ, _NJ + 1)):
        series = series + (_GAUSS[idx] * bp) / (n0 + 2.0 * j)
        if idx < 2 * _NJ:
            bp = bp * bstep
    small = jnp.exp(-(u * u)) * series * _INV_SQRT_PI

    xs = jnp.where(jnp.abs(x) > 1.0, x, 1.0)
    s = 1.0 / (2.0 * xs * xs)
    ser = 1.0 + s * (1.0 + s * (3.0 + s * (15.0 + s * (105.0 + s * (945.0 + s * 10395.0)))))
    large = ser / (2.0 * xs)
    return jnp.where(jnp.abs(x) <= 6.0, small, large)


def _species_consts(spp_ref, S):
    """Static-unrolled per-species scalars from the SMEM param block.

    spp rows: 0=Z, 1=Ti, 2=fract, 3=A.  Returns (Zbar, [(Z, fract, vTi,
    Mi, comg, icf)] * S) with comg s.t. omgpi = comg * sqrt(ne) and
    icf = fract Z^2 / (Zbar vTi).
    """
    zs = [spp_ref[0, 0, s] for s in range(S)]
    tis = [spp_ref[0, 1, s] for s in range(S)]
    frs = [spp_ref[0, 2, s] for s in range(S)]
    ams = [spp_ref[0, 3, s] for s in range(S)]
    zbar = zs[0] * frs[0]
    for s in range(1, S):
        zbar = zbar + zs[s] * frs[s]
    out = []
    for s in range(S):
        mi = ams[s] * MP_KEV
        vti = jnp.sqrt(tis[s] / mi)
        comg = PLASMA_FREQ_CONST * zs[s] * jnp.sqrt(frs[s] * ME_KEV / (mi * zbar))
        icf = frs[s] * zs[s] * zs[s] / (zbar * vti)
        out.append((zs[s], frs[s], vti, mi, comg, icf))
    return zbar, out


def _common_fields(scal_ref, rsc_ref, omgs_ref):
    """Kinematics fields shared by fwd and bwd (form_factor._kinematics_fields)."""
    lam = scal_ref[0, 0, 0]
    Va = scal_ref[0, 0, 1]
    ud = scal_ref[0, 0, 2]
    rsc = rsc_ref[0]  # [GA, 8]
    ne = rsc[:, 0:1]
    Te = rsc[:, 1:2]
    costh = rsc[:, 2:3]
    wrow = rsc[:, 3:4]
    omgs = omgs_ref[0]  # [1, L]

    omgL = OMGL_NUM / lam
    sqrt_ne = jnp.sqrt(ne)
    omgpe = PLASMA_FREQ_CONST * sqrt_ne  # [GA, 1]
    ks = jnp.sqrt(omgs * omgs - omgpe * omgpe) / C  # [GA, L]
    kL = jnp.sqrt(omgL * omgL - omgpe * omgpe) / C  # [GA, 1]
    k = jnp.sqrt(ks * ks + kL * kL - 2.0 * ks * kL * costh)
    omgdop = (omgs - omgL) - k * Va
    vTe = jnp.sqrt(Te / ME_KEV)
    klde = (vTe / omgpe) * k
    xie = omgdop / (k * vTe) - ud / vTe
    return dict(
        lam=lam, Va=Va, ud=ud, ne=ne, Te=Te, costh=costh, wrow=wrow, omgs=omgs,
        omgL=omgL, sqrt_ne=sqrt_ne, omgpe=omgpe, ks=ks, kL=kL, k=k,
        omgdop=omgdop, vTe=vTe, klde=klde, xie=xie,
    )


def _ion_fields(cf, spp_ref, S):
    """Per-species ion susceptibility terms (form_factor._ion_fields)."""
    zbar, sps = _species_consts(spp_ref, S)
    k, omgdop, sqrt_ne = cf["k"], cf["omgdop"], cf["sqrt_ne"]
    vratio = omgdop / k
    ciR = None
    ciI = None
    SA = None
    per = []
    for s, (Z, fract, vTi, Mi, comg, icf) in enumerate(sps):
        omgpi = comg * sqrt_ne  # [GA, 1]
        kldi = (vTi / omgpi) * k
        xii = vratio / (_SQRT2 * vTi)
        D = _dawsn(xii)
        ex2 = jnp.exp(-(xii * xii))
        ZpR = -2.0 * (1.0 - 2.0 * xii * D)
        ZpI = (-2.0 * _SQRT_PI) * xii * ex2
        ik2 = 1.0 / (kldi * kldi)
        cr = -0.5 * ik2 * ZpR
        ci = -0.5 * ik2 * ZpI
        g2 = ex2 * _INV_SQRT_2PI
        sa = icf * g2
        ciR = cr if ciR is None else ciR + cr
        ciI = ci if ciI is None else ciI + ci
        SA = sa if SA is None else SA + sa
        per.append(dict(Z=Z, fract=fract, vTi=vTi, Mi=Mi, comg=comg, icf=icf,
                        omgpi=omgpi, kldi=kldi, xii=xii, D=D, ex2=ex2,
                        ZpR=ZpR, ZpI=ZpI, ik2=ik2, g2=g2))
    return zbar, ciR, ciI, SA, per


def _electron_fields(cf, lf_ref, chi_ref, L):
    """fe, df (spectral difference), and the electron chi parts."""
    lf = lf_ref[0]  # [GA, L]
    chiER = chi_ref[0]
    xie = cf["xie"]
    fv = jnp.exp(lf)
    fv_n = pltpu.roll(fv, shift=L - 1, axis=1)  # roll by -1 (left shift)
    xie_n = pltpu.roll(xie, shift=L - 1, axis=1)
    liota = jax.lax.broadcasted_iota(jnp.int32, fv.shape, 1)
    inner = liota < (L - 1)
    rinv = jnp.where(inner, 1.0 / (xie_n - xie), 0.0)
    df = (fv_n - fv) * rinv
    klde = cf["klde"]
    iklde2 = 1.0 / (klde * klde)
    ceR = -iklde2 * chiER
    ceI = (-math.pi) * iklde2 * df
    return dict(fv=fv, df=df, rinv=rinv, inner=inner, liota=liota,
                chiER=chiER, iklde2=iklde2, ceR=ceR, ceI=ceI)


def _assembly(cf, ciR, ciI, SA, ef):
    """S(k, omega) assembly fields (form_factor._assemble_fields)."""
    ceR, ceI, fv = ef["ceR"], ef["ceI"], ef["fv"]
    k, vTe, omgdop, omgL, ne, omgs = (
        cf["k"], cf["vTe"], cf["omgdop"], cf["omgL"], cf["ne"], cf["omgs"]
    )
    epsR = 1.0 + ceR + ciR
    epsI = ceI + ciI
    E2 = epsR * epsR + epsI * epsI
    AE2 = ceR * ceR + ceI * ceI
    BI2 = (1.0 + ciR) ** 2 + ciI * ciI
    base = 1.0 / (k * E2)
    ele_over_vTe = BI2 * fv / vTe
    SKW = (AE2 * SA + ele_over_vTe) * base
    w2 = 1.0 + 2.0 * omgdop / omgL
    # PsLam = SKW * w2 * RE^2 * ne * (2 pi C / lams^2), lams = 2 pi C / omgs
    wl = omgs * omgs * (1.0 / (2.0 * math.pi * C))
    ps = SKW * w2 * (RE_CM * RE_CM) * ne * wl
    return dict(epsR=epsR, epsI=epsI, E2=E2, AE2=AE2, BI2=BI2, base=base,
                ele_over_vTe=ele_over_vTe, SKW=SKW, w2=w2, wl=wl, ps=ps)


def _fwd_kernel(S, L, scal_ref, spp_ref, rsc_ref, omgs_ref, lf_ref, chi_ref, red_ref):
    cf = _common_fields(scal_ref, rsc_ref, omgs_ref)
    _, ciR, ciI, SA, _ = _ion_fields(cf, spp_ref, S)
    ef = _electron_fields(cf, lf_ref, chi_ref, L)
    asm = _assembly(cf, ciR, ciI, SA, ef)
    red_ref[0] = jnp.sum(asm["ps"] * cf["wrow"], axis=0, keepdims=True)  # [1, L]


def _bwd_kernel(S, L, scal_ref, spp_ref, rsc_ref, omgs_ref, lf_ref, chi_ref, g_ref,
                glf_ref, gchi_ref, grsc_ref, gmisc_ref):
    # ---- recompute the forward (all VMEM-resident)
    cf = _common_fields(scal_ref, rsc_ref, omgs_ref)
    zbar, ciR, ciI, SA, per = _ion_fields(cf, spp_ref, S)
    ef = _electron_fields(cf, lf_ref, chi_ref, L)
    asm = _assembly(cf, ciR, ciI, SA, ef)

    k, vTe, omgdop, omgL, ne, omgs = (
        cf["k"], cf["vTe"], cf["omgdop"], cf["omgL"], cf["ne"], cf["omgs"]
    )
    wrow, costh, omgpe, ks, kL, xie, klde = (
        cf["wrow"], cf["costh"], cf["omgpe"], cf["ks"], cf["kL"], cf["xie"], cf["klde"]
    )

    # ---- assembly backward (form_factor._asm_bwd, row form)
    gPs = g_ref[0] * wrow  # [1, L] x [GA, 1] -> [GA, L]
    gs = gPs * asm["wl"] * (RE_CM * RE_CM)
    gS_ = gs * asm["w2"] * ne
    g_w2 = gs * asm["SKW"] * ne
    g_omgdop = g_w2 * (2.0 / omgL)
    g_omgL = jnp.sum(g_w2 * ((-2.0 / (omgL * omgL)) * omgdop))
    g_ne_row = jnp.sum(gs * asm["SKW"] * asm["w2"], axis=1, keepdims=True)  # [GA, 1]

    base, AE2, BI2 = asm["base"], asm["AE2"], asm["BI2"]
    g_AE2 = gS_ * SA * base
    g_SA = gS_ * AE2 * base
    g_BI2 = gS_ * (ef["fv"] / vTe) * base
    g_fe = gS_ * (BI2 / vTe) * base
    g_vTe_row = jnp.sum(-gS_ * asm["ele_over_vTe"] * base / vTe, axis=1, keepdims=True)
    g_base = gS_ * (AE2 * SA + asm["ele_over_vTe"])
    g_k = -g_base * base / k
    g_E2 = -g_base * base / asm["E2"]

    g_epsR = 2.0 * asm["epsR"] * g_E2
    g_epsI = 2.0 * asm["epsI"] * g_E2
    g_ceR = g_epsR + 2.0 * ef["ceR"] * g_AE2
    g_ceI = g_epsI + 2.0 * ef["ceI"] * g_AE2
    g_ciR = g_epsR + 2.0 * (1.0 + ciR) * g_BI2
    g_ciI = g_epsI + 2.0 * ciI * g_BI2

    # ---- electron chi + spectral-difference chain
    iklde2, df, rinv, chiER = ef["iklde2"], ef["df"], ef["rinv"], ef["chiER"]
    g_chi = -g_ceR * iklde2
    g_df = (-math.pi) * iklde2 * g_ceI
    g_iklde2 = -g_ceR * chiER + (-math.pi) * df * g_ceI
    g_klde = -2.0 * g_iklde2 * iklde2 / klde

    t = g_df * rinv  # rinv is 0 on the last column (df there is a constant 0)
    u = t * df
    nz = ef["liota"] > 0
    t_prev = jnp.where(nz, pltpu.roll(t, shift=1, axis=1), 0.0)
    u_prev = jnp.where(nz, pltpu.roll(u, shift=1, axis=1), 0.0)
    g_fv = -t + t_prev
    gx = u - u_prev  # xie cotangent from the df chain
    glf_ref[0] = (g_fe + g_fv) * ef["fv"]

    # ---- ion chain (form_factor._rt_bwd species loop, scalars unrolled)
    vratio = omgdop / k
    g_omgdop_i = jnp.zeros_like(k)
    g_k_i = jnp.zeros_like(k)
    g_zbar = jnp.float32(0.0)
    sp_out = []  # (g_Z, g_Ti, g_fract) per species before the Zbar distribution
    for sp in per:
        xii, D, ex2, ik2, kldi, omgpi, vTi = (
            sp["xii"], sp["D"], sp["ex2"], sp["ik2"], sp["kldi"], sp["omgpi"], sp["vTi"]
        )
        g_ZpR = -0.5 * ik2 * g_ciR
        g_ZpI = -0.5 * ik2 * g_ciI
        g_ik2 = -0.5 * (sp["ZpR"] * g_ciR + sp["ZpI"] * g_ciI)
        g_kldi = -2.0 * g_ik2 * ik2 / kldi
        dZpR = 4.0 * D + 4.0 * xii * (1.0 - 2.0 * xii * D)
        dZpI = (-2.0 * _SQRT_PI) * ex2 * (1.0 - 2.0 * xii * xii)
        # assembly's exp(-xii^2) term: g_SA * icf * g2 * (-2 xii)
        g_xii = g_SA * (sp["icf"] * (-2.0) * xii) * sp["g2"] + g_ZpR * dZpR + g_ZpI * dZpI
        g_icf = jnp.sum(g_SA * sp["g2"])
        # xii = (omgdop/k) / (sqrt2 vTi)
        g_omgdop_i = g_omgdop_i + g_xii / ((_SQRT2 * vTi) * k)
        g_k_i = g_k_i - g_xii * xii / k
        g_vTi = jnp.sum(-g_xii * xii) / vTi
        # kldi = vTi k / omgpi
        g_k_i = g_k_i + g_kldi * (vTi / omgpi)
        g_vTi = g_vTi + jnp.sum(g_kldi * k / omgpi)
        g_omgpi_row = jnp.sum(-g_kldi * kldi, axis=1, keepdims=True) / omgpi  # [GA, 1]
        # omgpi = comg sqrt(ne)
        g_ne_row = g_ne_row + g_omgpi_row * (sp["comg"] / (2.0 * cf["sqrt_ne"]))
        g_comg = jnp.sum(g_omgpi_row * cf["sqrt_ne"])
        # comg = Cp Z sqrt(fract ME/(Mi Zbar)); icf = fract Z^2/(Zbar vTi)
        g_Z = g_comg * sp["comg"] / sp["Z"] + g_icf * 2.0 * sp["icf"] / sp["Z"]
        g_fract = (
            g_comg * sp["comg"] / (2.0 * sp["fract"]) + g_icf * sp["icf"] / sp["fract"]
        )
        g_zbar = g_zbar - g_comg * sp["comg"] / (2.0 * zbar) - g_icf * sp["icf"] / zbar
        # icf and vTi: g_vTi also carries the icf channel
        g_vTi = g_vTi - g_icf * sp["icf"] / vTi
        g_Ti = g_vTi / (2.0 * vTi * sp["Mi"])
        sp_out.append((g_Z, g_Ti, g_fract))

    # ---- kinematics backward (form_factor._kin_bwd, row form)
    inv_kvTe = 1.0 / (k * vTe)
    gd_tot = (g_omgdop + g_omgdop_i) + gx * inv_kvTe
    ge = g_klde
    gk_tot = (
        (g_k + g_k_i)
        - cf["Va"] * gd_tot
        - gx * omgdop * inv_kvTe / k
        + ge * (vTe / omgpe)
    )
    dk_dks = (ks - kL * costh) / k
    dk_dkL = (kL - ks * costh) / k
    g_omgpe = gk_tot * (
        dk_dks * (-omgpe / (C * C * ks)) + dk_dkL * (-omgpe / (C * C * kL))
    ) + ge * (-vTe * k / (omgpe * omgpe))
    g_ne_row = g_ne_row + jnp.sum(g_omgpe, axis=1, keepdims=True) * (omgpe / (2.0 * ne))
    g_vTe_row = g_vTe_row + jnp.sum(ge * (k / omgpe) + gx * (-xie / vTe), axis=1, keepdims=True)
    g_Te_row = g_vTe_row / (2.0 * vTe * ME_KEV)
    g_omgL = g_omgL - jnp.sum(gd_tot) + jnp.sum(gk_tot * dk_dkL * (omgL / (C * C * kL)))
    g_lam = g_omgL * (-OMGL_NUM / (cf["lam"] * cf["lam"]))
    g_Va = jnp.sum(gd_tot * (-k))
    g_ud = jnp.sum(gx * (-1.0 / vTe))

    gchi_ref[0] = g_chi

    # ---- pack the small cotangents
    # g_rsc [GA, 8]: col 0 = ne, col 1 = Te (costh/wrow are constants)
    ga = g_ne_row.shape[0]
    c8 = jax.lax.broadcasted_iota(jnp.int32, (ga, 8), 1)
    grsc_ref[0] = jnp.where(c8 == 0, g_ne_row, 0.0) + jnp.where(c8 == 1, g_Te_row, 0.0)
    # g_misc [1, 128]: lanes 0-2 = lam/Va/ud; 8+3s..10+3s = Z/Ti/fract per species
    m = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.where(m == 0, g_lam, 0.0) + jnp.where(m == 1, g_Va, 0.0) + jnp.where(m == 2, g_ud, 0.0)
    for s, (g_Z, g_Ti, g_fract) in enumerate(sp_out):
        g_Z_t = g_Z + g_zbar * per[s]["fract"]  # Zbar = sum Z fract
        g_fract_t = g_fract + g_zbar * per[s]["Z"]
        out = (
            out
            + jnp.where(m == 8 + 3 * s, g_Z_t, 0.0)
            + jnp.where(m == 9 + 3 * s, g_Ti, 0.0)
            + jnp.where(m == 10 + 3 * s, g_fract_t, 0.0)
        )
    gmisc_ref[0] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def spectrum_tail_pallas(lf, chi, rsc, scal, spp, omgs, interpret=False):
    """Reduced spectrum [B, L] from lookup outputs [B, GA, L].

    Args:
      lf: [B, GA, L] log-EDF at the phase velocities (rows G-major (g, a)).
      chi: [B, GA, L] raw chi_R lookups.
      rsc: [B, GA, 8] per-row scalars, cols (ne, Te, cos(sarad), w/G, 0...).
      scal: [B, 8] per-lineout scalars (lam, Va, ud, 0...).
      spp: [B, 4, S] species params, rows (Z, Ti, fract, A).
      omgs: [B, L] scattered-frequency axis (same values every row).

    The 2D operands get a size-1 middle axis before the pallas_call:
    Mosaic requires a block's last two dims to be (8, 128)-divisible OR
    equal to the array's, and a (1, 8)/(1, L) block over a [B, ...] array
    is neither — [B, 1, x] with block (1, 1, x) is.
    """
    B, GA, L = lf.shape
    S = spp.shape[-1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, S, L),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, S), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, GA, 8), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, GA, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, GA, L), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, L), lf.dtype),
        interpret=interpret,
    )(scal[:, None, :], spp, rsc, omgs[:, None, :], lf, chi)[:, 0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def spectrum_tail_pallas_bwd(lf, chi, rsc, scal, spp, omgs, g, interpret=False):
    """All cotangents of ``spectrum_tail_pallas`` in one fused pass.

    Returns (g_lf [B,GA,L], g_chi [B,GA,L], g_rsc [B,GA,8], g_misc [B,128]):
    g_rsc cols (ne, Te, 0...); g_misc lanes 0-2 = (lam, Va, ud) and
    8+3s..10+3s = (Z, Ti, fract) for species s.
    """
    B, GA, L = lf.shape
    S = spp.shape[-1]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, S, L),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, S), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, GA, 8), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, GA, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, GA, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, GA, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, GA, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, GA, 8), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, GA, L), lf.dtype),
            jax.ShapeDtypeStruct((B, GA, L), lf.dtype),
            jax.ShapeDtypeStruct((B, GA, 8), lf.dtype),
            jax.ShapeDtypeStruct((B, 1, 128), lf.dtype),
        ),
        interpret=interpret,
    )(scal[:, None, :], spp, rsc, omgs[:, None, :], lf, chi, g[:, None, :])
    return outs[0], outs[1], outs[2], outs[3][:, 0, :]
