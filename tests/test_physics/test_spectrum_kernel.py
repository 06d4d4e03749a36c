"""Fused Pallas spectrum-tail kernel: equivalence vs the jnp reduced tail.

``ops/spectrum_kernel.py`` ports ``form_factor._reduced_tail`` / ``_rt_bwd``
to one Pallas kernel per direction (every intermediate VMEM-resident).  All
checks run the kernel in interpret mode on CPU f64 against the jnp oracle.

The kernel's in-kernel Dawson function uses the f32/TPU semantics of
``zprime.dawsn`` (centered Rybicki h=0.36 + the 6-term asymptotic tail for
|x| > 6, discretization ~5.5e-9 abs — far below f32 resolution), while the
oracle's f64 path uses h=0.25 with no asymptotic switch (~7e-18).  So the
suite pins two things separately:

* with the oracle's dawsn monkeypatched to the kernel's semantics, forward
  and every cotangent agree to f64 round-off (<= ~1e-9 relative even through
  the Ti gradient's documented cancellation amplification) — the kernel's
  algebra and hand-written backward are exact;
* with the production dawsn, the end-to-end deviation stays below f32
  resolution — the number that matters on the only backend that dispatches
  the kernel.
"""

import functools
import sys

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
from jax import numpy as jnp

import tsadar_tpu.core.physics.zprime  # noqa: F401  (register the submodule)
from tsadar_tpu.core.physics.form_factor import (
    FormFactor,
    _reduced_tail,
    _reduced_tail_pallas,
    _use_tail_kernel,
)
from tsadar_tpu.ops import spectrum_kernel as sk

# the package __init__ rebinds the name `zprime` to the function, shadowing
# the submodule — go through sys.modules for the module object
zp = sys.modules["tsadar_tpu.core.physics.zprime"]


@pytest.fixture
def interpret_kernels(monkeypatch):
    """Route the form_factor dispatch wrappers through interpret-mode pallas."""
    monkeypatch.setattr(
        sk, "spectrum_tail_pallas", functools.partial(sk.spectrum_tail_pallas, interpret=True)
    )
    monkeypatch.setattr(
        sk,
        "spectrum_tail_pallas_bwd",
        functools.partial(sk.spectrum_tail_pallas_bwd, interpret=True),
    )


@pytest.fixture
def kernel_sem_dawsn(monkeypatch):
    """Oracle dawsn := the kernel's f32-semantics dawsn (isolates the algebra)."""

    @jax.custom_jvp
    def _ksd(x):
        return sk._dawsn(x)

    @_ksd.defjvp
    def _ksd_jvp(p, t):
        (x,), (dx,) = p, t
        d = _ksd(x)
        return d, (1.0 - 2.0 * x * d) * dx

    monkeypatch.setattr(zp, "dawsn", _ksd)


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


def _setup(two_species=False, lamrang=(450, 650), num_grad_points=2, angles=(55.0, 60.0, 65.0), nv=512):
    vx, fe = _maxwellian_1v(nv=nv)
    ff = FormFactor(
        list(lamrang),
        npts=256,
        lam_shift=0.0,
        scattering_angles={"sa": np.array(list(angles))},
        num_grad_points=num_grad_points,
    )
    params = _params(fe, vx, two_species)
    w = jnp.asarray([0.5, 0.3, 0.2][: len(angles)])
    sarad = (ff.scattering_angles["sa"] * jnp.pi / 180.0).reshape(1, 1, -1)
    inputs = ff._lookups_1v(params)
    return ff, inputs, w, sarad


GRAD_NAMES = ["lf", "chiERraw", "ne", "Te", "lam", "Va", "ud", "A", "Z", "Ti", "fract"]


def _compare_grads(inputs, w, sarad, omgs, npts, atol_rel):
    cvec = jnp.cos(jnp.linspace(0.0, 3.0, npts))

    def loss(tail, *args):
        return jnp.sum(cvec * tail(*args, w, sarad, omgs))

    g_plain = jax.grad(functools.partial(loss, _reduced_tail), argnums=tuple(range(11)))(*inputs)
    g_pl = jax.grad(functools.partial(loss, _reduced_tail_pallas), argnums=tuple(range(11)))(*inputs)
    gmax_global = max(float(jnp.max(jnp.abs(gp))) for gp in g_plain)
    for name, gp, gc in zip(GRAD_NAMES, g_plain, g_pl):
        if name == "A":  # non-trainable by convention: kernel returns zeros
            continue
        scale = float(jnp.max(jnp.abs(gp)))
        if scale < 1e-9 * gmax_global and float(jnp.max(jnp.abs(gc))) < 1e-9 * gmax_global:
            continue  # both ~0 (e.g. ud telescopes to an exact zero)
        # atol floor at the global gradient scale: Ti's gradient cancels
        # ~1e8-scale vTi contributions down to ~1e-4, so its round-off noise
        # is absolute, not relative to its own (tiny) magnitude
        assert_allclose(
            np.asarray(gc), np.asarray(gp), atol=atol_rel * max(scale, gmax_global),
            rtol=atol_rel, err_msg=f"grad[{name}]",
        )


def test_dawsn_matches_zprime():
    """The in-kernel Dawson vs the production zprime.dawsn: the cumulative-
    power Rybicki + asymptotic port stays within the f32-path's documented
    discretization bound everywhere (the f64 oracle is ~7e-18 accurate)."""
    x = jnp.linspace(-9.0, 9.0, 20001)
    assert float(jnp.max(jnp.abs(sk._dawsn(x) - zp.dawsn(x)))) < 2e-9


@pytest.mark.parametrize("two_species", [False, True])
def test_tail_kernel_exact_vs_matched_oracle(interpret_kernels, kernel_sem_dawsn, two_species):
    """Kernel algebra + hand-written backward vs the oracle with the SAME
    dawsn: f64 round-off agreement, forward and all cotangents."""
    ff, inputs, w, sarad = _setup(two_species)
    expected = _reduced_tail(*inputs, w, sarad, ff.omgs)
    got = _reduced_tail_pallas(*inputs, w, sarad, ff.omgs)
    scale = float(jnp.max(jnp.abs(expected)))
    assert float(jnp.max(jnp.abs(got - expected))) < 1e-12 * scale
    # Ti's gradient is a documented ~1e8-scale cancellation (test_reduced_tail)
    _compare_grads(inputs, w, sarad, ff.omgs, ff.npts, atol_rel=3e-8)


@pytest.mark.parametrize("lamrang", [(450, 650), (523, 527)])
def test_tail_kernel_vs_production_oracle(interpret_kernels, lamrang):
    """End-to-end deviation with the production (h=0.25, no-switch) f64
    dawsn: stays well below f32 resolution on both features."""
    ff, inputs, w, sarad = _setup(two_species=True, lamrang=lamrang)
    expected = _reduced_tail(*inputs, w, sarad, ff.omgs)
    got = _reduced_tail_pallas(*inputs, w, sarad, ff.omgs)
    scale = float(jnp.max(jnp.abs(expected)))
    assert float(jnp.max(jnp.abs(got - expected))) < 3e-6 * scale
    _compare_grads(inputs, w, sarad, ff.omgs, ff.npts, atol_rel=1e-4)


def test_tail_kernel_scalar_weights(interpret_kernels, kernel_sem_dawsn):
    """Scalar weights — the production 1d path: ``weights[0]`` of a 1-D
    aperture-weight array is ONE weight (reference generate_spectra.py:197
    parity quirk), broadcast over the unweighted angle sum."""
    ff, inputs, _, sarad = _setup()
    w = jnp.asarray(0.00702671050853565)  # P9 weights[0]
    expected = _reduced_tail(*inputs, w, sarad, ff.omgs)
    got = _reduced_tail_pallas(*inputs, w, sarad, ff.omgs)
    scale = float(jnp.max(jnp.abs(expected)))
    assert float(jnp.max(jnp.abs(got - expected))) < 1e-12 * scale
    _compare_grads(inputs, w, sarad, ff.omgs, ff.npts, atol_rel=3e-8)


def test_tail_kernel_vmapped(interpret_kernels, kernel_sem_dawsn):
    """The custom_vmap batch route (explicit batch grid, not vmap-lifting)
    under grad — the production pattern (vmapped model, batch-summed loss)."""
    ff, inputs, w, sarad = _setup(num_grad_points=1, angles=(60.0,), nv=128)
    B = 3
    blf = jnp.stack([inputs[0] * (1.0 + 0.01 * i) for i in range(B)])
    bchi = jnp.stack([inputs[1] * (1.0 - 0.01 * i) for i in range(B)])
    bne = jnp.stack([inputs[2] * (1.0 + 0.05 * i) for i in range(B)])

    def loss(tail_fn, blf, bchi, bne):
        red = jax.vmap(
            lambda lf, chi, ne: tail_fn(lf, chi, ne, *inputs[3:], w, sarad, ff.omgs)
        )(blf, bchi, bne)
        return jnp.sum(red**2), red

    (l_p, red_p), g_plain = jax.value_and_grad(
        lambda *a: loss(_reduced_tail, *a), argnums=(0, 1, 2), has_aux=True
    )(blf, bchi, bne)
    (l_k, red_k), g_kern = jax.value_and_grad(
        lambda *a: loss(_reduced_tail_pallas, *a), argnums=(0, 1, 2), has_aux=True
    )(blf, bchi, bne)
    assert_allclose(np.asarray(red_k), np.asarray(red_p), rtol=1e-11)
    for gp, gc in zip(g_plain, g_kern):
        scale = max(float(jnp.max(jnp.abs(gp))), 1e-30)
        assert_allclose(np.asarray(gc), np.asarray(gp), atol=1e-10 * scale, rtol=1e-10)


def test_dispatch_gate():
    """`_use_tail_kernel` stays off on CPU (no Mosaic there) and rejects
    non-lane-aligned L and weight shapes the wrow slot cannot encode."""
    lf = jnp.zeros((2, 256, 3), jnp.float32)
    w = jnp.ones(3)
    omgs = jnp.zeros((1, 256, 1))
    assert not _use_tail_kernel(lf, w, omgs)  # CPU backend under tests


def test_tail_kernel_mosaic_block_legality():
    """Every pallas block keeps its last two dims equal to the operand's
    (the Mosaic (8, 128)-divisibility rule's escape hatch) — a pure shape
    check that catches relayouts without needing a TPU.  The whole-shot
    shapes (B=128, GA=10, L=1024) originally crashed Mosaic lowering on a
    (1, 8) scal block before the [B, 1, x] reshape."""
    B, GA, L, S = 4, 6, 256, 2
    lf = jnp.zeros((B, GA, L))
    chi = jnp.zeros((B, GA, L))
    rsc = jnp.zeros((B, GA, 8))
    scal = jnp.zeros((B, 8))
    spp = jnp.zeros((B, 4, S))
    omgs = jnp.ones((B, L))
    g = jnp.zeros((B, L))
    red = sk.spectrum_tail_pallas(lf, chi, rsc, scal, spp, omgs, interpret=True)
    assert red.shape == (B, L)
    outs = sk.spectrum_tail_pallas_bwd(lf, chi, rsc, scal, spp, omgs, g, interpret=True)
    assert [o.shape for o in outs] == [(B, GA, L), (B, GA, L), (B, GA, 8), (B, 128)]
