"""Interpret-mode checks for the take-2 Pallas interp kernel (wired on TPU)."""

import numpy as np
from numpy.testing import assert_allclose

import jax
from jax import numpy as jnp

from tsadar_tpu.ops.interp_kernel2 import (
    QT,
    cubic_interp_pallas2,
    cubic_interp_pallas2_bwd,
    cubic_segments_for_pallas2,
    lin_interp_pallas2,
    lin_interp_pallas2_bwd,
    segments_for_pallas2,
)
from tsadar_tpu.core.physics.interp import (
    interp1d_cubic_blocked,
    interp1d_linear_blocked,
    interp1d_linear_uniform,
)


def test_lin_interp_pallas2_matches_uniform_interp():
    rng = np.random.default_rng(0)
    B, Q, n = 3, 2 * QT, 2043
    x = jnp.asarray(np.linspace(-8.2, 8.2, n), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    q = jnp.asarray(rng.uniform(-9, 9, (B, Q)), jnp.float32)  # incl. out-of-range
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(n), jnp.float32)])

    out, diff = lin_interp_pallas2(q, segments_for_pallas2(t), meta, interpret=True)
    ref = jax.vmap(lambda a, b: interp1d_linear_uniform(a, x, b))(q, t)
    assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=1e-6)

    pos = jnp.clip((q - x[0]) / (x[1] - x[0]), 0.0, n - 1.0)
    i0 = np.minimum(np.floor(np.asarray(pos)).astype(int), n - 2)
    want = np.take_along_axis(np.asarray(t), i0 + 1, 1) - np.take_along_axis(np.asarray(t), i0, 1)
    assert_allclose(np.asarray(diff), want, rtol=0, atol=1e-6)


def test_bwd_kernel_matches_xla_table_cotangent():
    """Fused backward kernel vs the XLA custom-VJP table cotangent (CPU path)."""
    rng = np.random.default_rng(1)
    B, Q, n, blk = 3, 2 * QT, 2043, 8
    k = -(-(n - 1) // blk)
    c = blk + 1
    x = jnp.asarray(np.linspace(-8.2, 8.2, n), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    q = jnp.asarray(rng.uniform(-9, 9, (B, Q)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, Q)), jnp.float32)
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(n), jnp.float32)])

    D2 = lin_interp_pallas2_bwd(q, g, meta, k, interpret=True)  # [B, 2c, K]
    dseg = np.asarray(jnp.swapaxes(D2[..., :c, :] + D2[..., c:, :], -1, -2))  # [B, K, blk+1]
    # fold overlapping segments back to the table, as interp._blocked_vjp_bwd
    got = np.zeros((B, k * blk + 1))
    got[:, : k * blk] = dseg[..., :blk].reshape(B, -1)
    got[:, blk::blk] += dseg[..., blk]
    got = got[:, :n]

    # reference: the XLA custom-VJP path (CPU dispatch keeps the XLA branch)
    _, vjp = jax.vjp(
        lambda t_: jax.vmap(lambda a, b: interp1d_linear_blocked(a, x, b))(q, t_), t
    )
    (want,) = vjp(g)
    scale = np.abs(np.asarray(want)).max()
    assert_allclose(got, np.asarray(want), rtol=0, atol=3e-5 * scale)


def test_cubic_interp_pallas2_matches_blocked():
    """Cubic forward kernel vs the XLA blocked path (CPU dispatch), incl. dout/dt."""
    rng = np.random.default_rng(2)
    B, Q, n = 3, 2 * QT, 320  # EDF velocity-grid size
    x = jnp.asarray(np.linspace(-7.0, 7.0, n), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    q = jnp.asarray(rng.uniform(-7.5, 7.5, (B, Q)), jnp.float32)  # incl. extrapolation
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(n), jnp.float32)])

    metaB = jnp.broadcast_to(meta[None, :], (B, 3))  # per-row (batched-grid) meta
    out, dout = cubic_interp_pallas2(q, cubic_segments_for_pallas2(t), metaB, interpret=True)

    fn = jax.vmap(lambda a, b: interp1d_cubic_blocked(a, x, b))
    ref, vjp = jax.vjp(lambda q_: fn(q_, t), q)
    (dxq_ref,) = vjp(jnp.ones_like(ref))  # dout/dt / dx is the query cotangent
    dxq = np.asarray(dout) / float(x[1] - x[0])

    # In-domain queries: f32-tight agreement.  Out-of-domain (Hermite
    # extrapolation, t >> 1): the t^3 cancellation amplifies fp-contraction
    # differences between the fused kernel and the eager reference to ~1e-5
    # relative — harmless, because form_factor masks those values to -50 and
    # their cotangents to zero before they enter the physics.
    inside = np.asarray((q >= x[0]) & (q <= x[-1]))
    scale = np.abs(np.asarray(ref)[inside]).max()
    assert_allclose(np.asarray(out)[inside], np.asarray(ref)[inside], rtol=0, atol=1e-6 * scale)
    assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-3, atol=1e-6 * scale)

    dscale = np.abs(np.asarray(dxq_ref)[inside]).max()
    assert_allclose(dxq[inside], np.asarray(dxq_ref)[inside], rtol=0, atol=1e-6 * dscale)
    # derivative cancellation out-of-domain is quadratic in t: looser still
    assert_allclose(dxq, np.asarray(dxq_ref), rtol=3e-3, atol=1e-6 * dscale)


def test_cubic_bwd_kernel_matches_xla_table_cotangent():
    """Fused cubic backward kernel vs the XLA custom-VJP table cotangent."""
    rng = np.random.default_rng(3)
    B, Q, n, blk = 3, 2 * QT, 320, 8
    k = -(-(n - 1) // blk)
    c = blk + 3
    x = jnp.asarray(np.linspace(-7.0, 7.0, n), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    q = jnp.asarray(rng.uniform(-7.5, 7.5, (B, Q)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, Q)), jnp.float32)
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(n), jnp.float32)])

    metaB = jnp.broadcast_to(meta[None, :], (B, 3))
    D2 = cubic_interp_pallas2_bwd(q, g, metaB, k, interpret=True)
    dseg = np.asarray(D2[..., :c] + D2[..., c:])  # [B, K, blk+3]
    # fold overlapping left-padded segments back, as interp._cubic_blocked_vjp_bwd
    npad = k * blk + 3
    got = np.zeros((B, npad))
    got[:, : k * blk] = dseg[..., :blk].reshape(B, -1)
    for cix in range(3):
        nfold = (npad - blk - cix - 1) // blk + 1
        got[:, blk + cix :: blk] += dseg[..., blk + cix][:, :nfold]
    got = got[:, 1 : 1 + n]

    _, vjp = jax.vjp(
        lambda t_: jax.vmap(lambda a, b: interp1d_cubic_blocked(a, x, b))(q, t_), t
    )
    (want,) = vjp(g)
    scale = np.abs(np.asarray(want)).max()
    assert_allclose(got, np.asarray(want), rtol=0, atol=3e-5 * scale)
