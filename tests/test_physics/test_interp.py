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


def test_blocked_linear_matches_gather_linear():
    """interp1d_linear_blocked (TPU gather-free path) == interp1d_linear_uniform.

    Forward must be bit-exact in f32 (three-term bf16 split recovers the full
    f32 mantissa); cotangents agree to f32 roundoff (different summation order).
    """
    from tsadar_tpu.core.physics.interp import (
        interp1d_linear_blocked,
        interp1d_linear_uniform,
    )

    rng = np.random.default_rng(7)
    n = 2043  # production chi_R table length (interleaved mid+node poles)
    x = jnp.asarray(np.linspace(-8.2, 8.2, n), jnp.float32)
    f = jnp.asarray(rng.standard_normal(n) * 50, jnp.float32)
    xq = jnp.asarray(rng.uniform(-9.0, 9.0, 4096), jnp.float32)  # incl. out-of-range

    a = interp1d_linear_uniform(xq, x, f)
    b = interp1d_linear_blocked(xq, x, f)
    assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=0)

    ga = jax.grad(lambda f_: jnp.sum(jnp.sin(interp1d_linear_uniform(xq, x, f_))))(f)
    gb = jax.grad(lambda f_: jnp.sum(jnp.sin(interp1d_linear_blocked(xq, x, f_))))(f)
    assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-5, atol=1e-4)

    ha = jax.grad(lambda q: jnp.sum(jnp.sin(interp1d_linear_uniform(q, x, f))))(xq)
    hb = jax.grad(lambda q: jnp.sum(jnp.sin(interp1d_linear_blocked(q, x, f))))(xq)
    assert_allclose(np.asarray(hb), np.asarray(ha), rtol=1e-5, atol=1e-3)


def test_blocked_linear_vmapped_per_lineout_tables():
    """The production pattern: vmap over per-lineout (queries, tables)."""
    from tsadar_tpu.core.physics.interp import (
        interp1d_linear_blocked,
        interp1d_linear_uniform,
    )

    rng = np.random.default_rng(3)
    n, B = 517, 6  # non-multiple of block: exercises the padding
    x = jnp.asarray(np.linspace(-4.0, 4.0, n), jnp.float32)
    fb = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    qb = jnp.asarray(rng.uniform(-4.5, 4.5, (B, 64, 10)), jnp.float32)

    va = jax.vmap(lambda q, f_: interp1d_linear_uniform(q, x, f_))(qb, fb)
    vb = jax.vmap(lambda q, f_: interp1d_linear_blocked(q, x, f_))(qb, fb)
    assert_allclose(np.asarray(vb), np.asarray(va), rtol=0, atol=0)

    def tot(fn, fb_):
        return jnp.sum(jnp.sin(jax.vmap(lambda q, f_: fn(q, x, f_))(qb, fb_)))

    ga = jax.grad(lambda fb_: tot(interp1d_linear_uniform, fb_))(fb)
    gb = jax.grad(lambda fb_: tot(interp1d_linear_blocked, fb_))(fb)
    assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-5, atol=1e-5)


def test_periodic_rowmix_plus_column_select_matches_bilinear():
    """The 2V TPU path (rowmix + column select) == _interp_beta_v bilinear gather."""
    from tsadar_tpu.core.physics.form_factor import FormFactor
    from tsadar_tpu.core.physics.interp import (
        periodic_linear_rowmix,
        select_columns_linear,
    )

    rng = np.random.default_rng(11)
    R, N, Q = 256, 128, 4097
    v0, dv = -6.0, 12.0 / N

    # rough random table: forward values must agree to the hi/lo-split precision
    table = jnp.asarray(rng.standard_normal((R, N)) * 3, jnp.float32)
    beta_q = jnp.asarray(rng.uniform(-7.0, 13.0, Q), jnp.float32)  # wraps both ways
    v_q = jnp.asarray(rng.uniform(-7.0, 7.0, Q), jnp.float32)  # incl. clamped
    ref = FormFactor._interp_beta_v(table, v0, dv, beta_q, v_q)
    got = select_columns_linear(periodic_linear_rowmix(table, beta_q), v0, dv, v_q)
    # hi/lo bf16 splits carry ~2^-16 of the table scale (|T| ~ 12 here); the
    # consumer (2V table mode) tolerates 2e-2 vs exact mode
    assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-3)

    # gradients on a SMOOTH table: piecewise-linear interp has discontinuous
    # derivatives at cell boundaries, where the two implementations may round
    # the cell index differently; smoothness keeps adjacent-cell slopes close
    # so the comparison tests the math rather than boundary tie-breaking.
    bgrid = np.linspace(0, 2 * np.pi, R, endpoint=False)
    vgrid = v0 + dv * np.arange(N)
    smooth = jnp.asarray(
        3.0 * np.sin(2 * bgrid)[:, None] * np.exp(-0.5 * (vgrid[None, :] / 3.0) ** 2),
        jnp.float32,
    )

    def loss(impl, t, b, v):
        if impl == "ref":
            out = FormFactor._interp_beta_v(t, v0, dv, b, v)
        else:
            out = select_columns_linear(periodic_linear_rowmix(t, b), v0, dv, v)
        return jnp.sum(jnp.sin(out))

    for arg in range(3):
        ga = jax.grad(lambda t, b, v: loss("ref", t, b, v), argnums=arg)(smooth, beta_q, v_q)
        gb = jax.grad(lambda t, b, v: loss("new", t, b, v), argnums=arg)(smooth, beta_q, v_q)
        assert_allclose(np.asarray(gb), np.asarray(ga), rtol=0, atol=5e-3)


def test_bf16_split_reconstructs_f32():
    """_bf16_split must sum back to x to ~2^-24 (f32-exact for 3 terms).

    Regression guard for the XLA excess-precision elision: a split written as
    ``x - x.astype(bf16).astype(f32)`` is constant-folded to zero on TPU,
    silently collapsing the split to one bf16 term; lax.reduce_precision is
    the non-elidable formulation (see CLAUDE.md).
    """
    from tsadar_tpu.core.physics.interp import _bf16_split

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(4096) * 100, jnp.float32)

    @jax.jit
    def recon(x_):
        parts = _bf16_split(x_, 3)
        return sum(p.astype(jnp.float32) for p in parts)

    err = np.abs(np.asarray(recon(x)) - np.asarray(x))
    assert err.max() <= 2.0 ** (-22) * 100  # a couple ulps of slack

    @jax.jit
    def second_term(x_):
        return _bf16_split(x_, 2)[1].astype(jnp.float32)

    # the residual term must NOT be identically zero (elision symptom)
    assert float(jnp.max(jnp.abs(second_term(x)))) > 0.0


def test_hessian_flows_through_custom_vjp_kernels():
    """jax.hessian (jacfwd-of-jacrev, the sigma path) must work through every
    custom-VJP interp kernel.

    Regression: a custom_vjp fwd rule that calls the WRAPPED function instead
    of the plain impl leaves the custom_vjp primitive in the linearized jaxpr,
    and the outer jacfwd then raises "can't apply forward-mode autodiff (jvp)
    to a custom_vjp function" — which silently zeroed all postprocess sigmas
    (the Hessian call is exception-guarded).
    """
    from tsadar_tpu.core.physics.interp import (
        interp1d_cubic_blocked,
        interp1d_cubic_matmul,
        interp1d_linear_blocked,
        interp1d_linear_uniform,
        periodic_linear_rowmix,
    )

    x = jnp.linspace(0.0, 1.0, 50)
    f = jnp.sin(3.0 * x)
    T = jnp.asarray(np.random.default_rng(0).standard_normal((16, 20)))
    bq = jnp.linspace(0.0, 2.0 * np.pi, 33)

    cases = {
        "linear_uniform": lambda t: jnp.sum(interp1d_linear_uniform(x * t, x, f * t) ** 2),
        "linear_blocked": lambda t: jnp.sum(interp1d_linear_blocked(x * t, x, f * t) ** 2),
        "cubic_matmul": lambda t: jnp.sum(interp1d_cubic_matmul(x * t, x, f * t, extrap=(0.0, 0.0)) ** 2),
        "cubic_blocked": lambda t: jnp.sum(interp1d_cubic_blocked(x * t, x, f * t) ** 2),
        "rowmix": lambda t: jnp.sum(periodic_linear_rowmix(T * t, bq * t) ** 2),
    }
    for name, loss in cases.items():
        h = jax.hessian(loss)(0.9)
        assert np.isfinite(float(h)), name


def test_chi_bilinear_kernel_matches_composition():
    """The fused Pallas bilinear lookup (interpret mode) == rowmix + column
    select, in values and all three gradients.

    This is the ARTS hot-path kernel (ops/bilinear_kernel.py); on TPU it
    replaces the composition whenever num_beta % 128 == 0.  The hi/lo
    bf16-split contraction carries ~2^-16 of the table scale, same as the
    composition itself, so the two agree to f32 roundoff-level tolerances.
    """
    from tsadar_tpu.core.physics.interp import (
        periodic_linear_rowmix,
        select_columns_linear,
    )
    from tsadar_tpu.ops.bilinear_kernel import (
        QT,
        chi_bilinear_pallas,
        chi_bilinear_pallas_bwd,
        tables_for_bilinear,
    )

    rng = np.random.default_rng(3)
    R, nvx = 256, 64
    C = 3 * nvx - 2
    Q = 2 * QT
    v0x, dvx = -6.0, 12.0 / nvx
    v0p, dvp = v0x + dvx / 2, dvx

    Tcat = jnp.asarray(rng.standard_normal((R, C)) * 2, jnp.float32)
    bq = jnp.asarray(rng.uniform(-7, 13, Q), jnp.float32)  # wraps both ways
    xq = jnp.asarray(rng.uniform(-7.5, 7.5, Q), jnp.float32)  # incl. clamped
    gs = [jnp.asarray(rng.standard_normal(Q), jnp.float32) for _ in range(3)]

    segs = [(0, nvx, v0x, dvx), (nvx, 2 * nvx, v0x, dvx), (2 * nvx, C, v0p, dvp)]

    def comp_outs(T, b, x):
        S = periodic_linear_rowmix(T, b)
        return [select_columns_linear(S[:, c0:c1], v0, dv, x) for c0, c1, v0, dv in segs]

    refs = comp_outs(Tcat, bq, xq)
    tsplit = tables_for_bilinear(Tcat[None])
    meta = jnp.asarray([[v0x, dvx, v0p, dvp]], jnp.float32)
    outs = chi_bilinear_pallas(bq[None], xq[None], tsplit, meta, nvx, interpret=True)
    for ref, got in zip(refs, outs[:3]):
        scale = float(jnp.max(jnp.abs(ref)))
        assert_allclose(np.asarray(got[0]), np.asarray(ref), rtol=0, atol=3e-6 * scale)

    def comp_loss(T, b, x):
        return sum(jnp.sum(o * g) for o, g in zip(comp_outs(T, b, x), gs))

    dT_ref, db_ref, dx_ref = jax.grad(comp_loss, argnums=(0, 1, 2))(Tcat, bq, xq)
    dt, db = chi_bilinear_pallas_bwd(
        bq[None], xq[None], tsplit, gs[0][None], gs[1][None], gs[2][None], meta, nvx,
        interpret=True,
    )
    dx_got = gs[0] * outs[3][0] + gs[1] * outs[4][0] + gs[2] * outs[5][0]
    for name, ref, got in [
        ("dT", dT_ref, dt[0][:, :C]),
        ("dbeta", db_ref, db[0]),
        ("dxq", dx_ref, dx_got),
    ]:
        scale = float(jnp.max(jnp.abs(ref)))
        assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=3e-6 * scale, err_msg=name)


def test_chi_bilinear_lookup_wrapper_pads_and_differentiates():
    """The custom-VJP wrapper (chi_bilinear_lookup) == composition at a query
    count that is NOT a multiple of the kernel tile, exercising the padding
    path, the 2D query reshape, and the full VJP plumbing (dT, dbeta, dxq).

    Runs the Pallas kernels in interpret mode via the
    ``pallas_interpret_forced`` test hook (the wrapper itself has no
    interpret knob — on TPU it is dispatched from calc_all_chi_vals' table
    mode).
    """
    from tsadar_tpu.core.physics import interp as interp_mod
    from tsadar_tpu.core.physics.interp import (
        chi_bilinear_lookup,
        periodic_linear_rowmix,
        select_columns_linear,
    )

    rng = np.random.default_rng(7)
    R, nvx = 256, 64
    C = 3 * nvx - 2
    shape = (7, 100)  # 700 queries: pads 700 -> 1024 (QT=512)
    v0x, dvx = -6.0, 12.0 / nvx
    # deliberately DIFFERENT pole-grid origin and spacing: a dvx<->dvp swap
    # in the meta packing or segment table must not pass
    v0p, dvp = v0x + 0.37, 1.7 * dvx

    Tcat = jnp.asarray(rng.standard_normal((R, C)) * 2, jnp.float32)
    bq = jnp.asarray(rng.uniform(-7, 13, shape), jnp.float32)
    xq = jnp.asarray(rng.uniform(-7.5, 7.5, shape), jnp.float32)
    gs = [jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3)]

    segs = [(0, nvx, v0x, dvx), (nvx, 2 * nvx, v0x, dvx), (2 * nvx, C, v0p, dvp)]

    def comp_loss(T, b, x):
        S = periodic_linear_rowmix(T, b.reshape(-1))
        tot = 0.0
        for g, (c0, c1, v0, dv) in zip(gs, segs):
            tot += jnp.sum(select_columns_linear(S[:, c0:c1], v0, dv, x.reshape(-1)).reshape(shape) * g)
        return tot

    def kern_loss(T, b, x):
        outs = chi_bilinear_lookup(T, b, x, v0x, dvx, v0p, dvp)
        return sum(jnp.sum(o * g) for o, g in zip(outs, gs))

    with interp_mod.pallas_interpret_forced():
        val_ref, grads_ref = jax.value_and_grad(comp_loss, argnums=(0, 1, 2))(Tcat, bq, xq)
        val_got, grads_got = jax.value_and_grad(kern_loss, argnums=(0, 1, 2))(Tcat, bq, xq)
    assert_allclose(float(val_got), float(val_ref), rtol=2e-5)
    for name, ref, got in zip(("dT", "dbeta", "dxq"), grads_ref, grads_got):
        scale = float(jnp.max(jnp.abs(ref)))
        assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=3e-6 * scale, err_msg=name
        )


def test_pallas_disabled_context_restores():
    """pallas_disabled() must nest and restore on exceptions — the sigma path
    (postprocess.batch_flat_hessian) relies on it to keep pallas_call out of
    jacfwd-of-jacrev traces."""
    from tsadar_tpu.core.physics import interp

    assert interp.pallas_enabled()
    with interp.pallas_disabled():
        assert not interp.pallas_enabled()
        with interp.pallas_disabled():
            assert not interp.pallas_enabled()
        assert not interp.pallas_enabled()
    assert interp.pallas_enabled()

    try:
        with interp.pallas_disabled():
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert interp.pallas_enabled()
