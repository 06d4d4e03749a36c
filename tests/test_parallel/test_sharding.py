"""Multi-device tests on the virtual 8-CPU mesh: lineout-batch data parallelism
and 2V chi-point sharding (reference form_factor.py:431-447 equivalent)."""

import numpy as np
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from tsadar_tpu.core.physics.form_factor import FormFactor
from tsadar_tpu.parallel import make_mesh, shard_batch, shard_params_batch_axis


def _edf_2v(nv=64):
    vmax = 6.0
    dv = 2 * vmax / nv
    vx = jnp.linspace(-vmax + dv / 2, vmax - dv / 2, nv)
    f2 = jnp.exp(-(vx[:, None] ** 2 + vx[None, :] ** 2) / 2)
    return vx, f2 / jnp.sum(f2) / dv**2


def _params(f2, vx):
    return {
        "electron": {"Te": jnp.asarray(0.5), "ne": jnp.asarray(0.2), "fe": f2, "v": vx},
        "general": {
            "lam": jnp.asarray(526.5),
            "ne_gradient": jnp.asarray(0.0),
            "Te_gradient": jnp.asarray(0.0),
            "ud": jnp.asarray(0.0),
            "Va": jnp.asarray(0.0),
        },
        "ion-1": {"A": jnp.asarray(1.0), "Z": jnp.asarray(1.0), "Ti": jnp.asarray(0.2), "fract": jnp.asarray(1.0)},
    }


def test_2v_point_sharding_matches_unsharded():
    assert jax.device_count() >= 8
    vx, f2 = _edf_2v()
    sa = {"sa": np.linspace(50, 70, 8)}
    kw = dict(npts=256, lam_shift=0.0, scattering_angles=sa, num_grad_points=1, ud_ang=0.0, va_ang=0.0, num_beta=64)
    ff_plain = FormFactor([450, 650], **kw)
    ff_shard = FormFactor([450, 650], shard_points=True, **kw)
    assert ff_shard._point_sharding is not None

    p = _params(f2, vx)
    S0, _ = jax.jit(ff_plain.calc_in_2D)(p)
    S1, _ = jax.jit(ff_shard.calc_in_2D)(p)
    assert_allclose(np.asarray(S1), np.asarray(S0), rtol=1e-10)


def test_2v_point_sharded_value_and_grad_matches_unsharded():
    """Gradient of the point-sharded 2V chi path on the mesh (r3 VERDICT #2).

    The production use of shard_points is inside value_and_grad of an angular
    fit — the backward of the with_sharding_constraint'd point axis (its
    transpose re-applies the sharding; the table contributions reduce across
    shards) must be a pure performance transformation. f64 CPU runs the plain
    XLA table path; tolerances are collective-reduction roundoff only."""
    assert jax.device_count() >= 8
    vx, f2 = _edf_2v()
    sa = {"sa": np.linspace(50, 70, 8)}
    kw = dict(npts=256, lam_shift=0.0, scattering_angles=sa, num_grad_points=1, ud_ang=0.0, va_ang=0.0, num_beta=64)
    ff_plain = FormFactor([450, 650], **kw)
    ff_shard = FormFactor([450, 650], shard_points=True, **kw)
    assert ff_shard._point_sharding is not None

    w = jnp.cos(jnp.arange(256, dtype=f2.dtype))

    def make_vg(ff):
        def loss(fe, Te, ne):
            p = _params(f2, vx)
            p["electron"]["fe"] = fe
            p["electron"]["Te"] = Te
            p["electron"]["ne"] = ne
            S, _ = ff.calc_in_2D(p)
            S = jnp.squeeze(S)  # [n_lam, n_angles]
            return jnp.sum(S * w[:, None])
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    args = (f2, jnp.asarray(0.5), jnp.asarray(0.2))
    v0, g0 = make_vg(ff_plain)(*args)
    v1, g1 = make_vg(ff_shard)(*args)

    assert_allclose(float(v1), float(v0), rtol=1e-10)
    for name, a, b in zip(("dfe", "dTe", "dne"), g1, g0):
        scale = float(np.max(np.abs(np.asarray(b)))) or 1.0
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10 * scale, err_msg=name)


def test_2v_point_sharded_kernel_value_and_grad_matches_unsharded():
    """Same gate through the FUSED KERNEL dispatch (interpret-forced, f32,
    num_beta % 128 == 0): the query-axis GSPMD rule's backward all-reduces the
    table cotangent across the point shards (ops.partitioning axis_partitioned
    psum_outs) inside the full calc_in_2D trace — the ARTS production path."""
    from tsadar_tpu.core.physics import interp

    assert jax.device_count() >= 8
    vx, f2 = _edf_2v()
    sa = {"sa": np.linspace(50, 70, 8)}
    kw = dict(npts=256, lam_shift=0.0, scattering_angles=sa, num_grad_points=1,
              ud_ang=0.0, va_ang=0.0, num_beta=128)
    w = jnp.cos(jnp.arange(256, dtype=jnp.float32))

    def make_vg(ff):
        def loss(fe, Te, ne):
            p = _params(f2, vx)
            p["electron"]["fe"] = fe
            p["electron"]["Te"] = Te
            p["electron"]["ne"] = ne
            p = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), p)
            S, _ = ff.calc_in_2D(p)
            S = jnp.squeeze(S)  # [n_lam, n_angles]
            return jnp.sum(S * w[:, None])
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    args = (jnp.asarray(f2, jnp.float32), jnp.float32(0.5), jnp.float32(0.2))
    with interp.pallas_interpret_forced():
        ff_plain = FormFactor([450, 650], **kw)
        ff_shard = FormFactor([450, 650], shard_points=True, **kw)
        assert ff_shard._point_sharding is not None
        v0, g0 = make_vg(ff_plain)(*args)
        v1, g1 = make_vg(ff_shard)(*args)

    # CPU bf16-gemm accumulation order differs between the sharded and
    # unsharded lowerings (see test_pallas_interp_partitioned_matches_unsharded)
    assert_allclose(float(v1), float(v0), rtol=1e-5)
    for name, a, b in zip(("dfe", "dTe", "dne"), g1, g0):
        scale = float(np.max(np.abs(np.asarray(b)))) or 1.0
        assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4 * scale, err_msg=name)


def test_batch_sharding_lineout_axis():
    mesh = make_mesh(8)
    batch = {"e_data": np.arange(8 * 16, dtype=float).reshape(8, 16)}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["e_data"].sharding.device_set) == 8

    tree = {"a": jnp.zeros((8, 4)), "b": jnp.zeros((3,))}
    placed = shard_params_batch_axis(tree, mesh, batch_size=8)
    assert len(placed["a"].sharding.device_set) == 8
    # non-batch leaves replicated
    assert placed["b"].sharding.is_fully_replicated


def test_sharded_training_step_matches_unsharded():
    """One full fit step (loss + grad + adam) sharded over 8 devices == unsharded.

    The strongest multi-chip gate: data-parallel sharding of the lineout batch
    (batch arrays and per-lineout parameter leaves P("batch"), tables
    replicated) must be a pure performance transformation — identical loss and
    identical updated parameters up to collective-reduction roundoff.
    """
    import optax
    from __graft_entry__ import _small_config, _make_batch
    from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition
    from tsadar_tpu.inverse.loss import LossFunction
    from tsadar_tpu.parallel import shard_batch, shard_params_batch_axis
    from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles

    assert jax.device_count() >= 8
    batch_size = 8
    cfg = _small_config(batch_size)
    sas = get_scattering_angles(cfg)
    batch = _make_batch(batch_size)

    loss_fn = LossFunction(cfg, sas, batch)
    ts_params = ThomsonParams.create(cfg["parameters"], num_params=batch_size, batch=True, activate=True)
    spec = get_filter_spec(cfg["parameters"], ts_params)
    diff0, static = partition(ts_params, spec)

    opt = optax.adam(1e-2)

    def train_step(dp, state, st, b):
        (value, _), grad = jax.value_and_grad(loss_fn.__loss__, has_aux=True)(dp, st, b)
        updates, state = opt.update(grad, state)
        return optax.apply_updates(dp, updates), state, value

    # unsharded (single-device) reference
    dp_ref, _, v_ref = jax.jit(train_step)(diff0, opt.init(diff0), static, batch)

    mesh = make_mesh(8)
    batch_sh = shard_batch(batch, mesh)
    diff_sh = shard_params_batch_axis(diff0, mesh, batch_size)
    static_sh = shard_params_batch_axis(static, mesh, batch_size)
    dp_sh, _, v_sh = jax.jit(train_step)(diff_sh, opt.init(diff_sh), static_sh, batch_sh)

    assert_allclose(float(v_sh), float(v_ref), rtol=1e-12)
    for a, b_ in zip(jax.tree.leaves(dp_sh), jax.tree.leaves(dp_ref)):
        assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-10, atol=1e-12)


def test_sharded_train_step_is_actually_partitioned():
    """GSPMD must PARTITION the training step, not elide the shardings.

    Asserts the compiled program (a) keeps the batch-axis input shardings
    (each device holds 1/8 of the lineout axis), and (b) contains cross-device
    collectives (the scalar loss and the shared-static contributions need an
    all-reduce over the mesh).  Guards against a silent regression to a fully
    replicated program, which bit-exactness tests alone cannot catch.
    """
    import optax

    from __graft_entry__ import _make_batch, _small_config
    from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition
    from tsadar_tpu.inverse.loss import LossFunction
    from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles

    n = 8
    cfg = _small_config(n)
    sas = get_scattering_angles(cfg)
    batch = _make_batch(n)
    loss_fn = LossFunction(cfg, sas, batch)
    ts_params = ThomsonParams.create(cfg["parameters"], num_params=n, batch=True, activate=True)
    diff0, static = partition(ts_params, get_filter_spec(cfg["parameters"], ts_params))

    mesh = make_mesh(n)
    batch = shard_batch(batch, mesh)
    diff0 = shard_params_batch_axis(diff0, mesh, n)
    static = shard_params_batch_axis(static, mesh, n)

    opt = optax.adam(1e-2)
    state = opt.init(diff0)

    def train_step(dp, st, b):
        (value, _), grad = jax.value_and_grad(loss_fn.__loss__, has_aux=True)(dp, static, b)
        updates, st = opt.update(grad, st)
        return optax.apply_updates(dp, updates), st, value

    compiled = jax.jit(train_step).lower(diff0, state, batch).compile()

    # (a) the batch data stays sharded along the lineout axis
    in_shardings = jax.tree_util.tree_leaves(
        compiled.input_shardings[0], is_leaf=lambda x: hasattr(x, "device_set")
    )
    assert any(len(s.device_set) == n for s in in_shardings)
    e_shard = batch["e_data"].sharding
    shard_shape = e_shard.shard_shape(batch["e_data"].shape)
    assert shard_shape[0] == 1  # 8-row batch split one lineout per device

    # (b) cross-device collectives exist in the partitioned module
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "no all-reduce in the sharded train step HLO"

    # and it runs
    dp, state, value = compiled(diff0, state, batch)
    assert np.isfinite(float(value))


def test_one_d_loop_data_parallel_matches_single():
    """The PRODUCTION fit loop goes data-parallel automatically on a multi-
    device backend (`optimizer.parallel`, default on) and must produce the
    same fit as the single-device path — the dryrun/test-only sharded step
    above is now the actual `one_d_loop` code path."""
    from __graft_entry__ import _make_batch, _small_config
    from tsadar_tpu.inverse.loops import _fit_mesh, one_d_loop

    assert jax.device_count() >= 8
    batch_size = 8
    all_data = _make_batch(batch_size)
    all_data = {
        "e_data": all_data["e_data"],
        "e_amps": all_data["e_amps"],
        "i_data": all_data["i_data"],
        "i_amps": all_data["i_amps"],
        "noiseE": all_data["noise_e"],
        "noiseI": all_data["noise_i"],
    }
    from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles

    losses = {}
    for parallel in (True, False):
        cfg = _small_config(batch_size)
        cfg["optimizer"]["num_epochs"] = 2
        cfg["optimizer"]["chunk_size"] = 2
        cfg["optimizer"]["parallel"] = parallel
        assert (_fit_mesh(cfg) is not None) == parallel
        sas = get_scattering_angles(cfg)
        weights, loss, _ = one_d_loop(cfg, all_data, sas, np.arange(batch_size), 1)
        losses[parallel] = loss
        assert np.isfinite(loss)

    assert_allclose(losses[True], losses[False], rtol=1e-10)


def test_one_d_loop_lbfgs_data_parallel_matches_single():
    """The device-resident L-BFGS path also shards; parity vs single-device."""
    from __graft_entry__ import _make_batch, _small_config
    from tsadar_tpu.inverse.loops import one_d_loop

    batch_size = 8
    b = _make_batch(batch_size)
    all_data = {
        "e_data": b["e_data"], "e_amps": b["e_amps"],
        "i_data": b["i_data"], "i_amps": b["i_amps"],
        "noiseE": b["noise_e"], "noiseI": b["noise_i"],
    }
    from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles

    losses = {}
    for parallel in (True, False):
        cfg = _small_config(batch_size)
        cfg["optimizer"]["method"] = "lbfgs"
        cfg["optimizer"]["num_epochs"] = 2
        cfg["optimizer"]["parallel"] = parallel
        sas = get_scattering_angles(cfg)
        _, loss, _ = one_d_loop(cfg, all_data, sas, np.arange(batch_size), 1)
        losses[parallel] = loss
        assert np.isfinite(loss)

    assert_allclose(losses[True], losses[False], rtol=1e-10)


def test_fit_mesh_trims_to_batch_divisor():
    """batch sizes not divisible by the device count get the largest dividing
    mesh (GSPMD would otherwise pad the batch axis)."""
    from __graft_entry__ import _small_config
    from tsadar_tpu.inverse.loops import _fit_mesh

    cfg = _small_config(6)  # 8 devices, batch 6 -> mesh of 6
    cfg["optimizer"]["parallel"] = True
    assert _fit_mesh(cfg).devices.size == 6
    cfg = _small_config(7)  # 7 is prime < 8 -> mesh of 7
    cfg["optimizer"]["parallel"] = True
    assert _fit_mesh(cfg).devices.size == 7
    cfg = _small_config(1)  # degenerate -> no mesh
    cfg["optimizer"]["parallel"] = True
    assert _fit_mesh(cfg) is None
    cfg = _small_config(8)
    cfg["optimizer"]["parallel"] = False
    assert _fit_mesh(cfg) is None
    # unset on CPU -> off (virtual CPU devices are same-core threads)
    cfg = _small_config(8)
    assert _fit_mesh(cfg) is None


def test_param_sharding_mask_protects_grid_leaves():
    """With nvx == batch_size the velocity grid's leading dim coincides with
    the batch size; the exact batched-leaf mask must still replicate it (the
    leading-dim heuristic would shard it along the VELOCITY axis and buy
    per-step all-gathers)."""
    import jax.tree_util as jtu

    from __graft_entry__ import _make_batch, _small_config
    from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition
    from tsadar_tpu.inverse.loops import _fit_mesh, _shard_fit_state

    batch_size = 8
    cfg = _small_config(batch_size)
    cfg["parameters"]["electron"]["fe"]["nvx"] = batch_size  # the collision
    cfg["optimizer"]["parallel"] = True
    ts_params = ThomsonParams.create(cfg["parameters"], num_params=batch_size, batch=True, activate=True)
    diff, static = partition(ts_params, get_filter_spec(cfg["parameters"], ts_params))

    mesh = _fit_mesh(cfg)
    assert mesh is not None
    _, diff_sh, static_sh = _shard_fit_state(mesh, cfg, _make_batch(batch_size), diff, static)

    placed = {
        jtu.keystr(path): leaf
        for path, leaf in jtu.tree_leaves_with_path(static_sh)
        if hasattr(leaf, "sharding")
    }
    vx = next(v for k, v in placed.items() if k.endswith(".vx"))
    assert vx.shape == (batch_size,)  # the coincidence is actually present
    assert vx.sharding.is_fully_replicated
    # while genuinely per-lineout leaves are sharded one row per device
    ti = next(v for k, v in placed.items() if "Ti" in k)
    assert ti.sharding.shard_shape(ti.shape)[0] == 1


def test_shard_2v_points_config_plumbing():
    """`other.shard_2v_points: true` must reach the FormFactor through
    LossFunction (the CLI/fitter path) — the flag is how a multi-chip ARTS
    run opts into chi-point sharding."""
    import os

    import yaml

    from tsadar_tpu.inverse.loss import LossFunction
    from tsadar_tpu.utils.config import merge_configs, set_forward_ranges
    from tsadar_tpu.utils.data_handling.calibration import (
        get_scattering_angles,
    )

    here = os.path.join(os.path.dirname(__file__), "..", "configs")
    with open(os.path.join(here, "arts2v_test_defaults.yaml")) as fi:
        defaults = yaml.safe_load(fi)
    with open(os.path.join(here, "arts2d_test_inputs.yaml")) as fi:
        inputs = yaml.safe_load(fi)
    cfg = set_forward_ranges(merge_configs(defaults, inputs))
    cfg["other"]["shard_2v_points"] = True
    sas = get_scattering_angles(cfg)
    dummy = {"e_data": np.ones((4, 4)), "i_data": np.ones((4, 4))}

    lf = LossFunction(cfg, sas, dummy)
    ff = lf.ts_diag.model.electron_form_factor
    assert ff._point_sharding is not None

    cfg["other"]["shard_2v_points"] = False
    lf2 = LossFunction(cfg, sas, dummy)
    assert lf2.ts_diag.model.electron_form_factor._point_sharding is None


def test_multi_device_fit_keeps_pallas_unless_opted_out():
    """Multi-device fit meshes keep the fused Pallas kernels by default — the
    kernels carry an explicit leading-batch-dim GSPMD rule
    (ops.partitioning.batch0_partitioned), so each device runs the kernel on
    its lineout shard.  `optimizer.pallas_sharded: false` opts back into the
    pure-XLA lowerings as a fallback (loops._pallas_ctx docstring)."""
    from tsadar_tpu.core.physics import interp
    from tsadar_tpu.inverse.loops import _pallas_ctx
    from tsadar_tpu.parallel import make_mesh

    assert interp.pallas_enabled()
    with _pallas_ctx(make_mesh(2)):
        assert interp.pallas_enabled()  # default: sharded Pallas stays on
    cfg = {"optimizer": {"pallas_sharded": False}}
    with _pallas_ctx(make_mesh(2), cfg):
        assert not interp.pallas_enabled()
    assert interp.pallas_enabled()  # restored on exit
    with _pallas_ctx(None, cfg):
        assert interp.pallas_enabled()  # opt-out is a no-op without a mesh
    with _pallas_ctx(make_mesh(1), cfg):
        assert interp.pallas_enabled()


def test_pallas_interp_partitioned_matches_unsharded():
    """The fused interp kernels under a 2-device mesh (interpret mode via the
    test hook) must match the unsharded kernels AND the pure-XLA lowering —
    forward and both cotangents, linear and cubic.  This exercises the
    library-level dispatch (interp1d_*_blocked), the custom_vjp, the
    custom_vmap lift, and the GSPMD partitioning rule together.

    Tolerances are CPU-backend bf16-gemm roundoff (~2^-16 of scale): the
    interpret-mode kernel and the XLA lowering run their bf16-split dots
    through different gemm shapes/schedules, and accumulation order is
    shape- and compile-dependent.  Pallas-vs-XLA BIT-exactness holds for the
    Mosaic-compiled kernels on the chip (pinned by bench.py's on-chip
    accuracy gate and the kernel wiring history in docs/performance.md),
    not for interpret mode on CPU.

    Each leg builds a FRESH jit: the dispatch flags (_PALLAS_ENABLED /
    _PALLAS_INTERPRET) are Python globals invisible to the jit cache, so
    reusing one jitted callable across contexts silently reuses the first
    leg's executable."""
    from tsadar_tpu.core.physics import interp
    from tsadar_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, Q, n = 8, 2048, 160
    key = jax.random.PRNGKey(0)
    kq, kf = jax.random.split(key)
    x = jnp.linspace(-2.0, 3.0, n, dtype=jnp.float32)
    f = jax.random.normal(kf, (B, n), dtype=jnp.float32)
    xq = jax.random.uniform(kq, (B, Q), dtype=jnp.float32, minval=-2.0, maxval=3.0)

    mesh = make_mesh(2)
    shard = NamedSharding(mesh, P("batch"))

    for fn in (interp.interp1d_linear_blocked, interp.interp1d_cubic_blocked):
        def loss(xq_, f_):
            # grid shared across the batch (the linear kernel requires it —
            # production chi_R grids are static), queries/tables per-lineout
            out = jax.vmap(fn, in_axes=(0, None, 0))(xq_, x, f_)
            return jnp.sum(out * jnp.cos(jnp.arange(Q, dtype=jnp.float32))), out

        def fresh_vg():
            return jax.jit(jax.value_and_grad(loss, argnums=(0, 1), has_aux=True))

        # pure-XLA reference (Pallas off)
        with interp.pallas_disabled():
            (l_ref, out_ref), (gq_ref, gf_ref) = fresh_vg()(xq, f)

        with interp.pallas_interpret_forced():
            # unsharded Pallas (interpret)
            (l_u, out_u), (gq_u, gf_u) = fresh_vg()(xq, f)
            # sharded Pallas (interpret) — batch axis split 4 rows/device
            args_sh = jax.device_put((xq, f), shard)
            (l_s, out_s), (gq_s, gf_s) = fresh_vg()(*args_sh)

        def close(a, b, msg):
            scale = float(np.max(np.abs(np.asarray(b)))) or 1.0
            assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                            atol=1e-4 * scale, err_msg=msg)

        # Pallas (interpret) vs the XLA lowering: same math, roundoff only
        close(out_u, out_ref, "pallas-vs-xla out")
        close(gq_u, gq_ref, "pallas-vs-xla gq")
        close(gf_u, gf_ref, "pallas-vs-xla gf")
        # sharded vs unsharded Pallas: the partitioning rule is pure
        # data-parallel decomposition, same roundoff class
        close(out_s, out_u, "sharded out")
        close(gq_s, gq_u, "sharded gq")
        close(gf_s, gf_u, "sharded gf")
        # the scalar loss reduces per-shard then all-reduces — a different
        # summation ORDER than the single-device sum (f32 roundoff only)
        assert_allclose(float(l_s), float(l_u), rtol=1e-5)


def test_2v_point_sharded_kernel_path_matches_unsharded():
    """Full calc_in_2D with point sharding through the FUSED KERNEL path
    (interpret-forced: the CPU mesh runs the TPU table-mode dispatch,
    num_beta % 128 == 0 so the bilinear kernel engages, and the query-axis
    GSPMD rule partitions it).  Must match the unsharded spectrum."""
    from tsadar_tpu.core.physics import interp

    assert jax.device_count() >= 8
    vx, f2 = _edf_2v()
    sa = {"sa": np.linspace(50, 70, 8)}
    kw = dict(npts=256, lam_shift=0.0, scattering_angles=sa, num_grad_points=1,
              ud_ang=0.0, va_ang=0.0, num_beta=128)
    p = _params(f2, vx)
    # f32 params: the kernels are f32-only (TPU dtype policy)
    p = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), p)

    with interp.pallas_interpret_forced():
        ff_plain = FormFactor([450, 650], **kw)
        ff_shard = FormFactor([450, 650], shard_points=True, **kw)
        assert ff_shard._point_sharding is not None
        S0, _ = jax.jit(ff_plain.calc_in_2D)(p)
        S1, _ = jax.jit(ff_shard.calc_in_2D)(p)
    scale = float(np.max(np.abs(np.asarray(S0))))
    assert_allclose(np.asarray(S1), np.asarray(S0), rtol=2e-4, atol=1e-5 * scale)


def test_bilinear_lookup_point_sharded_matches_unsharded():
    """The fused 2V bilinear chi lookup under a point-sharded mesh (ARTS
    multi-chip: queries sharded, tables replicated) must match the unsharded
    kernel — values and all three gradients.  The backward's table cotangent
    sums over every query shard, so its per-shard lowering all-reduces
    (ops.partitioning.axis_partitioned psum_outs); this test pins that the
    collective reduction is complete and placed correctly."""
    from tsadar_tpu.core.physics import interp
    from tsadar_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    R, nvx, Q = 128, 32, 4096  # Q = QT * 8 -> whole tiles per device
    C = 3 * nvx - 2
    key = jax.random.PRNGKey(2)
    kt, kb, kx = jax.random.split(key, 3)
    Tcat = jax.random.normal(kt, (R, C), dtype=jnp.float32)
    beta = jax.random.uniform(kb, (Q,), dtype=jnp.float32, minval=-7.0, maxval=7.0)
    xq = jax.random.uniform(kx, (Q,), dtype=jnp.float32, minval=-1.0, maxval=7.5)
    v0x, dvx = -1.0, 8.5 / (nvx - 1)
    v0p, dvp = -1.2, 9.0 / (nvx - 3)
    w = jnp.sin(jnp.arange(Q, dtype=jnp.float32))

    def make_loss(nshards):
        def loss(T, b, x):
            fe, dfe, chiR = interp.chi_bilinear_lookup(
                T, b, x, v0x, dvx, v0p, dvp, nshards=nshards
            )
            return jnp.sum(w * (fe + 2.0 * dfe + 3.0 * chiR)), (fe, dfe, chiR)
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True))

    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("batch"))

    with interp.pallas_interpret_forced():
        (l_u, outs_u), grads_u = make_loss(1)(Tcat, beta, xq)
        b_sh = jax.device_put(beta, shard)
        x_sh = jax.device_put(xq, shard)
        (l_s, outs_s), grads_s = make_loss(8)(Tcat, b_sh, x_sh)

    scale = float(np.max(np.abs(np.asarray(outs_u[2]))))
    for a, b_ in zip(outs_s, outs_u):
        assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                        atol=1e-5 * scale)
    names = ("dT", "dbeta", "dxq")
    for name, a, b_ in zip(names, grads_s, grads_u):
        gs = float(np.max(np.abs(np.asarray(b_)))) or 1.0
        assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                        atol=1e-4 * gs, err_msg=name)
    assert_allclose(float(l_s), float(l_u), rtol=1e-5)


def test_pallas_partitioned_lowering_is_local():
    """The partitioned kernel program must actually be LOCAL: the per-shard
    lowering sees the shard-local batch (B/ndev rows), and the partitioned
    module contains no cross-device collectives for the kernel outputs
    (dim-0 sharding in, dim-0 sharding out)."""
    from tsadar_tpu.ops.interp_kernel2 import lin_interp_pallas2, segments_for_pallas2
    from tsadar_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, Q, n = 8, 2048, 160
    x0, dx = -2.0, 5.0 / (n - 1)
    f = jax.random.normal(jax.random.PRNGKey(1), (B, n), dtype=jnp.float32)
    xq = jnp.linspace(-1.5, 2.5, Q, dtype=jnp.float32)
    xq = jnp.broadcast_to(xq, (B, Q))
    meta = jnp.stack([jnp.float32(x0), jnp.float32(dx), jnp.float32(n)])
    segt = segments_for_pallas2(f)

    mesh = make_mesh(8)
    qs = jax.device_put(xq, NamedSharding(mesh, P("batch")))
    ss = jax.device_put(segt, NamedSharding(mesh, P("batch")))

    fn = jax.jit(lambda a, b, m: lin_interp_pallas2(a, b, m, interpret=True))
    lowered = fn.lower(qs, ss, meta).compile()
    out, diff = fn(qs, ss, meta)
    # outputs stay sharded along the batch axis, one row per device
    assert out.sharding.shard_shape(out.shape)[0] == 1
    assert "all-gather" not in lowered.as_text()
    assert "all-reduce" not in lowered.as_text()
