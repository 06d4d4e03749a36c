"""Parameter-system tests: normalization round trips, DLM physics, filter specs,
partition/combine, gradient flow (mirrors reference build-gate 4, SURVEY.md)."""

import numpy as np
from numpy.testing import assert_allclose

import jax
from jax import numpy as jnp

from tsadar_tpu.core.params import (
    ThomsonParams,
    get_filter_spec,
    partition,
    combine,
    DLM1V,
    Arbitrary1V,
    SphericalHarmonics,
)


def base_cfg(fe_type="dlm", active_m=False, nvx=512):
    return {
        "electron": {
            "Te": {"val": 0.6, "active": True, "lb": 0.01, "ub": 1.5},
            "ne": {"val": 0.2, "active": True, "lb": 0.001, "ub": 1.0},
            "fe": {
                "type": fe_type,
                "dim": 1,
                "nvx": nvx,
                "active": active_m,
                "params": {"m": {"val": 2.5, "lb": 2.0, "ub": 5.0}, "init_m": 2.5},
            },
        },
        "ion-1": {
            "Ti": {"val": 0.2, "active": True, "same": False, "lb": 0.01, "ub": 1.0},
            "Z": {"val": 1.0, "active": False, "lb": 0.5, "ub": 18.0},
            "A": {"val": 1.0, "active": False},
            "fract": {"val": 1.0, "active": False},
        },
        "general": {
            "amp1": {"val": 1.0, "active": False, "lb": 0.01, "ub": 3.75},
            "amp2": {"val": 1.0, "active": False, "lb": 0.01, "ub": 3.75},
            "amp3": {"val": 1.0, "active": False, "lb": 0.01, "ub": 3.75},
            "lam": {"val": 526.5, "active": False, "lb": 523.0, "ub": 528.0},
            "Te_gradient": {"val": 0.0, "active": False, "lb": 0.0, "ub": 10.0, "num_grad_points": 1},
            "ne_gradient": {"val": 0.0, "active": False, "lb": 0.0, "ub": 15.0, "num_grad_points": 1},
            "ud": {"val": 0.0, "angle": 0.0, "active": False, "lb": -10.0, "ub": 10.0},
            "Va": {"val": 0.0, "angle": 0.0, "active": False, "lb": -20.5, "ub": 20.5},
        },
    }


def test_unnormed_round_trip_identity():
    cfg = base_cfg()
    ts = ThomsonParams.create(cfg, num_params=4, batch=True, activate=False)
    p = ts.get_unnormed_params()
    assert_allclose(np.asarray(p["electron"]["Te"]), 0.6, rtol=1e-12)
    assert_allclose(np.asarray(p["electron"]["ne"]), 0.2, rtol=1e-12)
    assert_allclose(np.asarray(p["ion-1"]["Ti"]), 0.2, rtol=1e-12)
    assert_allclose(np.asarray(p["general"]["lam"]), 526.5, rtol=1e-12)
    assert p["electron"]["Te"].shape == (4,)


def test_activated_round_trip_approximate():
    # the stabilized logit is an approximate inverse by design (ref ts_params.py:344)
    cfg = base_cfg()
    ts = ThomsonParams.create(cfg, num_params=1, batch=True, activate=True)
    p = ts.get_unnormed_params()
    assert_allclose(np.asarray(p["electron"]["Te"]), 0.6, rtol=3e-2)
    assert_allclose(np.asarray(p["electron"]["ne"]), 0.2, rtol=3e-2)


def test_dlm_m2_is_maxwellian():
    cfg = base_cfg()["electron"]["fe"]
    cfg["params"]["m"]["val"] = 2.0
    d = DLM1V.create(cfg, 1, batch=False, activate=False)
    f = np.asarray(d())
    vx = np.asarray(d.vx)
    dv = vx[1] - vx[0]
    mx = np.exp(-(vx**2) / 2)
    mx = mx / mx.sum() / dv
    assert_allclose(f, mx, rtol=2e-3, atol=1e-9)


def test_dlm_unit_variance_all_m():
    for m in [2.0, 2.7, 3.5, 5.0]:
        cfg = base_cfg()["electron"]["fe"]
        cfg["params"]["m"]["val"] = m
        d = DLM1V.create(cfg, 1, batch=False, activate=False)
        f = np.asarray(d())
        vx = np.asarray(d.vx)
        dv = vx[1] - vx[0]
        var = np.sum(f * vx**2) * dv
        assert_allclose(var, 1.0, rtol=5e-3), m


def test_dlm_differentiable_in_m():
    cfg = base_cfg()["electron"]["fe"]
    d = DLM1V.create(cfg, 1, batch=False, activate=False)

    def loss(nm):
        import dataclasses

        d2 = dataclasses.replace(d, normed_m=nm)
        return jnp.sum(d2() ** 2)

    g = jax.grad(loss)(d.normed_m)
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_arbitrary1v_normalized():
    cfg = base_cfg("arbitrary")["electron"]["fe"]
    a = Arbitrary1V.create(cfg, 3, batch=True, activate=False)
    f = np.asarray(a())
    assert f.shape[0] == 3
    dv = float(a.vx[1] - a.vx[0])
    assert_allclose(f.sum(axis=-1) * dv, 1.0, rtol=1e-10)
    assert (f > 0).all()


def test_filter_spec_marks_active_leaves():
    cfg = base_cfg(active_m=True)
    ts = ThomsonParams.create(cfg, num_params=2, batch=True, activate=True)
    spec = get_filter_spec(cfg, ts)
    leaves = jax.tree_util.tree_leaves(spec)
    # active: Te, ne, Ti, normed_m -> 4 True leaves
    assert sum(leaves) == 4

    diff, static = partition(ts, spec)
    dleaves = [l for l in jax.tree_util.tree_leaves(diff)]
    assert len(dleaves) == 4
    recon = combine(diff, static)
    p1, p2 = ts(), recon()
    assert_allclose(np.asarray(p1["electron"]["fe"]), np.asarray(p2["electron"]["fe"]))


def test_grad_flows_only_through_active():
    cfg = base_cfg(active_m=True)
    ts = ThomsonParams.create(cfg, num_params=2, batch=True, activate=True)
    spec = get_filter_spec(cfg, ts)
    diff, static = partition(ts, spec)

    def loss(d):
        params = combine(d, static)()
        return jnp.sum(params["electron"]["fe"] ** 2) + jnp.sum(params["electron"]["Te"] ** 2)

    g = jax.grad(loss)(diff)
    gl = jax.tree_util.tree_leaves(g)
    assert len(gl) == 4
    assert all(np.all(np.isfinite(np.asarray(x))) for x in gl)


def test_ion_renormalization_and_tying():
    cfg = base_cfg()
    cfg["ion-2"] = {
        "Ti": {"val": 0.9, "active": False, "same": True, "lb": 0.01, "ub": 1.0},
        "Z": {"val": 6.0, "active": False, "lb": 0.5, "ub": 18.0},
        "A": {"val": 12.0, "active": False},
        "fract": {"val": 3.0, "active": False},
    }
    cfg["ion-1"]["fract"]["val"] = 1.0
    ts = ThomsonParams.create(cfg, num_params=1, batch=True, activate=False)
    p = ts()
    assert_allclose(np.asarray(p["ion-2"]["Ti"]), np.asarray(p["ion-1"]["Ti"]))
    assert_allclose(np.asarray(p["ion-1"]["fract"] + p["ion-2"]["fract"]), 1.0, rtol=1e-12)
    assert_allclose(np.asarray(p["ion-2"]["fract"]), 0.75, rtol=1e-12)


def test_spherical_harmonics_isotropic_arbitrary_flm():
    cfg = {
        "type": "sphericalharmonic",
        "dim": 2,
        "nvx": 64,
        "active": True,
        "params": {"nvr": 32, "Nl": 1, "flm_type": "arbitrary", "init_m": 2.0},
    }
    sph = SphericalHarmonics.create(cfg)
    f = np.asarray(sph())
    vx = np.asarray(sph.vx)
    dv = vx[1] - vx[0]
    assert_allclose(f.sum() * dv * dv, 1.0, rtol=1e-10)
    # ArbitraryVr initializes to zero -> isotropic
    assert_allclose(f, f.T, rtol=1e-8)


def test_spherical_harmonics_mora_yahi_anisotropy():
    cfg = {
        "type": "sphericalharmonic",
        "dim": 2,
        "nvx": 64,
        "active": True,
        "params": {"nvr": 64, "Nl": 1, "flm_type": "mora-yahi", "LTx": 1e3, "LTy": 1e5, "init_m": 2.0},
    }
    sph = SphericalHarmonics.create(cfg)
    f = np.asarray(sph())
    assert np.isfinite(f).all()
    # heat-flux term along x breaks the +x/-x symmetry
    assert not np.allclose(f, f[:, ::-1])
