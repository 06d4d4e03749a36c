"""Measure the fused cubic Pallas kernels against the XLA blocked-cubic path.

Production EDF-lookup shapes (B=512 lineouts, Q=10240 queries, n=320 velocity
grid — form_factor.py:254).  Compares the wired ``interp1d_cubic_blocked``
with the Pallas dispatch gate on vs off: forward, and fwd+bwd w.r.t. both the
queries and the table (the fit differentiates through both).  Prints times and
deviations; the verdict is recorded in CLAUDE.md / docs/performance.md.
"""

import os
import time

import numpy as np
import jax
from jax import numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import tsadar_tpu.core.physics.interp as interp_mod  # noqa: E402
from tsadar_tpu.core.physics.interp import interp1d_cubic_blocked  # noqa: E402

B, Q, N = 512, 10240, 320
rng = np.random.default_rng(0)
x = jnp.asarray(np.linspace(-7.0, 7.0, N), jnp.float32)
f = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
q = jnp.asarray(rng.uniform(-6.9, 6.9, (B, Q)), jnp.float32)
g_out = jnp.asarray(rng.standard_normal((B, Q)), jnp.float32)


def fwd(q_, f_):
    return jax.vmap(lambda a, b: interp1d_cubic_blocked(a, x, b))(q_, f_)


def vjp_both(q_, f_, g_):
    out, vjp = jax.vjp(lambda a, b: fwd(a, b), q_, f_)
    dq, df = vjp(g_)
    return dq, df


def best_of(fn, *args, windows=3, iters=8):
    g = jax.jit(fn)
    out = g(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best, out


_gate = interp_mod._use_pallas2

interp_mod._use_pallas2 = lambda xq, f_: False
t_xla, ref = best_of(fwd, q, f)
t_xla_v, (ref_dq, ref_df) = best_of(vjp_both, q, f, g_out)

interp_mod._use_pallas2 = _gate
t_pal, got = best_of(fwd, q, f)
t_pal_v, (got_dq, got_df) = best_of(vjp_both, q, f, g_out)

dev = float(jnp.max(jnp.abs(got - ref)))
dev_dq = float(jnp.max(jnp.abs(got_dq - ref_dq)))
dev_df = float(jnp.max(jnp.abs(got_df - ref_df)))
sc = float(jnp.max(jnp.abs(ref)))
sc_dq = float(jnp.max(jnp.abs(ref_dq)))
sc_df = float(jnp.max(jnp.abs(ref_df)))
print(f"xla blocked-cubic fwd:  {t_xla:7.2f} ms   fwd+bwd: {t_xla_v:7.2f} ms")
print(f"pallas cubic fwd:       {t_pal:7.2f} ms   fwd+bwd: {t_pal_v:7.2f} ms")
print(f"max abs dev  out {dev:.3e} (scale {sc:.3e})  dq {dev_dq:.3e} ({sc_dq:.3e})  df {dev_df:.3e} ({sc_df:.3e})")


# --- small-grid regime (bench.py shapes: nvx=64): form_factor dispatches the
# [Q, N] Hermite weight-matrix form there (interp1d_cubic_matmul); compare it
# against the Pallas blocked path to decide the dispatch threshold.
from tsadar_tpu.core.physics.interp import interp1d_cubic_matmul  # noqa: E402

N2 = 64
x2 = jnp.asarray(np.linspace(-7.0, 7.0, N2), jnp.float32)
f2 = jnp.asarray(rng.standard_normal((B, N2)), jnp.float32)


def fwd_matmul(q_, f_):
    return jax.vmap(lambda a, b: interp1d_cubic_matmul(a, x2, b))(q_, f_)


def fwd_blocked64(q_, f_):
    return jax.vmap(lambda a, b: interp1d_cubic_blocked(a, x2, b))(q_, f_)


def vjp_matmul(q_, f_, g_):
    out, vjp = jax.vjp(fwd_matmul, q_, f_)
    return vjp(g_)


def vjp_blocked64(q_, f_, g_):
    out, vjp = jax.vjp(fwd_blocked64, q_, f_)
    return vjp(g_)


t_mm, _ = best_of(fwd_matmul, q, f2)
t_mm_v, _ = best_of(vjp_matmul, q, f2, g_out)
t_b64, _ = best_of(fwd_blocked64, q, f2)
t_b64_v, _ = best_of(vjp_blocked64, q, f2, g_out)
print(f"n=64 W-matmul fwd:      {t_mm:7.2f} ms   fwd+bwd: {t_mm_v:7.2f} ms")
print(f"n=64 pallas cubic fwd:  {t_b64:7.2f} ms   fwd+bwd: {t_b64_v:7.2f} ms")
