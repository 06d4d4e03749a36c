"""Measure the take-2 Pallas interp kernel against the XLA blocked path.

Forward-only at production shapes (B=512 lineouts, Q=10240 queries, n=2043
chi_R table).  Prints per-variant times and max deviation; the verdict (and
whether the kernel is wired) is recorded in CLAUDE.md / docs/performance.md.
"""

import os
import time

import numpy as np
import jax
from jax import numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from tsadar_tpu.core.physics.interp import interp1d_linear_blocked  # noqa: E402
from tsadar_tpu.ops.interp_kernel2 import QT, lin_interp_pallas2, segments_for_pallas2  # noqa: E402

B, Q, N = 512, 10240, 2043
rng = np.random.default_rng(0)
x = jnp.asarray(np.linspace(-8.2, 8.2, N), jnp.float32)
f = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
q = jnp.asarray(rng.uniform(-8.0, 8.0, (B, Q)), jnp.float32)
meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(N), jnp.float32)])


def xla_fwd(q_, f_):
    return jax.vmap(lambda a, b: interp1d_linear_blocked(a, x, b))(q_, f_)


def pallas_fwd(q_, f_):
    qpad = -Q % QT
    qq = jnp.concatenate([q_, jnp.full((B, qpad), x[0], q_.dtype)], axis=1) if qpad else q_
    segt = segments_for_pallas2(f_)
    out, _ = lin_interp_pallas2(qq, segt, meta)
    return out[:, :Q]


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


t_xla, ref = best_of(xla_fwd, q, f)
t_pal, got = best_of(pallas_fwd, q, f)
dev = float(jnp.max(jnp.abs(jnp.asarray(got) - jnp.asarray(ref))))
print(f"xla blocked fwd:   {t_xla:7.2f} ms")
print(f"pallas2 fwd:       {t_pal:7.2f} ms")
print(f"max abs deviation: {dev:.3e}")


# --- fwd+bwd: the wired custom-VJP path dispatches fwd AND bwd to Pallas on
# TPU; compare against the XLA formulations by toggling the dispatch gate.
import tsadar_tpu.core.physics.interp as interp_mod  # noqa: E402

g_out = jnp.asarray(rng.standard_normal((B, Q)), jnp.float32)


def vjp_tables(q_, f_, g_):
    _, vjp = jax.vjp(lambda t_: xla_fwd(q_, t_), f_)
    return vjp(g_)[0]


_gate = interp_mod._use_pallas2
interp_mod._use_pallas2 = lambda xq, f: False
t_xla_vjp, ref_df = best_of(vjp_tables, q, f, g_out)
interp_mod._use_pallas2 = _gate
t_pal_vjp, got_df = best_of(vjp_tables, q, f, g_out)
dev_df = float(jnp.max(jnp.abs(jnp.asarray(got_df) - jnp.asarray(ref_df))))
scale = float(jnp.max(jnp.abs(jnp.asarray(ref_df))))
print(f"xla fwd+bwd (df):  {t_xla_vjp:7.2f} ms")
print(f"pallas2 fwd+bwd:   {t_pal_vjp:7.2f} ms")
print(f"df max abs dev:    {dev_df:.3e}  (scale {scale:.3e})")
