"""Microbench: variants of the blocked-interp table-cotangent transpose on TPU.

Production shape: vmap over B=512 lineouts, Q=10240 queries, table n=2043.
Times the full fwd+bwd of a sum-loss through interp1d_linear_blocked variants.
Not wired into the driver; used to pick the VJP formulation (the axon compiler
shows compile-to-compile lowering variance, so each variant is its own program).
"""

import os
import time

import numpy as np
import jax
from jax import numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from tsadar_tpu.core.physics.interp import (  # noqa: E402
    _bf16_split,
    _blocked_fwd_impl,
    _blocked_indices,
    _BLOCK,
)

B, Q, N = 512, 10240, 2043
rng = np.random.default_rng(0)
x = jnp.asarray(np.linspace(-8.2, 8.2, N), jnp.float32)
f = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
q = jnp.asarray(rng.uniform(-8.0, 8.0, (B, Q)), jnp.float32)


def make_vjp(kind):
    block = _BLOCK

    @jax.custom_vjp
    def terp(xq, f_):
        return _blocked_fwd_impl(xq, x, f_, block)[0]

    def fwd(xq, f_):
        out, (f0, f1) = _blocked_fwd_impl(xq, x, f_, block)
        return out, (xq, f_, f0, f1)

    def bwd(res, g):
        xq, f_, f0, f1 = res
        n = x.shape[0]
        dx = x[1] - x[0]
        blk, lo, w, inside = _blocked_indices(xq, x, block)
        w = w.astype(f_.dtype)
        gq = g.reshape(-1).astype(f_.dtype)
        dxq = jnp.where(inside, gq * (f1 - f0) / dx, 0.0).reshape(jnp.shape(xq)).astype(xq.dtype)
        jj = jnp.arange(block + 1, dtype=jnp.int32)[None, :]
        cot = gq[:, None] * (
            (lo[:, None] == jj) * (1.0 - w[:, None]) + ((lo + 1)[:, None] == jj) * w[:, None]
        ).astype(f_.dtype)
        nblk = -(-(n - 1) // block)
        onehot = (blk[:, None] == jnp.arange(nblk, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
        if kind == "single":
            dseg = jnp.matmul(onehot.T, cot.astype(jnp.bfloat16), preferred_element_type=f_.dtype)
        elif kind == "single_barrier":
            cotb = jax.lax.optimization_barrier(cot.astype(jnp.bfloat16))
            dseg = jnp.matmul(onehot.T, cotb, preferred_element_type=f_.dtype)
        elif kind == "split2":
            ch, cl = _bf16_split(cot, 2)
            D2 = jnp.matmul(onehot.T, jnp.concatenate([ch, cl], axis=-1), preferred_element_type=f_.dtype)
            dseg = D2[..., : block + 1] + D2[..., block + 1 :]
        elif kind == "f32":
            dseg = jnp.matmul(
                onehot.astype(f_.dtype).T, cot, preferred_element_type=f_.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
        npad = nblk * block + 1
        dfpad = jnp.concatenate([dseg[:, :block].reshape(-1), jnp.zeros((1,), f_.dtype)], axis=-1)
        dfpad = dfpad.at[block::block].add(dseg[:, block])
        return dxq, dfpad[:n]

    terp.defvjp(fwd, bwd)
    return terp


def loss_fn(kind):
    terp = make_vjp(kind)

    def loss(q_, f_):
        out = jax.vmap(terp)(q_, f_)
        return jnp.sum(out * out)

    return jax.jit(jax.grad(loss, argnums=(0, 1)))


for kind in ["split2", "single", "single_barrier", "f32"]:
    g = loss_fn(kind)
    out = g(q, f)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = g(q, f)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 5 * 1e3)
    print(f"{kind:16s} fwd+bwd {best:7.2f} ms")
