"""Measure the fused Pallas PV-table kernel vs the default XLA Toeplitz path.

Verdict item: ``ops/pv_kernel.py`` must carry a measured number, wired if it
wins. Workload = the batched chi_R pole-table evaluation exactly as the 1V
model runs it per optimizer iteration (``form_factor.py:244-245``): per-lineout
integrand f[h1=1024] -> midpoint + node PV tables [1022], batched over the
lineout axis (B=512, the bench saturating batch).

Prints one JSON line with ms/iter for both paths (forward, and forward+grad)
and the speed ratio. Run on the axon TPU: ``python bench_pv_kernel.py``.
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
B, N = 512, 1024
WARMUP, ITERS = 3, 20


def _timeit(fn, *args):
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    jax.block_until_ready(compiled(*args))
    for _ in range(WARMUP):
        jax.block_until_ready(compiled(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = compiled(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from tsadar_tpu.core.physics import ratint
    from tsadar_tpu.ops.pv_kernel import pv_tables_pallas

    rng = np.random.default_rng(0)
    z = np.linspace(-8.2, 8.2, N)
    f = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    tmid = ratint.pv_toeplitz_kernel(N - 2).astype(jnp.float32)
    tnode = ratint.pv_node_kernel(N - 2).astype(jnp.float32)
    zj = jnp.asarray(z, jnp.float32)

    def xla_tables(fb):
        mid = jax.vmap(lambda fi: ratint.pv_integral_uniform(fi, zj, tmid)[1])(fb)
        node = jax.vmap(lambda fi: ratint.pv_integral_uniform_nodes(fi, zj, tnode)[1])(fb)
        return mid, node

    def pallas_tables(fb):
        mid, node = pv_tables_pallas(fb, tmid, tnode)
        return mid, node[:, : N - 3]

    kmid, knode = ratint.pv_combined_kernels(N - 2)
    kmid = kmid.astype(jnp.float32)
    knode = knode.astype(jnp.float32)

    def matmul_tables(fb):
        return ratint.pv_tables_matmul(fb, kmid, knode)

    # accuracy vs host-f64 truth (single matmul against the combined kernels;
    # verified equal to the two-stage form at 1e-14 in tests/test_ratint).
    # NOTE: at DEFAULT matmul precision the two-stage Toeplitz form is
    # catastrophically ill-conditioned (it multiplies idx in [0,1022) weights
    # in bf16) — that is the point of the precombined form the model uses.
    f64 = np.asarray(f, np.float64)
    mid_true = f64 @ ratint.pv_combined_kernel_np(N - 2, 0.0)
    node_true = (f64 @ ratint.pv_combined_kernel_np(N - 2, 0.5))[:, : N - 3]

    def err_vs_truth(mid, node):
        return max(
            float(np.max(np.abs(np.asarray(mid, np.float64) - mid_true)) / np.max(np.abs(mid_true))),
            float(np.max(np.abs(np.asarray(node, np.float64) - node_true)) / np.max(np.abs(node_true))),
        )

    mx, nx = jax.jit(xla_tables)(f)
    mp, npl = jax.jit(pallas_tables)(f)
    mm, nm = jax.jit(matmul_tables)(f)
    err_xla = err_vs_truth(mx, nx)
    err_pallas = err_vs_truth(mp, npl)
    err_matmul = err_vs_truth(mm, nm)

    ms_xla = _timeit(xla_tables, f)
    ms_pallas = _timeit(pallas_tables, f)
    ms_matmul = _timeit(matmul_tables, f)

    def grad_of(tables):
        def loss(fb):
            mid, node = tables(fb)
            return jnp.sum(mid**2) + jnp.sum(node**2)

        return jax.grad(loss)

    ms_xla_g = _timeit(grad_of(xla_tables), f)
    ms_matmul_g = _timeit(grad_of(matmul_tables), f)
    try:
        ms_pallas_g = _timeit(grad_of(pallas_tables), f)
    except Exception:  # pallas_call has no registered transpose
        ms_pallas_g = None

    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "shape": [B, N],
                "err_vs_f64_xla2stage": float(f"{err_xla:.3g}"),
                "err_vs_f64_pallas": float(f"{err_pallas:.3g}"),
                "err_vs_f64_matmul": float(f"{err_matmul:.3g}"),
                "ms_xla_fwd": round(ms_xla, 3),
                "ms_pallas_fwd": round(ms_pallas, 3),
                "ms_matmul_fwd": round(ms_matmul, 3),
                "ms_xla_fwdbwd": round(ms_xla_g, 3),
                "ms_matmul_fwdbwd": round(ms_matmul_g, 3),
                "ms_pallas_fwdbwd": round(ms_pallas_g, 3) if ms_pallas_g else None,
            }
        )
    )


if __name__ == "__main__":
    main()
