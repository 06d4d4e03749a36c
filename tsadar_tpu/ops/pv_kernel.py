"""Pallas TPU kernel: fused pole-integral table evaluation.

Fuses the three stages of the batched chi_R pole sweep —
(1) finite-difference prep (fav, fdif, index weighting) from the integrand,
(2) the two static-Toeplitz contractions (midpoint + node kernels, MXU),
(3) the affine recombination into the interleaved pole table —
into one kernel so the intermediates never round-trip through HBM.

Equivalent to ``ratint.pv_integral_uniform(+_nodes)`` batched over lineouts
(validated against them in tests/test_ops).

MEASURED (v5e, f32 [512, 1024], bench_pv_kernel.py): this kernel beats the
two-stage XLA Toeplitz formulation forward (1.58 ms vs 1.69-6.25 ms — the axon
compiler's lowering choice for the vmap'd matvecs varies run to run) but has
no autodiff transpose, and both are superseded by the fully-precombined
single-matmul form ``ratint.pv_tables_matmul`` (1.59 ms fwd, 1.60 ms fwd+bwd,
natively differentiable, and ~1000x less f32 cancellation error: 2e-7 vs
1.6e-4 of table max against f64 truth at 'highest' matmul precision; at
default bf16 precision the two-stage form is outright wrong, rel err > 2).
The precombined matmul is wired into the model; this kernel stays as the
tested Pallas reference point.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pv_tables_kernel(f_ref, tmid_ref, tnode_ref, mid_ref, node_ref):
    f = f_ref[:]  # [B, N]
    fav = 0.5 * (f[:, 1:-1] + f[:, 0:-2])  # [B, M]
    fdif = f[:, 1:-1] - f[:, 0:-2]
    m = fav.shape[1]
    # Mosaic requires integer iota; convert after (float iota fails verification)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1).astype(fav.dtype)

    a_mid = fav - idx * fdif
    a_node = fav - (idx + 0.5) * fdif

    # G = A @ T^T : T[p, i] contracted over i
    g1m = jax.lax.dot_general(
        a_mid, tmid_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f.dtype,
    )
    g2m = jax.lax.dot_general(
        fdif, tmid_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f.dtype,
    )
    g1n = jax.lax.dot_general(
        a_node, tnode_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f.dtype,
    )
    g2n = jax.lax.dot_general(
        fdif, tnode_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f.dtype,
    )

    fsum = jnp.sum(fdif, axis=1, keepdims=True)
    mid_ref[:] = fsum + g1m + idx * g2m
    node_ref[:] = fsum + g1n + (idx + 1.0) * g2n


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def pv_tables_pallas(f, tmid, tnode, interpret=False, block_b=64):
    """Batched PV tables: f [B, N] -> (mid [B, N-2], node [B, N-2]).

    ``node[:, :N-3]`` matches ``pv_integral_uniform_nodes`` (its last column is
    the out-of-range pole and should be ignored, as in the XLA path).

    Gridded over batch blocks of ``block_b`` rows: the two [M, M] Toeplitz
    operands stay VMEM-resident across grid steps while each step streams one
    block of integrands — the whole-batch form blows the 16 MB VMEM scoped
    limit at bench shapes (B=512, N=1024).  When B is not divisible by
    ``block_b``, the largest divisor at or below it is used instead (the grid
    needs equal blocks).
    """
    b, n = f.shape
    m = n - 2
    block_b = min(block_b, b)
    while b % block_b:
        block_b -= 1
    return pl.pallas_call(
        _pv_tables_kernel,
        grid=(b // block_b,),
        out_shape=(
            jax.ShapeDtypeStruct((b, m), f.dtype),
            jax.ShapeDtypeStruct((b, m), f.dtype),
        ),
        in_specs=[
            pl.BlockSpec((block_b, n), lambda i: (i, 0)),
            pl.BlockSpec((m, m), lambda i: (0, 0)),
            pl.BlockSpec((m, m), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_b, m), lambda i: (i, 0)),
            pl.BlockSpec((block_b, m), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(f, tmid, tnode)
