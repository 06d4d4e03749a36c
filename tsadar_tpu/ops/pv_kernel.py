"""Pallas TPU kernel: fused pole-integral table evaluation.

Fuses the three stages of the batched chi_R pole sweep —
(1) finite-difference prep (fav, fdif, index weighting) from the integrand,
(2) the two static-Toeplitz contractions (midpoint + node kernels, MXU),
(3) the affine recombination into the interleaved pole table —
into one kernel so the intermediates never round-trip through HBM.

Equivalent to ``ratint.pv_integral_uniform(+_nodes)`` batched over lineouts
(validated against them in tests/test_ops).  The XLA path remains the default;
this kernel is the template for further fusion work and is exercised via
``pv_tables_pallas``.
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
    idx = jax.lax.broadcasted_iota(fav.dtype, (1, m), 1)

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


@functools.partial(jax.jit, static_argnames=("interpret",))
def pv_tables_pallas(f, tmid, tnode, interpret=False):
    """Batched PV tables: f [B, N] -> (mid [B, N-2], node [B, N-2]).

    ``node[:, :N-3]`` matches ``pv_integral_uniform_nodes`` (its last column is
    the out-of-range pole and should be ignored, as in the XLA path).
    """
    b, n = f.shape
    m = n - 2
    return pl.pallas_call(
        _pv_tables_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, m), f.dtype),
            jax.ShapeDtypeStruct((b, m), f.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(f, tmid, tnode)
