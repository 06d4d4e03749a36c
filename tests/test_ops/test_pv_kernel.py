"""Pallas fused PV-table kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from tsadar_tpu.core.physics import ratint
from tsadar_tpu.ops.pv_kernel import pv_tables_pallas


def test_pv_tables_pallas_matches_xla():
    n = 256
    b = 4
    z = jnp.linspace(-8.2, 8.2, n)
    rng = np.random.default_rng(0)
    f = jnp.asarray(np.exp(-np.linspace(-4, 4, n) ** 2 / 2)[None, :] * rng.uniform(0.5, 1.5, (b, 1)))

    tmid = ratint.pv_toeplitz_kernel(n - 2)
    tnode = ratint.pv_node_kernel(n - 2)

    mid, node = pv_tables_pallas(f, tmid, tnode, interpret=True)

    for i in range(b):
        _, mref = ratint.pv_integral_uniform(f[i], z, tmid)
        _, nref = ratint.pv_integral_uniform_nodes(f[i], z, tnode)
        assert_allclose(np.asarray(mid[i]), np.asarray(mref), rtol=1e-10, atol=1e-12)
        assert_allclose(np.asarray(node[i, : n - 3]), np.asarray(nref), rtol=1e-10, atol=1e-12)
