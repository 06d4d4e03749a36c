"""Block (linear-in-batch) sigma Hessian == dense jax.hessian.

The 1D loss is an exact per-lineout sum with per-lineout active parameters,
so the Hessian is block-diagonal; `batch_flat_hessian` exploits that with
n_active broadcast-basis HVPs (O(B) cost) instead of jax.hessian's
n_active*B dense basis (O(B^2)).  This pins block-vs-dense equality — any
cross-lineout coupling introduced into the model/loss would break the
broadcast-basis trick silently, and this test is what catches it.
"""

import numpy as np
from numpy.testing import assert_allclose

from __graft_entry__ import _make_batch, _small_config
from tsadar_tpu.inverse.loss import LossFunction
from tsadar_tpu.core.params import ThomsonParams
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles
from tsadar_tpu.utils.process.postprocess import batch_flat_hessian, get_sigmas

B = 4


def test_block_hessian_matches_dense():
    cfg = _small_config(B)
    sas = get_scattering_angles(cfg)
    batch = _make_batch(B)
    loss_fn = LossFunction(cfg, sas, batch)
    ts = ThomsonParams.create(cfg["parameters"], num_params=B, batch=True, activate=True)

    H_block = batch_flat_hessian(cfg, loss_fn, ts, batch)
    H_dense = batch_flat_hessian(cfg, loss_fn, ts, batch, force_dense=True)
    assert H_block.shape == H_dense.shape

    scale = float(np.max(np.abs(H_dense)))
    # off-diagonal (cross-lineout) dense entries must actually BE zero —
    # the structural assumption the block path rests on
    mask = H_block == 0.0
    assert float(np.max(np.abs(H_dense[mask]))) < 1e-10 * scale
    assert_allclose(H_block, H_dense, rtol=1e-8, atol=1e-10 * scale)

    s_block = get_sigmas(H_block, B)
    s_dense = get_sigmas(H_dense, B)
    assert_allclose(s_block, s_dense, rtol=1e-6)
    assert np.all(np.isfinite(s_block))


def test_chunked_hessian_bit_exact():
    """B > 16 batches evaluate as same-shape chunks of 16 lineouts through one
    jitted executable (the whole-shot B=128 runs ~3x faster that way — the
    unchunked program's per-lineout cost rises with batch as the f64 working
    set leaves cache; docs/performance.md).  Each lineout's block must be
    BIT-IDENTICAL to the block from a direct small-batch evaluation of the
    same lineouts — chunking may never change the numbers."""
    B32 = 32
    cfg = _small_config(B32)
    sas = get_scattering_angles(cfg)
    batch = _make_batch(B32)
    loss_fn = LossFunction(cfg, sas, batch)
    ts = ThomsonParams.create(cfg["parameters"], num_params=B32, batch=True, activate=True)
    H32 = batch_flat_hessian(cfg, loss_fn, ts, batch)  # 2 chunks of 16

    import jax

    B16 = 16
    cfg16 = _small_config(B16)
    batch16 = {k: v[:B16] for k, v in batch.items()}
    loss16 = LossFunction(cfg16, sas, batch16)
    ts16 = jax.tree_util.tree_map(
        lambda a: a[:B16] if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == B32) else a,
        ts,
    )
    H16 = batch_flat_hessian(cfg16, loss16, ts16, batch16)  # single chunk

    P = H16.shape[0] // B16
    for li in [0, 5, 15]:
        b32 = H32[np.ix_(np.arange(P) * B32 + li, np.arange(P) * B32 + li)]
        b16 = H16[np.ix_(np.arange(P) * B16 + li, np.arange(P) * B16 + li)]
        assert np.array_equal(b32, b16), f"chunked block {li} deviates"
