"""Fused Pallas bilinear chi-table lookup for the 2V (ARTS) hot path.

The XLA lowering of ``calc_all_chi_vals``'s table mode stages two huge
intermediates through HBM every iteration at full ARTS resolution
(Q = 1024 lambda x 241 angles = 246,784 queries, R = num_beta rows,
C = 3*nvx - 2 stacked table columns):

  * the fractional two-hot row-weight matrix W [Q, R] (bf16 hi/lo pair,
    ~0.5 GB at R=512) — built in the forward AND rebuilt in the backward;
  * the row-mixed table slice S [Q, C] f32 (~0.4 GB), consumed immediately
    by ``select_columns_linear``'s per-query column lerp.

This kernel fuses row mix + column select (+ their VJP) so neither ever
leaves VMEM: the tables (R x C ~ 780 KB) sit resident, each query tile
builds its two-hot in registers, the MXU does the same 4-product
bf16-split contraction as the XLA path (`interp.periodic_linear_rowmix`
semantics, `_rowmix_indices` index math, `select_columns_linear` clamped
column lerp), and only the [Q]-sized values/derivatives/cotangents touch
HBM.  The backward accumulates the full table cotangent dT [R, C] in a
VMEM block across the query-tile grid (same pattern as
``interp_kernel2.lin_interp_pallas2_bwd``).

Layout follows the round-3 kernel playbook (ops/interp_kernel2.py):
queries on LANES, row/column axes on sublanes, bf16 operands with f32
accumulation, precision pinned DEFAULT (Mosaic rejects fp32-precision
matmuls on bf16 operands), plain-convert bf16 splits in-kernel (the XLA
excess-precision elision is an HLO pass, absent in Mosaic).

Reference behavior: tsadar/core/physics/form_factor.py:419-447 (the
per-point bilinear gathers this build replaced with tables + lookups).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .partitioning import axis_partitioned

QT = 512  # query lanes per program (Q padded to a multiple of this)
_TWO_PI = 6.283185307179586


def _row_weights(brow, R):
    """Periodic row indices/weight — interp._rowmix_indices, in-kernel."""
    bpos = (brow % _TWO_PI) * (R / _TWO_PI)
    ifl = jnp.floor(bpos)
    ib0 = ifl.astype(jnp.int32) % R
    ib1 = (ib0 + 1) % R
    wb = (bpos - ifl).astype(jnp.float32)
    return ib0, ib1, wb


def _col_weights(xrow, v0, dv, ns):
    """Clamped column lerp indices — interp.select_columns_linear, in-kernel.

    Returns (iv0, wv, inside): ``inside`` masks d(out)/d(xq) to zero where
    the raw position was clamped (matching clip's autodiff).
    """
    raw = (xrow - v0) / dv
    vpos = jnp.clip(raw, 0.0, ns - 1.0)
    iv0 = jnp.minimum(jnp.floor(vpos), ns - 2.0)
    wv = (vpos - iv0).astype(jnp.float32)
    inside = ((raw > 0.0) & (raw < ns - 1.0)).astype(jnp.float32)
    return iv0.astype(jnp.int32), wv, inside


def _build_w(brow, R, qt):
    """Two-hot row-weight matrix [R, QT] f32 and its bf16 hi/lo split."""
    ib0, ib1, wb = _row_weights(brow, R)
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, qt), 0)
    w = jnp.where(riota == ib0[None, :], 1.0 - wb[None, :], 0.0) + jnp.where(
        riota == ib1[None, :], wb[None, :], 0.0
    )
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    return wh, wl, ib0, ib1, wb


def _segments(meta_ref, nvx):
    """(c0, Ns, v0, dv) for the three stacked table segments.

    Segment columns: f1d [0, nvx), df1d [nvx, 2nvx), chiR [2nvx, 2nvx+M)
    with M = nvx - 2; v0/dv are traced per-row scalars (the velocity grid
    arrives through the batched parameter pytree).
    """
    v0x, dvx, v0p, dvp = (meta_ref[0, 0, j] for j in range(4))
    return (
        (0, nvx, v0x, dvx),
        (nvx, nvx, v0x, dvx),
        (2 * nvx, nvx - 2, v0p, dvp),
    )


def _kernel(nvx, meta_ref, b_ref, x_ref, t_ref, *out_refs):
    ts = t_ref[0]  # [2C, R] bf16 (hi stacked over lo)
    two_c, R = ts.shape
    C = two_c // 2
    brow = b_ref[0, 0][0]  # [QT]
    xrow = x_ref[0, 0][0]  # [QT]

    wh, wl, _, _, _ = _build_w(brow, R, QT)
    # all four hi/lo cross products, f32 accumulate (rowmix parity)
    a = jax.lax.dot_general(
        ts, wh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )
    a = a + jax.lax.dot_general(
        ts, wl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )
    s = a[:C] + a[C:]  # [C, QT] row-mixed tables

    ciota = jax.lax.broadcasted_iota(jnp.int32, (C, QT), 0)
    for si, (c0, ns, v0, dv) in enumerate(_segments(meta_ref, nvx)):
        iv0, wv, inside = _col_weights(xrow, v0, dv, ns)
        f0 = jnp.sum(jnp.where(ciota == (c0 + iv0)[None, :], s, 0.0), axis=0)
        f1 = jnp.sum(jnp.where(ciota == (c0 + iv0 + 1)[None, :], s, 0.0), axis=0)
        out_refs[si][0, 0] = (f0 * (1.0 - wv) + f1 * wv)[None, :]
        out_refs[3 + si][0, 0] = ((f1 - f0) / dv * inside)[None, :]


def _fwd_impl(bq, xq, tsplit, meta, nvx, interpret):
    B, Q = bq.shape
    nt = Q // QT
    b4 = bq.reshape(B, nt, 1, QT)
    x4 = xq.reshape(B, nt, 1, QT)
    meta3 = meta.reshape(B, 1, 4)
    spec_q = pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_kernel, nvx),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
            spec_q,
            spec_q,
            pl.BlockSpec((1,) + tsplit.shape[1:], lambda b, i: (b, 0, 0)),
        ],
        out_specs=(spec_q,) * 6,
        out_shape=tuple(jax.ShapeDtypeStruct((B, nt, 1, QT), jnp.float32) for _ in range(6)),
        interpret=interpret,
    )(meta3, b4, x4, tsplit)
    return tuple(o.reshape(B, Q) for o in outs)


_fwd_cp = axis_partitioned(
    _fwd_impl,
    arg_dims=(1, 1, None, None),
    out_dims=(1,) * 6,
    rule="b q, b q, b c r, b m -> b q, b q, b q, b q, b q, b q",
    static_argnums=(4, 5),
)


@functools.partial(jax.jit, static_argnames=("nvx", "interpret"))
def chi_bilinear_pallas(bq, xq, tsplit, meta, nvx, interpret=False):
    """Fused (row mix + column lerp) lookup of the three stacked chi tables.

    Args:
      bq: [B, Q] beta queries (radians, any range), Q % QT == 0.
      xq: [B, Q] velocity-magnitude queries.
      tsplit: [B, 2C, R] bf16 — transposed hi/lo split of the padded stacked
        tables (build with ``tables_for_bilinear``).
      meta: [B, 4] per-row (v0_vx, dvx, v0_pole, d_pole) traced scalars.
      nvx: static velocity-grid size (defines the three column segments).

    Returns:
      (fe, dfe, chiR, d_fe/dxq, d_dfe/dxq, d_chiR/dxq) — each [B, Q].

    Partitions along the QUERY axis (dim 1) under a mesh — multi-chip ARTS
    point sharding (ops.partitioning.axis_partitioned); tables and meta are
    replicated, each device runs the kernel on its query shard.  The
    per-shard Q must stay a QT multiple: ``interp._bilin_prepare`` pads to
    QT * nshards.
    """
    return _fwd_cp(bq, xq, tsplit, meta, nvx, interpret)


def _bwd_kernel(nvx, meta_ref, b_ref, x_ref, t_ref, g0_ref, g1_ref, g2_ref, dt_ref, db_ref):
    i = pl.program_id(1)
    ts = t_ref[0]  # [2C, R] bf16
    two_c, R = ts.shape
    C = two_c // 2
    brow = b_ref[0, 0][0]
    xrow = x_ref[0, 0][0]
    g = (g0_ref[0, 0][0], g1_ref[0, 0][0], g2_ref[0, 0][0])

    wh, wl, ib0, ib1, _ = _build_w(brow, R, QT)

    # row-difference tables (exact two-hot in bf16; T already hi/lo split)
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, QT), 0)
    d = (
        jnp.where(riota == ib1[None, :], 1.0, 0.0)
        - jnp.where(riota == ib0[None, :], 1.0, 0.0)
    ).astype(jnp.bfloat16)
    sd2 = jax.lax.dot_general(
        ts, d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )
    sd = sd2[:C] + sd2[C:]  # [C, QT] = T[ib1] - T[ib0] per query

    ciota = jax.lax.broadcasted_iota(jnp.int32, (C, QT), 0)
    dbeta = jnp.zeros((QT,), jnp.float32)
    ds = jnp.zeros((C, QT), jnp.float32)
    for si, (c0, ns, v0, dv) in enumerate(_segments(meta_ref, nvx)):
        iv0, wv, _ = _col_weights(xrow, v0, dv, ns)
        m0 = ciota == (c0 + iv0)[None, :]
        m1 = ciota == (c0 + iv0 + 1)[None, :]
        # dbeta: cotangent against the column-lerped row difference
        rd = jnp.sum(jnp.where(m0, sd, 0.0), axis=0) * (1.0 - wv) + jnp.sum(
            jnp.where(m1, sd, 0.0), axis=0
        ) * wv
        dbeta = dbeta + g[si] * rd
        # dS: scatter the cotangent onto the two selected columns
        ds = ds + jnp.where(m0, (g[si] * (1.0 - wv))[None, :], 0.0)
        ds = ds + jnp.where(m1, (g[si] * wv)[None, :], 0.0)
    db_ref[0, 0] = (dbeta * (R / _TWO_PI))[None, :]

    dsh = ds.astype(jnp.bfloat16)
    dsl = (ds - dsh.astype(jnp.float32)).astype(jnp.bfloat16)
    dscat = jnp.concatenate([dsh, dsl], axis=0)  # [2C, QT]
    # dT = W @ dS^T with all four hi/lo cross products: two QT-contractions
    # of doubled output width, halves folded after
    ph = jax.lax.dot_general(
        wh, dscat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )  # [R, 2C]
    ph = ph + jax.lax.dot_general(
        wl, dscat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )
    part = ph[:, :C] + ph[:, C:]  # [R, C]

    @pl.when(i == 0)
    def _init():
        dt_ref[0] = part

    @pl.when(i != 0)
    def _acc():
        dt_ref[0] += part


def _bwd_impl(bq, xq, tsplit, g0, g1, g2, meta, nvx, interpret):
    B, Q = bq.shape
    two_c, R = tsplit.shape[1:]
    C = two_c // 2
    nt = Q // QT
    r4 = lambda a: a.reshape(B, nt, 1, QT)
    meta3 = meta.reshape(B, 1, 4)
    spec_q = pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0))
    dt, db = pl.pallas_call(
        functools.partial(_bwd_kernel, nvx),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
            spec_q,
            spec_q,
            pl.BlockSpec((1, two_c, R), lambda b, i: (b, 0, 0)),
            spec_q,
            spec_q,
            spec_q,
        ],
        out_specs=(
            pl.BlockSpec((1, R, C), lambda b, i: (b, 0, 0)),
            spec_q,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nt, 1, QT), jnp.float32),
        ),
        interpret=interpret,
    )(meta3, r4(bq), r4(xq), tsplit, r4(g0), r4(g1), r4(g2))
    return dt, db.reshape(B, Q)


_bwd_cp = axis_partitioned(
    _bwd_impl,
    arg_dims=(1, 1, None, 1, 1, 1, None),
    out_dims=(None, 1),
    rule="b q, b q, b c r, b q, b q, b q, b m -> b r c, b q",
    static_argnums=(7, 8),
    psum_outs=(0,),
)


@functools.partial(jax.jit, static_argnames=("nvx", "interpret"))
def chi_bilinear_pallas_bwd(bq, xq, tsplit, g0, g1, g2, meta, nvx, interpret=False):
    """(dT [B, R, C], dbeta [B, Q]) for the fused bilinear lookup.

    The query cotangent dxq is NOT computed here: the forward already emits
    d(out_s)/dxq, so the caller forms dxq = sum_s g_s * der_s elementwise.
    Pad queries with (beta=0, xq=v0) and cotangents with 0.

    Partitions along the query axis under a mesh: dbeta stays query-sharded;
    the table cotangent dT sums contributions from every query shard, so the
    per-shard lowering all-reduces it over the mesh axis (the ONE collective
    in the sharded ARTS kernel path — [B, R, C] ≈ 780 KB per iteration).
    """
    return _bwd_cp(bq, xq, tsplit, g0, g1, g2, meta, nvx, interpret)


def tables_for_bilinear(tcat):
    """[B, 2C, R] bf16 transposed hi/lo split of stacked tables tcat [B, R, c].

    Pads the column count up to a sublane multiple of 8 (padded columns are
    zero and never selected — the chiR segment ends at 2*nvx + (nvx-2)).
    """
    from ..core.physics.interp import _bf16_split

    # the kernel layout encodes exactly 2 bf16 planes; _bf16_split is
    # dtype-polymorphic (returns [x] unsplit for non-f32), so reject other
    # dtypes loudly instead of mis-stacking (Pallas dispatch is f32-gated)
    if tcat.dtype != jnp.float32:
        raise TypeError(f"tables_for_bilinear requires f32 tables, got {tcat.dtype}")
    c = tcat.shape[-1]
    cpad = -c % 8
    if cpad:
        tcat = jnp.concatenate(
            [tcat, jnp.zeros(tcat.shape[:-1] + (cpad,), tcat.dtype)], axis=-1
        )
    tt = jnp.swapaxes(tcat, -1, -2)  # [B, C, R]
    th, tl = _bf16_split(tt, 2)
    return jnp.concatenate([th, tl], axis=-2)  # [B, 2C, R]
