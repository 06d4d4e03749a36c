"""Pallas TPU kernel, take 2: blocked linear interpolation in XLA's layout.

The round-1 kernel (``interp_kernel.py``) lost 3.5x to the XLA blocked
formulation; its autopsy pointed at the 3D ``[SUB, K, LANE]`` one-hot layout
(contraction on a middle dimension forces Mosaic relayouts) and f32-HIGHEST
dots (6 MXU passes).  This version mirrors what the XLA lowering actually
does — the profiler shows XLA computes ``[3*(blk+1), K] @ [K, Q]`` with
queries on LANES and the tiny segment axis on sublanes, in bf16 with f32
accumulation — and keeps the whole chain (one-hot, segment matmul, split
sum, within-segment select, lerp) in VMEM, eliminating the [Q, 27] f32 HBM
round trip that makes the XLA version bandwidth-bound.

Layout per grid step (one query tile QT, one batch row):
  - one-hot [K, QT] bf16: K on sublanes, queries on lanes (iota over dim 0);
  - segcatT [3*(blk+1), K] bf16 (host-transposed segments, bf16-split);
  - S3 [3*(blk+1), QT] f32 = dot(segcatT, one-hot) — MXU, f32 accumulate;
  - split sum + within-segment select + lerp: elementwise on [*, QT].

Measured on v5e (bench_interp_kernel2.py): see CLAUDE.md / docs for the
verdict and whether this is wired into the hot path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .partitioning import batch0_partitioned

_BLK = 8  # table block width (= segment columns), as in interp._BLOCK
QT = 2048  # query lanes per program


def _kernel(meta_ref, q_ref, segt_ref, o_ref, d_ref):
    x0 = meta_ref[0]
    dx = meta_ref[1]
    n = meta_ref[2]

    segt = segt_ref[0]  # [3*(_BLK+1), K] bf16
    k = segt.shape[1]
    q = q_ref[0, 0]  # [1, QT] f32 -> use row 0
    qrow = q[0]

    pos = jnp.clip((qrow - x0) / dx, 0.0, n - 1.0)
    i0f = jnp.minimum(jnp.floor(pos), n - 2.0)
    w = (pos - i0f).astype(jnp.float32)
    i0 = i0f.astype(jnp.int32)
    blk = i0 // _BLK
    lo = i0 - blk * _BLK

    # one-hot [K, QT]: K on sublanes, queries on lanes
    kiota = jax.lax.broadcasted_iota(jnp.int32, (k, QT), 0)
    oh = (kiota == blk[None, :]).astype(jnp.bfloat16)

    c = _BLK + 1
    # precision pinned DEFAULT: the diagnostic traces its model under
    # jax.default_matmul_precision("highest"), and Mosaic rejects an
    # fp32-precision tpu.matmul on bf16 operands ("Bad lhs type"); this dot
    # is exact anyway (bf16 one-hot x bf16-split values, f32 accumulate)
    s3 = jax.lax.dot_general(
        segt,
        oh,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [3c, QT]
    s = s3[:c] + s3[c : 2 * c] + s3[2 * c :]  # [c, QT] f32

    jiota = jax.lax.broadcasted_iota(jnp.int32, (_BLK, QT), 0)
    loh = (jiota == lo[None, :]).astype(jnp.float32)  # [blk, QT]
    f0 = jnp.sum(loh * s[:_BLK], axis=0)
    f1 = jnp.sum(loh * s[1:], axis=0)
    o_ref[0, 0] = (f0 * (1.0 - w) + f1 * w)[None, :]
    d_ref[0, 0] = (f1 - f0)[None, :]


def _lin_interp_impl(q, segcat_t, meta, interpret):
    B, Q = q.shape
    three_c, k = segcat_t.shape[1:]
    nt = Q // QT
    q4 = q.reshape(B, nt, 1, QT)
    out, diff = pl.pallas_call(
        _kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, three_c, k), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nt, 1, QT), q.dtype),
            jax.ShapeDtypeStruct((B, nt, 1, QT), q.dtype),
        ),
        interpret=interpret,
    )(meta, q4, segcat_t)
    return out.reshape(B, Q), diff.reshape(B, Q)


_lin_interp_cp = batch0_partitioned(
    _lin_interp_impl, (True, True, False), "b q, b c k, m -> b q, b q", static_argnums=(3,)
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lin_interp_pallas2(q, segcat_t, meta, interpret=False):
    """(values, f[i0+1]-f[i0]) for per-row tables at per-row queries.

    Args:
      q: [B, Q] queries, Q % QT == 0.
      segcat_t: [B, 3*(_BLK+1), K] bf16 — transposed, bf16-split segment
        tables (build with ``segments_for_pallas2``).
      meta: jnp.stack([x0, dx, n]) shared across rows.

    Partitions along dim 0 under a mesh (ops.partitioning): each device runs
    the kernel on its local batch rows; no collectives.
    """
    return _lin_interp_cp(q, segcat_t, meta, interpret)


def _bwd_kernel(meta_ref, q_ref, g_ref, d2_ref):
    """Accumulate the table cotangent D2[K, 2c] over query tiles.

    Same math as ``interp._blocked_vjp_bwd``'s cotangent build + transpose
    matmul, fused: the [Q, c] fractional cotangent and its hi/lo bf16 split
    never leave VMEM (they are [512, 10240, 9] bf16 x2 HBM round trips in the
    XLA lowering), and the transposed one-hot contraction accumulates into a
    VMEM-resident [K, 2c] block across the query-tile grid axis.
    """
    i = pl.program_id(1)
    x0 = meta_ref[0]
    dx = meta_ref[1]
    n = meta_ref[2]

    qrow = q_ref[0, 0][0]  # [QT]
    grow = g_ref[0, 0][0]  # [QT]
    pos = jnp.clip((qrow - x0) / dx, 0.0, n - 1.0)
    i0f = jnp.minimum(jnp.floor(pos), n - 2.0)
    w = (pos - i0f).astype(jnp.float32)
    i0 = i0f.astype(jnp.int32)
    blk = i0 // _BLK
    lo = i0 - blk * _BLK

    c = _BLK + 1
    jiota = jax.lax.broadcasted_iota(jnp.int32, (c, QT), 0)
    wj = jnp.where(jiota == lo[None, :], 1.0 - w[None, :], 0.0) + jnp.where(
        jiota == (lo + 1)[None, :], w[None, :], 0.0
    )
    cot = grow[None, :] * wj  # [c, QT] f32
    # hi/lo bf16 split via plain converts: Mosaic compiles them directly (the
    # f32->bf16->f32 excess-precision elision that breaks this pattern in XLA
    # HLO — interp._bf16_split — is an XLA simplifier pass, not present here)
    ch = cot.astype(jnp.bfloat16)
    cl = (cot - ch.astype(jnp.float32)).astype(jnp.bfloat16)
    catcot = jnp.concatenate([ch, cl], axis=0)  # [2c, QT]

    k = d2_ref.shape[2]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (k, QT), 0)
    oh = (kiota == blk[None, :]).astype(jnp.bfloat16)  # [K, QT]

    # emit [2c, K], not [K, 2c]: with K=256 on LANES the MXU output tiles are
    # full (2 lane tiles) vs 18/128 lanes used the other way — 16% on the
    # isolated op, bit-exact (same QT contraction).  The cubic variant below
    # keeps [K, 2c]: its K (nvx/_BLK = 8-40) is smaller than 2c either way.
    part = jax.lax.dot_general(
        catcot,
        oh,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [2c, K]

    @pl.when(i == 0)
    def _init():
        d2_ref[0] = part

    @pl.when(i != 0)
    def _acc():
        d2_ref[0] += part


def _lin_bwd_impl(q, g, meta, k, interpret):
    B, Q = q.shape
    nt = Q // QT
    q4 = q.reshape(B, nt, 1, QT)
    g4 = g.reshape(B, nt, 1, QT)
    c2 = 2 * (_BLK + 1)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c2, k), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, c2, k), jnp.float32),
        interpret=interpret,
    )(meta, q4, g4)


_lin_bwd_cp = batch0_partitioned(
    _lin_bwd_impl, (True, True, False), "b q, b q, m -> b c k", static_argnums=(3, 4)
)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def lin_interp_pallas2_bwd(q, g, meta, k, interpret=False):
    """Table cotangent D2 [B, 2*(_BLK+1), K] for per-row queries/cotangents.

    ``sum over the hi+lo halves`` gives dseg-transposed [B, _BLK+1, K]; the
    caller folds the overlapping segments back to the table
    (interp._blocked_vjp_bwd).  K rides the LANE axis (see _bwd_kernel).
    Partitions along dim 0 under a mesh (ops.partitioning).

    Args:
      q: [B, Q] queries, Q % QT == 0 (pad with x0; pad cotangents with 0).
      g: [B, Q] output cotangents.
      meta: jnp.stack([x0, dx, n]) shared across rows.
      k: number of table segments (static).
    """
    return _lin_bwd_cp(q, g, meta, k, interpret)


def segments_for_pallas2(f):
    """[B, 3*(_BLK+1), K] bf16 transposed split segments of tables f [B, n].

    Same segment/overlap structure and 3-term bf16 split as the XLA blocked
    path (interp._blocked_segments/_bf16_split), transposed so the kernel's
    dot contracts over K with queries on lanes.
    """
    from ..core.physics.interp import _bf16_split, _blocked_segments

    # kernel layout encodes exactly 3 bf16 planes; _bf16_split returns [x]
    # unsplit for non-f32 (dtype-polymorphic) — reject those loudly
    if f.dtype != jnp.float32:
        raise TypeError(f"segments_for_pallas2 requires f32 tables, got {f.dtype}")
    n = f.shape[-1]
    seg, nblk = _blocked_segments(f, n, _BLK)  # [B, K, blk+1]
    segcat = jnp.concatenate(_bf16_split(seg, 3), axis=-1)  # [B, K, 3*(blk+1)]
    return jnp.swapaxes(segcat, -1, -2)  # [B, 3*(blk+1), K]


# ---------------------------------------------------------------------------
# Cubic Hermite variant: same layout, 4-tap stencil + Hermite/FD weights.
#
# Targets the EDF lookup (form_factor.py:254, interp.interp1d_cubic_blocked):
# the profiler shows its XLA forward + custom-VJP backward as six [512, 10240]
# loop fusions at ~6.4 ms/iter of the whole-shot fit step — the [Q, blk+3]
# intermediate arrays (taps, cotangent, hi/lo splits) all round-trip HBM.
# Here the whole chain stays in VMEM.  The forward also emits d(out)/dt so
# the query cotangent is one elementwise multiply in the backward.
# ---------------------------------------------------------------------------


def _cubic_idx(qrow, x0, dx, n):
    """(i0f, t, blk, lo, first, last) — interp._cubic_blocked_indices math.

    t is UNCLAMPED (edge cells extrapolate their polynomial, matching
    interp1d_cubic_matmul semantics); i0 is clipped to [0, n-2].
    """
    pos = (qrow - x0) / dx
    i0f = jnp.clip(jnp.floor(pos), 0.0, n - 2.0)
    t = (pos - i0f).astype(jnp.float32)
    i0 = i0f.astype(jnp.int32)
    blk = i0 // _BLK
    lo = i0 - blk * _BLK
    return t, blk, lo, i0f == 0.0, i0f == n - 2.0


def _cubic_kernel(meta_ref, q_ref, segt_ref, o_ref, d_ref):
    from ..core.physics.interp import _cubic_weights

    x0, dx, n = meta_ref[0, 0, 0], meta_ref[0, 0, 1], meta_ref[0, 0, 2]
    segt = segt_ref[0]  # [3*(_BLK+3), K] bf16
    k = segt.shape[1]
    qrow = q_ref[0, 0][0]  # [QT]
    t, blk, lo, first, last = _cubic_idx(qrow, x0, dx, n)

    kiota = jax.lax.broadcasted_iota(jnp.int32, (k, QT), 0)
    oh = (kiota == blk[None, :]).astype(jnp.bfloat16)  # [K, QT]

    c = _BLK + 3
    s3 = jax.lax.dot_general(
        segt,
        oh,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [3c, QT]
    s = s3[:c] + s3[c : 2 * c] + s3[2 * c :]  # [c, QT] f32

    jiota = jax.lax.broadcasted_iota(jnp.int32, (_BLK, QT), 0)
    loh = (jiota == lo[None, :]).astype(jnp.float32)  # [blk, QT]
    taps = [jnp.sum(loh * s[kk : kk + _BLK], axis=0) for kk in range(4)]

    cw = _cubic_weights(t, first, last)
    dw = _cubic_weights(t, first, last, d=True)
    o_ref[0, 0] = sum(w * tap for w, tap in zip(cw, taps))[None, :]
    d_ref[0, 0] = sum(w * tap for w, tap in zip(dw, taps))[None, :]


def _cubic_interp_impl(q, segcat_t, meta, interpret):
    B, Q = q.shape
    three_c, k = segcat_t.shape[1:]
    nt = Q // QT
    q4 = q.reshape(B, nt, 1, QT)
    meta3 = meta.reshape(B, 1, 3)
    out, dout = pl.pallas_call(
        _cubic_kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, three_c, k), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nt, 1, QT), q.dtype),
            jax.ShapeDtypeStruct((B, nt, 1, QT), q.dtype),
        ),
        interpret=interpret,
    )(meta3, q4, segcat_t)
    return out.reshape(B, Q), dout.reshape(B, Q)


_cubic_interp_cp = batch0_partitioned(
    _cubic_interp_impl, (True, True, True), "b q, b c k, b m -> b q, b q", static_argnums=(3,)
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cubic_interp_pallas2(q, segcat_t, meta, interpret=False):
    """(values, d(values)/dt) for per-row tables at per-row queries.

    Same math as ``interp.interp1d_cubic_blocked``'s forward (bit-exact);
    the second output is the per-query Hermite derivative w.r.t. the cell
    coordinate t, so the backward's query cotangent is g * dout_dt / dx.
    Partitions along dim 0 under a mesh (ops.partitioning).

    Args:
      q: [B, Q] queries, Q % QT == 0 (pad with x0).
      segcat_t: [B, 3*(_BLK+3), K] bf16 (build with
        ``cubic_segments_for_pallas2``).
      meta: [B, 3] per-row (x0, dx, n) — per-row because the EDF velocity
        grid arrives through the batched parameter pytree (identical values
        across lineouts, but a batched tracer under vmap), unlike the linear
        kernel's static chi_R pole grid.
    """
    return _cubic_interp_cp(q, segcat_t, meta, interpret)


def _cubic_bwd_kernel(meta_ref, q_ref, g_ref, d2_ref):
    """Accumulate the cubic table cotangent D2[K, 2*(_BLK+3)] over query tiles.

    Fuses interp._cubic_blocked_vjp_bwd's cotangent build (4-tap Hermite
    weights scattered to stencil offsets), the hi/lo bf16 split, and the
    transposed one-hot contraction — all VMEM-resident.
    """
    from ..core.physics.interp import _cubic_weights

    i = pl.program_id(1)
    x0, dx, n = meta_ref[0, 0, 0], meta_ref[0, 0, 1], meta_ref[0, 0, 2]
    qrow = q_ref[0, 0][0]  # [QT]
    grow = g_ref[0, 0][0]  # [QT]
    t, blk, lo, first, last = _cubic_idx(qrow, x0, dx, n)

    c = _BLK + 3
    cw = _cubic_weights(t, first, last)
    jiota = jax.lax.broadcasted_iota(jnp.int32, (c, QT), 0)
    wj = sum(
        jnp.where(jiota == (lo + kk)[None, :], w[None, :], 0.0) for kk, w in enumerate(cw)
    )
    cot = grow[None, :] * wj  # [c, QT] f32
    # plain-convert bf16 split: safe in Mosaic (no excess-precision elision)
    ch = cot.astype(jnp.bfloat16)
    cl = (cot - ch.astype(jnp.float32)).astype(jnp.bfloat16)
    catcot = jnp.concatenate([ch, cl], axis=0)  # [2c, QT]

    k = d2_ref.shape[1]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (k, QT), 0)
    oh = (kiota == blk[None, :]).astype(jnp.bfloat16)  # [K, QT]

    part = jax.lax.dot_general(
        oh,
        catcot,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [K, 2c]

    @pl.when(i == 0)
    def _init():
        d2_ref[0] = part

    @pl.when(i != 0)
    def _acc():
        d2_ref[0] += part


def _cubic_bwd_impl(q, g, meta, k, interpret):
    B, Q = q.shape
    nt = Q // QT
    q4 = q.reshape(B, nt, 1, QT)
    g4 = g.reshape(B, nt, 1, QT)
    meta3 = meta.reshape(B, 1, 3)
    c2 = 2 * (_BLK + 3)
    return pl.pallas_call(
        _cubic_bwd_kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, QT), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, c2), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, k, c2), jnp.float32),
        interpret=interpret,
    )(meta3, q4, g4)


_cubic_bwd_cp = batch0_partitioned(
    _cubic_bwd_impl, (True, True, True), "b q, b q, b m -> b k c", static_argnums=(3, 4)
)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def cubic_interp_pallas2_bwd(q, g, meta, k, interpret=False):
    """Cubic table cotangent D2 [B, K, 2*(_BLK+3)] for per-row queries/cotangents.

    ``D2[..., :c] + D2[..., c:]`` gives dseg [B, K, _BLK+3]; the caller folds
    the overlapping segments back to the table (interp._cubic_blocked_vjp_bwd).
    Partitions along dim 0 under a mesh (ops.partitioning).

    Args:
      q: [B, Q] queries, Q % QT == 0 (pad with x0; pad cotangents with 0).
      g: [B, Q] output cotangents.
      meta: [B, 3] per-row (x0, dx, n) — see ``cubic_interp_pallas2``.
      k: number of table segments (static).
    """
    return _cubic_bwd_cp(q, g, meta, k, interpret)


def cubic_segments_for_pallas2(f):
    """[B, 3*(_BLK+3), K] bf16 transposed split cubic segments of tables f [B, n].

    Same left-padded 4-tap segment structure and 3-term bf16 split as the XLA
    blocked cubic path (interp._cubic_blocked_segments/_bf16_split).
    """
    from ..core.physics.interp import _bf16_split, _cubic_blocked_segments

    # same 3-plane layout contract as segments_for_pallas2
    if f.dtype != jnp.float32:
        raise TypeError(f"cubic_segments_for_pallas2 requires f32 tables, got {f.dtype}")
    n = f.shape[-1]
    seg, nblk = _cubic_blocked_segments(f, n, _BLK)  # [B, K, blk+3]
    segcat = jnp.concatenate(_bf16_split(seg, 3), axis=-1)  # [B, K, 3*(blk+3)]
    return jnp.swapaxes(segcat, -1, -2)  # [B, 3*(blk+3), K]
