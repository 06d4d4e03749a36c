"""Pallas TPU kernel: uniform-grid linear interpolation (EXPERIMENTAL).

``lin_interp_pallas`` reimplements ``interp.interp1d_linear_blocked`` as one
kernel whose one-hot tile never leaves VMEM.  Measured on v5e it LOSES to the
XLA blocked formulation (14.6 vs 4.2 ms at bench shapes): Pallas grid steps
execute sequentially on the one core, so the per-program [SUB, K, LANE]
iota-compare one-hot build is VPU-bound and cannot overlap the way XLA's
fused bf16 one-hot + MXU pipeline does.  Kept (with interpret-mode tests) as
the template for a future revisit — e.g. wider _BLK or a Mosaic dynamic
gather — but NOT wired into the hot path; ``interp1d_linear_pallas`` in
interp.py is the drop-in wrapper if that changes.

The kernel also emits f[i0+1] - f[i0] per query so the custom VJP can form
the query cotangent without re-gathering.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 8  # table block width inside the kernel (= segment columns)
_SUB = 8  # query sublanes per program
_LANE = 512  # query lanes per program
TILE = _SUB * _LANE  # queries per program; pad Q to a multiple of this


def _lin_kernel(meta_ref, q_ref, t_ref, o_ref, d_ref):
    x0 = meta_ref[0]
    dx = meta_ref[1]
    n = meta_ref[2]  # true table length

    body = t_ref[0]  # [K, _BLK]: body[k, j] = f[k*_BLK + j] (zero-padded)
    k = body.shape[0]
    q = q_ref[0, 0]  # [_SUB, _LANE]

    pos = jnp.clip((q - x0) / dx, 0.0, n - 1.0)
    i0 = jnp.minimum(jnp.floor(pos), n - 2.0)
    w = (pos - i0).astype(body.dtype)
    i0 = i0.astype(jnp.int32)
    blk = i0 // _BLK
    lo = i0 - blk * _BLK

    kiota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, k, _LANE), 1)
    oh0 = (blk[:, None, :] == kiota).astype(body.dtype)  # [_SUB, K, _LANE]
    oh1 = ((blk + 1)[:, None, :] == kiota).astype(body.dtype)
    hi = jax.lax.Precision.HIGHEST
    # S[s, l, j] = sum_k oh[s, k, l] body[k, j]
    S8 = jax.lax.dot_general(
        oh0, body, (((1,), (0,)), ((), ())), precision=hi, preferred_element_type=body.dtype
    )  # [_SUB, _LANE, _BLK]
    edge = jax.lax.dot_general(
        oh1, body[:, :1], (((1,), (0,)), ((), ())), precision=hi, preferred_element_type=body.dtype
    )  # [_SUB, _LANE, 1] = f[(blk+1)*_BLK]
    S9 = jnp.concatenate([S8, edge], axis=-1)  # [_SUB, _LANE, _BLK+1]

    liota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE, _BLK), 2)
    loh = (lo[:, :, None] == liota).astype(body.dtype)
    f0 = jnp.sum(loh * S9[..., :_BLK], axis=-1)
    f1 = jnp.sum(loh * S9[..., 1:], axis=-1)
    o_ref[0, 0] = f0 * (1.0 - w) + f1 * w
    d_ref[0, 0] = f1 - f0


@functools.partial(jax.jit, static_argnames=("interpret",))
def lin_interp_pallas(q, t, meta, interpret=False):
    """(values, f[i0+1]-f[i0]) of per-row tables t at queries q, uniform grid.

    q [B, Q] with Q % TILE == 0; t [B, Npad] with Npad % _BLK == 0 and
    Npad >= n+1 (entries past n are never selected: jnp.interp edge clamping);
    meta = jnp.stack([x0, dx, n]) (traced scalars OK, shared across rows).

    NOTE: call this with the batch explicit — vmap-lifting the unbatched form
    measured ~300x slower than this grid formulation on v5e.
    """
    B, Q = q.shape
    npad = t.shape[1]
    k = npad // _BLK
    nt = Q // TILE
    body = t.reshape(B, k, _BLK)
    q4 = q.reshape(B, nt, _SUB, _LANE)
    out, diff = pl.pallas_call(
        _lin_kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, k, _BLK), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b, i: (b, i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nt, _SUB, _LANE), q.dtype),
            jax.ShapeDtypeStruct((B, nt, _SUB, _LANE), q.dtype),
        ),
        interpret=interpret,
    )(meta, q4, body)
    return out.reshape(B, Q), diff.reshape(B, Q)
