"""Interpolation kernels (linear, C1 cubic Hermite 1D/2D), pure jnp.

The reference uses ``interpax.interp1d/interp2d`` (method="cubic": C1 cubic Hermite
with finite-difference derivative estimates) on the hot path
(``form_factor.py:256, 263, 300-324``).  interpax is not a dependency here; these are
self-contained equivalents designed for XLA: static shapes, searchsorted gathers
(O(log N)) with a fast path implied by uniform grids, no host round trips.
"""

from jax import numpy as jnp


def interp1d_linear(xq, x, f, left=None, right=None):
    """Linear interpolation, thin wrapper over jnp.interp with fill values."""
    return jnp.interp(xq, x, f, left=left, right=right)


def _fd_slopes_1d(x, f):
    """Second-order finite-difference slope estimates along the last axis.

    Interior nodes use the non-uniform weighted central difference; the two edge
    nodes use one-sided second-order formulas.  Matches the derivative estimation
    of C1 cubic Hermite ("cubic") interpolation.
    """
    h = x[1:] - x[:-1]  # [N-1]
    s = (f[..., 1:] - f[..., :-1]) / h  # secant slopes [N-1]

    hl, hr = h[:-1], h[1:]
    d_int = (s[..., 1:] * hl + s[..., :-1] * hr) / (hl + hr)

    d0 = ((2.0 * h[0] + h[1]) * s[..., 0] - h[0] * s[..., 1]) / (h[0] + h[1])
    dn = ((2.0 * h[-1] + h[-2]) * s[..., -1] - h[-1] * s[..., -2]) / (h[-1] + h[-2])

    return jnp.concatenate([d0[..., None], d_int, dn[..., None]], axis=-1)


def _locate(xq, x, uniform=False):
    """Cell index i such that x[i] <= xq < x[i+1], clipped to [0, N-2].

    With ``uniform=True`` the index is computed directly from the grid spacing —
    on TPU this removes the searchsorted binary search (log2 N sequential gather
    rounds), which dominates wall-clock for large query sets.
    """
    if uniform:
        pos = (xq - x[0]) / (x[1] - x[0])
        return jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[0] - 2)
    i = jnp.searchsorted(x, xq, side="right") - 1
    return jnp.clip(i, 0, x.shape[0] - 2)


import jax as _jax


@_jax.custom_vjp
def interp1d_linear_uniform(xq, x, f):
    """Linear interpolation on a UNIFORM grid with edge clamping (jnp.interp
    semantics) and no binary search.

    Custom VJP: the cotangent w.r.t. the table ``f`` is computed as a one-hot
    matmul instead of a scatter-add (TPU scatters dominate the backward pass
    otherwise)."""
    return _lin_uniform_impl(xq, x, f)


def _lin_uniform_impl(xq, x, f):
    n = x.shape[0]
    pos = jnp.clip((xq - x[0]) / (x[1] - x[0]), 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    w = pos - i0
    return f[i0] * (1.0 - w) + f[i0 + 1] * w


def _lin_uniform_fwd(xq, x, f):
    return _lin_uniform_impl(xq, x, f), (xq, x, f)


def _lin_uniform_bwd(res, g):
    xq, x, f = res
    n = x.shape[0]
    dx = x[1] - x[0]
    raw = (xq - x[0]) / dx
    pos = jnp.clip(raw, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    w = pos - i0

    inside = (raw > 0.0) & (raw < n - 1.0)
    slope = (f[i0 + 1] - f[i0]) / dx
    dxq = jnp.where(inside, g * slope, 0.0)

    i0f = i0.reshape(-1)
    a = ((1.0 - w) * g).reshape(-1)
    b = (w * g).reshape(-1)
    if dispatch_backend() == "tpu":
        # one-hot matmul: TPU scatter-adds are slow, MXU contractions are not
        cols = jnp.arange(n, dtype=jnp.int32)
        onehot0 = (i0f[:, None] == cols[None, :]).astype(g.dtype)
        onehot1 = ((i0f + 1)[:, None] == cols[None, :]).astype(g.dtype)
        df = a @ onehot0 + b @ onehot1
    else:
        df = jnp.zeros_like(f).at[i0f].add(a).at[i0f + 1].add(b)
    return dxq, jnp.zeros_like(x), df


interp1d_linear_uniform.defvjp(_lin_uniform_fwd, _lin_uniform_bwd)



def _bf16_split(x, terms):
    """Split f32 x into ``terms`` bf16 arrays summing to x (to ~2^-(8*terms)).

    MUST use ``lax.reduce_precision`` for the truncation: a plain
    ``x - x.astype(bf16).astype(f32)`` is constant-folded to ZERO by XLA's
    excess-precision simplifier on TPU (the f32->bf16->f32 roundtrip is elided),
    which silently collapses the split to one bf16 term.

    DTYPE-POLYMORPHIC: for non-f32 inputs (the f64 CPU sigma-Hessian traces,
    postprocess.batch_flat_hessian) returns ``[x]`` unchanged — a bf16 split
    would cap the value accuracy at ~2^-24, silently defeating the f64
    evaluation those traces exist for.  Every split-contraction call site
    sizes its one-hot dtype and chunk-sum off ``len(parts)``, so the same
    code paths run one exact full-precision matmul instead.  (Keeping the
    matmul FORM in f64 is deliberate: the gather/scatter formulations measure
    4.5x SLOWER on this host's XLA:CPU backend — its AOT kernels are built
    with prefer-no-scatter/gather — so only the split changes, not the
    algorithm; measured B=16 hessian: 43.6 s split-matmul, 198.6 s gathers.)
    """
    if x.dtype != jnp.float32:
        return [x]
    parts = []
    r = x
    for _ in range(terms - 1):
        pt = _jax.lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
        parts.append(pt.astype(jnp.bfloat16))
        r = r - pt
    parts.append(r.astype(jnp.bfloat16))
    return parts


def _onehot_dtype(parts):
    """One-hot operand dtype matching a ``_bf16_split`` result: bf16 against
    split bf16 values (rows exact), the value dtype against unsplit values."""
    return jnp.bfloat16 if parts[0].dtype == jnp.bfloat16 else parts[0].dtype


_BLOCK = 8  # in-context whole-shot step sweet spot on v5e (isolated sweeps mildly favor 16)


def _block_for(f):
    """Per-dtype block size for the blocked-interp formulation.

    f64 only occurs in the CPU-destined sigma-Hessian traces, where the
    dominant cost is materializing the [Q, nblk] one-hot (compare+convert)
    plus the two [Q, block] within-segment selects — total width
    nblk + 2*block = (n-1)/block + 2*block, minimized near block=sqrt(n/2).
    For the 2043-entry chi_R tables block=32 cuts the width 272 -> 128.
    The f32 (TPU) value is the measured end-to-end sweet spot — unchanged.
    """
    return 32 if f.dtype == jnp.float64 else _BLOCK


@_jax.custom_vjp
def interp1d_linear_blocked(xq, x, f):
    """Linear interpolation on a UNIFORM grid with NO hardware gather.

    Numerically identical to ``interp1d_linear_uniform`` (jnp.interp edge
    clamping) but the table lookup is restructured as a two-level one-hot
    contraction, for backends where per-element gathers lower poorly (the TPU
    compiler nondeterministically picks a ~500x-slow lowering for batched 1D
    gathers; see CLAUDE.md "Open performance lead"):

      1. pad f to K*block+1 entries and view it as K overlapping segments of
         ``block+1``; a [Q, K] one-hot (exact in bf16) times the [K, block+1]
         segment table — one MXU matmul — lands each query's segment;
         the table is split hi/lo in bf16 so the f32 values survive exactly
         (one-hot entries are exact, accumulation is f32).
      2. the within-segment index (< block) selects f[i0], f[i0+1] via an
         iota-compare reduction — pure elementwise VPU work that XLA fuses.

    On TPU (f32, non-trivial query counts) the FORWARD runs as the fused
    Pallas kernel ``ops.interp_kernel2`` — the same math in the same layout,
    bit-exact, but the [Q, 3*(block+1)] matmul output never leaves VMEM,
    which makes it 2x faster than the XLA lowering (bench_interp_kernel2.py).
    The backward pass is a custom VJP: the table cotangent is the transposed
    one-hot contraction evaluated in f32 (exact weights), the query cotangent
    the usual slope formula with edge masking — no scatter anywhere.  On
    CPU/f64 prefer ``interp1d_linear_uniform``.
    """
    out, _ = _blocked_any_fwd(xq, x, f)
    return out


_PALLAS_ENABLED = True


import contextlib as _contextlib


@_contextlib.contextmanager
def pallas_disabled():
    """Trace-time switch to the pure-XLA lowerings of every fused kernel.

    ``pallas_call`` has no JVP rule, so jacfwd-of-jacrev (``jax.hessian``,
    the postprocess sigma path) cannot cross the Pallas-dispatched branches —
    any function containing one fails to forward-differentiate.  Tracing the
    model inside this context routes all interp/chi lookups through their XLA
    formulations (identical math, plain-AD- and hessian-compatible; see
    ``test_hessian_flows_through_custom_vjp_kernels``).  Only affects traces
    STARTED inside the context — already-compiled executables are unchanged.
    """
    global _PALLAS_ENABLED
    prev = _PALLAS_ENABLED
    _PALLAS_ENABLED = False
    try:
        yield
    finally:
        _PALLAS_ENABLED = prev


def pallas_enabled():
    """Whether fused-Pallas dispatch is currently allowed (see pallas_disabled)."""
    return _PALLAS_ENABLED


def dispatch_backend():
    """Backend name the FORMULATION dispatch keys on.

    Note for CPU-destined traces from a TPU process (the f64 sigma-Hessian,
    postprocess.batch_flat_hessian): this still reports "tpu" under
    ``jax.default_device(cpu)``, so those traces get the TPU-oriented matmul
    formulations — and that is CORRECT on this host, not an accident.  Routing
    them to the "cpu" branches (hardware gathers/scatter-adds) was tried and
    measured 4.5x SLOWER (B=16 hessian: 198.6 s vs 43.6 s) because the XLA:CPU
    AOT kernels here are built prefer-no-scatter/no-gather.  The f64-accuracy
    side of that coin is handled where it belongs: ``_bf16_split`` is
    dtype-polymorphic, so non-f32 traces run the same matmul forms at full
    working precision.
    """
    return _jax.default_backend()


_PALLAS_INTERPRET = False


@_contextlib.contextmanager
def pallas_interpret_forced():
    """TEST HOOK: route interp dispatch through the Pallas kernels in
    interpret mode on any backend.

    The kernels normally dispatch only on TPU; this lets CPU test meshes
    (8 virtual devices) exercise the full interp-level Pallas path —
    including the GSPMD partitioning rules (ops.partitioning) that shard the
    kernels along the lineout batch — without a multi-chip TPU.  Interpret
    mode runs the kernel body as jnp ops, so results match the Mosaic
    compilation up to backend matmul differences."""
    global _PALLAS_INTERPRET
    prev = _PALLAS_INTERPRET
    _PALLAS_INTERPRET = True
    try:
        yield
    finally:
        _PALLAS_INTERPRET = prev


def pallas_interpret_active():
    """Whether the interpret-mode test hook is on (see pallas_interpret_forced)."""
    return _PALLAS_INTERPRET


def _use_pallas2(xq, f):
    if _PALLAS_ENABLED and _PALLAS_INTERPRET and f.dtype == jnp.float32:
        return True
    return (
        _PALLAS_ENABLED
        and dispatch_backend() == "tpu"
        and f.dtype == jnp.float32
        and xq.size >= 1024  # tiny query sets are not worth a kernel launch
    )


def _blocked_any_fwd(xq, x, f):
    """(out, diff=f[i0+1]-f[i0]) via the Pallas kernel on TPU, XLA elsewhere."""
    if _use_pallas2(xq, f):
        return _pallas2_fwd(xq, x, f)
    out, (f0, f1) = _blocked_fwd_impl(xq, x, f, _block_for(f))
    return out, f1 - f0


def _blocked_segments(f, n, block):
    """[..., K, block+1] overlapping segment view of the padded table."""
    nblk = -(-(n - 1) // block)
    npad = nblk * block + 1
    fpad = jnp.concatenate([f, jnp.zeros(f.shape[:-1] + (npad - n,), f.dtype)], axis=-1)
    body = fpad[..., :-1].reshape(fpad.shape[:-1] + (nblk, block))
    edge = fpad[..., block::block][..., None]  # fpad[block*(k+1)] for each k
    return jnp.concatenate([body, edge], axis=-1), nblk


def _blocked_indices(xq, x, block):
    n = x.shape[0]
    raw = (xq - x[0]) / (x[1] - x[0])
    pos = jnp.clip(raw, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    w = pos - i0
    blk = (i0 // block).reshape(-1)
    lo = (i0 - (i0 // block) * block).reshape(-1)
    inside = ((raw > 0.0) & (raw < n - 1.0)).reshape(-1)
    return blk, lo, w.reshape(-1), inside


def _blocked_fwd_impl(xq, x, f, block):
    n = x.shape[0]
    seg, nblk = _blocked_segments(f, n, block)
    # three-term bf16 split: values survive to ~2^-24 relative (one-hot rows
    # are exact in bf16; accumulation is f32).  f64 (sigma-Hessian traces):
    # one unsplit full-precision matmul (see _bf16_split).
    parts = _bf16_split(seg, 3)
    segcat = jnp.concatenate(parts, axis=-1)  # [..., K, nterm*(block+1)]

    blk, lo, w, inside = _blocked_indices(xq, x, block)
    w = w.astype(f.dtype)
    onehot = (blk[:, None] == jnp.arange(nblk, dtype=jnp.int32)[None, :]).astype(_onehot_dtype(parts))
    S3 = jnp.matmul(onehot, segcat, preferred_element_type=f.dtype)  # [Q, nterm*(block+1)]
    c = block + 1
    S = sum(S3[..., k * c : (k + 1) * c] for k in range(len(parts)))  # [Q, block+1]

    oh = (lo[:, None] == jnp.arange(block, dtype=jnp.int32)[None, :]).astype(f.dtype)
    f0 = jnp.sum(oh * S[..., :block], axis=-1)
    f1 = jnp.sum(oh * S[..., 1:], axis=-1)
    out = (f0 * (1.0 - w) + f1 * w).reshape(jnp.shape(xq))
    return out, (f0, f1)


def _blocked_vjp_fwd(xq, x, f):
    out, diff = _blocked_any_fwd(xq, x, f)
    return out, (xq, x, f, diff)


def _blocked_vjp_bwd(res, g):
    xq, x, f, diff = res
    block = _block_for(f)
    n = x.shape[0]
    dx = x[1] - x[0]
    blk, lo, w, inside = _blocked_indices(xq, x, block)
    w = w.astype(f.dtype)
    gq = g.reshape(-1).astype(f.dtype)
    diffq = jnp.asarray(diff).reshape(-1)

    dxq = jnp.where(inside, gq * diffq / dx, 0.0).reshape(jnp.shape(xq)).astype(xq.dtype)

    nblk = -(-(n - 1) // block)
    if _use_pallas2(xq, f):
        # fused Pallas kernel: cotangent build + hi/lo split + transposed
        # one-hot contraction all in VMEM (ops.interp_kernel2._bwd_kernel)
        dseg = _pallas2_bwd_dseg(xq, x, f, gq, nblk)  # [K, block+1]
    else:
        # table cotangent: per-query segment cotangent, folded back through the
        # transposed block one-hot.  The one-hot is exact in bf16; the fractional
        # cotangent is hi/lo-split so the bf16 matmul recovers it to ~2^-16 —
        # cheaper than an f32 HIGHEST contraction and ample for gradients.
        # (Measured on v5e, bench_blocked_bwd.py: a single-term bf16 cotangent
        # looks cheaper on paper but fuses the cotangent build into the transpose
        # matmul's fusion, serializing VPU work — 25.1 ms vs 16.3 ms fwd+bwd at
        # production shapes; split2 / barrier / f32-HIGHEST all land ~16 ms, and
        # the split keeps full gradient precision for free.)
        jj = jnp.arange(block + 1, dtype=jnp.int32)[None, :]
        cot = gq[:, None] * (
            (lo[:, None] == jj) * (1.0 - w[:, None]) + ((lo + 1)[:, None] == jj) * w[:, None]
        ).astype(f.dtype)  # [Q, block+1]
        parts = _bf16_split(cot, 2)
        onehot = (blk[:, None] == jnp.arange(nblk, dtype=jnp.int32)[None, :]).astype(_onehot_dtype(parts))
        D2 = jnp.matmul(
            onehot.T, jnp.concatenate(parts, axis=-1), preferred_element_type=f.dtype
        )
        c1 = block + 1
        dseg = sum(D2[..., k * c1 : (k + 1) * c1] for k in range(len(parts)))  # [K, block+1]
    # fold overlapping segments: seg[k, j] -> fpad[block*k + j]
    dfpad = jnp.concatenate([dseg[..., :block].reshape(-1), jnp.zeros((1,), f.dtype)], axis=-1)
    dfpad = dfpad.at[block::block].add(dseg[..., block])
    return dxq, jnp.zeros_like(x), dfpad[:n]


interp1d_linear_blocked.defvjp(_blocked_vjp_fwd, _blocked_vjp_bwd)


import functools as _functools_blocked

from jax import custom_batching as _custom_batching_blocked


@_custom_batching_blocked.custom_vmap
def _pallas2_core(qf, f, meta):
    """Unbatched fused blocked-interp forward (ops.interp_kernel2).

    The custom_vmap rule routes vmapped calls to the kernel's explicit batch
    grid — letting vmap lift an unbatched pallas_call is the known ~300x
    pathology (see _pallas_lerp)."""
    from ...ops.interp_kernel2 import lin_interp_pallas2, segments_for_pallas2

    segt = segments_for_pallas2(f[None, :])
    out, diff = lin_interp_pallas2(qf[None, :], segt, meta, interpret=_PALLAS_INTERPRET)
    return out[0], diff[0]


@_pallas2_core.def_vmap
def _pallas2_core_vmap(axis_size, in_batched, qf, f, meta):
    from ...ops.interp_kernel2 import lin_interp_pallas2, segments_for_pallas2

    qb, fb, mb = in_batched
    assert not mb, "grid meta must be shared across the batch"
    if not qb:
        qf = jnp.broadcast_to(qf[None, :], (axis_size,) + qf.shape)
    if not fb:
        f = jnp.broadcast_to(f[None, :], (axis_size,) + f.shape)
    out, diff = lin_interp_pallas2(qf, segments_for_pallas2(f), meta, interpret=_PALLAS_INTERPRET)
    return (out, diff), (True, True)


def _pallas2_fwd(xq, x, f):
    from ...ops.interp_kernel2 import QT

    qf = xq.reshape(-1)
    Q = qf.shape[0]
    pad = -Q % QT
    if pad:
        qf = jnp.concatenate([qf, jnp.full((pad,), x[0], qf.dtype)])
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(x.shape[0]), f.dtype)])
    out, diff = _pallas2_core(qf, f, meta)
    if pad:
        out, diff = out[:Q], diff[:Q]
    return out.reshape(jnp.shape(xq)), diff


@_functools_blocked.lru_cache(maxsize=None)
def _pallas2_bwd_core_for(nblk):
    """custom_vmap-wrapped fused table-cotangent kernel for K=nblk segments.

    Cached per segment count because the kernel's output shape is static in K;
    same vmap-routing rationale as ``_pallas2_core``."""

    @_custom_batching_blocked.custom_vmap
    def core(qf, gf, meta):
        from ...ops.interp_kernel2 import lin_interp_pallas2_bwd

        return lin_interp_pallas2_bwd(qf[None, :], gf[None, :], meta, nblk, interpret=_PALLAS_INTERPRET)[0]

    @core.def_vmap
    def _vmap(axis_size, in_batched, qf, gf, meta):
        from ...ops.interp_kernel2 import lin_interp_pallas2_bwd

        qb, gb, mb = in_batched
        assert not mb, "grid meta must be shared across the batch"
        if not qb:
            qf = jnp.broadcast_to(qf[None, :], (axis_size,) + qf.shape)
        if not gb:
            gf = jnp.broadcast_to(gf[None, :], (axis_size,) + gf.shape)
        return lin_interp_pallas2_bwd(qf, gf, meta, nblk, interpret=_PALLAS_INTERPRET), True

    return core


def _pallas2_bwd_dseg(xq, x, f, gq, nblk):
    """dseg [K, block+1] via the fused Pallas backward kernel."""
    from ...ops.interp_kernel2 import QT

    qf = xq.reshape(-1)
    gf = gq.reshape(-1).astype(jnp.float32)
    Q = qf.shape[0]
    pad = -Q % QT
    if pad:
        qf = jnp.concatenate([qf, jnp.full((pad,), x[0], qf.dtype)])
        gf = jnp.concatenate([gf, jnp.zeros((pad,), gf.dtype)])
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(x.shape[0]), f.dtype)])
    D2 = _pallas2_bwd_core_for(nblk)(qf, gf, meta)  # [2*(block+1), K] (K on lanes)
    c = _BLOCK + 1
    return jnp.swapaxes(D2[..., :c, :] + D2[..., c:, :], -1, -2)


def _hermite_eval(t, h, f0, f1, d0, d1):
    """Cubic Hermite on one cell; t normalized to [0, 1] (unclamped -> extrapolates)."""
    t2 = t * t
    t3 = t2 * t
    h00 = 2.0 * t3 - 3.0 * t2 + 1.0
    h10 = t3 - 2.0 * t2 + t
    h01 = -2.0 * t3 + 3.0 * t2
    h11 = t3 - t2
    return h00 * f0 + h10 * h * d0 + h01 * f1 + h11 * h * d1


def interp1d_cubic(xq, x, f, extrap=True, uniform=False):
    """C1 cubic Hermite interpolation of f(x) at points xq.

    Args:
        xq: query points, any shape.
        x: [N] strictly increasing grid.
        f: [N] samples.
        extrap: True -> extrapolate the edge-cell polynomial;
                (lo, hi) tuple -> constant fill values outside the domain
                (the reference's ``extrap=[-50, -50]`` pattern, form_factor.py:256).
        uniform: the grid is uniformly spaced (skips the binary search).

    Returns:
        Array shaped like xq.
    """
    xq = jnp.asarray(xq)
    d = _fd_slopes_1d(x, f)
    i = _locate(xq, x, uniform=uniform)
    h = x[i + 1] - x[i]
    t = (xq - x[i]) / h
    out = _hermite_eval(t, h, f[i], f[i + 1], d[i], d[i + 1])
    if extrap is not True:
        lo, hi = extrap
        out = jnp.where(xq < x[0], lo, out)
        out = jnp.where(xq > x[-1], hi, out)
    return out


def _cubic_W(xq, x, d=False):
    """[Q, N] banded cubic-Hermite weight matrix (4 nonzeros per row).

    The Hermite basis composed with the finite-difference slope stencil
    (``_cubic_weights``); ``d=True`` builds dW/dt instead (for the analytic
    query cotangent).
    """
    n = x.shape[0]
    pos = (xq.reshape(-1) - x[0]) / (x[1] - x[0])
    i = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    t = pos - i
    c_m1, c_0, c_p1, c_p2 = _cubic_weights(t, i == 0, i == n - 2, d=d)
    cols = jnp.arange(n, dtype=jnp.int32)
    iq = i[:, None]
    return (
        c_m1[:, None] * (cols == iq - 1)
        + c_0[:, None] * (cols == iq)
        + c_p1[:, None] * (cols == iq + 1)
        + c_p2[:, None] * (cols == iq + 2)
    )


def _cubic_matmul_impl(xq, x, f):
    return (jnp.matmul(_cubic_W(xq, x).astype(f.dtype), f)).reshape(jnp.shape(xq))


@_jax.custom_vjp
def _cubic_matmul_core(xq, x, f):
    return _cubic_matmul_impl(xq, x, f)


def _cubic_matmul_core_fwd(xq, x, f):
    # call the PLAIN impl, not the wrapped function: the custom_vjp primitive
    # must dissolve under linearization or jacfwd-of-jacrev (jax.hessian,
    # the sigma path) hits "can't apply jvp to a custom_vjp function"
    return _cubic_matmul_impl(xq, x, f), (xq, x, f)


def _cubic_matmul_core_bwd(res, g):
    """Both cotangents as W-shaped matmuls (the W build fuses into each).

    XLA's automatic transpose of the fused W-build emitted six separate
    reduce fusions per spectrum (the chain rule walked through every
    jnp.where in the weight construction); the analytic forms are one
    matmul each and the unused one (static query grids) dead-code
    eliminates.
    """
    xq, x, f = res
    gq = g.reshape(-1).astype(f.dtype)
    dout_dx = jnp.matmul(_cubic_W(xq, x, d=True).astype(f.dtype), f) / (x[1] - x[0])
    dxq = (gq * dout_dx).reshape(jnp.shape(xq)).astype(xq.dtype)
    df = jnp.einsum("q,qn->n", gq, _cubic_W(xq, x).astype(f.dtype))
    return dxq, jnp.zeros_like(x), df.astype(f.dtype)


_cubic_matmul_core.defvjp(_cubic_matmul_core_fwd, _cubic_matmul_core_bwd)


def interp1d_cubic_matmul(xq, x, f, extrap=True):
    """C1 cubic Hermite interpolation as a banded weight-matrix contraction.

    Identical math to ``interp1d_cubic(..., uniform=True)`` on a UNIFORM grid,
    but expressed as out = W(xq) @ f where W has four nonzeros per row (the
    Hermite basis composed with the finite-difference slope stencil).  On TPU
    this replaces per-query gathers with one MXU matmul; when both xq and x are
    compile-time constants, W constant-folds entirely.  Custom VJP: see
    ``_cubic_matmul_core_bwd``.

    Intended for moderate N (the EDF velocity grid); W materializes [Q, N].

    NOTE: like every custom-VJP kernel in this module, the cotangent w.r.t.
    the GRID ``x`` is not propagated (returned as zeros) — grids are static
    throughout this codebase.  Differentiating w.r.t. x yields silently zero
    gradients; use ``interp1d_cubic(..., uniform=True)`` if you need them.
    """
    xq = jnp.asarray(xq)
    out = _cubic_matmul_core(xq, x, f)
    if extrap is not True:
        lo, hi = extrap
        out = jnp.where(xq < x[0], lo, out)
        out = jnp.where(xq > x[-1], hi, out)
    return out


def interp2d_cubic(xq, yq, x, y, f, extrap=True):
    """Bicubic Hermite interpolation of f on a tensor grid at scattered points.

    Args:
        xq, yq: query coordinates, matching shapes.
        x: [Nx], y: [Ny] strictly increasing grids.
        f: [Nx, Ny] samples, f[i, j] = f(x[i], y[j]).
        extrap: True -> extrapolate edge-cell polynomials (reference rotate uses
                extrap=True, form_factor.py:324); or a scalar constant fill.

    Returns:
        Array shaped like xq.
    """
    xq = jnp.asarray(xq)
    yq = jnp.asarray(yq)

    fx = _fd_slopes_1d(x, jnp.moveaxis(f, 0, -1))  # d/dx: operate with x last
    fx = jnp.moveaxis(fx, -1, 0)  # [Nx, Ny]
    fy = _fd_slopes_1d(y, f)  # [Nx, Ny]
    fxy = _fd_slopes_1d(y, fx)  # [Nx, Ny]

    ix = _locate(xq, x)
    iy = _locate(yq, y)
    hx = x[ix + 1] - x[ix]
    hy = y[iy + 1] - y[iy]
    tx = (xq - x[ix]) / hx
    ty = (yq - y[iy]) / hy

    def corners(a):
        return a[ix, iy], a[ix + 1, iy], a[ix, iy + 1], a[ix + 1, iy + 1]

    f00, f10, f01, f11 = corners(f)
    fx00, fx10, fx01, fx11 = corners(fx)
    fy00, fy10, fy01, fy11 = corners(fy)
    fxy00, fxy10, fxy01, fxy11 = corners(fxy)

    # interpolate along x at y-edges (values and d/dy), then along y
    g0 = _hermite_eval(tx, hx, f00, f10, fx00, fx10)
    g1 = _hermite_eval(tx, hx, f01, f11, fx01, fx11)
    gy0 = _hermite_eval(tx, hx, fy00, fy10, fxy00, fxy10)
    gy1 = _hermite_eval(tx, hx, fy01, fy11, fxy01, fxy11)
    out = _hermite_eval(ty, hy, g0, g1, gy0, gy1)

    if extrap is not True:
        inside = (xq >= x[0]) & (xq <= x[-1]) & (yq >= y[0]) & (yq <= y[-1])
        out = jnp.where(inside, out, extrap)
    return out


def _rowmix_indices(R, beta_q):
    """Periodic row indices/weight for a [0, 2pi) row grid of R rows."""
    two_pi = 2.0 * jnp.pi
    bpos = (beta_q % two_pi) * (R / two_pi)
    ifl = jnp.floor(bpos)
    ib0 = ifl.astype(jnp.int32) % R
    ib1 = (ib0 + 1) % R
    wb = bpos - ifl
    return ib0, ib1, wb


def _rowmix_impl(T, beta_q):
    R, C = T.shape
    qshape = jnp.shape(beta_q)
    ib0, ib1, wb = _rowmix_indices(R, beta_q.reshape(-1))
    rows = jnp.arange(R, dtype=jnp.int32)[None, :]
    wb = wb.astype(T.dtype)
    W = (1.0 - wb)[:, None] * (ib0[:, None] == rows) + wb[:, None] * (ib1[:, None] == rows)
    Wparts = _bf16_split(W, 2)
    Tparts = _bf16_split(T, 2)
    Wcat = jnp.concatenate(Wparts, axis=1)  # [Q, nterm*R]
    out = sum(
        jnp.matmul(
            Wcat, jnp.concatenate([Tp] * len(Wparts), axis=0), preferred_element_type=T.dtype
        )
        for Tp in Tparts
    )
    return out.reshape(qshape + (C,))


@_jax.custom_vjp
def periodic_linear_rowmix(T, beta_q):
    """Row-interpolate T[R, C] at angles beta_q: out[q, :] = lerp(T[ib0], T[ib1], wb).

    Rows live on a uniform periodic grid beta_r = 2*pi*r/R.  The lookup is a
    fractional two-hot [Q, R] contraction with the weight matrix split hi/lo in
    bfloat16 (result exact to ~2^-17 relative) — no hardware gather, so the TPU
    compiler's pathological batched-gather lowering (CLAUDE.md) never triggers.
    Used by the 2V chi table mode: one rowmix over the stacked
    (f1d | df1d | chiR) tables replaces three bilinear gathers; the remaining
    v-axis selection is elementwise (``select_columns_linear``).

    Custom VJP: dT = W^T @ g and the row-difference for dbeta as hi/lo
    bf16-split matmuls (see ``_rowmix_vjp_bwd``).
    """
    return _rowmix_impl(T, beta_q)


def _rowmix_vjp_fwd(T, beta_q):
    # plain impl, not the wrapped function: see _cubic_matmul_core_fwd
    return _rowmix_impl(T, beta_q), (T, beta_q)


def _rowmix_vjp_bwd(res, g):
    T, beta_q = res
    R, C = T.shape
    qshape = jnp.shape(beta_q)
    ib0, ib1, wb = _rowmix_indices(R, beta_q.reshape(-1))
    gq = g.reshape(-1, C).astype(T.dtype)
    rows = jnp.arange(R, dtype=jnp.int32)[None, :]
    wb = wb.astype(T.dtype)
    oh0 = (ib0[:, None] == rows).astype(T.dtype)
    oh1 = (ib1[:, None] == rows).astype(T.dtype)
    W = (1.0 - wb)[:, None] * oh0 + wb[:, None] * oh1

    # hi/lo bf16 splits instead of f32-HIGHEST matmuls (6-pass bf16
    # emulation on the MXU): the concat trick computes all four cross
    # products of dT in two MXU passes of doubled size — the same ~2^-17
    # relative exactness as the forward's split, at ~1/3 the passes.  This
    # was the largest single device op of the ARTS fit iteration (2.2 ms of
    # ~11 ms at full resolution, docs/performance.md).
    Wparts = _bf16_split(W, 2)
    gparts = _bf16_split(gq, 2)
    Wcat_t = jnp.concatenate(Wparts, axis=1).T  # [nterm*R, Q]
    M = sum(jnp.matmul(Wcat_t, gp, preferred_element_type=T.dtype) for gp in gparts)
    dT = sum(M[k * R : (k + 1) * R] for k in range(len(Wparts)))

    # oh1 - oh0 has entries in {-1, 0, 1}, exactly representable in bf16;
    # only T needs the split — two plain passes replace six.
    Tparts = _bf16_split(T, 2)
    D = (oh1 - oh0).astype(_onehot_dtype(Tparts))
    rowdiff = sum(jnp.matmul(D, Tp, preferred_element_type=T.dtype) for Tp in Tparts)
    dbeta = jnp.sum(gq * rowdiff, axis=-1) * (R / (2.0 * jnp.pi))
    return dT, dbeta.reshape(qshape).astype(beta_q.dtype)


periodic_linear_rowmix.defvjp(_rowmix_vjp_fwd, _rowmix_vjp_bwd)


@_functools_blocked.lru_cache(maxsize=None)
def _bilin_core_for(nvx):
    """custom_vmap-wrapped fused bilinear chi lookup (ops.bilinear_kernel).

    Cached per velocity-grid size (static segment layout); vmapped calls are
    routed to the kernel's explicit batch grid — letting vmap lift an
    unbatched pallas_call is the known ~300x pathology."""

    @_custom_batching_blocked.custom_vmap
    def core(bq, xq, tsplit, meta):
        from ...ops.bilinear_kernel import chi_bilinear_pallas

        outs = chi_bilinear_pallas(
            bq[None], xq[None], tsplit[None], meta[None], nvx, interpret=_PALLAS_INTERPRET
        )
        return tuple(o[0] for o in outs)

    @core.def_vmap
    def _vmap(axis_size, in_batched, bq, xq, tsplit, meta):
        from ...ops.bilinear_kernel import chi_bilinear_pallas

        args = []
        for a, b in zip((bq, xq, tsplit, meta), in_batched):
            args.append(a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape))
        return chi_bilinear_pallas(*args, nvx, interpret=_PALLAS_INTERPRET), (True,) * 6

    @_custom_batching_blocked.custom_vmap
    def core_bwd(bq, xq, tsplit, g0, g1, g2, meta):
        from ...ops.bilinear_kernel import chi_bilinear_pallas_bwd

        dt, db = chi_bilinear_pallas_bwd(
            bq[None], xq[None], tsplit[None], g0[None], g1[None], g2[None], meta[None], nvx,
            interpret=_PALLAS_INTERPRET,
        )
        return dt[0], db[0]

    @core_bwd.def_vmap
    def _vmap_bwd(axis_size, in_batched, bq, xq, tsplit, g0, g1, g2, meta):
        from ...ops.bilinear_kernel import chi_bilinear_pallas_bwd

        args = []
        for a, b in zip((bq, xq, tsplit, g0, g1, g2, meta), in_batched):
            args.append(a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape))
        return chi_bilinear_pallas_bwd(*args, nvx, interpret=_PALLAS_INTERPRET), (True, True)

    return core, core_bwd


def _bilin_prepare(Tcat, beta_q, xq, v0x, dvx, v0p, dvp, nshards=1):
    """(padded bq/xq flat, tsplit, meta, Q, pad) for the fused kernel.

    ``nshards`` > 1 pads the flat query axis to a multiple of QT * nshards so
    each device of a point-sharded mesh gets a whole number of query tiles
    (the kernel's grid requires per-shard Q % QT == 0)."""
    from ...ops.bilinear_kernel import QT, tables_for_bilinear

    bq = beta_q.reshape(-1)
    xf = xq.reshape(-1).astype(jnp.float32)
    bq = bq.astype(jnp.float32)
    Q = bq.shape[0]
    pad = -Q % (QT * nshards)
    if pad:
        bq = jnp.concatenate([bq, jnp.zeros((pad,), bq.dtype)])
        fill = jnp.broadcast_to(jnp.asarray(v0x, jnp.float32), (pad,))
        xf = jnp.concatenate([xf, fill])
    tsplit = tables_for_bilinear(Tcat[None])[0]
    meta = jnp.stack(
        [jnp.asarray(s, jnp.float32) for s in (v0x, dvx, v0p, dvp)]
    )
    return bq, xf, tsplit, meta, Q, pad


@_functools_blocked.lru_cache(maxsize=None)
def _chi_bilinear_lookup_for(nshards):
    """custom_vjp'd fused bilinear lookup, cached per point-shard count.

    ``nshards`` is static (it sets the query padding), so the lookup is a
    factory: nshards=1 is the single-device kernel; >1 pads the query axis to
    QT * nshards so the GSPMD rule on the kernel (ops.partitioning) can give
    every device a whole number of query tiles."""

    def _fwd(Tcat, beta_q, xq, v0x, dvx, v0p, dvp):
        nvx = (Tcat.shape[-1] + 2) // 3
        bq, xf, tsplit, meta, Q, pad = _bilin_prepare(
            Tcat, beta_q, xq, v0x, dvx, v0p, dvp, nshards
        )
        core, _ = _bilin_core_for(nvx)
        fe, dfe, chiR, d0, d1, d2 = core(bq, xf, tsplit, meta)
        shape = jnp.shape(beta_q)
        rs = lambda a: a[:Q].reshape(shape)
        out = (rs(fe), rs(dfe), rs(chiR))
        res = (Tcat, beta_q, xq, v0x, dvx, v0p, dvp, d0, d1, d2)
        return out, res

    def _bwd(res, g):
        Tcat, beta_q, xq, v0x, dvx, v0p, dvp, d0, d1, d2 = res
        g0, g1, g2 = g
        nvx = (Tcat.shape[-1] + 2) // 3
        bq, xf, tsplit, meta, Q, pad = _bilin_prepare(
            Tcat, beta_q, xq, v0x, dvx, v0p, dvp, nshards
        )
        gp = []
        for gi in (g0, g1, g2):
            gf = gi.reshape(-1).astype(jnp.float32)
            if pad:
                gf = jnp.concatenate([gf, jnp.zeros((pad,), gf.dtype)])
            gp.append(gf)
        _, core_bwd = _bilin_core_for(nvx)
        dt, db = core_bwd(bq, xf, tsplit, gp[0], gp[1], gp[2], meta)
        shape = jnp.shape(beta_q)
        dT = dt[: Tcat.shape[0], : Tcat.shape[1]].astype(Tcat.dtype)
        dbeta = db[:Q].reshape(shape).astype(beta_q.dtype)
        # query cotangent from the forward-emitted derivatives (one multiply each)
        gq = g0.reshape(-1) * d0[:Q] + g1.reshape(-1) * d1[:Q] + g2.reshape(-1) * d2[:Q]
        dxq = gq.reshape(jnp.shape(xq)).astype(xq.dtype)
        z = lambda a: jnp.zeros_like(a)
        return dT, dbeta, dxq, z(v0x), z(dvx), z(v0p), z(dvp)

    @_jax.custom_vjp
    def lookup(Tcat, beta_q, xq, v0x, dvx, v0p, dvp):
        out, _ = _fwd(Tcat, beta_q, xq, v0x, dvx, v0p, dvp)
        return out

    lookup.defvjp(_fwd, _bwd)
    return lookup


def chi_bilinear_lookup(Tcat, beta_q, xq, v0x, dvx, v0p, dvp, nshards=1):
    """Fused row-mix + column-lerp lookup of the stacked 2V chi tables.

    Semantics identical to the ``periodic_linear_rowmix`` +
    ``select_columns_linear`` composition in ``calc_all_chi_vals`` (TPU
    table mode), fused into one Pallas kernel so the [Q, R] two-hot and the
    [Q, C] row-mixed slice never round-trip HBM (~0.9 GB/iteration at full
    ARTS resolution).  TPU-only; requires num_beta % 128 == 0.

    Args:
      Tcat: [R, 3*nvx - 2] stacked (f1d | df1d | chiR) tables.
      beta_q, xq: query angle/magnitude arrays (same shape).
      v0x, dvx: velocity-grid origin/spacing; v0p, dvp: pole-grid ditto.
      nshards: static point-shard count of the mesh the queries are sharded
        over (1 = unsharded); sets the query-axis padding so the kernel's
        GSPMD rule gives each device whole query tiles.

    Returns:
      (fe_vphi, dfe, chiR_raw) shaped like beta_q.

    Gradients flow to Tcat, beta_q, and xq; the grid scalars get zeros
    (same convention as the other custom-VJP interp kernels).
    """
    return _chi_bilinear_lookup_for(int(nshards))(Tcat, beta_q, xq, v0x, dvx, v0p, dvp)


def select_columns_linear(S, v0, dv, v_q):
    """Per-row linear column interpolation: out[q] = lerp(S[q, iv0], S[q, iv0+1], wv).

    S is [Q, N] (e.g. the output of ``periodic_linear_rowmix``), v the uniform
    column grid with origin v0 and spacing dv, clamped at the ends (jnp.interp
    edge behaviour).  Pure iota-compare elementwise work — fuses, no gather;
    plain AD transposes elementwise.
    """
    N = S.shape[-1]
    vpos = jnp.clip((v_q - v0) / dv, 0.0, N - 1.0)
    iv0 = jnp.minimum(jnp.floor(vpos).astype(jnp.int32), N - 2)
    wv = (vpos - iv0).astype(S.dtype)
    cols = jnp.arange(N, dtype=jnp.int32)
    oh0 = (iv0[..., None] == cols).astype(S.dtype)  # [Q, N]
    f0 = jnp.sum(oh0 * S, axis=-1)
    f1 = jnp.sum(oh0[..., :-1] * S[..., 1:], axis=-1)
    return f0 * (1.0 - wv) + f1 * wv


def _cubic_blocked_segments(f, n, block):
    """[..., K, block+3] segment view with one-column left pad (taps i-1..i+2)."""
    nblk = -(-(n - 1) // block)
    npad = nblk * block + 3
    zl = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
    zr = jnp.zeros(f.shape[:-1] + (npad - n - 1,), f.dtype)
    fpad = jnp.concatenate([zl, f, zr], axis=-1)  # fpad[j] = f[j-1]
    body = fpad[..., : nblk * block].reshape(f.shape[:-1] + (nblk, block))
    extras = [fpad[..., block + c :: block][..., :nblk, None] for c in range(3)]
    return jnp.concatenate([body] + [e.reshape(f.shape[:-1] + (nblk, 1)) for e in extras], axis=-1), nblk


def _cubic_weights(t, first, last, d=False):
    """Per-offset cubic Hermite x FD-slope weights (c_m1, c_0, c_p1, c_p2).

    Identical math to ``interp1d_cubic_matmul`` (uniform grid, one-sided
    second-order slope stencils in the first/last cells).  With ``d=True``
    returns d/dt of each weight instead.
    """
    t2 = t * t
    if not d:
        t3 = t2 * t
        h00 = 2.0 * t3 - 3.0 * t2 + 1.0
        h10 = t3 - 2.0 * t2 + t
        h01 = -2.0 * t3 + 3.0 * t2
        h11 = t3 - t2
    else:
        h00 = 6.0 * t2 - 6.0 * t
        h10 = 3.0 * t2 - 4.0 * t + 1.0
        h01 = 6.0 * t - 6.0 * t2
        h11 = 3.0 * t2 - 2.0 * t
    c_m1 = jnp.where(first, 0.0, jnp.where(last, -0.5 * h10 + 0.5 * h11, -0.5 * h10))
    c_0 = jnp.where(
        first, h00 - 1.5 * h10 - 0.5 * h11, jnp.where(last, h00 - 2.0 * h11, h00 - 0.5 * h11)
    )
    c_p1 = jnp.where(
        first, h01 + 2.0 * h10, jnp.where(last, h01 + 0.5 * h10 + 1.5 * h11, h01 + 0.5 * h10)
    )
    c_p2 = jnp.where(first, -0.5 * h10 + 0.5 * h11, jnp.where(last, 0.0, 0.5 * h11))
    return c_m1, c_0, c_p1, c_p2


_CUBIC_BLOCK = 8


def _cubic_blocked_indices(xq, x, block):
    n = x.shape[0]
    pos = (xq.reshape(-1) - x[0]) / (x[1] - x[0])
    i = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    t = pos - i  # unclamped: edge cells extrapolate their polynomial
    blk = i // block
    lo = i - blk * block
    return i, blk, lo, t


def _cubic_blocked_taps(xq, x, f, block):
    n = x.shape[0]
    seg, nblk = _cubic_blocked_segments(f, n, block)
    parts = _bf16_split(seg, 3)
    segcat = jnp.concatenate(parts, axis=-1)

    i, blk, lo, t = _cubic_blocked_indices(xq, x, block)
    onehot = (blk[:, None] == jnp.arange(nblk, dtype=jnp.int32)[None, :]).astype(_onehot_dtype(parts))
    S3 = jnp.matmul(onehot, segcat, preferred_element_type=f.dtype)
    c = block + 3
    S = sum(S3[..., k * c : (k + 1) * c] for k in range(len(parts)))  # [Q, block+3]

    oh = (lo[:, None] == jnp.arange(block, dtype=jnp.int32)[None, :]).astype(f.dtype)
    taps = [jnp.sum(oh * S[..., k : k + block], axis=-1) for k in range(4)]
    return taps, i, blk, lo, t


@_jax.custom_vjp
def interp1d_cubic_blocked(xq, x, f):
    """C1 cubic Hermite interpolation on a UNIFORM grid with NO hardware gather.

    Same math as ``interp1d_cubic_matmul`` (edge cells extrapolate their
    polynomial; apply constant fills with jnp.where outside) but instead of
    materializing the [Q, N] weight matrix it lands each query's 4-tap stencil
    through a [Q, N/8]-block one-hot contraction — for the 320-point EDF grid
    that is 8x less traffic, and the one-hot is exact in bf16 (values recover
    f32 via a three-term split).  Custom VJP: both cotangents avoid gathers
    and scatters; the table cotangent is a transposed one-hot bf16 matmul with
    a hi/lo-split cotangent (~2^-17 relative).

    On TPU (f32, >=1024 queries) both directions run as fused Pallas kernels
    (``ops.interp_kernel2``, cubic variant) — bit-exact same math, but the
    [Q, block+3] intermediates (taps, cotangent, hi/lo splits) never leave
    VMEM, and the forward emits d(out)/dt so the backward's query cotangent
    is one elementwise multiply.
    """
    out, _ = _cubic_any_fwd(xq, x, f)
    return out


def _cubic_any_fwd(xq, x, f):
    """(out, aux): aux is dout_dt [Q] on the Pallas path, the 4 taps on XLA's."""
    if _use_pallas2(xq, f):
        return _cubic_pallas2_fwd(xq, x, f)
    taps, i, blk, lo, t = _cubic_blocked_taps(xq, x, f, _CUBIC_BLOCK)
    n = x.shape[0]
    cw = _cubic_weights(t.astype(f.dtype), i == 0, i == n - 2)
    out = sum(c * tap for c, tap in zip(cw, taps))
    return out.reshape(jnp.shape(xq)), taps


def _cubic_blocked_vjp_fwd(xq, x, f):
    out, aux = _cubic_any_fwd(xq, x, f)
    return out, (xq, x, f, aux)


def _cubic_blocked_vjp_bwd(res, g):
    block = _CUBIC_BLOCK
    xq, x, f, aux = res
    n = x.shape[0]
    h = x[1] - x[0]
    i, blk, lo, t = _cubic_blocked_indices(xq, x, block)
    gq = g.reshape(-1).astype(f.dtype)
    nblk = -(-(n - 1) // block)

    if _use_pallas2(xq, f):
        # aux = d(out)/dt from the forward kernel: query cotangent is elementwise
        dxq = (gq * jnp.asarray(aux).reshape(-1) / h).reshape(jnp.shape(xq)).astype(xq.dtype)
        dseg = _cubic_pallas2_bwd_dseg(xq, x, f, gq, nblk)  # [K, block+3]
    else:
        taps = aux
        first, last = i == 0, i == n - 2
        t = t.astype(f.dtype)

        # query cotangent: analytic d/dt of the per-offset weights
        dw = _cubic_weights(t, first, last, d=True)
        dxq = (gq * sum(c * tap for c, tap in zip(dw, taps)) / h).reshape(jnp.shape(xq)).astype(xq.dtype)

        # table cotangent: per-query (block+3)-wide stencil cotangent, folded back
        # through the transposed block one-hot (exact bf16) with hi/lo-split values
        # (a single-term bf16 cotangent measures ~1.5x SLOWER at production shapes
        # — the cotangent build fuses into the transpose matmul and serializes its
        # VPU work; see _blocked_vjp_bwd and bench_blocked_bwd.py)
        cw = _cubic_weights(t, first, last)
        jj = jnp.arange(block + 3, dtype=jnp.int32)[None, :]
        cot = gq[:, None] * sum(
            c[:, None] * (jj == (lo + k)[:, None]) for k, c in enumerate(cw)
        ).astype(f.dtype)  # [Q, block+3]
        parts = _bf16_split(cot, 2)
        onehot = (blk[:, None] == jnp.arange(nblk, dtype=jnp.int32)[None, :]).astype(_onehot_dtype(parts))
        D2 = jnp.matmul(onehot.T, jnp.concatenate(parts, axis=-1), preferred_element_type=f.dtype)
        c = block + 3
        dseg = sum(D2[..., k * c : (k + 1) * c] for k in range(len(parts)))  # [K, block+3]

    npad = nblk * block + 3
    dfpad = jnp.concatenate([dseg[:, :block].reshape(-1), jnp.zeros((3,), f.dtype)], axis=-1)
    for cix in range(3):
        dfpad = dfpad.at[block + cix :: block].add(dseg[:, block + cix][: (npad - block - cix - 1) // block + 1])
    return dxq, jnp.zeros_like(x), dfpad[1 : 1 + n]


interp1d_cubic_blocked.defvjp(_cubic_blocked_vjp_fwd, _cubic_blocked_vjp_bwd)


@_custom_batching_blocked.custom_vmap
def _cubic_pallas2_core(qf, f, meta):
    """Unbatched fused blocked-cubic forward (ops.interp_kernel2, cubic).

    Same vmap-routing rationale as ``_pallas2_core``.  Unlike the linear
    kernel, meta may be BATCHED under vmap: the EDF velocity grid arrives
    through the batched parameter pytree (identical values per lineout, but
    a batched tracer), so the kernel takes per-row (x0, dx, n)."""
    from ...ops.interp_kernel2 import cubic_interp_pallas2, cubic_segments_for_pallas2

    segt = cubic_segments_for_pallas2(f[None, :])
    out, dout = cubic_interp_pallas2(qf[None, :], segt, meta[None, :], interpret=_PALLAS_INTERPRET)
    return out[0], dout[0]


@_cubic_pallas2_core.def_vmap
def _cubic_pallas2_core_vmap(axis_size, in_batched, qf, f, meta):
    from ...ops.interp_kernel2 import cubic_interp_pallas2, cubic_segments_for_pallas2

    qb, fb, mb = in_batched
    if not qb:
        qf = jnp.broadcast_to(qf[None, :], (axis_size,) + qf.shape)
    if not fb:
        f = jnp.broadcast_to(f[None, :], (axis_size,) + f.shape)
    if not mb:
        meta = jnp.broadcast_to(meta[None, :], (axis_size,) + meta.shape)
    out, dout = cubic_interp_pallas2(qf, cubic_segments_for_pallas2(f), meta, interpret=_PALLAS_INTERPRET)
    return (out, dout), (True, True)


def _cubic_pallas2_fwd(xq, x, f):
    from ...ops.interp_kernel2 import QT

    qf = xq.reshape(-1)
    Q = qf.shape[0]
    pad = -Q % QT
    if pad:
        qf = jnp.concatenate([qf, jnp.full((pad,), x[0], qf.dtype)])
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(x.shape[0]), f.dtype)])
    out, dout = _cubic_pallas2_core(qf, f, meta)
    if pad:
        out, dout = out[:Q], dout[:Q]
    return out.reshape(jnp.shape(xq)), dout


@_functools_blocked.lru_cache(maxsize=None)
def _cubic_pallas2_bwd_core_for(nblk):
    """custom_vmap-wrapped fused cubic table-cotangent kernel for K=nblk segments."""

    @_custom_batching_blocked.custom_vmap
    def core(qf, gf, meta):
        from ...ops.interp_kernel2 import cubic_interp_pallas2_bwd

        return cubic_interp_pallas2_bwd(qf[None, :], gf[None, :], meta[None, :], nblk, interpret=_PALLAS_INTERPRET)[0]

    @core.def_vmap
    def _vmap(axis_size, in_batched, qf, gf, meta):
        from ...ops.interp_kernel2 import cubic_interp_pallas2_bwd

        qb, gb, mb = in_batched
        if not qb:
            qf = jnp.broadcast_to(qf[None, :], (axis_size,) + qf.shape)
        if not gb:
            gf = jnp.broadcast_to(gf[None, :], (axis_size,) + gf.shape)
        if not mb:
            meta = jnp.broadcast_to(meta[None, :], (axis_size,) + meta.shape)
        return cubic_interp_pallas2_bwd(qf, gf, meta, nblk, interpret=_PALLAS_INTERPRET), True

    return core


def _cubic_pallas2_bwd_dseg(xq, x, f, gq, nblk):
    """dseg [K, block+3] via the fused cubic Pallas backward kernel."""
    from ...ops.interp_kernel2 import QT

    qf = xq.reshape(-1)
    gf = gq.reshape(-1).astype(jnp.float32)
    Q = qf.shape[0]
    pad = -Q % QT
    if pad:
        qf = jnp.concatenate([qf, jnp.full((pad,), x[0], qf.dtype)])
        gf = jnp.concatenate([gf, jnp.zeros((pad,), gf.dtype)])
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(x.shape[0]), f.dtype)])
    D2 = _cubic_pallas2_bwd_core_for(nblk)(qf, gf, meta)  # [K, 2*(block+3)]
    c = _CUBIC_BLOCK + 3
    return D2[..., :c] + D2[..., c:]


@_jax.custom_vjp
def interp1d_linear_pallas(xq, x, f):
    """interp1d_linear_blocked semantics with the Pallas forward kernel.

    The forward runs at the HBM roofline (queries in, values out; the one-hot
    contraction never leaves VMEM — ~200x the XLA blocked form at whole-shot
    query counts).  The backward reuses the XLA transposed-one-hot matmuls,
    with the query cotangent's slope taken from the kernel's second output.
    TPU-only caller path; vmap over per-lineout (queries, tables) lifts the
    batch into an extra Pallas grid axis.
    """
    out, _ = _lin_pallas_fwd_impl(xq, x, f)
    return out


from jax import custom_batching as _custom_batching


@_custom_batching.custom_vmap
def _pallas_lerp(qf, fpad, meta):
    """Unbatched Pallas lerp core: (values, f[i0+1]-f[i0]) at flat queries.

    The custom_vmap rule routes vmapped calls to the explicit-batch Pallas
    grid — letting vmap lift the unbatched pallas_call measured ~300x slower
    on v5e.
    """
    from ...ops.interp_kernel import lin_interp_pallas

    out, diff = lin_interp_pallas(qf[None, :], fpad[None, :], meta)
    return out[0], diff[0]


@_pallas_lerp.def_vmap
def _pallas_lerp_vmap(axis_size, in_batched, qf, fpad, meta):
    from ...ops.interp_kernel import lin_interp_pallas

    qb, fb, mb = in_batched
    assert not mb, "grid meta must be shared across the batch"
    if not qb:
        qf = jnp.broadcast_to(qf[None, :], (axis_size,) + qf.shape)
    if not fb:
        fpad = jnp.broadcast_to(fpad[None, :], (axis_size,) + fpad.shape)
    out, diff = lin_interp_pallas(qf, fpad, meta)
    return (out, diff), (True, True)


def _lin_pallas_fwd_impl(xq, x, f):
    from ...ops.interp_kernel import TILE, _BLK

    n = x.shape[0]
    qf = xq.reshape(-1)
    Q = qf.shape[0]
    qpad = -Q % TILE
    if qpad:
        qf = jnp.concatenate([qf, jnp.full((qpad,), x[0], qf.dtype)])
    npad = ((n + _BLK) // _BLK) * _BLK
    fpad = jnp.concatenate([f, jnp.zeros((npad - n,), f.dtype)])
    meta = jnp.stack([x[0], x[1] - x[0], jnp.asarray(float(n), f.dtype)])
    out, diff = _pallas_lerp(qf, fpad, meta)
    if qpad:
        out, diff = out[:Q], diff[:Q]
    return out.reshape(jnp.shape(xq)), diff


def _lin_pallas_vjp_fwd(xq, x, f):
    out, diff = _lin_pallas_fwd_impl(xq, x, f)
    return out, (xq, x, f, diff)


def _lin_pallas_vjp_bwd(res, g):
    block = _BLOCK
    xq, x, f, fdiff = res
    n = x.shape[0]
    dx = x[1] - x[0]
    blk, lo, w, inside = _blocked_indices(xq, x, block)
    w = w.astype(f.dtype)
    gq = g.reshape(-1).astype(f.dtype)

    dxq = jnp.where(inside, gq * fdiff / dx, 0.0).reshape(jnp.shape(xq)).astype(xq.dtype)

    jj = jnp.arange(block + 1, dtype=jnp.int32)[None, :]
    cot = gq[:, None] * (
        (lo[:, None] == jj) * (1.0 - w[:, None]) + ((lo + 1)[:, None] == jj) * w[:, None]
    ).astype(f.dtype)
    parts = _bf16_split(cot, 2)  # len-generic: [cot] unsplit for non-f32
    nblk = -(-(n - 1) // block)
    onehot = (blk[:, None] == jnp.arange(nblk, dtype=jnp.int32)[None, :]).astype(_onehot_dtype(parts))
    D2 = jnp.matmul(onehot.T, jnp.concatenate(parts, axis=-1), preferred_element_type=f.dtype)
    c1 = block + 1
    dseg = sum(D2[..., k * c1 : (k + 1) * c1] for k in range(len(parts)))
    dfpad = jnp.concatenate([dseg[:, :block].reshape(-1), jnp.zeros((1,), f.dtype)], axis=-1)
    dfpad = dfpad.at[block::block].add(dseg[:, block])
    return dxq, jnp.zeros_like(x), dfpad[:n]


interp1d_linear_pallas.defvjp(_lin_pallas_vjp_fwd, _lin_pallas_vjp_bwd)
