"""Pole-aware ("rational") integration of piecewise-linear f/g.

Computes int f(z)/g(z) dz treating f and g as piecewise linear on each interval,
which integrates accurately through near-poles of f/g (the principal value of the
susceptibility integral).  Functional parity with the reference ``ratintn``/``ratcen``
(``/root/reference/tsadar/core/physics/ratintn.py``, based on Ed Williams' newlip),
with two TPU-first changes:

1. All-real arithmetic.  The reference forms a complex log and takes the real part
   at the end; the real part of log((gav + gdif/2)/(gav - gdif/2)) is
   log|gav + gdif/2| - log|gav - gdif/2|, so we never materialize complex arrays.
   (The discarded imaginary part is the residue i*pi term; principal value only.)

2. A fully vectorized multi-pole form ``pv_integral`` which evaluates the integral
   for a whole batch of poles in one broadcasted [P, N] computation, replacing the
   reference's ``vmap(ratintn)`` over poles (``form_factor.py:266-268``) and its
   per-point ``lax.map`` chunks in the 2V path.

Both branches of the near/far-pole ``where`` are computed with guarded denominators
so reverse-mode AD stays NaN-free (the classic where-grad trap).
"""

from jax import numpy as jnp

# Same branch threshold as the reference (ratintn.py:51)
_BRANCH_RTOL = 1.0e-4


def _safe(x, cond):
    """Replace entries where ``cond`` is False by 1.0 (their branch is unused)."""
    return jnp.where(cond, x, 1.0)


def _ratcen_terms(fav, fdif, gav, gdif):
    """Rationally-centered integrand values per interval (real part).

    fav/fdif: averages and differences of f per interval  [..., N]
    gav/gdif: averages and differences of g per interval  [..., N]
    """
    tmp = fav * gdif - gav * fdif

    # far-from-pole branch: |gdif| < rtol*|gav| -> smooth rational form
    far = jnp.abs(gdif) < _BRANCH_RTOL * jnp.abs(gav)
    gav_safe = _safe(gav, far)
    rf = fav / gav_safe + tmp * gdif / (12.0 * gav_safe**3)

    # near-pole branch: log form.  Guard |gav +- gdif/2| against exact zeros
    # (grids are constructed so poles never land on nodes, but AD needs finite
    # values in the untaken branch too).
    near = ~far
    gdif_safe = _safe(gdif, near)
    ap = jnp.abs(gav + 0.5 * gdif)
    am = jnp.abs(gav - 0.5 * gdif)
    tiny = jnp.finfo(gav.dtype).tiny
    log_ratio = jnp.log(jnp.maximum(ap, tiny)) - jnp.log(jnp.maximum(am, tiny))
    rfn = fdif / gdif_safe + tmp * log_ratio / gdif_safe**2

    return jnp.where(far, rf, rfn)


def ratcen(f, g):
    """Reference-parity ratcen: f [..., N], g [N] -> per-interval values [..., N-2].

    Intervals follow the reference convention (ratintn.py:41-44): pairs
    (i, i+1) for i = 0..N-3 (the last interval is dropped).
    """
    fdif = f[..., 1:-1] - f[..., 0:-2]
    gdif = g[1:-1] - g[0:-2]
    fav = 0.5 * (f[..., 1:-1] + f[..., 0:-2])
    gav = 0.5 * (g[1:-1] + g[0:-2])
    return _ratcen_terms(fav, fdif, gav, gdif)


def ratintn(f, g, z):
    """int f/g dz with f, g piecewise linear; f [N] or [..., N], g [N], z [N]."""
    f = jnp.asarray(f)
    if f.ndim == 1:
        f = f[None, :]
        squeeze = True
    else:
        squeeze = False
    zdif = z[1:-1] - z[0:-2]
    out = jnp.sum(ratcen(f, g) * zdif, axis=-1)
    return out[0] if squeeze else out


import numpy as _np


def pv_toeplitz_kernel(n_intervals):
    """Static Toeplitz matrix for midpoint-pole PV integration.

    T[p, i] = L(i - p) with L(d) = log(|d + 0.5| / |d - 0.5|); L(0) = 0, so the
    pole-centered cell is regular (its PV contribution is exactly fdif).
    Built once in float64 on the host; a dense [M, M] matmul operand (MXU).
    """
    m = n_intervals
    d = _np.arange(m)[None, :] - _np.arange(m)[:, None]  # i - p
    L = _np.log(_np.abs(d + 0.5)) - _np.log(_np.abs(d - 0.5))
    return jnp.asarray(L)


def pv_integral_uniform(f, z, kernel=None):
    """PV integral table on the midpoint-pole grid via a static Toeplitz matmul.

    For a UNIFORM grid z, placing the poles at the interval midpoints makes the
    piecewise-linear PV integral an exact contraction with the static matrix
    T[p, i] = L(i - p), L(d) = log|d+0.5| - log|d-0.5|:

        out[p] = sum_i fdif_i + T @ (fav - i*fdif) + p * (T @ fdif)

    This replaces the O(P*N) runtime log evaluations of the dense form
    (reference form_factor.py:263-271 evaluates ~1640x1022 complex logs per
    call) with two matvecs against a precomputed matrix — no transcendentals on
    the hot path, MXU-native, trivially transposable for reverse-mode AD, and
    exact for piecewise-linear integrands (the log form IS the exact
    antiderivative).

    Args:
        f: [N] integrand samples on the uniform grid z.
        z: [N] uniform grid.
        kernel: optional precomputed ``pv_toeplitz_kernel(N - 2)``.

    Returns:
        (poles, out): midpoint pole locations [N-2] and integral values [N-2].
    """
    fav = 0.5 * (f[..., 1:-1] + f[..., 0:-2])
    fdif = f[..., 1:-1] - f[..., 0:-2]
    m = fav.shape[-1]
    poles = 0.5 * (z[1:-1] + z[0:-2])
    if kernel is None:
        kernel = pv_toeplitz_kernel(m)
    T = kernel.astype(f.dtype)

    idx = jnp.arange(m, dtype=f.dtype)
    g1 = T @ (fav - idx * fdif)
    g2 = T @ fdif
    out = jnp.sum(fdif, axis=-1) + g1 + idx * g2
    return poles, out


def pv_node_kernel(n_intervals):
    """Static Toeplitz matrix for node-pole PV integration.

    Tn[q, i] = Ln(i - q - 1) with Ln(d) = log|d+1| - log|d| and
    Ln(0) = Ln(-1) = 0: the two cells adjacent to the pole are singular
    individually but their PV sum is exactly fdif_left + fdif_right
    (continuity cancellation), reproduced by the zeroed entries plus the
    global sum(fdif) term.
    """
    m = n_intervals
    d = _np.arange(m)[None, :] - _np.arange(m)[:, None] - 1  # i - q - 1
    with _np.errstate(divide="ignore"):
        Ln = _np.log(_np.abs(d + 1.0)) - _np.log(_np.abs(d).clip(min=1e-300))
    Ln[(d == 0) | (d == -1)] = 0.0
    return jnp.asarray(Ln)


def pv_integral_uniform_nodes(f, z, kernel=None):
    """PV integral table with poles at the interior grid NODES z[1:-1].

    Companion to ``pv_integral_uniform``; interleaving the two tables doubles
    the pole-table density at the cost of two more matvecs.

    Returns:
        (poles, out): node pole locations [N-3] and integral values [N-3].
    """
    fav = 0.5 * (f[..., 1:-1] + f[..., 0:-2])
    fdif = f[..., 1:-1] - f[..., 0:-2]
    m = fav.shape[-1]
    poles = z[1 : 1 + (m - 1)]
    if kernel is None:
        kernel = pv_node_kernel(m)
    Tn = kernel.astype(f.dtype)

    idx = jnp.arange(m, dtype=f.dtype)
    q = jnp.arange(m, dtype=f.dtype)
    g1 = Tn @ (fav - (idx + 0.5) * fdif)
    g2 = Tn @ fdif
    out = jnp.sum(fdif, axis=-1) + g1 + (q + 1.0) * g2
    return poles, out[: m - 1]


def pv_combined_kernel(n_intervals, delta):
    """Fully-precombined PV-table matrix K [N, M]: table = f @ K.

    The midpoint/node PV tables are linear in the integrand f, so both stages
    of ``pv_integral_uniform``(+``_nodes``) — the finite-difference stencils
    (fav, fdif) and the Toeplitz contraction — collapse into one host-built
    f64 matrix.  Writing W[p,i] = 1 + (p + delta - i)·T[p,i] (delta = 0 for
    midpoint poles, 0.5 for node poles), the table is
    out[p] = Σ_i (T[p,i]·fav_i + W[p,i]·fdif_i), so the coefficient on node j
    is 0.5·(T[p,j] + T[p,j-1]) + (W[p,j-1] - W[p,j]).

    One [.., N] @ [N, M] matmul replaces two [M, M] contractions per table:
    half the FLOPs, a native matmul transpose for reverse-mode AD, and better
    conditioning — W ≈ O(1/(p-i)²) because d·L(d) → 1, where the two-stage
    form multiplies the unbounded index weights idx ∈ [0, M) explicitly.
    """
    return jnp.asarray(pv_combined_kernel_np(n_intervals, delta))


def pv_combined_kernel_np(n_intervals, delta):
    """Host-f64 numpy form of ``pv_combined_kernel`` (also the truth oracle for
    on-chip accuracy checks — the jnp conversion truncates to f32 on TPU)."""
    # delta doubles as the kernel-type selector (0.0 -> midpoint poles,
    # 0.5 -> node poles); any other offset would silently build a node-type
    # Toeplitz matrix inconsistent with the requested pole positions
    if delta not in (0.0, 0.5):
        raise ValueError(f"delta must be 0.0 (midpoint poles) or 0.5 (node poles), got {delta}")
    m = n_intervals
    # build T in pure numpy (same formulas as pv_toeplitz_kernel/pv_node_kernel;
    # a jnp round trip would fail under an active trace — 2V builds this inside jit)
    d = _np.arange(m)[None, :] - _np.arange(m)[:, None]
    if delta == 0.0:
        T = _np.log(_np.abs(d + 0.5)) - _np.log(_np.abs(d - 0.5))
    else:
        dn = d - 1
        with _np.errstate(divide="ignore"):
            T = _np.log(_np.abs(dn + 1.0)) - _np.log(_np.abs(dn).clip(min=1e-300))
        T[(dn == 0) | (dn == -1)] = 0.0
    p = _np.arange(m, dtype=_np.float64)[:, None]
    i = _np.arange(m, dtype=_np.float64)[None, :]
    W = 1.0 + (p + delta - i) * T
    K = _np.zeros((m + 2, m))
    K[:m] += 0.5 * T.T - W.T  # node j as the left end of interval i = j
    K[1 : m + 1] += 0.5 * T.T + W.T  # node j as the right end of interval i = j - 1
    return K


def pv_combined_kernels(n_intervals):
    """(K_mid [N, M], K_node [N, M]) for ``pv_tables_matmul``."""
    return pv_combined_kernel(n_intervals, 0.0), pv_combined_kernel(n_intervals, 0.5)


def pv_tables_matmul(f, kmid, knode):
    """Midpoint + node PV tables as two matmuls: f [..., N] -> ([..., M], [..., M-1]).

    Matches ``pv_integral_uniform(f, z)[1]`` and
    ``pv_integral_uniform_nodes(f, z)[1]`` exactly (same piecewise-linear PV
    integral, reassociated); supports arbitrary leading batch dims.
    """
    kmid = kmid.astype(f.dtype)
    knode = knode.astype(f.dtype)
    mid = f @ kmid
    node = (f @ knode)[..., : kmid.shape[1] - 1]
    return mid, node


def pv_integral(f, z, poles):
    """Principal-value integral int f(z')/(z' - p) dz' for a batch of poles.

    Args:
        f: [N] integrand samples (piecewise linear between nodes of z).
        z: [N] integration grid (need not be uniform).
        poles: [...] pole locations p.

    Returns:
        Array shaped like ``poles`` with the integral value for each pole.

    This is the fully vectorized equivalent of
    ``vmap(ratintn)(f, z[None,:] - poles[:,None], z)`` in the reference
    (``form_factor.py:266-268``): one [P, N] broadcast, no vmap, no chunking.
    """
    pshape = jnp.shape(poles)
    p = jnp.reshape(poles, (-1,))[:, None]  # [P, 1]

    zmid = 0.5 * (z[1:-1] + z[0:-2])  # [N-2]
    zdif = z[1:-1] - z[0:-2]  # [N-2]
    fav = 0.5 * (f[..., 1:-1] + f[..., 0:-2])
    fdif = f[..., 1:-1] - f[..., 0:-2]

    gav = zmid - p  # [P, N-2]
    gdif = jnp.broadcast_to(zdif, gav.shape)
    vals = _ratcen_terms(fav, fdif, gav, gdif)
    out = jnp.sum(vals * zdif, axis=-1)
    return jnp.reshape(out, pshape)
