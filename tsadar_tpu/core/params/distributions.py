"""Electron distribution-function modules (1V and 2V pointwise families).

Parity targets (``/root/reference/tsadar/core/modules/distribution_functions/base.py``):
* DLM1V — Dum-Langdon-Matte super-Gaussian family, differentiable in the shape
  parameter m via tabulated projected distributions (base.py:207-294).  The
  reference loads a pre-projected .mat table (missing from the snapshot); we
  regenerate it analytically at init: the 1D projection of the 3D super-Gaussian
  f3(v) ~ exp(-(v/(alpha(m) vth))^m), vth = sqrt(2), which has unit variance per
  velocity component for every m (so x = v/vTe), computed by host-side quadrature
  once and cached.
* Maxwellian ("mx") — closed form, no trainables (ts_params.py:134-142).
* Arbitrary1V — pointwise-learnable f(v), parameterized as sqrt(-log10 f)/7 with
  differentiable second-order Butterworth smoothing (base.py:41-96, 157-204).
* Arbitrary2V — pointwise-learnable f(vx, vy) with optional log parameterization
  (base.py:341-426).

TPU-first deviation: batching is an array axis (leaves shaped [B, ...]) instead of
the reference's Python lists of modules — one pytree, one jit, shardable.
"""

from functools import lru_cache

import numpy as np
from scipy.special import gamma as _gamma_np

import jax
from jax import numpy as jnp

from .module import module, static_field

VMAX_1V = 6.0


def velocity_grid(nvx, vmax=VMAX_1V):
    """Cell-centered velocity grid (reference base.py:148-151)."""
    dv = 2.0 * vmax / nvx
    return jnp.linspace(-vmax + dv / 2, vmax - dv / 2, nvx)


def act(x, activated: bool):
    return jax.nn.sigmoid(x) if activated else x


def inv_act(x, activated: bool):
    # stabilized logit (reference ts_params.py:344)
    return np.log(1e-2 + x / (1.0 - x + 1e-2)) if activated else x


# ----------------------------------------------------------------- DLM table


@lru_cache(maxsize=16)
def _dlm_projected_table(nvx, vmax=VMAX_1V, n_m=31, m_lo=2.0, m_hi=5.0):
    """Projected super-Gaussian table f1(vx; m), columns normalized to unit integral.

    f1(vx) = 2 pi cst(m) int_{|vx|}^inf exp(-(u/(alpha vth))^m) u du,
    alpha(m) = sqrt(3 Gamma(3/m) / (2 Gamma(5/m))), vth = sqrt(2).
    Equivalent to the reference's DLM_x_-3_-10_10_m_-1_2_5.mat (base.py:266-272)
    regenerated from first principles on the target velocity grid.
    """
    dv = 2.0 * vmax / nvx
    vx = np.linspace(-vmax + dv / 2, vmax - dv / 2, nvx)
    ms = np.linspace(m_lo, m_hi, n_m)
    vth = np.sqrt(2.0)

    u = np.linspace(0.0, 4.0 * vmax, 48001)
    table = np.empty((nvx, n_m))
    for j, m in enumerate(ms):
        alpha = np.sqrt(3.0 * _gamma_np(3.0 / m) / (2.0 * _gamma_np(5.0 / m)))
        w = np.exp(-((u / (alpha * vth)) ** m)) * u
        # tail integral accumulated from the far end so tiny tails stay accurate
        # (forward cumsum would cancel catastrophically and underflow to 0,
        # poisoning the log-space interpolation downstream)
        seg = 0.5 * (w[1:] + w[:-1]) * np.diff(u)
        tail_nodes = np.concatenate([np.cumsum(seg[::-1])[::-1], [0.0]])
        tail = np.interp(np.abs(vx), u, tail_nodes)
        table[:, j] = tail / np.trapezoid(tail, vx)
    return vx, ms, table


def _super_gaussian_3d_on_axis(vx, m, vth):
    """3D super-Gaussian evaluated on-axis (reference init_dlm, base.py:188-196, 375-408)."""
    alpha = jnp.sqrt(3.0 * jax.scipy.special.gamma(3.0 / m) / 2.0 / jax.scipy.special.gamma(5.0 / m))
    cst = m / (4.0 * jnp.pi * alpha**3.0 * jax.scipy.special.gamma(3.0 / m))
    return cst / vth**3.0 * jnp.exp(-((jnp.abs(vx) / alpha / vth) ** m))


# ------------------------------------------------------------------ smoothing


def second_order_butterworth(signal, f_sampling=100, f_cutoff=15, method="forward_backward"):
    """Differentiable 2nd-order Butterworth filter (zero-phase when forward_backward).

    Same difference equation as the reference (base.py:41-96); operates along the
    last axis and supports batched leading axes via a vectorized lax.scan carry.
    """
    if method == "forward_backward":
        signal = second_order_butterworth(signal, f_sampling, f_cutoff, "forward")
        return second_order_butterworth(signal, f_sampling, f_cutoff, "backward")
    if method == "backward":
        signal = jnp.flip(signal, axis=-1)
    elif method != "forward":
        raise NotImplementedError(method)

    ff = f_cutoff / f_sampling
    ita = 1.0 / jnp.tan(jnp.pi * ff)
    q = jnp.sqrt(2.0)
    b0 = 1.0 / (1.0 + q * ita + ita**2)
    b1, b2 = 2 * b0, b0
    a1 = 2.0 * (ita**2 - 1.0) * b0
    a2 = -(1.0 - q * ita + ita**2) * b0

    x = jnp.moveaxis(signal, -1, 0)  # [N, ...]

    def step(carry, x_i):
        x_im1, x_im2, y_im1, y_im2 = carry
        y_i = b0 * x_i + b1 * x_im1 + b2 * x_im2 + a1 * y_im1 + a2 * y_im2
        return (x_i, x_im1, y_i, y_im1), y_i

    init = (x[1], x[0], x[1], x[0])
    ys = jax.lax.scan(step, init, x[2:])[1]  # [N-2, ...]
    ys = jnp.concatenate([ys[0:1], ys[0:1], ys], axis=0)
    out = jnp.moveaxis(ys, 0, -1)
    if method == "backward":
        out = jnp.flip(out, axis=-1)
    return out


def smooth1d(array, window_size):
    """Hanning-window smoothing along the last axis (reference base.py:17-38)."""
    window = jnp.hanning(window_size)
    window = window / jnp.sum(window)
    if array.ndim == 1:
        return jnp.convolve(array, window, mode="same")
    return jax.vmap(lambda a: jnp.convolve(a, window, mode="same"))(array)


# ------------------------------------------------------------------- modules


@module
class Maxwellian1V:
    """Closed-form Maxwellian, no trainables (reference ts_params.py:134-142)."""

    vx: jax.Array
    batch_size: int = static_field(default=0)  # 0 = unbatched

    @classmethod
    def create(cls, dist_cfg, batch_size, batch, activate):
        return cls(vx=velocity_grid(dist_cfg["nvx"]), batch_size=batch_size if batch else 0)

    def get_unnormed_params(self):
        return {}

    def __call__(self):
        dv = self.vx[1] - self.vx[0]
        f = jnp.exp(-(self.vx**2) / 2)
        f = f / jnp.sum(f) / dv
        if self.batch_size:
            return jnp.broadcast_to(f, (self.batch_size,) + f.shape)
        return f


@module
class DLM1V:
    """Super-Gaussian family, differentiable in m via the projected table."""

    normed_m: jax.Array  # [B] or scalar
    vx: jax.Array
    m_ax: jax.Array
    f_vx_m: jax.Array  # [nv, n_m]
    m_scale: float = static_field(default=3.0)
    m_shift: float = static_field(default=2.0)
    activated: bool = static_field(default=False)

    @classmethod
    def create(cls, dist_cfg, batch_size, batch, activate):
        activated = bool(activate and dist_cfg.get("active", False))
        m_scale, m_shift = 3.0, 2.0
        m_val = dist_cfg["params"]["m"]["val"]
        normed = inv_act((m_val - m_shift) / m_scale, activated)
        normed_m = jnp.full(batch_size, normed) if batch else jnp.asarray(float(normed))
        vx_np, m_np, tab_np = _dlm_projected_table(dist_cfg["nvx"])
        return cls(
            normed_m=normed_m,
            vx=jnp.asarray(vx_np),
            m_ax=jnp.asarray(m_np),
            f_vx_m=jnp.asarray(tab_np),
            m_scale=m_scale,
            m_shift=m_shift,
            activated=activated,
        )

    def _unnormed_m(self):
        return act(self.normed_m, self.activated) * self.m_scale + self.m_shift

    def get_unnormed_params(self):
        return {"m": self._unnormed_m()}

    def __call__(self):
        m = self._unnormed_m()
        interp_in_m = jax.vmap(jnp.interp, in_axes=(None, None, 0), out_axes=0)

        def one(mval):
            return interp_in_m(mval, self.m_ax, self.f_vx_m)

        fdlm = jax.vmap(one)(m) if m.ndim else one(m)
        dv = self.vx[1] - self.vx[0]
        return fdlm / jnp.sum(fdlm, axis=-1, keepdims=True) / dv


@module
class Arbitrary1V:
    """Pointwise-learnable f(v) with Butterworth-smoothed sqrt-log parameterization."""

    fval: jax.Array  # [B, nv] or [nv]
    vx: jax.Array

    @classmethod
    def create(cls, dist_cfg, batch_size, batch, activate):
        vx = velocity_grid(dist_cfg["nvx"])
        vx_np, m_np, tab_np = _dlm_projected_table(dist_cfg["nvx"])
        m0 = float(dist_cfg["params"]["init_m"])
        f0 = np.empty(len(vx_np))
        for i in range(len(vx_np)):
            f0[i] = np.interp(m0, m_np, tab_np[i])
        f0 = f0 / np.trapezoid(f0, vx_np)
        fval = jnp.asarray(np.sqrt(-np.log10(f0)) / 7.0)
        if batch:
            fval = jnp.broadcast_to(fval, (batch_size,) + fval.shape)
        return cls(fval=fval, vx=vx)

    def get_unnormed_params(self):
        return {"f": self()}

    def __call__(self):
        smoothed = second_order_butterworth(self.fval, f_sampling=100, f_cutoff=6)
        f = jnp.power(10.0, -((7.0 * smoothed) ** 2.0))
        dv = self.vx[1] - self.vx[0]
        return f / jnp.sum(f, axis=-1, keepdims=True) / dv


@module
class Arbitrary2V:
    """Pointwise-learnable f(vx, vy) (reference base.py:341-426). Unbatched."""

    fval: jax.Array  # [nv, nv]
    vx: jax.Array
    learn_log: bool = static_field(default=True)

    @classmethod
    def create(cls, dist_cfg, batch_size, batch, activate):
        vx = velocity_grid(dist_cfg["nvx"])
        learn_log = bool(dist_cfg["params"]["learn_log"])
        m = dist_cfg["params"]["init_m"]
        vmag = jnp.sqrt(vx[:, None] ** 2 + vx[None, :] ** 2)
        fdlm = _super_gaussian_3d_on_axis(vmag, m, vth=jnp.sqrt(2.0))
        dv = vx[1] - vx[0]
        fdlm = fdlm / jnp.sum(fdlm) / dv**2
        if learn_log:
            fdlm = -jnp.log10(fdlm)
        return cls(fval=jnp.sqrt(fdlm), vx=vx, learn_log=learn_log)

    def get_unnormed_params(self):
        return {"f": self()}

    def __call__(self):
        f = self.fval**2.0
        if self.learn_log:
            f = jnp.power(10.0, -f)
        dv = self.vx[1] - self.vx[0]
        return f / jnp.sum(f) / dv**2.0
