"""Spherical-harmonic 2V electron distribution functions.

Parity with the reference (``distribution_functions/spherical_harmonics.py``):
f(vx, vy) = interp(f00)(|v|) + sum_{l<=Nl, m<=l} flm(|v|) Re Y_lm, with f00 a
super-Gaussian of trainable order m and three flm families:

* FLM_NN — two small MLPs for magnitude and sign (reference :14-49).  The MLPs
  here are plain pytree modules (equinox is not a dependency); weights AND biases
  are trainable (the reference marks only weights — a strict superset).
* FLM_MY — Mora & Yahi (1982) heat-flux closure with trainable log10 L_T
  (reference :52-114).
* ArbitraryVr — learnable smoothed magnitude and sign arrays (reference :117-147).

The angular convention follows the reference exactly (:206-212): polar angle
theta = arctan2(vy, vx), azimuth phi in {0, pi} by sign of vy, evaluated in the
(vx, vy) plane.
"""

import numpy as np

import jax
from jax import numpy as jnp

from .module import module, static_field
from .distributions import velocity_grid, smooth1d, inv_act

try:  # jax >= 0.5
    from jax.scipy.special import sph_harm_y as _sph_harm_y
except ImportError:  # pragma: no cover
    _sph_harm_y = None


def real_sph_harm(l, m, polar, azim):
    """Re Y_lm with the reference's argument convention.

    Note: jax's sph_harm_y requires n/m arrays the same length as theta/phi.
    """
    flat = polar.reshape(-1)
    ns = jnp.full(flat.shape, l, dtype=jnp.int64 if flat.dtype == jnp.float64 else jnp.int32)
    ms = jnp.full(flat.shape, m, dtype=ns.dtype)
    out = _sph_harm_y(ns, ms, flat, azim.reshape(-1), n_max=l)
    return jnp.real(out).reshape(polar.shape)


# ---------------------------------------------------------------------- MLPs


@module
class MLP:
    """Small fully-connected net: relu hidden layers, configurable final activation."""

    weights: tuple  # ((W, b), ...)
    final_act: str = static_field(default="relu")

    @classmethod
    def create(cls, in_size, out_size, width, depth, final_act, key):
        sizes = [in_size] + [width] * depth + [out_size]
        keys = jax.random.split(key, len(sizes) - 1)
        ws = []
        for i, k in enumerate(keys):
            lim = 1.0 / np.sqrt(sizes[i])
            W = jax.random.uniform(k, (sizes[i + 1], sizes[i]), minval=-lim, maxval=lim)
            b = jnp.zeros((sizes[i + 1],))
            ws.append((W, b))
        return cls(weights=tuple(ws), final_act=final_act)

    def __call__(self, x):
        for W, b in self.weights[:-1]:
            x = jax.nn.relu(W @ x + b)
        W, b = self.weights[-1]
        x = W @ x + b
        if self.final_act == "relu":
            return jax.nn.relu(x)
        if self.final_act == "tanh":
            return jnp.tanh(x)
        return x


@module
class FLM_NN:
    flm_mag: MLP
    flm_sign: MLP
    vr: jax.Array

    @classmethod
    def create(cls, vr):
        return cls(
            flm_mag=MLP.create(1, 1, 32, 3, "relu", jax.random.PRNGKey(0)),
            flm_sign=MLP.create(1, 1, 32, 3, "tanh", jax.random.PRNGKey(42)),
            vr=vr,
        )

    def __call__(self, **kwargs):
        f00 = kwargs["f00"]
        mag = -jax.vmap(self.flm_mag)(self.vr[:, None])[:, 0]
        mag = jnp.power(10.0, mag) * f00
        sign = jax.vmap(self.flm_sign)(self.vr[:, None])[:, 0]
        return mag * sign


@module
class FLM_MY:
    """Mora & Yahi 1982 (Phys. Rev. A 26, 2259) heat-flux f1 closure."""

    log_10_LT: jax.Array
    vr: jax.Array

    @classmethod
    def create(cls, vr, LT):
        return cls(log_10_LT=jnp.asarray(float(np.log10(LT))), vr=vr)

    def __call__(self, **kwargs):
        m_f0 = kwargs["m_f0"]
        f00 = kwargs["f00"]
        gamma = jax.scipy.special.gamma
        v0 = 1.0
        lambda_e = 1.0  # gradient scale lengths are in units of the mean free path
        ve = gamma(5.0 / m_f0) / 3.0 / gamma(3.0 / m_f0) * v0
        uu = self.vr / v0
        lambda_v = lambda_e * (self.vr / ve) ** 4.0
        coeff = (
            m_f0 / 2 * uu**m_f0
            - 5 * m_f0 / 12 * gamma(8 / m_f0) / gamma(6 / m_f0) * uu ** (m_f0 - 2)
            - 1.5
        ) * lambda_v
        return coeff / 10**self.log_10_LT * f00


@module
class ArbitraryVr:
    flm_sign: jax.Array
    flm_mag: jax.Array
    window: int = static_field(default=8)

    @classmethod
    def create(cls, nvr):
        return cls(flm_sign=jnp.zeros(nvr), flm_mag=jnp.zeros(nvr), window=nvr // 4)

    def __call__(self, **kwargs):
        sign = jnp.tanh(smooth1d(self.flm_sign, self.window))
        mag = -jax.nn.sigmoid(smooth1d(self.flm_mag, self.window)) * 10
        return 10**mag * sign


# ------------------------------------------------------------ SphericalHarmonics


@module
class SphericalHarmonics:
    normed_m: jax.Array
    vx: jax.Array
    vr: jax.Array
    th: jax.Array
    phi: jax.Array
    vr_vxvy: jax.Array
    flm: tuple  # modules for (l, m) in lm_list order
    lm_list: tuple = static_field(default=())
    flm_type: str = static_field(default="nn")
    m_scale: float = static_field(default=3.0)
    m_shift: float = static_field(default=2.0)

    @classmethod
    def create(cls, dist_cfg, batch_size=1, batch=False, activate=False):
        if batch:
            raise NotImplementedError("batch mode not supported for 2D distributions")
        vx = velocity_grid(dist_cfg["nvx"])
        nvr = dist_cfg["params"]["nvr"]
        vmax = 6.0 * 1.05 * float(np.sqrt(2.0))
        dvr = vmax / nvr
        vr = jnp.linspace(dvr / 2, vmax - dvr / 2, nvr)

        VX, VY = jnp.meshgrid(vx, vx)  # VX[i,j]=vx[j], VY[i,j]=vx[i]
        th = jnp.arctan2(VY, VX)
        phi = jnp.arccos(VY / jnp.abs(VY))
        vr_vxvy = jnp.sqrt(VX**2 + VY**2)

        Nl = dist_cfg["params"]["Nl"]
        flm_type = dist_cfg["params"]["flm_type"].casefold()
        init_m = dist_cfg["params"]["init_m"]
        m_scale, m_shift = 3.0, 2.0
        normed_m = jnp.asarray(float(inv_act((init_m - m_shift) / m_scale, True)))

        lm_list, flm = [], []
        for l in range(1, Nl + 1):
            for m in range(l + 1):
                lm_list.append((l, m))
                if flm_type == "nn":
                    flm.append(FLM_NN.create(vr))
                elif flm_type == "mora-yahi":
                    if l == 1 and m == 0:
                        flm.append(FLM_MY.create(vr, dist_cfg["params"]["LTx"]))
                    elif l == 1 and m == 1:
                        flm.append(FLM_MY.create(vr, dist_cfg["params"]["LTy"]))
                    else:
                        raise NotImplementedError("Mora-Yahi only supports l=1")
                elif flm_type == "arbitrary":
                    flm.append(ArbitraryVr.create(nvr))
                else:
                    raise NotImplementedError(f"Unknown flm_type: {flm_type}")

        return cls(
            normed_m=normed_m,
            vx=vx,
            vr=vr,
            th=th,
            phi=phi,
            vr_vxvy=vr_vxvy,
            flm=tuple(flm),
            lm_list=tuple(lm_list),
            flm_type=flm_type,
            m_scale=m_scale,
            m_shift=m_shift,
        )

    def get_unnormed_m(self):
        return jax.nn.sigmoid(self.normed_m) * self.m_scale + self.m_shift

    def get_f00(self):
        """Isotropic super-Gaussian component on the radial grid (reference :267-285)."""
        m = self.get_unnormed_m()
        gamma = jax.scipy.special.gamma
        ve = 1.0
        v0 = ve / jnp.sqrt(gamma(5.0 / m) / 3.0 / gamma(3.0 / m))
        cst = m / (4 * jnp.pi * gamma(3.0 / m))
        f00 = cst / v0**3.0 * jnp.exp(-((self.vr / v0) ** m))
        f00 = f00 / (jnp.sum(f00 * 4 * jnp.pi * self.vr**2.0) * (self.vr[1] - self.vr[0]))
        return f00

    def get_unnormed_params(self):
        flm_dict = {0: {0: self.get_f00()}}
        kwargs = {"m_f0": self.get_unnormed_m(), "f00": flm_dict[0][0]}
        for (l, m), mod in zip(self.lm_list, self.flm):
            flm_dict.setdefault(l, {})[m] = mod(**kwargs)
        return {"m": self.get_unnormed_m(), "flm": flm_dict}

    def __call__(self):
        f00 = self.get_f00()
        fvxvy = jnp.interp(self.vr_vxvy, self.vr, f00, right=1e-16)
        kwargs = {"m_f0": self.get_unnormed_m(), "f00": f00}
        for (l, m), mod in zip(self.lm_list, self.flm):
            flm = mod(**kwargs)
            flm_vxvy = jnp.interp(self.vr_vxvy, self.vr, flm, right=1e-32)
            fvxvy = fvxvy + flm_vxvy * real_sph_harm(l, m, self.th, self.phi)
        fvxvy = jnp.maximum(fvxvy, 1e-32)
        dv = self.vx[1] - self.vx[0]
        return fvxvy / (jnp.sum(fvxvy) * dv * dv)
