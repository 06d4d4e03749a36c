"""Thomson-scattering parameter pytrees.

Parity with the reference parameter system
(``/root/reference/tsadar/core/modules/ts_params.py``): normalized/activated
parameters with (lb, ub) scale/shift, electron + per-species ion + general groups,
ion-fraction renormalization and Ti tying, and boolean filter specs marking
trainable leaves.

TPU-first deviations (semantics-preserving):
* Batched lineouts are array axes on the leaves ([B] scalars, [B, nv] EDFs) —
  one pytree for the whole batch instead of Python lists of modules
  (reference ts_params.py:93-104), so the entire batch jits/shards as a unit.
* Filter specs are built by declarative path matching (module.filter_spec_by_path)
  instead of equinox tree surgery (reference ts_params.py:648-685).
"""

import numpy as np

import jax
from jax import numpy as jnp

from .module import module, static_field, filter_spec_by_path, partition, combine
from .distributions import (
    Maxwellian1V,
    DLM1V,
    Arbitrary1V,
    Arbitrary2V,
    act,
    inv_act,
)
from .spherical import SphericalHarmonics

__all__ = [
    "ThomsonParams",
    "get_filter_spec",
    "partition",
    "combine",
]


@module
class ParamGroup:
    """A set of normalized scalar parameters with static scale/shift/activation."""

    normed: dict  # name -> array ([B] or scalar)
    names: tuple = static_field(default=())
    scales: tuple = static_field(default=())
    shifts: tuple = static_field(default=())
    activated: tuple = static_field(default=())

    @classmethod
    def create(cls, cfg, names, batch_size, batch, activate):
        normed, scales, shifts, activated = {}, [], [], []
        for name in names:
            c = cfg[name]
            scale = float(c["ub"] - c["lb"]) if "ub" in c and "lb" in c else 1.0
            if scale == 0.0:  # degenerate bounds (lb == ub): pin, don't divide by zero
                scale = 1.0
            shift = float(c["lb"]) if "lb" in c else 0.0
            is_act = bool(c.get("active", False) and activate)
            val = inv_act((float(c["val"]) - shift) / scale, is_act)
            normed[name] = jnp.full(batch_size, val) if batch else jnp.asarray(val)
            scales.append(scale)
            shifts.append(shift)
            activated.append(is_act)
        return cls(
            normed=normed,
            names=tuple(names),
            scales=tuple(scales),
            shifts=tuple(shifts),
            activated=tuple(activated),
        )

    def unnormed(self):
        out = {}
        for i, name in enumerate(self.names):
            out[name] = (
                act(self.normed[name], self.activated[i]) * self.scales[i] + self.shifts[i]
            )
        return out


_DIST_1V = {"dlm": DLM1V, "mx": Maxwellian1V, "arbitrary": Arbitrary1V}


def _make_distribution(dist_cfg, batch_size, batch, activate):
    dim = dist_cfg["dim"]
    dtype = dist_cfg["type"].casefold()
    if dim == 1:
        if dtype not in _DIST_1V:
            raise NotImplementedError(f"Unknown 1D distribution type: {dist_cfg['type']}")
        return _DIST_1V[dtype].create(dist_cfg, batch_size, batch, activate)
    if dim == 2:
        if batch:
            raise NotImplementedError("Batch mode not implemented for 2D distributions")
        if "sph" in dtype:
            return SphericalHarmonics.create(dist_cfg, batch_size, batch, activate)
        if dtype == "arbitrary":
            return Arbitrary2V.create(dist_cfg, batch_size, batch, activate)
        raise NotImplementedError(f"Unknown 2D distribution type: {dist_cfg['type']}")
    raise NotImplementedError(f"Not implemented distribution dimension: {dim}")


@module
class ElectronParams:
    params: ParamGroup  # Te, ne
    distribution_functions: object
    batch: bool = static_field(default=True)

    @classmethod
    def create(cls, cfg, batch_size, batch=True, activate=False):
        group = ParamGroup.create(cfg, ("Te", "ne"), batch_size, batch, activate)
        dist = _make_distribution(cfg["fe"], batch_size, batch, activate)
        return cls(params=group, distribution_functions=dist, batch=batch)

    def get_unnormed_params(self):
        dist_params = self.distribution_functions.get_unnormed_params()
        return self.params.unnormed() | dist_params

    def __call__(self):
        fe = self.distribution_functions()
        vx = self.distribution_functions.vx
        if self.batch and fe.ndim == vx.ndim + 1:
            vx = jnp.broadcast_to(vx, fe.shape)
        return self.params.unnormed() | {"fe": fe, "v": vx}


@module
class IonParams:
    params: ParamGroup  # Ti, Z, fract
    A: jax.Array

    @classmethod
    def create(cls, cfg, batch_size, batch=True, activate=False):
        group = ParamGroup.create(cfg, ("Ti", "Z", "fract"), batch_size, batch, activate)
        A = jnp.full(batch_size, float(cfg["A"]["val"])) if batch else jnp.asarray(float(cfg["A"]["val"]))
        return cls(params=group, A=A)

    def get_unnormed_params(self):
        return self()

    def __call__(self):
        return {"A": self.A} | self.params.unnormed()


_GENERAL_NAMES = ("lam", "amp1", "amp2", "amp3", "ne_gradient", "Te_gradient", "ud", "Va")


@module
class GeneralParams:
    params: ParamGroup

    @classmethod
    def create(cls, cfg, batch_size, batch=True, activate=False):
        return cls(params=ParamGroup.create(cfg, _GENERAL_NAMES, batch_size, batch, activate))

    def get_unnormed_params(self):
        return self()

    def __call__(self):
        return self.params.unnormed()


@module
class ThomsonParams:
    """Aggregate parameter pytree (reference ts_params.py:498-645)."""

    electron: ElectronParams
    ions: tuple
    general: GeneralParams
    ti_same: tuple = static_field(default=())

    @classmethod
    def create(cls, param_cfg, num_params: int, batch=True, activate=False):
        electron = ElectronParams.create(param_cfg["electron"], num_params, batch, activate)
        ion_keys = sorted(k for k in param_cfg.keys() if "ion" in k)
        ions = tuple(
            IonParams.create(param_cfg[k], num_params, batch, activate) for k in ion_keys
        )
        assert len(ions) > 0, "No ion species found in input deck"
        ti_same = tuple(
            bool(param_cfg[k]["Ti"].get("same", False)) if i > 0 else False
            for i, k in enumerate(ion_keys)
        )
        general = GeneralParams.create(param_cfg["general"], num_params, batch, activate)
        return cls(electron=electron, ions=ions, general=general, ti_same=ti_same)

    def renormalize_ions(self, tmp_dict):
        """Tie Ti where configured and normalize fractions to sum 1 (ref :543-563)."""
        fract_sum = 0.0
        for i in range(len(self.ions)):
            if i > 0 and self.ti_same[i]:
                tmp_dict[f"ion-{i+1}"]["Ti"] = tmp_dict["ion-1"]["Ti"]
            fract_sum = fract_sum + tmp_dict[f"ion-{i+1}"]["fract"]
        for i in range(len(self.ions)):
            tmp_dict[f"ion-{i+1}"]["fract"] = tmp_dict[f"ion-{i+1}"]["fract"] / fract_sum
        return tmp_dict

    def get_unnormed_params(self):
        tmp = {
            "electron": self.electron.get_unnormed_params(),
            "general": self.general.get_unnormed_params(),
        } | {f"ion-{i+1}": ion.get_unnormed_params() for i, ion in enumerate(self.ions)}
        return self.renormalize_ions(tmp)

    def __call__(self):
        tmp = {"electron": self.electron(), "general": self.general()} | {
            f"ion-{i+1}": ion() for i, ion in enumerate(self.ions)
        }
        return self.renormalize_ions(tmp)

    def get_fitted_params(self, param_cfg):
        """Extract active parameters for reporting (reference ts_params.py:605-645)."""
        param_dict = self.get_unnormed_params()
        num_params = 0
        fitted = {}
        for k in param_dict.keys():
            fitted[k] = {}
            for k2 in param_dict[k].keys():
                if k2 == "m":
                    if param_cfg[k]["fe"]["active"]:
                        fitted[k][k2] = param_dict[k][k2]
                        num_params += 1
                elif k2 in ("f", "fe", "flm"):
                    fitted[k][k2] = param_dict[k][k2]
                    if k2 == "flm":
                        out = self()
                        fitted[k][k2]["fvxvy"] = out["electron"]["fe"]
                        fitted[k][k2]["v"] = out["electron"]["v"]
                elif param_cfg[k].get(k2, {}).get("active", False):
                    fitted[k][k2] = param_dict[k][k2]
                    num_params += 1
        return fitted, num_params


def get_filter_spec(cfg_params, ts_params):
    """Boolean pytree marking trainable leaves (reference ts_params.py:648-685 and
    distribution_functions/base.py:429-523)."""
    fe_cfg = cfg_params["electron"]["fe"]
    fe_active = bool(fe_cfg.get("active", False))
    fe_type = fe_cfg["type"].casefold()
    flm_type = str(fe_cfg.get("params", {}).get("flm_type", "")).casefold()

    def pred(path, leaf):
        if not path:
            return False
        if path[0] == "electron":
            if len(path) >= 2 and path[1] == "distribution_functions":
                if not fe_active:
                    return False
                tail = path[2:]
                if fe_type == "dlm":
                    return tail == ("normed_m",)
                if fe_type == "arbitrary":
                    return tail == ("fval",)
                if "sph" in fe_type:
                    if tail == ("normed_m",):
                        return True
                    if len(tail) >= 2 and tail[0] == "flm":
                        if flm_type == "arbitrary":
                            return tail[-1] in ("flm_mag", "flm_sign")
                        if flm_type == "mora-yahi":
                            return tail[-1] == "log_10_LT"
                        if flm_type == "nn":
                            return "weights" in tail
                    return False
                return False
            if len(path) >= 4 and path[1] == "params" and path[2] == "normed":
                return bool(cfg_params["electron"][path[3]]["active"])
            return False
        if path[0] == "ions":
            if len(path) >= 5 and path[2] == "params" and path[3] == "normed":
                species = f"ion-{path[1] + 1}"
                return bool(cfg_params[species][path[4]]["active"])
            return False
        if path[0] == "general":
            if len(path) >= 4 and path[1] == "params" and path[2] == "normed":
                return bool(cfg_params["general"][path[3]]["active"])
            return False
        return False

    return filter_spec_by_path(ts_params, pred)
