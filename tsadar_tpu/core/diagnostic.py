"""Top-level diagnostic model: spectra + instrument effects + noise.

Parity with the reference ``ThomsonScatteringDiagnostic``
(``/root/reference/tsadar/core/thomson_diagnostic.py``): vmaps the spectrum model
and IRF postprocessing over the lineout batch for temporal/imaging/1d spectypes,
applies the 2D ATS IRF and resolution-unit reduction for angular spectra, and adds
the measured noise floor.

TPU-first notes: the batch axis is the unit of data parallelism — the vmapped
model shards over a device mesh by giving the batch arrays a NamedSharding (see
``tsadar_tpu.parallel``); resolution-unit reduction uses reshape-mean block
averaging instead of Python list comprehensions (reference :96-101).
"""

from jax import numpy as jnp, vmap

from .physics import irf
from .physics.spectrum import SpectrumModel


class ThomsonScatteringDiagnostic:
    def __init__(self, cfg, scattering_angles, mode_2v: str = "table"):
        self.cfg = cfg
        self.scattering_angles = scattering_angles
        self.model = SpectrumModel(cfg, scattering_angles, mode_2v=mode_2v)

        spectype = cfg["other"]["extraoptions"]["spectype"]
        if any(s in spectype for s in ("temporal", "imaging", "1d")):
            self._model = vmap(self.model)
            self._postprocess = vmap(self.postprocess_theory)
            self.batched = True
        elif "angular" in spectype:
            self._model = self.model
            self._postprocess = self.postprocess_theory
            self.batched = False
        else:
            raise NotImplementedError(f"Unknown spectype: {spectype}")

    def postprocess_theory(self, modlE, modlI, lamAxisE, lamAxisI, amps, TSins):
        """Apply instrument broadening (reference thomson_diagnostic.py:42-76)."""
        if self.cfg["other"]["extraoptions"]["load_ion_spec"]:
            lamAxisI, ThryI = irf.add_ion_IRF(self.cfg, lamAxisI, modlI, amps["i_amps"], TSins)
        else:
            ThryI = modlI

        if self.cfg["other"]["extraoptions"]["load_ele_spec"]:
            if self.cfg["other"]["extraoptions"]["spectype"] == "angular_full":
                lamAxisE, ThryE = irf.add_ATS_IRF(
                    self.cfg, self.scattering_angles, lamAxisE, modlE, amps["e_amps"], TSins
                )
            else:
                lamAxisE, ThryE = irf.add_electron_IRF(self.cfg, lamAxisE, modlE, amps["e_amps"], TSins)
        else:
            ThryE = modlE
        return ThryE, ThryI, lamAxisE, lamAxisI

    def reduce_ATS_to_resunit(self, ThryE, lamAxisE, TSins, batch):
        """Block-average to detector resolution units (reference :78-107)."""
        n_ang, n_lam = ThryE.shape
        lam_step = round(n_lam / batch["e_data"].shape[1])
        ang_step = round(n_ang / self.cfg["other"]["CCDsize"][0])
        n_lam_out = n_lam // lam_step
        n_ang_out = n_ang // ang_step

        ThryE = ThryE.reshape(n_ang_out, ang_step, n_lam_out, lam_step).mean(axis=(1, 3))
        lamAxisE = lamAxisE.reshape(n_lam_out, lam_step).mean(axis=1)

        ThryE = ThryE[self.cfg["data"]["lineouts"]["start"] : self.cfg["data"]["lineouts"]["end"], :]
        ThryE = batch["e_amps"] * ThryE / jnp.amax(ThryE, axis=1, keepdims=True)
        ThryE = jnp.where(
            lamAxisE < TSins["general"]["lam"],
            TSins["general"]["amp1"] * ThryE,
            TSins["general"]["amp2"] * ThryE,
        )
        return ThryE, lamAxisE

    def __call__(self, ts_params, batch):
        physical_params = ts_params()
        modlE, modlI, lamAxisE, lamAxisI = self._model(physical_params)
        ThryE, ThryI, lamAxisE, lamAxisI = self._postprocess(
            modlE,
            modlI,
            lamAxisE,
            lamAxisI,
            {"e_amps": batch["e_amps"], "i_amps": batch["i_amps"]},
            physical_params,
        )
        if self.cfg["other"]["extraoptions"]["spectype"] == "angular_full":
            ThryE, lamAxisE = self.reduce_ATS_to_resunit(ThryE, lamAxisE, physical_params, batch)

        ThryE = ThryE + batch["noise_e"]
        ThryI = ThryI + batch["noise_i"]
        return ThryE, ThryI, lamAxisE, lamAxisI
