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

import jax
from jax import numpy as jnp, vmap

from .physics import irf
from .physics.spectrum import SpectrumModel
from ..utils.console import log_info


class ThomsonScatteringDiagnostic:
    def __init__(self, cfg, scattering_angles, mode_2v: str = "table", shard_2v_points: bool = False):
        self.cfg = cfg
        self.scattering_angles = scattering_angles
        self.model = SpectrumModel(cfg, scattering_angles, mode_2v=mode_2v, shard_2v_points=shard_2v_points)

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

    @staticmethod
    def _block_mean(a, step, axis):
        """Mean over contiguous blocks of ``step`` along ``axis``; a ragged final
        block is averaged over its actual length (reference comprehension
        semantics, thomson_diagnostic.py:96-101)."""
        a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        n_full = n // step
        full = a[: n_full * step].reshape(n_full, step, *a.shape[1:]).mean(axis=1)
        if n_full * step < n:
            tail = a[n_full * step :].mean(axis=0, keepdims=True)
            full = jnp.concatenate([full, tail], axis=0)
        return jnp.moveaxis(full, 0, axis)

    def reduce_ATS_to_resunit(self, ThryE, lamAxisE, TSins, batch):
        """Block-average to detector resolution units (reference :78-107)."""
        n_ang, n_lam = ThryE.shape
        lam_step = round(n_lam / batch["e_data"].shape[1])
        ang_step = round(n_ang / self.cfg["other"]["CCDsize"][0])

        ThryE = self._block_mean(self._block_mean(ThryE, lam_step, 1), ang_step, 0)
        lamAxisE = self._block_mean(lamAxisE, lam_step, 0)

        ThryE = ThryE[self.cfg["data"]["lineouts"]["start"] : self.cfg["data"]["lineouts"]["end"], :]
        ThryE = batch["e_amps"] * ThryE / jnp.amax(ThryE, axis=1, keepdims=True)
        ThryE = jnp.where(
            lamAxisE < TSins["general"]["lam"],
            TSins["general"]["amp1"] * ThryE,
            TSins["general"]["amp2"] * ThryE,
        )
        return ThryE, lamAxisE

    def spectrum_breakdown(self, ts_params, batch):
        """Detailed per-component spectra + IRF-only spectra for plotting
        (reference thomson_diagnostic.py:144-216).  Host-side (not jitted):
        uses scipy peak finding on concrete arrays."""
        import numpy as np
        from scipy.signal import find_peaks
        from jax import vmap as _vmap

        import jax as _jax

        # jit the device work: the axon TPU runtime cannot execute ops eagerly
        @_jax.jit
        def _detailed(tp, b):
            physical = tp()
            if self.batched:
                det = _vmap(self.model.detailed_spectrum)(physical)
            else:
                det = self.model.detailed_spectrum(physical)
            mE, mI, TE, TI, lE_raw, lI_raw = det
            a = {"e_amps": b["e_amps"], "i_amps": b["i_amps"]}
            mE, mI, lE, lI = self._postprocess(mE, mI, lE_raw, lI_raw, a, physical)
            return physical, mE, mI, TE, TI, lE, lI, lE_raw, lI_raw

        physical_params, modlE, modlI, ThryE, ThryI, lamAxisE, lamAxisI, lamAxisE_raw, lamAxisI_raw = _detailed(
            ts_params, batch
        )
        amps = {"e_amps": batch["e_amps"], "i_amps": batch["i_amps"]}

        # IRF-only spectra: delta functions at the two most prominent peaks
        def _irf_deltas(spectra):
            arr = np.asarray(spectra)
            out = np.zeros_like(arr)
            for i in range(arr.shape[0]):
                try:
                    peaks, props = find_peaks(arr[i], prominence=0.1)
                    order = np.argsort(props["prominences"])
                    out[i, peaks[order[-1]]] = 1.0
                    if len(peaks) > 1:
                        out[i, peaks[order[-2]]] = 1.0
                except (ValueError, IndexError):
                    log_info("Unable to locate peak; IRF may not be plotted")
            return jnp.asarray(out)

        eIRF = _irf_deltas(np.atleast_2d(np.asarray(modlE))) if self.cfg["other"]["extraoptions"]["load_ele_spec"] else jnp.zeros_like(modlE)
        iIRF = _irf_deltas(np.atleast_2d(np.asarray(modlI))) if self.cfg["other"]["extraoptions"]["load_ion_spec"] else jnp.zeros_like(modlI)

        @_jax.jit
        def _finish(tp, b, mE, mI, TE, TI, eI, iI, lE, lI):
            physical = tp()
            a = {"e_amps": b["e_amps"], "i_amps": b["i_amps"]}
            eI, iI, lE, lI = self._postprocess(eI, iI, lE, lI, a, physical)
            if self.cfg["other"]["extraoptions"]["spectype"] == "angular_full":
                mE, lE = self.reduce_ATS_to_resunit(TE, lE, physical, b)
            mE = mE + b["noise_e"]
            mI = mI + b["noise_i"]
            if self.cfg["other"]["extraoptions"]["load_ele_spec"]:
                TE = jnp.reshape(b["e_amps"], (-1, 1, 1, 1)) * TE / jnp.amax(TE)
                eI = jnp.reshape(b["e_amps"], (-1, 1)) * eI / jnp.amax(eI)
            if self.cfg["other"]["extraoptions"]["load_ion_spec"]:
                TI = jnp.reshape(b["i_amps"], (-1, 1, 1, 1)) * TI / jnp.amax(TI)
                iI = jnp.reshape(b["i_amps"], (-1, 1)) * iI / jnp.amax(iI)
            return mE, mI, TE, TI, eI, iI, lE, lI

        modlE, modlI, ThryE, ThryI, eIRF, iIRF, lamAxisE, lamAxisI = _finish(
            ts_params, batch, modlE, modlI, ThryE, ThryI, eIRF, iIRF, lamAxisE, lamAxisI
        )
        return modlE, modlI, ThryE, ThryI, eIRF, iIRF, lamAxisE, lamAxisI, lamAxisE_raw, lamAxisI_raw

    def __call__(self, ts_params, batch):
        # TPU MXUs execute f32 matmuls as single-pass bf16 by default, which
        # costs ~8x accuracy on the spectrum (measured 7.8e-3 -> 9.2e-4 of
        # peak vs CPU f64) for ~1% runtime: the hot interp kernels use their
        # own explicit bf16-split matmuls and are unaffected, so force full
        # f32 precision for every other contraction traced under the model.
        with jax.default_matmul_precision("highest"):
            return self._call_impl(ts_params, batch)

    def _call_impl(self, ts_params, batch):
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
