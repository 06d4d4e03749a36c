"""Refit write-back indexing (postprocess.refit_bad_fits).

The reference writes a successful refit into batch (i-1)//batch_size with
slot i % batch_size (reference postprocess.py:365,330) — whenever the bad
lineout is the FIRST of a batch that pairs the previous batch with slot 0,
overwriting a different (good) lineout's fit and leaving the bad one alone.
This pins the corrected behavior: the refit lands in lineout i's own
(batch, slot), and no other lineout's stored fit changes.
"""

import numpy as np

import __graft_entry__ as ge
from tsadar_tpu.core.params import ThomsonParams
from tsadar_tpu.inverse.loops import one_d_loop
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles
from tsadar_tpu.utils.process import postprocess as pp

SENTINEL_TE = 1.2345


class _FakeRefitLossFn:
    def array_loss(self, weights, batch):
        # always a huge improvement -> the write-back always triggers
        return np.array([-1e9]), None, None, None, None


def test_refit_writes_into_own_batch_slot(monkeypatch):
    n_lineouts, bs = 4, 2  # two batches; lineout 2 is the FIRST of batch 1
    cfg = ge._small_config(n_lineouts)
    cfg["optimizer"].update(method="adam", num_epochs=2, batch_size=bs)
    cfg["other"]["refit"] = True
    cfg["other"]["refit_thresh"] = 1e-9  # force: every lineout's loss exceeds it
    sas = get_scattering_angles(cfg)
    b = ge._make_batch(n_lineouts)
    all_data = {
        "e_data": b["e_data"], "e_amps": b["e_amps"],
        "i_data": b["i_data"], "i_amps": b["i_amps"],
        "noiseE": b["noise_e"], "noiseI": b["noise_i"],
    }

    batch_indices = np.arange(n_lineouts)
    fitted_weights, _, loss_fn = one_d_loop(cfg, all_data, sas, batch_indices.copy(), n_lineouts // bs)

    def te_of(wb):
        return np.asarray(wb.get_unnormed_params()["electron"]["Te"]).copy()

    te_before = [te_of(w) for w in fitted_weights]

    # deterministic single-lineout "refit": recognizable params, loss that
    # always beats the stored fit, so every non-skipped lineout writes back
    sent_cfg = ge._small_config(1)
    sent_cfg["parameters"]["electron"]["Te"]["val"] = SENTINEL_TE
    sentinel = ThomsonParams.create(sent_cfg["parameters"], num_params=1, batch=True, activate=True)
    # what the sentinel reads back as (the stabilized logit inverse in
    # create() is not an exact round trip of `val`)
    sentinel_te = float(np.asarray(sentinel.get_unnormed_params()["electron"]["Te"]).reshape(-1)[0])

    def fake_one_d_loop(config, data, sa, inds, nb):
        return [sentinel], 0.0, _FakeRefitLossFn()

    import tsadar_tpu.inverse.loops as loops_mod

    monkeypatch.setattr(loops_mod, "one_d_loop", fake_one_d_loop)

    pp.refit_bad_fits(cfg, sas, batch_indices.copy(), all_data, loss_fn, fitted_weights)
    te_after = [te_of(w) for w in fitted_weights]

    # i=0 is skipped (no previous neighbor): its slot must be untouched.
    # Under the reference's (i-1)//bs indexing, lineout 2's refit (first of
    # batch 1) would land exactly here instead of its own slot.
    assert np.isclose(te_after[0][0], te_before[0][0])
    # i=1, 2, 3 each land in their own (batch, slot)
    assert np.isclose(te_after[0][1], sentinel_te, rtol=1e-6)
    assert np.isclose(te_after[1][0], sentinel_te, rtol=1e-6)
    assert np.isclose(te_after[1][1], sentinel_te, rtol=1e-6)
