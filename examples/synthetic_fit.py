"""Library-level example: synthetic spectra + gradient fit, no data files.

Generates spectra from known ground-truth parameters, perturbs the fit's
initial guess, and recovers the parameters with a device-resident optimizer —
the same pattern as tests/test_inverse/test_1d_random.py and the reference's
library-usage examples (SURVEY.md §3.4).

    python examples/synthetic_fit.py            # CPU or TPU, ~1 min

On the TPU the model runs f32 with full-precision matmuls; on CPU enable x64
for reference-grade precision (done below).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import optax

from __graft_entry__ import _make_batch, _small_config
from tsadar_tpu.core.diagnostic import ThomsonScatteringDiagnostic
from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition, combine
from tsadar_tpu.inverse.loss import LossFunction
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles


def main(batch_size=4, num_epochs=150, learning_rate=2e-2):
    cfg = _small_config(batch_size)  # same schema as the YAML decks
    sas = get_scattering_angles(cfg)
    ts_diag = ThomsonScatteringDiagnostic(cfg, scattering_angles=sas)

    # ground truth: Te/ne/m vary across the lineout batch
    truth = ThomsonParams.create(cfg["parameters"], num_params=batch_size, batch=True, activate=True)
    physical = truth()
    print("ground truth Te:", np.round(np.asarray(physical["electron"]["Te"]).ravel(), 4))

    batch = _make_batch(batch_size)
    ThryE, ThryI, lamAxisE, lamAxisI = jax.jit(ts_diag)(truth, batch)
    batch["e_data"] = np.asarray(ThryE)
    batch["i_data"] = np.asarray(ThryI)

    # fit from a perturbed start
    cfg["parameters"]["electron"]["Te"]["val"] = 0.45
    cfg["parameters"]["electron"]["ne"]["val"] = 0.28
    start = ThomsonParams.create(cfg["parameters"], num_params=batch_size, batch=True, activate=True)
    loss_fn = LossFunction(cfg, sas, batch)
    diff, static = partition(start, get_filter_spec(cfg["parameters"], start))

    opt = optax.adam(learning_rate)
    opt_state = opt.init(diff)

    @jax.jit
    def step(dp, state):
        (value, _), grad = jax.value_and_grad(loss_fn.__loss__, has_aux=True)(dp, static, batch)
        updates, state = opt.update(grad, state)
        return optax.apply_updates(dp, updates), state, value

    for epoch in range(num_epochs):
        diff, opt_state, value = step(diff, opt_state)
        if epoch % 25 == 0:
            print(f"epoch {epoch:4d}  loss {float(value):.3e}")

    fitted = combine(diff, static)().copy()
    print("recovered Te:   ", np.round(np.asarray(fitted["electron"]["Te"]).ravel(), 4))
    print("recovered ne:   ", np.round(np.asarray(fitted["electron"]["ne"]).ravel(), 4))
    return fitted


if __name__ == "__main__":
    main()
