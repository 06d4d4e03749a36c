"""Postprocessing: refit of bad lineouts, Hessian uncertainties, final outputs.

Behavioral port of ``/root/reference/tsadar/utils/process/postprocess.py`` adapted
to the batched-array parameter pytrees (the reference's per-lineout module-list
surgery, postprocess.py:313-345, becomes plain indexed tree_maps) and with the
Hessian taken over the flattened active-parameter vector, from which per-lineout
blocks are extracted (cross-lineout blocks are zero by construction).
"""

import copy
import os
import tempfile
import time
from collections import defaultdict
from typing import Dict

import numpy as np

import jax
from jax.flatten_util import ravel_pytree

from ...core.params import get_filter_spec, partition, combine
from ...inverse.loss import LossFunction
from .. import mlflow_shim as mlflow
from ..config import flatten, unflatten
from ..plotting import plotters
from ..console import log_info


def recalculate_with_chosen_weights(
    config: Dict, sa, sample_indices, all_data: Dict, loss_fn: LossFunction, calc_sigma: bool, fitted_weights
):
    """Re-run the forward model with the best weights; optionally sigmas."""
    losses = np.zeros_like(sample_indices, dtype=np.float64)
    sample_indices.sort()
    batch_indices = np.reshape(sample_indices, (-1, config["optimizer"]["batch_size"]))

    all_params = {k: defaultdict(list) for k in config["parameters"].keys()}
    num_params = 0
    for _fw in fitted_weights:
        batch_fitted_params, num_params = _fw.get_fitted_params(config["parameters"])
        for k in batch_fitted_params.keys():
            for k2 in batch_fitted_params[k].keys():
                all_params[k][k2].append(batch_fitted_params[k][k2])

    if config["other"]["extraoptions"]["spectype"] != "angular_full":
        for k in all_params.keys():
            for k2 in all_params[k].keys():
                all_params[k][k2] = np.concatenate([np.atleast_1d(a) for a in all_params[k][k2]])

    def _grid_shape(arr):
        a = np.asarray(arr)
        return a.shape if a.ndim == 2 else (len(sample_indices), 1)

    e_shape, i_shape = _grid_shape(all_data["e_data"]), _grid_shape(all_data["i_data"])
    fits = {
        "ele": {"total_spec": np.zeros(e_shape)},
        "ion": {"total_spec": np.zeros(i_shape)},
    }
    sqdevs = {"ion": np.zeros(i_shape), "ele": np.zeros(e_shape)}
    sigmas = np.zeros((len(sample_indices), max(num_params, 1)))

    if config["other"]["extraoptions"]["spectype"] == "angular_full":
        sl = slice(config["data"]["lineouts"]["start"], config["data"]["lineouts"]["end"])
        batch = {
            "e_data": all_data["e_data"][sl, :],
            "e_amps": all_data["e_amps"][sl, :],
            "i_data": all_data["i_data"],
            "i_amps": all_data["i_amps"],
            "noise_e": all_data["noiseE"][sl, :],
            "noise_i": all_data["noiseI"][sl, :],
        }
        loss, sqds, ThryE, ThryI, params = loss_fn.array_loss(fitted_weights[0], batch)
        fits["ele"] = np.asarray(ThryE)
        sqdevs["ele"] = np.asarray(sqds["ele"])
        losses = np.asarray(loss)

        if calc_sigma:
            # reference parity (postprocess.py:130-136): hessian-based sigmas
            # for the single angular weight set.  Guarded by parameter count —
            # a fully-active arbitrary EDF (nvx^2 weights) would need nvx^2
            # forward-mode basis vectors, which no platform handles.
            try:
                hess = batch_flat_hessian(
                    config, loss_fn, fitted_weights[0], batch, max_params=2048
                )
                sigmas = get_sigmas(hess, 1)
            except Exception as e:
                log_info(f"Error calculating angular Hessian ({e}); skipping uncertainties")
                calc_sigma = False
    else:
        arrayloss_s = hessian_s = 0.0
        for i_batch, inds in enumerate(batch_indices):
            batch = {
                "e_data": all_data["e_data"][inds],
                "e_amps": all_data["e_amps"][inds],
                "i_data": all_data["i_data"][inds],
                "i_amps": all_data["i_amps"][inds],
                "noise_e": all_data["noiseE"][inds],
                "noise_i": all_data["noiseI"][inds],
            }
            t0 = time.time()
            loss, sqds, ThryE, ThryI, params = loss_fn.array_loss(fitted_weights[i_batch], batch)
            losses[inds] = np.asarray(loss)
            arrayloss_s += time.time() - t0

            def assign(dst, inds, val):
                # tolerant placement: unloaded species carry placeholder zeros
                # whose shapes don't match the (N, 1) placeholder grid
                val = np.atleast_2d(np.asarray(val))
                tgt = dst[inds].shape
                if val.shape == (1, tgt[0]) and tgt[1] != tgt[0]:
                    val = val.T
                if val.shape == tgt:
                    dst[inds] = val
                elif val.shape[0] == tgt[0] and val.shape[1] >= tgt[1]:
                    dst[inds] = val[:, : tgt[1]]
                else:
                    dst[inds] = np.broadcast_to(val, tgt)

            assign(sqdevs["ele"], inds, sqds["ele"])
            assign(sqdevs["ion"], inds, sqds["ion"])
            assign(fits["ele"]["total_spec"], inds, ThryE)
            assign(fits["ion"]["total_spec"], inds, ThryI)

            if config.get("plotting", {}).get("detailed_breakdown", False):
                try:
                    bd = loss_fn.ts_diag.spectrum_breakdown(fitted_weights[i_batch], batch)
                    modlE_b, modlI_b, ThryE_c, ThryI_c, eIRF, iIRF, lamE, lamI, lamE_raw, lamI_raw = bd
                    comps = fits["ele"].setdefault("spec_comps", {})
                    comps[tuple(inds)] = np.asarray(ThryE_c)
                    fits["ele"].setdefault("IRF", np.zeros(e_shape))
                    assign(fits["ele"]["IRF"], inds, eIRF)
                    icomps = fits["ion"].setdefault("spec_comps", {})
                    icomps[tuple(inds)] = np.asarray(ThryI_c)
                    fits["ion"].setdefault("IRF", np.zeros(i_shape))
                    assign(fits["ion"]["IRF"], inds, iIRF)
                    # raw model axes: components live on the pre-IRF grid;
                    # keyed per batch (like spec_comps) because lam can be
                    # fitted per-lineout, so each lineout has its own axis
                    fits["ele"].setdefault("detailed_axis", {})[tuple(inds)] = np.squeeze(
                        np.asarray(lamE_raw)
                    )
                    fits["ion"].setdefault("detailed_axis", {})[tuple(inds)] = np.squeeze(
                        np.asarray(lamI_raw)
                    )
                except Exception as e:
                    log_info(f"detailed breakdown failed ({e}); continuing")

            if calc_sigma:
                t0 = time.time()
                try:
                    hess = batch_flat_hessian(config, loss_fn, fitted_weights[i_batch], batch)
                    sigmas[inds] = get_sigmas(hess, config["optimizer"]["batch_size"])
                except Exception as e:
                    log_info(f"Error calculating Hessian ({e}); skipping uncertainties")
                    calc_sigma = False
                hessian_s += time.time() - t0
        # recalc sub-stage attribution for the E2E artifact: the loss-array
        # re-evaluation compiles/loads its own TPU executable and the sigma
        # Hessian traces f64 on the 1-core CPU backend — both seconds-scale
        mlflow.log_metrics({
            "recalc_arrayloss_time": round(arrayloss_s, 2),
            "recalc_hessian_time": round(hessian_s, 2),
        })

    return losses, sqdevs, num_params, fits, sigmas, all_params


def batch_flat_hessian(config, loss_fn, weights, batch, max_params=None, force_dense=False):
    """Hessian of the sum-loss w.r.t. the flattened active parameters.

    Returns ([P, P] matrix, B) where P = num_active_params * batch_size.
    Raises ValueError if ``max_params`` is given and P exceeds it (jacfwd
    cost scales with P basis vectors — distribution-function weight sets
    are too large to hessian directly).

    Always computed on the CPU backend in float64, even from a TPU process:

    * the hessian loss weighs pixels by 1/uncert^2 with the reference's
      absolute 1e-10 floor (loss.py ``_loss_for_hess_fn_``), so zero-signal
      pixels contribute ~1e20-scale cotangents whose products overflow f32
      (NaN rows in H), and even when rescaled into range the f32 hessian is
      too ill-conditioned for the sigma extraction (measured: sign flips vs
      f64 on identical inputs);
    * jacfwd-of-jacrev also cannot cross ``pallas_call`` (no JVP rule), and
      unjitted ``jax.hessian`` dispatches ops eagerly, which the axon runtime
      cannot execute — the CPU trace must therefore run with the fused-Pallas
      dispatch disabled (``pallas_disabled``: ``jax.default_backend()`` still
      reports "tpu" under ``jax.default_device(cpu)``).  The trace therefore
      gets the TPU-oriented one-hot MATMUL formulations — deliberately kept:
      the gather/scatter "cpu" branches measured 4.5x slower on this host
      (see ``interp.dispatch_backend``), and ``interp._bf16_split`` is
      dtype-polymorphic, so the f64 trace runs those matmuls unsplit at full
      f64 precision (a bf16 split would cap table accuracy at ~2^-24).
    """
    try:  # public home through jax 0.4.x
        from jax.experimental import enable_x64
    except ImportError:  # removed in 0.5+; the config State is a context manager
        from jax._src.config import enable_x64

    from ...core.physics.interp import pallas_disabled

    cpu = jax.devices("cpu")[0]

    def host_f64(tree):
        def cast(a):
            a = np.asarray(a)
            if np.issubdtype(a.dtype, np.floating):
                a = a.astype(np.float64)
            elif np.issubdtype(a.dtype, np.complexfloating):
                a = a.astype(np.complex128)
            return jax.device_put(a, cpu)

        return jax.tree_util.tree_map(cast, tree)

    with enable_x64(True), jax.default_device(cpu), pallas_disabled():
        weights64 = host_f64(weights)
        batch64 = host_f64(batch)
        spec = get_filter_spec(config["parameters"], weights64)
        diff, static = partition(weights64, spec)
        x0, unravel = ravel_pytree(diff)
        if max_params is not None and x0.size > max_params:
            raise ValueError(
                f"{x0.size} active parameters exceed the hessian budget ({max_params})"
            )

        def flat_loss(x):
            return loss_fn._loss_for_hess_fn_(combine(unravel(x), static), batch64)

        # Linear-in-batch block Hessian: the 1D loss is an exact per-lineout
        # sum and every active leaf is per-lineout ([B]-shaped), so the
        # Hessian is block-diagonal with zero cross-lineout terms.  Perturbing
        # parameter p for ALL lineouts at once (tangent e_p (x) 1_B) therefore
        # returns exactly row p of every lineout's block in ONE
        # forward-over-reverse pass: n_active HVPs total instead of
        # n_active*B (jax.hessian's dense basis) — the dense form is
        # quadratic in batch size and costs 64x more at the 128-lineout
        # whole-shot.  Falls back to the dense Hessian when any active leaf
        # is not [B] (e.g. arbitrary-EDF weight sets), where the ravel
        # layout/block assumptions don't hold.
        B = int(np.shape(batch64["e_data"])[0]) if np.ndim(batch64["e_data"]) > 1 else 1
        leaves = [a for a in jax.tree_util.tree_leaves(diff)]
        per_lineout = not force_dense and B > 1 and all(np.shape(a) == (B,) for a in leaves)
        if per_lineout:
            n_active = x0.size // B
            # Lineout-CHUNKED evaluation: the blocks are independent per
            # lineout (pinned by test_hessian_blocks), and the per-lineout
            # cost of the HVP program grows with batch size on this host
            # (measured: 1.22 s/lineout at B=16, 1.69 at B=32, ~2.8 at B=128
            # — the f64 working set leaves cache) — so the whole-shot B=128
            # hessian runs ~3x faster as 8 same-shape chunks of 16 reusing
            # ONE jitted executable (batch/static/params passed as ARGUMENTS,
            # not closures, so jax's jit cache hits across chunks).  Chunk
            # sweep at B=128 (ms/lineout): CH=8 966, CH=16 926, CH=32 1434.
            CH = 16 if (B > 16 and B % 16 == 0) else B

            # slice every leaf whose LEADING axis is the lineout batch.  This
            # is a shape-keyed heuristic: it relies on the invariant that in
            # the 1D path every [B, ...]-leading leaf of the params/batch
            # trees IS per-lineout (data rows, per-lineout scalars, batched
            # velocity grids) and nothing else coincidentally leads with B.
            # The x_c size assertion below catches diff-side violations; a
            # new non-per-lineout static leaf with leading dim == B would
            # need an explicit exclusion here.
            def slice_tree(tree, sl):
                return jax.tree_util.tree_map(
                    lambda a: a[sl]
                    if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == B)
                    else a,
                    tree,
                )

            diff_c0 = slice_tree(diff, slice(0, CH))
            _, unravel_c = ravel_pytree(diff_c0)

            def chunk_loss(x, static_c, batch_c):
                return loss_fn._loss_for_hess_fn_(combine(unravel_c(x), static_c), batch_c)

            def hvp_rows(x, basis_c, static_c, batch_c):
                grad_c = jax.grad(chunk_loss)

                def one(tangent):
                    return jax.jvp(lambda xx: grad_c(xx, static_c, batch_c), (x,), (tangent,))[1]

                return jax.vmap(one)(basis_c)

            hvp_rows_j = jax.jit(hvp_rows)
            basis_c = np.zeros((n_active, n_active * CH))
            for p in range(n_active):
                basis_c[p, p * CH : (p + 1) * CH] = 1.0
            basis_c = jax.numpy.asarray(basis_c)

            H = np.zeros((x0.size, x0.size))
            for s in range(B // CH):
                sl = slice(s * CH, (s + 1) * CH)
                x_c, _ = ravel_pytree(slice_tree(diff, sl))
                assert x_c.size == n_active * CH, (
                    f"chunk slice produced {x_c.size} params, expected {n_active * CH} "
                    "(a diff leaf was not sliced per-lineout)"
                )
                rows = np.asarray(
                    hvp_rows_j(x_c, basis_c, slice_tree(static, sl), slice_tree(batch64, sl))
                )  # [n_active, n_active*CH]; rows[p, q*CH + i] = d2L/dx[p,i]dx[q,i]
                blocks = np.transpose(rows.reshape(n_active, n_active, CH), (2, 0, 1))
                # dense block-diagonal assembly in the GLOBAL p*B + i layout
                # so downstream (get_sigmas) is unchanged
                for i in range(CH):
                    idx = np.arange(n_active) * B + (s * CH + i)
                    H[np.ix_(idx, idx)] = blocks[i]
            return H

        H = jax.jit(jax.hessian(flat_loss))(x0)
        return np.asarray(H)


def get_sigmas(hess: np.ndarray, batch_size: int) -> np.ndarray:
    """Per-lineout parameter uncertainties from the inverse Hessian diagonal.

    The flattened layout places parameter p, lineout i at index p*B + i; the
    cross-lineout blocks are zero, so each lineout's PxP submatrix is extracted
    and inverted.  Negative inverse-diagonal entries (non-optimal points) are
    sign-coded as negative sigmas, as in the reference (postprocess.py:188-251).
    """
    P = hess.shape[0] // batch_size
    sigmas = np.zeros((batch_size, P))
    for i in range(batch_size):
        idx = np.arange(P) * batch_size + i
        sub = hess[np.ix_(idx, idx)]
        inv = np.linalg.inv(sub)
        sigmas[i, :] = np.sign(np.diag(inv)) * np.sqrt(np.abs(np.diag(inv)))
    return sigmas


def refit_bad_fits(config, sa, batch_indices, all_data, loss_fn, fitted_weights):
    """Warm-started single-lineout re-minimization of high-loss fits
    (reference postprocess.py:290-371)."""
    from ...inverse.loops import one_d_loop

    losses_init, sqdevs, num_params, fits, sigmas, all_params = recalculate_with_chosen_weights(
        config, sa, batch_indices, all_data, loss_fn, False, fitted_weights
    )
    red_losses_init = losses_init
    true_batch_size = config["optimizer"]["batch_size"]

    mlflow.log_metrics({"number of fits": len(batch_indices.flatten())})
    mlflow.log_metrics({"number of refits": int(np.sum(red_losses_init > config["other"]["refit_thresh"]))})

    for i in batch_indices.flatten()[red_losses_init > config["other"]["refit_thresh"]]:
        if i == 0:
            continue

        temp_cfg = copy.deepcopy(config)
        temp_cfg["optimizer"]["batch_size"] = 1

        # warm start from the previous lineout's fitted values
        prev_weights = fitted_weights[(i - 1) // true_batch_size]
        prev_unnormed = prev_weights.get_unnormed_params()
        j = (i - 1) % true_batch_size

        def val_of(x):
            arr = np.asarray(x)
            return {"val": float(arr.reshape(-1)[j] if arr.size > 1 else arr)}

        prev_vals = {}
        for sp, params in prev_unnormed.items():
            prev_vals[sp] = {}
            for k, v in params.items():
                if k in ("f", "fe", "flm"):
                    continue
                if k == "m":
                    prev_vals[sp]["fe"] = {"params": {"m": val_of(v)}}
                else:
                    prev_vals[sp][k] = val_of(v)

        temp_params = flatten(temp_cfg["parameters"])
        temp_params.update(flatten(prev_vals))
        temp_cfg["parameters"] = unflatten(temp_params)

        new_weights, _, refit_loss_fn = one_d_loop(temp_cfg, all_data, sa, np.array([i]), 1)

        inds = np.array([i])
        batch = {
            "e_data": all_data["e_data"][inds],
            "e_amps": all_data["e_amps"][inds],
            "i_data": all_data["i_data"][inds],
            "i_amps": all_data["i_amps"][inds],
            "noise_e": all_data["noiseE"][inds],
            "noise_i": all_data["noiseI"][inds],
        }
        loss, *_ = refit_loss_fn.array_loss(new_weights[0], batch)
        if float(np.asarray(loss).sum()) < losses_init[i]:
            # write back into lineout i's own (batch, slot).  The reference
            # indexes the batch as (i-1)//batch_size (postprocess.py:365),
            # which, whenever the bad lineout is the FIRST of a batch, pairs
            # the previous batch with slot i%bs — overwriting a different
            # (good) lineout's fit and leaving the bad one in place.
            ib = i // true_batch_size
            tgt = fitted_weights[ib]
            src = new_weights[0]

            def insert(x, y):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == true_batch_size:
                    return x.at[i % true_batch_size].set(np.asarray(y).reshape(x.shape[1:]) if x.ndim > 1 else float(np.asarray(y).reshape(-1)[0]))
                return x

            fitted_weights[ib] = jax.tree.map(insert, tgt, src)
    return losses_init


def postprocess(config, sample_indices, all_data: Dict, all_axes: Dict, loss_fn, sa, fitted_weights):
    """Refit + recalculate + plots/CSVs (reference postprocess.py:254-287)."""
    t1 = time.time()

    if config["other"]["extraoptions"]["spectype"] != "angular_full" and config["other"]["refit"]:
        init_losses = refit_bad_fits(config, sa, sample_indices, all_data, loss_fn, fitted_weights)
    else:
        init_losses = []
    mlflow.log_metrics({"refitting time": round(time.time() - t1, 2)})

    with tempfile.TemporaryDirectory() as td:
        for dirname in ["plots", "binary", "csv"]:
            os.makedirs(os.path.join(td, dirname), exist_ok=True)
        if config["other"]["extraoptions"]["spectype"] == "angular_full":
            t1, final_params = process_angular_data(
                config, sample_indices, all_data, all_axes, loss_fn, fitted_weights, sa, t1, td
            )
        else:
            t1, final_params = process_data(
                config, sample_indices, all_data, all_axes, loss_fn, fitted_weights, sa, init_losses, t1, td
            )
        mlflow.log_artifacts(td)
    mlflow.log_metrics({"plotting time": round(time.time() - t1, 2)})
    mlflow.set_tag("status", "done plotting")
    return final_params


def process_data(config, sample_indices, all_data, all_axes, loss_fn, fitted_weights, sa, losses_init, t1, td):
    losses, sqdevs, num_params, fits, sigmas, all_params = recalculate_with_chosen_weights(
        config, sa, sample_indices, all_data, loss_fn, config["other"]["calc_sigmas"], fitted_weights
    )
    if len(losses_init) == 0:
        losses_init = losses
    mlflow.log_metrics({"postprocessing time": round(time.time() - t1, 2)})
    mlflow.set_tag("status", "plotting")
    t1 = time.time()

    final_params = plotters.get_final_params(config, all_params, all_axes, td)
    red_losses = plotters.plot_loss_hist(config, losses_init, losses, 1.0, td)
    plotters.plot_ts_data(config, fits, all_data, all_axes, td)
    plotters.detailed_lineouts(config, all_data, all_axes, fits, losses, red_losses, sqdevs, td)
    sigma_ds = plotters.save_sigmas_params(config, all_params, sigmas, all_axes, td)
    plotters.plot_final_params(config, all_params, sigma_ds, td)
    return t1, final_params


def process_angular_data(config, batch_indices, all_data, all_axes, loss_fn, fitted_weights, sa, t1, td):
    losses, sqdevs, num_params, fits, sigmas, all_params = recalculate_with_chosen_weights(
        config, sa, batch_indices, all_data, loss_fn, config["other"]["calc_sigmas"], [fitted_weights]
    )
    mlflow.log_metrics({"postprocessing time": round(time.time() - t1, 2)})
    mlflow.set_tag("status", "plotting")
    t1 = time.time()

    final_params = plotters.get_final_params(config, all_params, all_axes, td)
    savedata = plotters.plot_data_angular(config, fits, all_data, all_axes, td)
    plotters.plot_ang_lineouts(num_params, sqdevs, losses, all_params, all_axes, savedata, td)
    sigma_fe = np.zeros_like(final_params.get("fe", np.zeros(1)))
    if config["other"]["calc_sigmas"]:
        sigma_fe = plotters.save_sigmas_fe(final_params, None, sigmas, td)
    plotters.plot_dist(config, "electron", final_params, sigma_fe, td)
    return t1, final_params
