"""Optimizer loops for 1D (batched-lineout) and angular (ARTS) fitting.

Parity with the reference (``/root/reference/tsadar/inverse/loops.py``):
* ``_1d_scipy_loop_`` — host-side scipy L-BFGS-B with AD gradients (ref :20-56);
* ``_1d_adam_loop_`` — optax adam epochs (ref :59-95);
* ``one_d_loop`` — batch dispatch with optional sequential warm start (ref :98-164);
* ``angular_optax`` — any optax optimizer by name, early stopping, periodic
  parameter snapshots (ref :167-275).

TPU-first addition: ``method: lbfgs`` runs a fully device-resident L-BFGS
(optax.lbfgs with zoom linesearch) — the whole optimization loop executes as one
jitted step function with zero host<->device synchronization per iteration,
removing the reference's per-iteration scipy host round trip (SURVEY.md "hard
parts").
"""

import pickle
import time
from contextlib import nullcontext
from functools import partial
from typing import Dict, List, Tuple

import numpy as np
import optax

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..core.params import ThomsonParams, get_filter_spec, partition, combine
from ..parallel import make_mesh, shard_batch, shard_params_batch_axis
from ..utils import mlflow_shim as mlflow
from .loss import LossFunction
from ..utils.console import log_info


def _fit_mesh(config):
    """Data-parallel mesh over the lineout-batch axis, or ``None``.

    The reference's multi-device story shards only the 2V chi points
    (``/root/reference/tsadar/core/physics/form_factor.py:431-447``); here the
    primary scale axis for 1D spectypes is the lineout batch.  When more than
    one accelerator is visible, every per-lineout array (data batch and
    batched parameter leaves) is given a ``NamedSharding`` over a 1D mesh and
    the jitted loss/step partitions via GSPMD — the only collective is the
    scalar-loss psum, riding ICI.  ``optimizer.parallel: false`` opts out;
    the mesh is trimmed to the largest device count dividing the batch size
    (GSPMD would otherwise pad the batch axis).

    Default is on for accelerator backends only.  On CPU the "devices" are
    same-core threads (tests use a virtual 8-device mesh): sharding there
    buys nothing, and on a low-core host long per-shard compute can hit
    XLA's 40 s in-process collective rendezvous abort (CLAUDE.md) — so CPU
    requires an explicit ``optimizer.parallel: true``.
    """
    parallel = config["optimizer"].get("parallel", None)
    if parallel is None:
        parallel = jax.default_backend() != "cpu"
    if not parallel:
        return None
    n = jax.device_count()
    bs = config["optimizer"]["batch_size"]
    n = min(n, bs)
    while bs % n:
        n -= 1
    return make_mesh(n) if n > 1 else None


def _pallas_ctx(mesh, config=None):
    """Trace context for a fit running over ``mesh``.

    ``pallas_call`` has no SPMD partitioning rule of its own — a bare Mosaic
    custom call under a >1-device mesh is replicated by the partitioner, so
    every device would run the kernel on the FULL gathered batch.  The fused
    interp kernels therefore carry an explicit leading-batch-dim rule
    (``ops.partitioning.batch0_partitioned``): each device runs the kernel on
    its lineout shard, no collectives.  Multi-device fits keep Pallas by
    default; sharded-vs-unsharded equivalence (to bf16-accumulation
    roundoff — NOT bit-exact, accumulation order is shape-dependent) is
    pinned in ``test_parallel/test_sharding.py``.

    ``optimizer.pallas_sharded: false`` opts back into the pure-XLA lowerings
    for multi-device meshes (identical math — see
    ``test_hessian_flows_through_custom_vjp_kernels`` — GSPMD partitions them
    cleanly along the batch axis), as a fallback should a Mosaic/partitioner
    interaction misbehave on a real multi-chip topology.  Only traces STARTED
    inside the context are affected, which is all of them: every jit in the
    loop functions compiles on first call, inside the loop body.
    """
    if mesh is not None and mesh.devices.size > 1:
        sharded_ok = True if config is None else config["optimizer"].get("pallas_sharded", True)
        if not sharded_ok:
            from ..core.physics.interp import pallas_disabled

            return pallas_disabled()
    return nullcontext()


def _batched_leaf_mask(config, diff_params, static_params):
    """Boolean pytrees marking exactly the per-lineout leaves.

    Built from the parameter system itself: a reference instance with
    ``num_params=1`` has every batched leaf at leading dim 1 while grids and
    tables (``vx``, ``m_ax``, ``f_vx_m``, ...) keep their shape — so
    "shape differs from the num_params=1 instance" identifies batched leaves
    without the leading-dim coincidence the heuristic is exposed to (e.g.
    ``nvx == batch_size`` must not shard the velocity grid)."""
    ref = ThomsonParams.create(config["parameters"], 1, batch=True, activate=True)
    ref_diff, ref_static = partition(ref, get_filter_spec(config["parameters"], ref))

    def differs(x, r):
        return hasattr(x, "shape") and x.shape != getattr(r, "shape", None)

    return (
        jax.tree.map(differs, diff_params, ref_diff),
        jax.tree.map(differs, static_params, ref_static),
    )


def _shard_fit_state(mesh, config, batch, diff_params, static_params, masks=None):
    """Place the batch + per-lineout parameter leaves over the fit mesh.

    ``masks`` lets callers that already built the batched-leaf masks (the
    per-lineout best tracker) pass them in instead of rebuilding the
    reference ThomsonParams per batch iteration."""
    if mesh is None:
        return batch, diff_params, static_params
    bs = config["optimizer"]["batch_size"]
    mask_diff, mask_static = masks if masks is not None else _batched_leaf_mask(config, diff_params, static_params)
    return (
        shard_batch(batch, mesh),
        shard_params_batch_axis(diff_params, mesh, bs, batched_mask=mask_diff),
        shard_params_batch_axis(static_params, mesh, bs, batched_mask=mask_static),
    )


def _init_params(config, previous_weights, batch_size=None, batch=True):
    if previous_weights is not None:
        return previous_weights
    bs = batch_size if batch_size is not None else config["optimizer"]["batch_size"]
    return ThomsonParams.create(config["parameters"], bs, batch=batch, activate=True)


def _slice_batch(all_data, rows):
    """Model-facing batch dict for a set of lineout rows (1D spectypes)."""
    return {
        "e_data": all_data["e_data"][rows],
        "e_amps": all_data["e_amps"][rows],
        "i_data": all_data["i_data"][rows],
        "i_amps": all_data["i_amps"][rows],
        "noise_e": all_data["noiseE"][rows],
        "noise_i": all_data["noiseI"][rows],
    }


def _angular_batch(all_data, sl, rot=False):
    """ARTS batch for the resolution-unit window ``sl``: electron channels are
    windowed (from the *_rot second shot when ``rot``); the ion channels are
    shared between multiplexed shots and stay whole except the noise window."""
    return {
        "e_data": all_data["e_data_rot" if rot else "e_data"][sl, :],
        "e_amps": all_data["e_amps_rot" if rot else "e_amps"][sl, :],
        "noise_e": all_data["noiseE_rot" if rot else "noiseE"][sl, :],
        "i_data": all_data["i_data"],
        "i_amps": all_data["i_amps"],
        "noise_i": all_data["noiseI"][sl, :],
    }


def _1d_scipy_loop_(config: Dict, loss_fn: LossFunction, previous_weights, batch: Dict) -> Tuple[float, Dict]:
    """Host scipy minimize with AD gradients (reference loops.py:20-56)."""
    import scipy.optimize as spopt

    ts_params = _init_params(config, previous_weights)
    diff_params, static_params = partition(ts_params, get_filter_spec(config["parameters"], ts_params))
    init_weights, loss_fn.unravel_weights = ravel_pytree(diff_params)

    res = spopt.minimize(
        loss_fn.vg_loss if config["optimizer"]["grad_method"] == "AD" else loss_fn.loss,
        np.asarray(init_weights, dtype=np.float64),
        args=(static_params, batch),
        method=config["optimizer"]["method"],
        jac=config["optimizer"]["grad_method"] == "AD",
        options={"disp": config["optimizer"].get("disp", False), "maxiter": config["optimizer"]["num_epochs"]},
    )
    best_weights = combine(loss_fn.unravel_weights(res["x"]), static_params)
    return res["fun"], best_weights


def _1d_adam_loop_(config: Dict, loss_fn: LossFunction, previous_weights, batch: Dict, tbatch=None, mesh=None):
    """optax adam epochs (reference loops.py:59-95).

    TPU-first structure: the epochs run as jitted ``lax.scan`` chunks of
    ``optimizer.chunk_size`` (default 8) steps, with best-so-far tracked ON
    DEVICE (same association as the host loop it replaces: the pre-update loss
    is credited to the post-update params).  A host-side ``float(value)`` per
    epoch costs a full dispatch->result round trip (~45 ms/step measured at
    ARTS shapes); even an async one-step-per-dispatch loop leaves the
    single-core host dispatch-bound (~18 ms/step).  Scanning k steps per
    dispatch reaches the device roofline (~11 ms/step).  Short scans (4-8
    steps) compile in about the same time as a single step on axon — only
    whole-fit-length scans (200+) hit the minutes-long remote-compile wall.
    """
    t_enter = time.time()
    opt = optax.adam(config["optimizer"]["learning_rate"])
    ts_params = _init_params(config, previous_weights)
    diff_params, static_params = partition(ts_params, get_filter_spec(config["parameters"], ts_params))
    # TPU-first extension beyond the reference: `optimizer.track_best:
    # per_lineout` keeps each LINEOUT's best-so-far parameters independently
    # (per-row masked-mean losses come back in the loss aux at no extra model
    # cost), so one lineout drifting past its optimum late in the fit cannot
    # drag the others' reported parameters with it.  Batched (per-lineout)
    # leaves select by their row's loss; any shared leaves follow the scalar
    # rule.  Default "overall" preserves the reference's association exactly.
    per_lineout = config["optimizer"].get("track_best", "overall") == "per_lineout"
    # the masks depend only on config + leaf shapes (sharding preserves
    # shapes), so build them once and share between sharding + best tracking
    masks = _batched_leaf_mask(config, diff_params, static_params) if (per_lineout or mesh is not None) else None
    batch, diff_params, static_params = _shard_fit_state(mesh, config, batch, diff_params, static_params, masks=masks)
    opt_state = opt.init(diff_params)

    num_epochs = config["optimizer"]["num_epochs"]
    if num_epochs == 0:
        return np.inf, ts_params

    if per_lineout:
        row_mask = masks[0]
        n_rows = np.shape(batch["e_data"])[0]

    def one_step(dp, state, best_loss, best_dp, best_rows):
        (value, aux), grad = loss_fn._vg_func_(dp, static_params, batch)
        updates, state = opt.update(grad, state)
        dp = optax.apply_updates(dp, updates)
        # pre-update loss credited to post-update params (reference assoc.)
        improved = value < best_loss
        best_loss = jnp.where(improved, value, best_loss)
        if per_lineout:
            row_loss = aux[2]
            row_improved = row_loss < best_rows
            best_rows = jnp.where(row_improved, row_loss, best_rows)

            def pick(n, o, is_row):
                sel = row_improved.reshape((-1,) + (1,) * (n.ndim - 1)) if is_row else improved
                return jnp.where(sel, n, o)

            best_dp = jax.tree.map(pick, dp, best_dp, row_mask)
        else:
            best_dp = jax.tree.map(lambda n, o: jnp.where(improved, n, o), dp, best_dp)
        return dp, state, value, best_loss, best_dp, best_rows

    best_loss = jnp.asarray(np.inf)
    best_rows = jnp.full((n_rows,), np.inf) if per_lineout else jnp.zeros(())
    best_dp = diff_params

    if tbatch is not None:  # progress display syncs every epoch; keep 1 step/dispatch
        step = jax.jit(one_step)
        for i_epoch in range(num_epochs):
            diff_params, opt_state, epoch_loss, best_loss, best_dp, best_rows = step(
                diff_params, opt_state, best_loss, best_dp, best_rows
            )
            tbatch.set_description(f"Epoch {i_epoch + 1}, Prev Epoch Loss {float(epoch_loss):.2e}")
    else:
        chunk = max(1, int(config["optimizer"].get("chunk_size", 8)))

        @partial(jax.jit, static_argnames="length")
        def run_chunk(dp, state, b_loss, b_dp, b_rows, length):
            def body(carry, _):
                dp, state, b_loss, b_dp, b_rows = carry
                dp, state, value, b_loss, b_dp, b_rows = one_step(dp, state, b_loss, b_dp, b_rows)
                return (dp, state, b_loss, b_dp, b_rows), value

            (dp, state, b_loss, b_dp, b_rows), _ = jax.lax.scan(
                body, (dp, state, b_loss, b_dp, b_rows), None, length=length
            )
            return dp, state, b_loss, b_dp, b_rows

        done = 0
        compile_s, seen_lengths = 0.0, set()
        # param/opt init + filter/partition + (mesh) sharding before the first
        # dispatch — eager jnp ops, each a tunnel round trip on axon
        mlflow.log_metrics({"fit_param_init_time": round(time.time() - t_enter, 2)})
        while done < num_epochs:
            length = min(chunk, num_epochs - done)
            # each distinct scan length compiles its own executable (the full
            # chunk, plus one tail chunk when chunk doesn't divide num_epochs)
            # — time those first dispatches so E2E artifacts can split compile
            # from fit steps; the sync costs one pipeline bubble per compile
            timed = length not in seen_lengths
            if timed:
                seen_lengths.add(length)
                t0 = time.time()
            diff_params, opt_state, best_loss, best_dp, best_rows = run_chunk(
                diff_params, opt_state, best_loss, best_dp, best_rows, length
            )
            if timed:
                jax.block_until_ready(best_loss)
                compile_s += time.time() - t0
                mlflow.log_metrics({"fit_first_dispatch_time": round(compile_s, 2)})
            done += length

    if per_lineout:
        # the assembled params mix epochs per lineout; report their actual
        # joint loss rather than the scalar-best seen.  This is ONE dispatch
        # of compute but compiles loss_fn._loss_ — a program nothing else in
        # the fit path builds (the scan inlines _vg_func_) — so on axon it
        # costs a full compile/cache-load (~10-30 s warm).  Timed separately
        # so E2E artifacts don't book it as step time.
        t0 = time.time()
        best_loss, _ = loss_fn._loss_(best_dp, static_params, batch)
        best_loss = float(best_loss)
        mlflow.log_metrics({"fit_final_loss_time": round(time.time() - t0, 2)})
    return float(best_loss), combine(best_dp, static_params)


def _1d_device_lbfgs_loop_(config: Dict, loss_fn: LossFunction, previous_weights, batch: Dict, mesh=None):
    """Device-resident L-BFGS: jitted steps, no per-iteration scipy round trip.

    Replaces the scipy L-BFGS-B host loop (SURVEY.md §7 hard parts) with
    optax.lbfgs running entirely on device.  The linesearch is backend-gated:
    zoom (reference-quality) on CPU; backtracking on TPU, because zoom's
    nested while_loops fault the axon runtime (CLAUDE.md) while the
    single-level backtracking search runs fine.  One jitted step + a Python
    loop rather than a scanned multi-step program — the remote TPU compiler
    takes minutes for long scans but ~30 s for one step.
    """
    ts_params = _init_params(config, previous_weights)
    diff_params, static_params = partition(ts_params, get_filter_spec(config["parameters"], ts_params))
    batch, diff_params, static_params = _shard_fit_state(mesh, config, batch, diff_params, static_params)

    def value_fn(dp):
        return loss_fn.__loss__(dp, static_params, batch)[0]

    if jax.default_backend() == "tpu":
        linesearch = optax.scale_by_backtracking_linesearch(max_backtracking_steps=12, store_grad=True)
        opt = optax.lbfgs(linesearch=linesearch)
    else:
        opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(value_fn)

    @jax.jit
    def step(dp, state):
        value, grad = value_and_grad(dp, state=state)
        updates, state = opt.update(grad, state, dp, value=value, grad=grad, value_fn=value_fn)
        dp = optax.apply_updates(dp, updates)
        return dp, state, value

    state = opt.init(diff_params)
    value = np.inf
    for _ in range(config["optimizer"]["num_epochs"]):
        diff_params, state, value = step(diff_params, state)
    return float(value), combine(diff_params, static_params)


def one_d_loop(
    config: Dict, all_data: Dict, sa, batch_indices: np.ndarray, num_batches: int
) -> Tuple[List, float, LossFunction]:
    """Batched-lineout fitting loop (reference loops.py:98-164)."""
    t0 = time.time()
    loss_fn = LossFunction(config, sa, _slice_batch(all_data, slice(0, config["optimizer"]["batch_size"])))
    # diagnostic + FormFactor construction: host-side f64 PV/projection table
    # builds on the 1-core box, seconds-scale — attributed for E2E artifacts
    mlflow.log_metrics({"fit_lossfn_init_time": round(time.time() - t0, 2)})
    mesh = _fit_mesh(config)
    if mesh is not None:
        log_info(f"lineout batch data-parallel over {mesh.devices.size} devices")

    batch_indices = np.reshape(batch_indices, (-1, config["optimizer"]["batch_size"]))
    all_weights, overall_loss, previous_weights = [], 0.0, None
    with _pallas_ctx(mesh, config):
        for i_batch in range(num_batches):
            batch = _slice_batch(all_data, batch_indices[i_batch])

            method = config["optimizer"]["method"]
            if method == "adam":
                best_loss, best_weights = _1d_adam_loop_(config, loss_fn, previous_weights, batch, mesh=mesh)
            elif method == "lbfgs":
                best_loss, best_weights = _1d_device_lbfgs_loop_(config, loss_fn, previous_weights, batch, mesh=mesh)
            else:
                # host scipy path: params ravel to numpy every iteration, but the
                # closed-over data batch still shards across the mesh
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                loss_fn = LossFunction(config, sa, batch)
                best_loss, best_weights = _1d_scipy_loop_(config, loss_fn, previous_weights, batch)

            all_weights.append(best_weights)
            mlflow.log_metrics({"batch loss": float(best_loss)}, step=i_batch)
            overall_loss += best_loss

            if config["optimizer"].get("sequential", False):
                previous_weights = best_weights

    return all_weights, overall_loss, loss_fn


def angular_optax(config, all_data, sa):
    """ARTS fitting with any optax optimizer + early stopping (reference loops.py:167-275)."""
    t_enter = time.time()
    config["optimizer"]["batch_size"] = 1
    config["data"]["lineouts"]["start"] = int(config["data"]["lineouts"]["start"] / config["other"]["ang_res_unit"])
    config["data"]["lineouts"]["end"] = int(config["data"]["lineouts"]["end"] / config["other"]["ang_res_unit"])
    sl = slice(config["data"]["lineouts"]["start"], config["data"]["lineouts"]["end"])
    batch1 = _angular_batch(all_data, sl)
    if isinstance(config["data"]["shotnum"], list):
        actual_data = {"b1": batch1, "b2": _angular_batch(all_data, sl, rot=True)}
    else:
        actual_data = batch1

    loss_fn = LossFunction(config, sa, batch1)
    # diagnostic + 2V projection/PV table construction: host-side f64 work on
    # the 1-core box, seconds-scale — attributed for the E2E_ARTS artifact
    mlflow.log_metrics({"fit_lossfn_init_time": round(time.time() - t_enter, 2)})
    minimizer = getattr(optax, config["optimizer"]["method"])
    solver = minimizer(config["optimizer"]["learning_rate"])

    ts_params = ThomsonParams.create(config["parameters"], num_params=1, batch=False, activate=True)
    diff_params, static_params = partition(ts_params, get_filter_spec(config["parameters"], ts_params))
    opt_state = solver.init(diff_params)

    # durable checkpoint/resume (beyond the reference's pickle snapshots)
    ckpt_dir = config["optimizer"].get("checkpoint_dir")
    start_epoch = 0
    if ckpt_dir:
        from ..utils.checkpoint import restore_checkpoint

        diff_params, opt_state, start_epoch = restore_checkpoint(ckpt_dir, diff_params, opt_state)
        if start_epoch:
            log_info(f"resumed angular fit from checkpoint at epoch {start_epoch}")

    # TPU-first loop structure: run the epochs as jitted lax.scan chunks with
    # the best-so-far (loss, params) tracked ON DEVICE, and sync the chunk's
    # per-epoch losses to the host once per chunk.  The reference's per-epoch
    # `float(val)` sync costs a dispatch->result round trip every step
    # (~45 ms/step at ARTS shapes vs ~11 ms/step for the scanned chunk — the
    # device roofline).  Early stopping, snapshots, and checkpoints become
    # chunk-granular: the stop decision replays the reference's per-epoch
    # counters (reference loops.py:243-261) over the synced chunk losses, so a
    # mid-chunk stop wastes at most chunk_size-1 epochs of device work (and the
    # device best-tracker only ever improves on what the reference would keep).
    chunk = max(1, int(config["optimizer"].get("chunk_size", 8)))

    def one_step(dp, state, b_loss, b_dp):
        (value, aux), grad = loss_fn._vg_func_(dp, static_params, actual_data)
        updates, state = solver.update(grad, state)
        dp = optax.apply_updates(dp, updates)
        # pre-update loss credited to post-update params, matching the
        # reference's (epoch_loss, best_weights) association
        improved = value < b_loss
        b_loss = jnp.where(improved, value, b_loss)
        b_dp = jax.tree.map(lambda n, o: jnp.where(improved, n, o), dp, b_dp)
        return dp, state, value, b_loss, b_dp

    @partial(jax.jit, static_argnames="length")
    def run_chunk(dp, state, b_loss, b_dp, length):
        def body(carry, _):
            dp, state, b_loss, b_dp = carry
            dp, state, value, b_loss, b_dp = one_step(dp, state, b_loss, b_dp)
            return (dp, state, b_loss, b_dp), value

        (dp, state, b_loss, b_dp), losses = jax.lax.scan(
            body, (dp, state, b_loss, b_dp), None, length=length
        )
        return dp, state, b_loss, b_dp, losses

    state_weights = {}
    epoch_loss, best_loss = 0.0, 100.0  # reference's initial best (loops.py:227)
    best_loss_dev = jnp.asarray(100.0)
    best_dp = diff_params
    stalled_epochs = rising_epochs = 0  # early stopping (reference loops.py:243-261)
    num_epochs = config["optimizer"]["num_epochs"]
    i_epoch = start_epoch
    stop = False
    first_dispatch = True
    while i_epoch < num_epochs and not stop:
        length = min(chunk, num_epochs - i_epoch)
        t_chunk = time.time()
        diff_params, opt_state, best_loss_dev, best_dp, losses = run_chunk(
            diff_params, opt_state, best_loss_dev, best_dp, length
        )
        losses = np.asarray(losses)  # the chunk's one host sync
        if first_dispatch:
            # compile (or cache-load) + first chunk: the E2E artifacts gate
            # this against warm/cold ceilings (see e2e_arts.py)
            mlflow.log_metrics({"fit_first_dispatch_time": round(time.time() - t_chunk, 2)})
            first_dispatch = False
        n_counted = length  # epochs the reference's per-epoch loop would reach
        for j in range(length):
            epoch_loss = float(losses[j])
            mlflow.log_metrics({"epoch loss": epoch_loss}, step=i_epoch + j)
            if epoch_loss < best_loss:
                improvement = best_loss - epoch_loss
                best_loss = epoch_loss
                if improvement < 1e-6:
                    stalled_epochs += 1
                    if stalled_epochs > 5:
                        log_info("Minimizer exited due to change in loss < 1e-6")
                        stop = True
                        n_counted = j + 1
                        break
                else:
                    stalled_epochs = rising_epochs = 0
            elif epoch_loss > best_loss:
                rising_epochs += 1
                if rising_epochs > 5:
                    log_info("Minimizer exited due to increase in loss")
                    stop = True
                    n_counted = j + 1
                    break

        # snapshots/checkpoints stop at the early-stop epoch: epochs the chunk
        # ran past the stop were never reached in the reference's per-epoch
        # semantics, and a checkpoint labeled beyond the stop would let a
        # resume continue a fit that had already terminated
        if config["optimizer"].get("save_state", False):
            freq = config["optimizer"]["save_state_freq"]
            hits = [e for e in range(i_epoch, i_epoch + n_counted) if e % freq == 0]
            if hits:
                snap = jax.tree.map(
                    np.asarray, combine(best_dp, static_params).get_unnormed_params()
                )
                for e in hits:
                    state_weights[e] = snap

        ckpt_freq = config["optimizer"].get("checkpoint_freq", 50)
        if (
            ckpt_dir
            and not stop
            and any(e % ckpt_freq == 0 for e in range(i_epoch, i_epoch + n_counted))
        ):
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(ckpt_dir, diff_params, opt_state, i_epoch + n_counted - 1)

        i_epoch += length

    best_weights = combine(best_dp, static_params)

    with open("state_weights.txt", "wb") as file:
        file.write(pickle.dumps(state_weights))
    mlflow.log_artifact("state_weights.txt")
    return best_weights, epoch_loss, loss_fn
