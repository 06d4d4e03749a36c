"""Benchmark: batched Thomson-scattering forward spectra per second (1k-lambda grid).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The workload is the full flagship forward step — batched 1D diagnostic (EPW+IAW
form factors on a 1024-point wavelength grid, 10 scattering angles, instrument
response, amplitude scaling) — i.e. one optimizer-iteration's forward cost for a
batch of lineouts.  ``value`` = lineout-spectra per second on the available
accelerator (f32 on TPU; the reference runs complex128 which TPUs do not support).

``vs_baseline``: the reference repo publishes no performance numbers
(BASELINE.md), and its dependency set (interpax/equinox) is not installed here,
so the recorded baseline is the same computation executed on CPU in float64 —
the reference's guaranteed CI platform and precision — measured once and cached
in .bench_cpu_baseline.json.

Extra fields:
- ``accuracy_ok`` + ``accuracy``: an on-chip correctness gate. The TPU-f32
  forward (1V ThryE/ThryI), one fit step (loss value + grad norm), and the 2V
  table-mode form factor are compared against CPU-float64 goldens computed in a
  subprocess (cached in .bench_cpu_golden.npz). Tolerances are ~3x the measured
  f32 conditioning floor (CPU-f32 shows the same deviations), so a TPU-only
  numerical regression — the class of bug hit twice before (bf16-split elision,
  f32 underflow) — fails the gate rather than shipping silently.
- ``tflops_xla`` / ``mfu_xla``: achieved TFLOP/s from the compiled TPU
  program's own cost analysis (includes the deliberate one-hot matmul overhead
  that buys gather-free lookups) against the v5e bf16 peak.
- ``tflops_useful`` / ``mfu_useful``: the same timing against the CPU
  lowering's FLOP count (gather-based, no one-hot overhead) — the honest
  algorithmic-work number.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = 512  # throughput saturates at B>=512 with the gather-free kernels
NPTS = 1024
WARMUP = 2
ITERS = 10
GATE_BATCH = 8
HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(HERE, ".bench_cpu_baseline.json")
GOLDEN_CACHE = os.path.join(HERE, ".bench_cpu_golden.npz")

V5E_PEAK_BF16_TFLOPS = 197.0  # per-chip MXU peak, bf16
V5E_HBM_GBS = 819.0  # per-chip HBM bandwidth peak

# Gate tolerances: ~3x the measured f32 conditioning floor (TPU-vs-CPU-f64
# deviations with full-precision matmuls; CPU-f32 shows the same magnitudes,
# i.e. these are f32 limits, not TPU defects).
GATE_TOL = {
    "fwd_ThryE": 5e-3,   # measured 9.2e-4 of peak
    "fwd_ThryI": 2.5e-2, # measured 6.4e-3 of peak (narrow IAW resonance)
    "loss": 1e-3,        # measured 9.0e-5 relative
    "grad_norm": 2e-2,   # measured 2.2e-3 relative
    "table_2v": 2.5e-2,  # bilinear/NUDFT table path, of peak
}


def _fwd_1d(batch_size):
    import jax

    from __graft_entry__ import _small_config, _make_batch
    from tsadar_tpu.core.diagnostic import ThomsonScatteringDiagnostic
    from tsadar_tpu.core.params import ThomsonParams
    from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles

    cfg = _small_config(batch_size)
    sas = get_scattering_angles(cfg)
    ts_diag = ThomsonScatteringDiagnostic(cfg, scattering_angles=sas)
    ts_params = ThomsonParams.create(cfg["parameters"], num_params=batch_size, batch=True, activate=True)
    batch = _make_batch(batch_size, NPTS)

    fwd = jax.jit(lambda p, b: ts_diag(p, b)[:2])
    # device-resident batch: the production optimizer loops close over the
    # batch (baked into the jitted step), so per-call host->device re-upload
    # is not part of the workload being measured — through the axon tunnel it
    # would add ~33 ms/call at B=512, dwarfing the compute.
    batch = jax.device_put(batch)
    return fwd, ts_params, batch, cfg, sas


def _gate_values():
    """The quantities the accuracy gate compares across backends.

    Returns a dict of numpy arrays/floats: 1V forward spectra, one fit step's
    loss + grad norm, and the 2V table-mode form factor on an anisotropic EDF.
    """
    import jax
    import jax.numpy as jnp

    from tsadar_tpu.core.params import get_filter_spec, partition
    from tsadar_tpu.core.physics.form_factor import FormFactor
    from tsadar_tpu.inverse.loss import LossFunction

    fwd, ts_params, batch, cfg, sas = _fwd_1d(GATE_BATCH)
    ThryE, ThryI = jax.block_until_ready(fwd(ts_params, batch))

    loss_fn = LossFunction(cfg, sas, batch)
    spec = get_filter_spec(cfg["parameters"], ts_params)
    diff, static = partition(ts_params, spec)
    (val, _), grad = jax.jit(jax.value_and_grad(loss_fn.__loss__, has_aux=True))(diff, static, batch)
    gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grad)))

    # 2V table path: bi-Maxwellian EDF, 3 angles (mirrors tests/test_physics).
    nv, vmax = 64, 6.0
    dv = 2 * vmax / nv
    vx2 = np.linspace(-vmax + dv / 2, vmax - dv / 2, nv)
    f2 = np.exp(-(vx2[None, :] ** 2) / 2 - (vx2[:, None] ** 2) / (2 * 1.44))
    f2 = f2 / f2.sum() / dv**2
    ff_tab = FormFactor(
        [450, 650], npts=256, num_beta=256, mode="table", lam_shift=0.0,
        scattering_angles={"sa": np.array([55.0, 60.0, 65.0])}, num_grad_points=1,
        ud_ang=0.0, va_ang=0.0,
    )
    params_2v = {
        "electron": {"Te": jnp.asarray(0.5), "ne": jnp.asarray(0.2),
                     "fe": jnp.asarray(f2), "v": jnp.asarray(vx2)},
        "general": {"lam": jnp.asarray(526.5), "ne_gradient": jnp.asarray(0.0),
                    "Te_gradient": jnp.asarray(0.0), "ud": jnp.asarray(0.0),
                    "Va": jnp.asarray(0.0)},
        "ion-1": {"A": jnp.asarray(1.0), "Z": jnp.asarray(1.0),
                  "Ti": jnp.asarray(0.2), "fract": jnp.asarray(1.0)},
    }
    S2v, _ = jax.jit(ff_tab.calc_in_2D)(params_2v)

    return {
        "ThryE": np.asarray(ThryE, np.float64),
        "ThryI": np.asarray(ThryI, np.float64),
        "loss": np.float64(val),
        "grad_norm": np.float64(gnorm),
        "S2v": np.asarray(S2v, np.float64),
    }


def measure(batch_size=BATCH, iters=ITERS, want_flops=False, repeats=3):
    """Best of ``repeats`` timing windows: the shared axon chip shows large
    run-to-run spread (contention + nondeterministic lowerings), and the best
    window is the least-contended estimate of the program's actual speed."""
    import jax

    fwd, ts_params, batch, _, _ = _fwd_1d(batch_size)
    compiled = fwd.lower(ts_params, batch).compile()
    out = compiled(ts_params, batch)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(compiled(ts_params, batch))
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(ts_params, batch)
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)

    flops = bytes_accessed = None
    if want_flops:
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = float(ca.get("flops"))
            bytes_accessed = float(ca.get("bytes accessed"))
        except Exception:
            pass
    return batch_size * iters / dt, dt / iters, flops, bytes_accessed


def _fit_step_ms(batch_size=BATCH, repeats=3, iters=5):
    """(ms, flops, bytes) per loss+gradient evaluation at the bench batch."""
    import jax

    from tsadar_tpu.core.params import get_filter_spec, partition
    from tsadar_tpu.inverse.loss import LossFunction

    _, ts_params, batch, cfg, sas = _fwd_1d(batch_size)
    loss_fn = LossFunction(cfg, sas, batch)
    diff, static = partition(ts_params, get_filter_spec(cfg["parameters"], ts_params))
    vg = jax.jit(jax.value_and_grad(loss_fn.__loss__, has_aux=True))
    compiled = vg.lower(diff, static, batch).compile()
    out = compiled(diff, static, batch)
    jax.block_until_ready(out[0][0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(diff, static, batch)
        jax.block_until_ready(out[0][0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    flops = bytes_accessed = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops"))
        bytes_accessed = float(ca.get("bytes accessed"))
    except Exception:
        pass
    return best, flops, bytes_accessed


PROBE_REF_MS = 0.76  # uncontended per-matmul time of _contention_probe's chain on
#                      v5e (best calibration windows measured 0.766-0.781;
#                      137 GFLOP at ~178 TFLOP/s = 90% bf16 peak, incl. the
#                      amortized readback RPC).  The probe divides out
#                      shared-chip contention: normalized = raw * probe_ms / this.


def _contention_probe(repeats=3, chain=512):
    """Fixed, model-independent calibration op: a chain of ``chain``
    [4096, 4096] bf16 self-matmuls inside ONE jit (137 GFLOP each), synced by
    a SCALAR READBACK.

    Two axon-tunnel traps shaped this design (both measured):
    * a single small op per dispatch times the ~7 ms dispatch RPC, not the
      chip — the chain makes one dispatch ~300+ ms of pure-MXU device time;
    * ``block_until_ready`` does NOT actually wait for a remote execution
      until the client's pipeline backpressures (3 queued copies of this
      program "completed" in 100 us) — only a host readback truly syncs.
      The ~30 ms scalar-readback RPC is amortized to <10%% by the chain
      length and is absorbed into PROBE_REF_MS (measured the same way).

    The shared chip shows +-25%% run-to-run contention spread, inside which
    a true ~15%% model regression is invisible.  This op never changes across
    rounds, so ``probe_matmul_ms / PROBE_REF_MS`` estimates the window's
    contention factor, and workload numbers scaled by it (``*_normalized``
    fields) are comparable across rounds/windows."""
    import jax
    import jax.numpy as jnp

    a = jnp.full((4096, 4096), 1e-3, jnp.bfloat16)

    @jax.jit
    def f(x):
        scale = jnp.bfloat16(2.0**-12)

        def body(_, y):
            # data-dependent chain so XLA cannot collapse the loop.  The
            # matmul grows y by ~4096*1e-3 = 4.1x per step, so rescale by
            # 2^-12: net factor ~1e-3 keeps y pinned near x forever (an
            # unscaled chain overflows bf16 to inf by step ~68 — inf still
            # times at line rate on v5e, but a calibration op shouldn't rest
            # on that).  The elementwise scale fuses into the add (~free).
            return y @ x * scale + x

        return jax.lax.fori_loop(0, chain, body, x).sum()

    float(f(a))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(a))  # scalar readback = the only real sync through the tunnel
        best = min(best, (time.perf_counter() - t0) / chain * 1e3)
    return best


def _run_cpu_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_CPU_BASELINE"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True, timeout=2400
    )
    if out.returncode != 0:
        print(out.stdout, file=sys.stderr)
        print(out.stderr, file=sys.stderr)


def _cpu_artifacts():
    """(baseline spectra/s, useful flops, golden dict) — computed once, cached."""
    if not (os.path.exists(BASELINE_CACHE) and os.path.exists(GOLDEN_CACHE)):
        _run_cpu_subprocess()
    baseline = flops = golden = None
    try:
        with open(BASELINE_CACHE) as f:
            d = json.load(f)
        baseline, flops = d.get("spectra_per_sec"), d.get("useful_flops")
    except (OSError, ValueError):
        pass
    try:
        golden = dict(np.load(GOLDEN_CACHE))
    except OSError:
        pass
    return baseline, flops, golden


def _accuracy_gate(golden):
    got = _gate_values()
    errs = {
        "fwd_ThryE": float(np.max(np.abs(got["ThryE"] - golden["ThryE"])) / np.max(np.abs(golden["ThryE"]))),
        "fwd_ThryI": float(np.max(np.abs(got["ThryI"] - golden["ThryI"])) / np.max(np.abs(golden["ThryI"]))),
        "loss": float(abs(got["loss"] - golden["loss"]) / abs(golden["loss"])),
        "grad_norm": float(abs(got["grad_norm"] - golden["grad_norm"]) / abs(golden["grad_norm"])),
        "table_2v": float(np.max(np.abs(got["S2v"] - golden["S2v"])) / np.max(np.abs(golden["S2v"]))),
    }
    ok = all(errs[k] <= GATE_TOL[k] for k in GATE_TOL)
    return ok, {k: float(f"{v:.3g}") for k, v in errs.items()}


def _cpu_main():
    """Subprocess body: CPU-f64 baseline + goldens + useful-FLOPs count."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # reference precision
    value, _, flops, _ = measure(batch_size=8, iters=3)
    # algorithmic FLOPs: the CPU lowering keeps gathers (no one-hot overhead),
    # so its cost analysis is the honest per-spectrum work estimate.  Static —
    # read it off the compiled program without executing the B=512 f64 forward.
    fwd, ts_params, batch, _, _ = _fwd_1d(BATCH)
    try:
        ca = fwd.lower(ts_params, batch).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        useful_flops = float(ca.get("flops"))
    except Exception:
        useful_flops = None
    golden = _gate_values()
    np.savez(GOLDEN_CACHE, **golden)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"spectra_per_sec": value, "useful_flops": useful_flops}, f)


def main():
    if os.environ.get("BENCH_CPU_BASELINE"):
        _cpu_main()
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    on_tpu = jax.default_backend() == "tpu"
    value, sec_per_iter, xla_flops, xla_bytes = measure(want_flops=True)
    probe_fwd_ms = _contention_probe() if on_tpu else None
    baseline, useful_flops, golden = _cpu_artifacts()

    # context: one optimizer iteration (loss + grad) over the same batch
    fit_ms = fit_flops = fit_bytes = None
    try:
        fit_ms, fit_flops, fit_bytes = _fit_step_ms()
    except Exception:
        pass
    probe_fit_ms = _contention_probe() if on_tpu else None

    result = {
        "metric": "forward lineout-spectra/sec (1k-lambda grid, batched diagnostic)",
        "value": round(value, 2),
        "unit": "spectra/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }

    # contention-normalized numbers: scale each workload by its own window's
    # probe factor so cross-round comparisons see the model, not the neighbors
    if probe_fwd_ms:
        result["probe_matmul_ms"] = round(probe_fwd_ms, 3)
        result["probe_ref_ms"] = PROBE_REF_MS
        result["value_normalized"] = round(value * probe_fwd_ms / PROBE_REF_MS, 2)

    if fit_ms:
        result["fit_step_ms"] = round(fit_ms, 2)
        result["fit_spectra_per_sec"] = round(BATCH / fit_ms * 1e3, 2)
        if probe_fit_ms:
            result["probe_matmul_fit_ms"] = round(probe_fit_ms, 3)
            result["fit_step_ms_normalized"] = round(fit_ms * PROBE_REF_MS / probe_fit_ms, 2)

    if xla_flops:
        tflops_xla = xla_flops / sec_per_iter / 1e12
        result["tflops_xla"] = round(tflops_xla, 3)
        result["mfu_xla"] = round(tflops_xla / V5E_PEAK_BF16_TFLOPS, 4)
    if useful_flops:
        tflops_useful = useful_flops / sec_per_iter / 1e12
        result["tflops_useful"] = round(tflops_useful, 3)
        result["mfu_useful"] = round(tflops_useful / V5E_PEAK_BF16_TFLOPS, 4)

    # roofline context: achieved HBM bandwidth vs the v5e peak answers whether
    # each workload is bandwidth-bound (the compiled program's own
    # bytes-accessed estimate; overcounts reuse, so treat >1 as "fully
    # bandwidth-bound after on-chip reuse")
    if xla_bytes:
        gbs = xla_bytes / sec_per_iter / 1e9
        result["membw_gbs_fwd"] = round(gbs, 1)
        result["membw_util_fwd"] = round(gbs / V5E_HBM_GBS, 3)
    if fit_ms and fit_bytes:
        gbs = fit_bytes / (fit_ms / 1e3) / 1e9
        result["membw_gbs_fit"] = round(gbs, 1)
        result["membw_util_fit"] = round(gbs / V5E_HBM_GBS, 3)

    # Pallas-aware split (tools/bytes_audit.py, docs/performance.md): the
    # naive ratios above mix two rooflines — the Pallas kernels are
    # MXU-dot-bound, only the XLA fusions are HBM-bound.  One short profiler
    # trace splits device time into kernel vs fusion; kernel IO bytes come
    # from the compiled HLO's custom-call operand/result shapes, and the
    # fusion-side utilization is the honest bandwidth-floor readout.
    if on_tpu:
        try:
            sys.path.insert(0, os.path.join(HERE, "tools"))
            from bytes_audit import kernel_io_bytes as _kio, _trace_split

            from tsadar_tpu.core.params import get_filter_spec, partition
            from tsadar_tpu.inverse.loss import LossFunction

            _, ts_params, batch, cfg, sas = _fwd_1d(BATCH)
            loss_fn = LossFunction(cfg, sas, batch)
            diff, static = partition(ts_params, get_filter_spec(cfg["parameters"], ts_params))
            vg = jax.jit(jax.value_and_grad(loss_fn.__loss__, has_aux=True))
            compiled = vg.lower(diff, static, batch).compile()
            kio = sum(o + r for o, r, _ in _kio(compiled.as_text()))
            k_ms, f_ms, dev_ms = _trace_split(
                compiled, (diff, static, batch), "/tmp/bench_fit_trace"
            )
            result["fit_device_ms"] = round(dev_ms, 2)
            result["fit_kernel_ms"] = round(k_ms, 2)
            result["fit_fusion_ms"] = round(f_ms, 2)
            if fit_bytes:
                fusion_gbs = (fit_bytes - kio) / (f_ms / 1e3) / 1e9
                result["fit_fusion_gbs"] = round(fusion_gbs, 1)
                result["fit_fusion_util"] = round(fusion_gbs / V5E_HBM_GBS, 3)
        except Exception:
            pass

    if on_tpu and golden is not None:
        ok, errs = _accuracy_gate(golden)
        result["accuracy_ok"] = ok
        result["accuracy"] = errs
    else:
        result["accuracy_ok"] = None

    print(json.dumps(result))
    if result.get("accuracy_ok") is False:
        sys.exit(1)


if __name__ == "__main__":
    main()
