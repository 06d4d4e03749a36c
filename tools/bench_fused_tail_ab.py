"""Same-window A/B of the fused reduced spectrum tail (TPU).

Builds the bench-shape 1D workload twice — FUSED_REDUCED_TAIL on and off —
and alternates timing windows between the two compiled executables, so the
shared-chip contention hits both arms equally.  Prints forward ms/iter and
fit-step (value_and_grad) ms/iter for both arms.
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import tsadar_tpu.core.physics.spectrum as specmod

BATCH = 512
ROUNDS = 4
ITERS = 8


def build(fused):
    specmod.FUSED_REDUCED_TAIL = fused
    from bench import _fwd_1d
    from tsadar_tpu.core.params import get_filter_spec, partition
    from tsadar_tpu.inverse.loss import LossFunction

    fwd, ts_params, batch, cfg, sas = _fwd_1d(BATCH)
    cfwd = fwd.lower(ts_params, batch).compile()
    loss_fn = LossFunction(cfg, sas, batch)
    diff, static = partition(ts_params, get_filter_spec(cfg["parameters"], ts_params))
    vg = jax.jit(jax.value_and_grad(loss_fn.__loss__, has_aux=True))
    cvg = vg.lower(diff, static, batch).compile()
    return cfwd, (ts_params, batch), cvg, (diff, static, batch)


def window(fn, args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    arms = {}
    for fused in (True, False):
        t0 = time.perf_counter()
        arms[fused] = build(fused)
        print(f"built fused={fused} in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    res = {True: {"fwd": [], "fit": []}, False: {"fwd": [], "fit": []}}
    for r in range(ROUNDS):
        for fused in (True, False):
            cfwd, fa, cvg, va = arms[fused]
            res[fused]["fwd"].append(window(cfwd, fa))
            res[fused]["fit"].append(window(cvg, va))
    for fused in (True, False):
        f = min(res[fused]["fwd"])
        v = min(res[fused]["fit"])
        print(
            f"fused={fused}: fwd {f:.2f} ms/iter ({BATCH/f*1000:.0f} spectra/s), "
            f"fit step {v:.2f} ms/iter   windows fwd={['%.2f'%x for x in res[fused]['fwd']]} "
            f"fit={['%.2f'%x for x in res[fused]['fit']]}"
        )


if __name__ == "__main__":
    main()
