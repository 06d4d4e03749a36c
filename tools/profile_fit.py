"""Capture a jax.profiler trace of the bench fit step (value_and_grad).

Usage: python tools/profile_fit.py [trace_dir]   (default /tmp/fit_trace)

Prints the wall ms/iter and writes a perfetto/tensorboard trace directory;
summarize device ops with tools/trace_top_ops.py.  Companion to bench.py's
_fit_step_ms (same workload, shapes, and device-resident batch).
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fit_trace"

    from bench import BATCH, _fwd_1d
    from tsadar_tpu.core.params import get_filter_spec, partition
    from tsadar_tpu.inverse.loss import LossFunction

    _, ts_params, batch, cfg, sas = _fwd_1d(BATCH)
    loss_fn = LossFunction(cfg, sas, batch)
    diff, static = partition(ts_params, get_filter_spec(cfg["parameters"], ts_params))
    vg = jax.jit(jax.value_and_grad(loss_fn.__loss__, has_aux=True))
    compiled = vg.lower(diff, static, batch).compile()

    out = compiled(diff, static, batch)
    jax.block_until_ready(out[0][0])
    for _ in range(3):
        out = compiled(diff, static, batch)
    jax.block_until_ready(out[0][0])

    t0 = time.perf_counter()
    for _ in range(10):
        out = compiled(diff, static, batch)
    jax.block_until_ready(out[0][0])
    print(f"fit_step_ms: {(time.perf_counter() - t0) / 10 * 1e3:.2f}")

    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = compiled(diff, static, batch)
        jax.block_until_ready(out[0][0])
    print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
