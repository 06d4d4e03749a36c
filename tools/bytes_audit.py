"""Pallas-aware bytes/roofline audit of the bench forward and fit step.

The XLA ``bytes accessed`` estimate counts every fusion's and custom call's
operands + results at face value — on TPU (no inter-kernel cache) that IS the
HBM traffic of the program, with custom-call (Pallas) interiors correctly
opaque: their VMEM-resident intermediates never touch HBM, and their
HBM-visible IO appears as the custom call's operands/results.  What the
aggregate number can NOT answer is whether the program is at the bandwidth
floor, because the Pallas kernels are MXU-dot-bound, not bandwidth-bound
(docs/performance.md): dividing total bytes by total time mixes two different
rooflines.

This tool separates them:

1. builds the bench fit step (and forward) at bench shapes,
2. splits program bytes into Pallas-kernel IO (parsed per tpu_custom_call
   from the compiled HLO: operand + result shapes) vs XLA-fusion bytes,
3. splits device time into kernel time vs fusion time (jax.profiler trace),
4. reports each side against its own floor: fusions vs the 819 GB/s v5e HBM
   peak, kernels vs their measured isolated-dot floors.

Usage: python tools/bytes_audit.py [--fwd]    (fit step by default)
"""

import os
import re
import sys
import time
from collections import defaultdict

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax  # noqa: E402


def _configure_cache():
    # Only as a script: importers (bench.py) own their own cache config.
    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


V5E_HBM_GBS = 819.0

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred|c64|c128)\[([0-9,]*)\]")


def _shape_bytes(shape_str):
    """Total bytes of all typed shapes appearing in an HLO type string."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def kernel_io_bytes(hlo_text):
    """Per-custom-call HBM IO: operand shapes + result shapes, from HLO text."""
    per_call = []
    # '  %name = <result types> custom-call(<operands>), ... custom_call_target="tpu_custom_call"'
    for line in hlo_text.splitlines():
        if 'custom_call_target="tpu_custom_call"' not in line:
            continue
        lhs, _, rhs = line.partition("custom-call(")
        result_b = _shape_bytes(lhs.split("=", 1)[-1])
        operands = rhs.split(")", 1)[0]
        operand_b = _shape_bytes(operands)
        per_call.append((operand_b, result_b, line.strip()[:100]))
    return per_call


def _trace_split(compiled, args, trace_dir, iters=5):
    """(kernel_ms, fusion_ms, total_device_ms) per iteration from a trace."""
    out = compiled(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = compiled(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])

    from trace_top_ops import load_trace

    data = load_trace(trace_dir)
    events = data.get("traceEvents", [])
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    op_us = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        tname = tnames.get((e.get("pid"), e.get("tid")), "")
        if "XLA" not in tname or "Ops" not in tname:
            continue
        op_us[e["name"]] += e["dur"]
    kernel_us = sum(us for name, us in op_us.items() if "pallas" in name.lower())
    total_us = sum(op_us.values())
    return kernel_us / iters / 1e3, (total_us - kernel_us) / iters / 1e3, total_us / iters / 1e3


def audit(which="fit"):
    from bench import BATCH, _fwd_1d
    from tsadar_tpu.core.params import get_filter_spec, partition
    from tsadar_tpu.inverse.loss import LossFunction

    fwd, ts_params, batch, cfg, sas = _fwd_1d(BATCH)
    if which == "fit":
        loss_fn = LossFunction(cfg, sas, batch)
        diff, static = partition(ts_params, get_filter_spec(cfg["parameters"], ts_params))
        vg = jax.jit(jax.value_and_grad(loss_fn.__loss__, has_aux=True))
        compiled = vg.lower(diff, static, batch).compile()
        args = (diff, static, batch)
    else:
        compiled = fwd.lower(ts_params, batch).compile()
        args = (ts_params, batch)

    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    total_bytes = float(ca.get("bytes accessed"))

    calls = kernel_io_bytes(compiled.as_text())
    kio = sum(o + r for o, r, _ in calls)

    # wall time (best-of-3 windows, same protocol as bench.py)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = compiled(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / 5 * 1e3)

    k_ms, f_ms, dev_ms = _trace_split(compiled, args, f"/tmp/bytes_audit_{which}")

    fusion_bytes = total_bytes - kio
    print(f"== {which} @ B={BATCH} ==")
    print(f"wall: {best:.2f} ms/iter   device-op: {dev_ms:.2f} ms "
          f"(kernels {k_ms:.2f} + fusions {f_ms:.2f})   dispatch gap {best - dev_ms:.2f} ms")
    print(f"bytes: total {total_bytes / 1e9:.3f} GB  = pallas-kernel IO {kio / 1e9:.3f} GB "
          f"({len(calls)} custom calls) + fusions {fusion_bytes / 1e9:.3f} GB")
    print(f"fusion roofline: {fusion_bytes / (f_ms / 1e3) / 1e9:.0f} GB/s "
          f"= {fusion_bytes / (f_ms / 1e3) / 1e9 / V5E_HBM_GBS * 100:.0f}% of v5e HBM peak")
    print(f"kernel IO rate (not their bound; kernels are MXU-dot-bound): "
          f"{kio / (k_ms / 1e3) / 1e9:.0f} GB/s")
    print(f"whole-program naive: {total_bytes / (best / 1e3) / 1e9:.0f} GB/s "
          f"({total_bytes / (best / 1e3) / 1e9 / V5E_HBM_GBS * 100:.0f}% of peak) "
          "<- mixes the two rooflines; see the split above")
    print("per-custom-call IO (operand+result bytes):")
    agg = defaultdict(lambda: [0, 0])
    for o, r, line in calls:
        key = f"{(o + r) / 1e6:8.2f} MB"
        agg[key][0] += 1
    for key in sorted(agg, key=lambda k: -float(k.split()[0])):
        print(f"  {agg[key][0]:3d} x {key}")
    return {
        "wall_ms": best, "device_ms": dev_ms, "kernel_ms": k_ms, "fusion_ms": f_ms,
        "total_bytes": total_bytes, "kernel_io_bytes": kio, "fusion_bytes": fusion_bytes,
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _configure_cache()
    audit("fwd" if "--fwd" in sys.argv else "fit")
