"""Shared stage-metric extraction + compile gating for the e2e artifact scripts.

``e2e_tpu_smoke.py`` / ``e2e_whole_shot.py`` / ``e2e_arts.py`` all read the
tracker's ``run.json``, resolve stage wall-clocks, and gate the fit compile
against cache-state-keyed ceilings — keeping the ceilings and the extraction
in ONE place prevents the three scripts drifting apart (they once did).

Ceilings are sized to the axon compile service's MEASURED spread — warm
cache-LOADs of identical programs ranged 8-219 s, cold compiles 110-446 s
across windows — so tighter walls would gate service noise, not regressions.
The recompile-every-run regression class (the r3 cache-key flap) is caught
structurally by ``tests/test_utils/test_cache_stats.py`` instead.
"""

import json

WARM_COMPILE_CEILING_S = 250.0
COLD_COMPILE_CEILING_S = 700.0


def last_metric_reader(run_json_path):
    """Callable ``last(name) -> float | None`` over a tracker run.json."""
    with open(run_json_path) as f:
        metrics = json.load(f).get("metrics", {})

    def last(k):
        return metrics[k][-1]["value"] if k in metrics else None

    return last, metrics


def compile_gate(fit_compile_s, cache):
    """Whether the measured first-dispatch wall passes its cache-state ceiling."""
    ceiling = WARM_COMPILE_CEILING_S if cache.get("cache_warm") else COLD_COMPILE_CEILING_S
    return fit_compile_s < ceiling
