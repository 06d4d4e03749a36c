"""Persistent-compile-cache state instrumentation.

The axon remote compiler is 25x-variable with load (8..219 s measured for a
warm LOAD of the same program), so a bare ``fit_compile_s`` number cannot be
compared across runs or gated sanely unless the artifact records whether the
persistent cache was warm or cold.  This module provides the diagnostic the
round-3 cache-key-flap bug was found with (count NEW ``jit_*`` entries across
identical reruns — ``custom_partitioning`` used to embed a process-local
callback pointer in the lowered HLO, giving every process a different cache
key; see ``ops/partitioning.py``), packaged so every TPU artifact can carry
``cache_warm`` / ``cache_new_entries`` fields and the e2e gates can split
warm (<60 s) from cold (<350 s) compile ceilings.
"""

import os


def cache_dir():
    """The persistent compile-cache directory currently configured, or None."""
    import jax

    return jax.config.jax_compilation_cache_dir


def snapshot(path=None):
    """Set of compile-cache entry names currently on disk (empty if no dir)."""
    path = path or cache_dir()
    if not path or not os.path.isdir(path):
        return frozenset()
    return frozenset(os.listdir(path))


def diff(before, path=None):
    """Cache-state fields for an artifact, given a pre-run ``snapshot()``.

    ``cache_warm`` means the run compiled nothing new: every executable it
    needed was loaded from the persistent cache.  A run that writes new
    entries paid at least one real (cold) compile — its wall-clock compile
    numbers must be gated against the cold ceiling, not the warm one.
    """
    after = snapshot(path)
    new = sorted(set(after) - set(before))
    return {
        "cache_dir": path or cache_dir(),
        "cache_entries_before": len(before),
        "cache_new_entries": len(new),
        "cache_warm": len(new) == 0,
    }
