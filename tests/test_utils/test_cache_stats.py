"""Persistent-cache state instrumentation + the cache-key-flap regression gate.

Round 3 shipped a bug where ``custom_partitioning`` embedded a process-local
callback POINTER in the lowered HLO, so every process computed a different
persistent-cache key for identical programs and CLI fits recompiled (~2-7 min)
on EVERY run.  The fix is one flag set at ``ops/partitioning.py`` import
(``jax_remove_custom_partitioning_ptr_from_cache_key``).  These tests pin:

1. the instrumentation (``utils.cache_stats``) detects warm vs cold runs —
   the fields every E2E artifact now carries;
2. an identical partitioned program in two fresh processes is a cache HIT
   (``cache_warm``) with the flag, and the deliberate flap (flag forced off)
   is CAUGHT as a miss — i.e. the r3 regression class is detectable by gate,
   not by luck.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))

# A minimal program through the SAME custom_partitioning wrapper the
# production kernels use (ops.partitioning.batch0_partitioned), on a 2-device
# CPU mesh.  args: cache_dir, unset_flag("0"/"1").
_PROBE = """
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from tsadar_tpu.ops.partitioning import batch0_partitioned  # sets the ptr flag
if sys.argv[2] == "1":
    # the deliberate r3-class flap: cache keys become process-local again
    jax.config.update("jax_remove_custom_partitioning_ptr_from_cache_key", False)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from tsadar_tpu.utils import cache_stats

before = cache_stats.snapshot(sys.argv[1])

fn = batch0_partitioned(lambda x: x * 2.0 + 1.0, (True,), "b q -> b q")
mesh = Mesh(np.array(jax.devices()), ("batch",))
x = jax.device_put(np.arange(8.0, dtype=np.float32).reshape(8, 1),
                   NamedSharding(mesh, P("batch", None)))
out = jax.jit(fn)(x)
np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0 + 1.0)

print(json.dumps(cache_stats.diff(before, sys.argv[1])))
"""


def _run(cache_dir, unset_flag):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, cache_dir, unset_flag],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_identical_partitioned_program_is_cache_warm(tmp_path):
    cache = str(tmp_path / "cache")
    first = _run(cache, "0")
    assert first["cache_new_entries"] > 0 and not first["cache_warm"]  # cold
    second = _run(cache, "0")
    assert second["cache_warm"], (
        f"identical partitioned program missed the persistent cache: {second} "
        "(r3 cache-key regression signature)"
    )


def test_deliberate_cache_key_flap_is_caught(tmp_path):
    cache = str(tmp_path / "cache")
    _run(cache, "1")
    second = _run(cache, "1")
    # with the ptr-removal flag off, each process embeds its own callback
    # pointer in the key -> the second, identical run is a MISS, and the
    # cache_warm field the E2E gates consume flags it
    assert not second["cache_warm"], (
        "expected the deliberate cache-key flap to be detected as a cold run; "
        f"got {second}"
    )
