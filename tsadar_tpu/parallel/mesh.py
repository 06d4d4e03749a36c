"""Device-mesh utilities: lineout-batch data parallelism over TPU ICI.

The reference's entire multi-device story is a 1D GPU mesh sharding the 2V
chi-evaluation points (``/root/reference/tsadar/core/physics/form_factor.py:147-161,
431-447``).  Here the primary axis of scale is the lineout batch (SURVEY.md §2.6):
batch arrays and per-lineout parameter leaves are given a NamedSharding over the
"batch" mesh axis, the jitted loss/step partitions via GSPMD, and XLA inserts the
(only) collective — the scalar-loss psum — over ICI.  The same helpers serve the
2V point-axis sharding.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="batch"):
    """1D mesh over the first n_devices (defaults to all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def shard_batch(batch, mesh, axis_name="batch"):
    """Place every array in a batch dict with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_params_batch_axis(ts_params, mesh, batch_size, axis_name="batch", batched_mask=None):
    """Shard per-lineout parameter leaves over the mesh; replicate everything
    else (velocity grids, tables).

    ``batched_mask`` (a matching pytree of booleans) decides exactly which
    leaves are per-lineout; the fit loop builds it from the parameter system
    itself (``loops._batched_leaf_mask``).  Without a mask, falls back to the
    leading-dim heuristic — fine unless a replicated leaf's leading dim
    coincidentally equals the batch size (e.g. ``nvx == batch_size`` would
    shard the velocity grid along its velocity axis: still correct under
    GSPMD, but inserts per-step all-gathers of the grid)."""
    batched = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    if batched_mask is not None:
        return jax.tree.map(
            lambda x, m: jax.device_put(x, batched if m else repl), ts_params, batched_mask
        )

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, batched)
        return jax.device_put(x, repl)

    return jax.tree.map(place, ts_params)
