"""Optimizer-state checkpointing (orbax) for long fits.

The reference has no real checkpoint/resume — only pickled parameter snapshots
for offline movies (SURVEY.md §5).  This adds durable (diff_params, opt_state,
epoch) checkpoints so interrupted angular/batched fits resume exactly, using
orbax when available and a pickle fallback otherwise.
"""

import os
import pickle

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    ocp = None
    HAVE_ORBAX = False


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(path, diff_params, opt_state, epoch):
    path = os.path.abspath(path)
    payload = {"diff_params": _to_host(diff_params), "opt_state": _to_host(opt_state), "epoch": int(epoch)}
    if HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, f"epoch_{epoch}"), payload, force=True)
    else:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, f"epoch_{epoch}.pkl"), "wb") as fh:
            pickle.dump(payload, fh)
    with open(os.path.join(path, "LATEST"), "w") as fh:
        fh.write(str(epoch))


def latest_epoch(path):
    marker = os.path.join(os.path.abspath(path), "LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        return int(fh.read().strip())


def restore_checkpoint(path, diff_params, opt_state):
    """Restore the newest checkpoint into the given pytree structures.

    Returns (diff_params, opt_state, epoch) — the inputs unchanged if no
    checkpoint exists.
    """
    path = os.path.abspath(path)
    epoch = latest_epoch(path)
    if epoch is None:
        return diff_params, opt_state, 0
    template = {"diff_params": _to_host(diff_params), "opt_state": _to_host(opt_state), "epoch": 0}
    if HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(os.path.join(path, f"epoch_{epoch}"), item=template)
    else:
        with open(os.path.join(path, f"epoch_{epoch}.pkl"), "rb") as fh:
            payload = pickle.load(fh)

    def like(ref, val):
        """Device arrays like the caller's template — the pickle fallback
        restores plain numpy host arrays, which must not leak into the
        jitted optimizer loop's input pytrees."""
        import jax.numpy as jnp

        return jax.tree.map(
            lambda r, v: jnp.asarray(v, getattr(r, "dtype", None)) if hasattr(r, "dtype") else v,
            ref,
            val,
        )

    return (
        like(diff_params, payload["diff_params"]),
        like(opt_state, payload["opt_state"]),
        payload["epoch"],
    )
