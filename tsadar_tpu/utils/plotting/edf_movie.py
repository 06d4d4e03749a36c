"""Offline animation of EDF evolution from pickled ``state_weights`` snapshots.

Port of ``/root/reference/tsadar/utils/plotting/edf_movie.py``: reads the
epoch-indexed parameter snapshots written by the angular optimizer loop
(``tsadar_tpu.inverse.loops.angular_optax``) and writes a GIF of the evolving
distribution function.
"""

import pickle

import matplotlib

matplotlib.use("Agg")
import matplotlib.animation as animation
import matplotlib.pyplot as plt
import numpy as np


def _extract_fe(snapshot):
    elec = snapshot.get("electron", {})
    for key in ("fe", "f"):
        if key in elec:
            return np.squeeze(np.asarray(elec[key]))
    if "flm" in elec and isinstance(elec["flm"], dict):
        f00 = elec["flm"].get(0, {}).get(0)
        if f00 is not None:
            return np.squeeze(np.asarray(f00))
    return None


def make_edf_movie(state_weights_path="state_weights.txt", out_path="edf_evolution.gif", fps=5):
    with open(state_weights_path, "rb") as fh:
        state_weights = pickle.loads(fh.read())

    epochs = sorted(state_weights.keys())
    frames = [(e, _extract_fe(state_weights[e])) for e in epochs]
    frames = [(e, f) for e, f in frames if f is not None]
    if not frames:
        raise ValueError("no distribution snapshots found in state_weights")

    fig, ax = plt.subplots(figsize=(6, 4), tight_layout=True)
    is_2d = frames[0][1].ndim == 2

    def draw(i):
        ax.clear()
        e, fe = frames[i]
        if is_2d:
            ax.imshow(np.log10(np.maximum(fe, 1e-30)), aspect="auto")
            ax.set_title(f"log10 f(vx, vy), epoch {e}")
        else:
            ax.semilogy(np.maximum(fe, 1e-30))
            ax.set_title(f"f(v), epoch {e}")
            ax.grid()

    ani = animation.FuncAnimation(fig, draw, frames=len(frames))
    ani.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path


if __name__ == "__main__":
    import sys

    make_edf_movie(*sys.argv[1:])
