"""Data / fit / residual subplot grids (port of reference lineout_plot.py:6-56)."""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def lineout_plot(sorted_data, sorted_fits, sorted_sqdev, yaxis, sorted_x, xlabel, s_ind, e_ind, td, tag):
    num = len(sorted_data)
    fig, ax = plt.subplots(2, num, figsize=(4 * num, 6), tight_layout=True, squeeze=False, sharex=True)
    for i in range(num):
        ax[0][i].plot(yaxis[s_ind[i] : e_ind[i]], np.squeeze(sorted_data[i][s_ind[i] : e_ind[i]]), label="Data")
        ax[0][i].plot(yaxis[s_ind[i] : e_ind[i]], np.squeeze(sorted_fits[i][s_ind[i] : e_ind[i]]), label="Fit")
        ax[0][i].set_title(f"{xlabel} = {sorted_x[i]}")
        ax[0][i].legend()
        ax[0][i].grid()
        ax[1][i].plot(yaxis[s_ind[i] : e_ind[i]], np.squeeze(sorted_sqdev[i][s_ind[i] : e_ind[i]]))
        ax[1][i].set_ylabel("Square deviation")
        ax[1][i].grid()
    fig.savefig(os.path.join(td, f"lineouts_{tag}.png"), bbox_inches="tight")
    plt.close(fig)
