"""netCDF artifact parity: ncwriter round trip, TScmap, and the data-vs-fit
plot/dataset set the reference's postprocess produces (reference
plotters.py:450-569, 935-957; calc_series.py:150-191)."""

import os

import numpy as np
import pytest

from tsadar_tpu.utils.ncwriter import write_dataset, read_dataset
from tsadar_tpu.utils.plotting.plotters import TScmap, plot_2D_data_vs_fit, plot_ts_data


def test_ncwriter_round_trip(tmp_path):
    path = str(tmp_path / "ds.nc")
    x = np.linspace(0.0, 10.0, 5)
    y = np.linspace(400.0, 700.0, 7)
    fit = np.arange(35.0).reshape(5, 7)
    write_dataset(path, {"fit": fit, "data": 2 * fit}, [("Time (ps)", x), ("Wavelength", y)])
    variables, coords = read_dataset(path)
    np.testing.assert_array_equal(variables["fit"], fit)
    np.testing.assert_array_equal(variables["data"], 2 * fit)
    np.testing.assert_allclose(coords["Time (ps)"], x)
    np.testing.assert_allclose(coords["Wavelength"], y)


def test_ncwriter_shape_mismatch_raises(tmp_path):
    with pytest.raises(ValueError, match="shape"):
        write_dataset(
            str(tmp_path / "bad.nc"), {"v": np.zeros((3, 4))}, [("a", np.arange(4)), ("b", np.arange(3))]
        )


def test_tscmap_white_foot():
    cmap = TScmap()
    assert cmap.N == 256 + 16
    np.testing.assert_allclose(cmap(0), (1.0, 1.0, 1.0, 1.0))  # zero renders white
    jet0 = np.asarray(cmap(16))
    assert jet0[2] > 0.4 and jet0[0] < 0.2  # start of jet is blue


def _artifact_dirs(tmp_path):
    for d in ("plots", "binary"):
        os.makedirs(tmp_path / d, exist_ok=True)
    return str(tmp_path)


def test_plot_2d_data_vs_fit_writes_png(tmp_path):
    td = _artifact_dirs(tmp_path)
    x, y = np.meshgrid(np.arange(6.0), np.linspace(400, 700, 8))
    data = np.random.default_rng(0).uniform(size=(8, 6))
    cfg = {"plotting": {"data_cbar_l": "data", "data_cbar_u": "data"}}
    plot_2D_data_vs_fit(cfg, x, y, data, 0.9 * data, td, name="fit_and_data.png")
    assert os.path.exists(os.path.join(td, "plots", "fit_and_data.png"))


def test_plot_ts_data_produces_reference_artifact_set(tmp_path):
    td = _artifact_dirs(tmp_path)
    n_lineouts, npts = 4, 16
    rng = np.random.default_rng(1)
    data = rng.uniform(0.5, 1.0, (n_lineouts, npts))
    fits = {"ele": {"total_spec": 0.95 * data}, "ion": np.zeros((1, 1))}
    pix = np.arange(100, 100 + n_lineouts)
    config = {"data": {"lineouts": {"pixelE": pix}}, "plotting": {}}
    all_axes = {
        "epw_x": np.linspace(-500.0, 500.0, 256),
        "epw_y": np.linspace(400.0, 700.0, npts),
        "x_label": "Time (ps)",
    }
    all_data = {"e_data": data, "i_data": np.zeros((1, 1))}

    plot_ts_data(config, fits, all_data, all_axes, td)

    assert os.path.exists(os.path.join(td, "binary", "ele_fit_and_data.nc"))
    assert os.path.exists(os.path.join(td, "plots", "fit_and_data_ele.png"))
    variables, coords = read_dataset(os.path.join(td, "binary", "ele_fit_and_data.nc"))
    np.testing.assert_allclose(variables["data"], data)
    np.testing.assert_allclose(coords["Time (ps)"], all_axes["epw_x"][pix])


def test_axis_for_lineout_indexes_per_lineout_rows():
    """The detailed-breakdown axis store must return EACH lineout's own
    wavelength axis when lam is fitted per-lineout (advisor finding: the
    component overlay used lineout 0's axis for every pick)."""
    from tsadar_tpu.utils.plotting.plotters import _axis_for_lineout

    axes = np.stack([np.linspace(400 + 10 * i, 700 + 10 * i, 8) for i in range(3)])
    # dict form keyed by batch indices (the postprocess producer)
    store = {(4, 5, 6): axes}
    np.testing.assert_array_equal(_axis_for_lineout(store, 5), axes[1])
    np.testing.assert_array_equal(_axis_for_lineout(store, 6), axes[2])
    assert _axis_for_lineout(store, 99) is None
    # legacy single-array form: batched rows index by global lineout
    np.testing.assert_array_equal(_axis_for_lineout(axes, 2), axes[2])
    np.testing.assert_array_equal(_axis_for_lineout(axes[0], 2), axes[0])  # shared axis
    assert _axis_for_lineout(axes, 7) is None  # out of range -> skip overlay, not row 0
    assert _axis_for_lineout(None, 0) is None
