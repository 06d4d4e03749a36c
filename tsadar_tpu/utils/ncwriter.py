"""Minimal netCDF3 dataset writer (pure scipy, no xarray).

The reference writes its binary artifacts as xarray netCDFs
(``/root/reference/tsadar/utils/plotting/plotters.py:369-408, 472-502``,
``forward/calc_series.py:108-191``). xarray is not available here, but netCDF3
classic is writable with ``scipy.io.netcdf_file``; this shim covers the one
pattern the reference uses — a Dataset of same-shaped DataArrays over named
1-D coordinates — so downstream consumers of the reference's ``.nc`` artifacts
can read ours with the same tools (xarray/netCDF4/scipy all read netCDF3).
"""

import numpy as np
from scipy.io import netcdf_file


def write_dataset(path, variables, coords):
    """Write ``variables`` (name -> ndarray) over named ``coords`` to netCDF3.

    Args:
        path: output ``.nc`` filename.
        variables: mapping of variable name -> ndarray; every array must have
            one axis per entry of ``coords`` (in order).
        coords: sequence of ``(dim_name, 1-D values)`` pairs, ordered to match
            the variable axes (the xarray ``coords=`` convention).
    """
    coords = [(str(name), np.asarray(vals).ravel()) for name, vals in coords]
    dims = tuple(name for name, _ in coords)

    f = netcdf_file(path, "w")
    try:
        for name, vals in coords:
            f.createDimension(name, len(vals))
            var = f.createVariable(name, "f8", (name,))
            var[:] = np.asarray(vals, np.float64)
        for name, arr in variables.items():
            arr = np.asarray(arr, np.float64)
            expected = tuple(len(vals) for _, vals in coords)
            if arr.shape != expected:
                raise ValueError(
                    f"variable {name!r} has shape {arr.shape}, expected {expected} from coords {dims}"
                )
            var = f.createVariable(str(name), "f8", dims)
            var[:] = arr
    finally:
        f.close()


def read_dataset(path):
    """Read back a netCDF3 file as (variables dict, coords dict) of ndarrays."""
    f = netcdf_file(path, "r", mmap=False)
    try:
        dims = set(f.dimensions)
        coords = {k: np.array(v[:]) for k, v in f.variables.items() if k in dims}
        variables = {k: np.array(v[:]) for k, v in f.variables.items() if k not in dims}
        return variables, coords
    finally:
        f.close()
