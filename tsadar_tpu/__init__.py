"""tsadar_tpu: TPU-native Thomson-scattering forward model and fitting framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
ergodicio/tsadar (mounted read-only at /root/reference), redesigned TPU-first:
direct plasma-dispersion-function kernels, vectorized pole integrals, batched
parameter pytrees, device-resident optimizers, and mesh-sharded whole-shot fits.

Package exports mirror the reference (``tsadar/__init__.py:1-3``).
"""

__version__ = "0.1.0"

from .core.diagnostic import ThomsonScatteringDiagnostic
from .core.params import ThomsonParams, get_filter_spec
from .utils.data_handling.calibration import get_scattering_angles


def run_for_app(run_id: str) -> str:
    from .runner import run_for_app as _run_for_app

    return _run_for_app(run_id)


__all__ = [
    "ThomsonScatteringDiagnostic",
    "ThomsonParams",
    "get_filter_spec",
    "get_scattering_angles",
    "run_for_app",
]
