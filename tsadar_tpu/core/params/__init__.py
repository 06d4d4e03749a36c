from .module import (
    module,
    static_field,
    partition,
    combine,
    filter_spec_by_path,
    apply_updates,
)
from .ts_params import ThomsonParams, get_filter_spec
from .distributions import (
    Maxwellian1V,
    DLM1V,
    Arbitrary1V,
    Arbitrary2V,
    velocity_grid,
    second_order_butterworth,
)
from .spherical import SphericalHarmonics

__all__ = [
    "module",
    "static_field",
    "partition",
    "combine",
    "filter_spec_by_path",
    "apply_updates",
    "ThomsonParams",
    "get_filter_spec",
    "Maxwellian1V",
    "DLM1V",
    "Arbitrary1V",
    "Arbitrary2V",
    "SphericalHarmonics",
    "velocity_grid",
    "second_order_butterworth",
]
