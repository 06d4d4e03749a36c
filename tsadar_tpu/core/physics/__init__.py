from .zprime import dawsn, zprime, zprimeMaxw
from .ratint import ratintn, ratcen, pv_integral
from .interp import interp1d_linear, interp1d_cubic, interp2d_cubic

__all__ = [
    "dawsn",
    "zprime",
    "zprimeMaxw",
    "ratintn",
    "ratcen",
    "pv_integral",
    "interp1d_linear",
    "interp1d_cubic",
    "interp2d_cubic",
]
