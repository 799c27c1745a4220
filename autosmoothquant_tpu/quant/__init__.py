from .config import QuantConfig, parse_quant_config
from . import math as qmath
from .smooth import smooth_norm_fcs, smooth_params

__all__ = [
    "QuantConfig",
    "parse_quant_config",
    "qmath",
    "smooth_norm_fcs",
    "smooth_params",
]
