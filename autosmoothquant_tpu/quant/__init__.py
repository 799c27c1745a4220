from .config import QuantConfig, parse_quant_config, save_quant_config
from . import math as qmath
from .smooth import smooth_norm_fcs, smooth_params, SmoothGroup
from .ignore import match_ignore_patterns, DEFAULT_IGNORE

__all__ = [
    "QuantConfig",
    "parse_quant_config",
    "save_quant_config",
    "qmath",
    "smooth_norm_fcs",
    "smooth_params",
    "SmoothGroup",
    "match_ignore_patterns",
    "DEFAULT_IGNORE",
]
