from .hf import load_hf_params, hf_config_dict
from .pipeline import calibrate_smooth_quantize, save_quantized, load_quantized

__all__ = [
    "load_hf_params",
    "hf_config_dict",
    "calibrate_smooth_quantize",
    "save_quantized",
    "load_quantized",
]
