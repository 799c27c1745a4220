from .gemm import (
    int8_matmul,
    int8_matmul_xla,
    w8a8_linear_int8,
    fp8_matmul,
)
from .attention import flash_attention, flash_supported
from .fused import fused_add_rmsnorm_quant, fused_add_layernorm_quant

__all__ = [
    "int8_matmul",
    "int8_matmul_xla",
    "w8a8_linear_int8",
    "fp8_matmul",
    "flash_attention",
    "flash_supported",
    "fused_add_rmsnorm_quant",
    "fused_add_layernorm_quant",
]
