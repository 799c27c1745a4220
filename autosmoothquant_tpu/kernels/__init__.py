from .gemm import (
    int8_matmul,
    int8_matmul_xla,
    w8a8_linear_int8,
    fp8_matmul,
)

__all__ = [
    "int8_matmul",
    "int8_matmul_xla",
    "w8a8_linear_int8",
    "fp8_matmul",
]
