"""Native-accelerated checkpoint loading (safetensors) via csrc/asq_io.cc.

The analog of the reference's packaging of a native extension alongside the
Python package (ref: setup.py:4-27 builds autosmoothquant._CUDA) — here the
native layer accelerates host I/O (mmap + threaded copy/prefault) instead of
GEMMs, which live in Pallas/XLA. Falls back to the pure-Python safetensors
reader when the shared library isn't built (``make -C csrc``).
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
from typing import Any, Dict, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "_native", "libasq_io.so")

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}
# bf16/fp8 need ml_dtypes (always present as a jax dep)
try:
    import ml_dtypes

    _DTYPES.update({
        "BF16": ml_dtypes.bfloat16,
        "F8_E4M3": ml_dtypes.float8_e4m3fn,
        "F8_E5M2": ml_dtypes.float8_e5m2,
    })
except ImportError:  # pragma: no cover
    pass


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.asq_open.restype = ctypes.c_void_p
    lib.asq_open.argtypes = [ctypes.c_char_p]
    lib.asq_size.restype = ctypes.c_int64
    lib.asq_size.argtypes = [ctypes.c_void_p]
    lib.asq_data.restype = ctypes.c_void_p
    lib.asq_data.argtypes = [ctypes.c_void_p]
    lib.asq_read.restype = ctypes.c_int
    lib.asq_read.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_void_p, ctypes.c_int]
    lib.asq_prefault.restype = None
    lib.asq_prefault.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int]
    lib.asq_close.restype = None
    lib.asq_close.argtypes = [ctypes.c_void_p]
    return lib


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


def load_safetensors(path: str, nthreads: int = 8) -> Dict[str, np.ndarray]:
    """Read every tensor of a .safetensors file into fresh numpy arrays.
    Uses the native mmap + threaded copy when built; pure-Python otherwise."""
    if _LIB is None:
        return _load_safetensors_py(path)
    h = _LIB.asq_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        total = _LIB.asq_size(h)
        if total < 8:
            raise ValueError(f"{path}: not a safetensors file")
        hdr_len_buf = (ctypes.c_char * 8)()
        _LIB.asq_read(h, 0, 8, hdr_len_buf, 1)
        (hdr_len,) = struct.unpack("<Q", bytes(hdr_len_buf))
        hdr_buf = ctypes.create_string_buffer(hdr_len)
        _LIB.asq_read(h, 8, hdr_len, hdr_buf, 1)
        header = json.loads(hdr_buf.raw.decode("utf-8"))
        data_off = 8 + hdr_len
        _LIB.asq_prefault(h, data_off, total - data_off, nthreads)
        out: Dict[str, np.ndarray] = {}
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            dtype = _DTYPES[meta["dtype"]]
            shape = tuple(meta["shape"])
            begin, end = meta["data_offsets"]
            arr = np.empty(shape, dtype)
            nbytes = end - begin
            assert arr.nbytes == nbytes, (name, arr.nbytes, nbytes)
            if nbytes:
                rc = _LIB.asq_read(h, data_off + begin, nbytes,
                                   arr.ctypes.data_as(ctypes.c_void_p), nthreads)
                if rc != 0:
                    raise IOError(f"read failed for tensor {name!r}")
            out[name] = arr
        return out
    finally:
        _LIB.asq_close(h)


def _load_safetensors_py(path: str) -> Dict[str, np.ndarray]:
    """Self-contained safetensors reader (mmap + frombuffer). The
    ``safetensors`` package's numpy framework cannot represent fp8 tensors
    (``np.float8_e4m3fn`` does not exist — fp8 checkpoints saved by this
    framework or the reference would fail to load through it), so the
    fallback parses the trivial format directly with ml_dtypes."""
    import mmap

    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            (hdr_len,) = struct.unpack("<Q", mm[:8])
            header = json.loads(mm[8:8 + hdr_len].decode("utf-8"))
            data_off = 8 + hdr_len
            for name, meta in header.items():
                if name == "__metadata__":
                    continue
                dtype = np.dtype(_DTYPES[meta["dtype"]])
                shape = tuple(meta["shape"])
                begin, end = meta["data_offsets"]
                count = (end - begin) // dtype.itemsize
                # copy in one expression: a named frombuffer view would
                # still hold a buffer export at mm.close() -> BufferError
                out[name] = np.frombuffer(
                    mm, dtype=dtype, count=count,
                    offset=data_off + begin).reshape(shape).copy()
        finally:
            mm.close()
    return out


def save_safetensors(path: str, tensors: Dict[str, np.ndarray],
                     metadata: Optional[Dict[str, str]] = None) -> None:
    """Minimal safetensors writer (numpy only; bf16/fp8 via ml_dtypes)."""
    rev = {v: k for k, v in _DTYPES.items()}
    header: Dict[str, Any] = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        code = rev.get(arr.dtype.type)
        if code is None:
            raise TypeError(f"unsupported dtype {arr.dtype} for {name!r}")
        header[name] = {"dtype": code, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + arr.nbytes]}
        offset += arr.nbytes
        blobs.append(arr.tobytes())
    if metadata:
        header["__metadata__"] = metadata
    hdr = json.dumps(header).encode()
    pad = (8 - len(hdr) % 8) % 8
    hdr += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        for b in blobs:
            f.write(b)
