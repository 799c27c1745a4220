"""The quant_config.json data contract, kept byte-compatible with the
reference (ref: README.md:28-41, utils/utils.py:35-39,
examples/smoothquant_model.py:65-70).

Keys:
  qkv / out / fc1 / fc2 : "per-tensor" | "per-token"   (activation granularity
                           per projection group)
  type                  : "int8" | "fp8" (alias of fp8_e4m3) | "fp8_e4m3"
                          | "fp8_e5m2"
  activation_scheme     : "static" | "dynamic"          (fp8 only)
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

PER_TENSOR = "per-tensor"
PER_TOKEN = "per-token"
_GRANULARITIES = (PER_TENSOR, PER_TOKEN)
_TYPES = ("int8", "fp8_e4m3", "fp8_e5m2", "int4")
_SCHEMES = ("static", "dynamic")


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Validated, hashable view of a quant_config dict (hashable so it can be
    a static argument to jit'd model apply functions)."""

    qkv: str = PER_TENSOR
    out: str = PER_TENSOR
    fc1: str = PER_TENSOR
    fc2: str = PER_TENSOR
    type: str = "int8"
    activation_scheme: str = "dynamic"
    # int4 (weight-only W4A16, beyond the reference) extension: consecutive
    # input rows sharing one symmetric scale per output column
    group_size: int = 128

    def __post_init__(self):
        for field in ("qkv", "out", "fc1", "fc2"):
            v = getattr(self, field)
            if v not in _GRANULARITIES:
                raise ValueError(f"quant_config[{field!r}]={v!r}; expected one of {_GRANULARITIES}")
        if self.type not in _TYPES:
            raise ValueError(f"quant_config['type']={self.type!r}; expected one of {_TYPES}")
        if self.activation_scheme not in _SCHEMES:
            raise ValueError(
                f"quant_config['activation_scheme']={self.activation_scheme!r}; "
                f"expected one of {_SCHEMES}"
            )
        if self.type == "fp8_e4m3" and self.activation_scheme == "static":
            # ref: models/llama.py:262-266 — fp8 static supports per-tensor only
            for field in ("qkv", "out", "fc1", "fc2"):
                if getattr(self, field) != PER_TENSOR:
                    raise ValueError("fp8_e4m3 static supports per-tensor only")
        if self.type == "fp8_e5m2":
            # ref: models/llama.py:247-251 — e5m2 is scale-free per-tensor only
            for field in ("qkv", "out", "fc1", "fc2"):
                if getattr(self, field) != PER_TENSOR:
                    raise ValueError("fp8_e5m2 supports per-tensor only")
        if not (isinstance(self.group_size, int) and self.group_size > 0
                and self.group_size % 2 == 0):
            raise ValueError(f"group_size={self.group_size!r}; expected a "
                             "positive even int")

    @classmethod
    def from_dict(cls, d: Dict[str, Any], default_type: str = "int8",
                  default_scheme: str = "dynamic") -> "QuantConfig":
        """Normalize a raw dict the way the reference CLI does
        (ref: smoothquant_model.py:65-70): default `type`/`activation_scheme`
        when absent, and alias "fp8" -> "fp8_e4m3"."""
        d = dict(d)
        if "type" not in d:
            d["type"] = default_type
        if "activation_scheme" not in d:
            d["activation_scheme"] = default_scheme
        if d["type"] == "fp8":
            d["type"] = "fp8_e4m3"
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def to_dict(self) -> Dict[str, str]:
        d = dataclasses.asdict(self)
        if self.type != "int4":
            # keep the serialized contract byte-compatible with the
            # reference for every type it knows about
            d.pop("group_size")
        return d

    def granularity(self, proj: str) -> str:
        """proj in {qkv, out, fc1, fc2}."""
        return getattr(self, proj)

    @property
    def is_int8(self) -> bool:
        return self.type == "int8"

    @property
    def is_int4(self) -> bool:
        return self.type == "int4"

    @property
    def is_fp8(self) -> bool:
        return self.type in ("fp8_e4m3", "fp8_e5m2")

    @property
    def fp8_dtype(self):
        import jax.numpy as jnp

        if self.type == "fp8_e4m3":
            return jnp.float8_e4m3fn
        if self.type == "fp8_e5m2":
            return jnp.float8_e5m2
        raise ValueError(f"not an fp8 config: {self.type}")


def parse_quant_config(path: str) -> QuantConfig:
    """Load + normalize quant_config.json. ref: utils/utils.py:35-39."""
    with open(path, "r", encoding="utf-8") as f:
        return QuantConfig.from_dict(json.load(f))


def save_quant_config(cfg: QuantConfig, path: str) -> None:
    """ref: smoothquant_model.py:97-99."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(cfg.to_dict(), f, indent=4)
