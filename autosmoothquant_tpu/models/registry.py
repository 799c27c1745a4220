"""Architecture-string -> model-family registry.

ref: autosmoothquant/models/__init__.py:7-25 (_MODEL_REGISTRY/_MODEL_TYPE).
Here the registry maps HF `architectures` strings to this package's
functional model modules (each exposing config_from_hf / init / forward /
quantize helpers) instead of nn.Module classes.
"""

from __future__ import annotations

from typing import Dict

MODEL_REGISTRY: Dict[str, object] = {}
MODEL_TYPE: Dict[str, str] = {}


def register_model(arch: str, family: str, module) -> None:
    MODEL_REGISTRY[arch] = module
    MODEL_TYPE[arch] = family


def get_model_family(config) -> tuple:
    """config: HF PretrainedConfig or dict with `architectures`.
    ref: utils/utils.py:47-54 (get_model_architecture)."""
    architectures = (
        config.get("architectures", []) if isinstance(config, dict)
        else getattr(config, "architectures", [])
    ) or []
    for arch in architectures:
        # reference-produced quantized checkpoints carry the reference's
        # class names (QuantizedLlamaForCausalLM / Int8OPTForCausalLM / ...,
        # ref: save_pretrained writes config.architectures); strip the
        # quantization prefix back to the HF architecture
        for prefix in ("", "Quantized", "Int8"):
            if prefix and arch.startswith(prefix):
                arch = arch[len(prefix):]
            if arch in MODEL_REGISTRY:
                return MODEL_REGISTRY[arch], MODEL_TYPE[arch]
    raise ValueError(
        f"Model architectures {architectures} are not supported for now. "
        f"Supported architectures: {list(MODEL_REGISTRY.keys())}"
    )


def _autoload():
    # import for registration side effects
    from . import llama as _llama  # noqa: F401

    try:
        from . import gemma as _gemma  # noqa: F401
    except ImportError:
        pass
    try:
        from . import opt as _opt  # noqa: F401
    except ImportError:
        pass
    try:
        from . import baichuan as _baichuan  # noqa: F401
    except ImportError:
        pass
    try:
        from . import mixtral as _mixtral  # noqa: F401
    except ImportError:
        pass


_autoload()
