from .registry import (
    MODEL_REGISTRY,
    MODEL_TYPE,
    get_model_family,
    register_model,
)

__all__ = ["MODEL_REGISTRY", "MODEL_TYPE", "get_model_family", "register_model"]
