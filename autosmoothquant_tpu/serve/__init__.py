from .engine import Engine, GenerationConfig

__all__ = ["Engine", "GenerationConfig"]
