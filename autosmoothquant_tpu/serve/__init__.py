from .batching import ContinuousEngine, Request
from .engine import Engine, GenerationConfig
from .multihost import MultiHostEngine, ShardedServingPool

__all__ = ["ContinuousEngine", "Engine", "GenerationConfig",
           "MultiHostEngine", "Request", "ShardedServingPool"]
