from .api import ServingAPI, serve
from .batching import ContinuousEngine, Request
from .engine import Engine, GenerationConfig
from .multihost import MultiHostEngine, ShardedServingPool
from .speculative import speculative_decode

__all__ = ["ContinuousEngine", "Engine", "GenerationConfig",
           "MultiHostEngine", "Request", "ServingAPI", "ShardedServingPool",
           "serve", "speculative_decode"]
