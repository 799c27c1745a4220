from .api import ServingAPI, serve
from .batching import ContinuousEngine
from .paged import PagedEngine, Request
from .engine import Engine, GenerationConfig
from .multihost import MultiHostEngine, ShardedServingPool
from .speculative import speculative_decode

__all__ = ["ContinuousEngine", "PagedEngine", "Engine", "GenerationConfig",
           "MultiHostEngine", "Request", "ServingAPI", "ShardedServingPool",
           "serve", "speculative_decode"]
