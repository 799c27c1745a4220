from .mesh import make_mesh
from .pipeline import pipelined_forward
from .sharding import (
    llama_param_specs,
    opt_param_specs,
    baichuan_param_specs,
    mixtral_param_specs,
    param_specs,
    shard_params,
    shard_kv_cache,
    kv_cache_specs,
)

__all__ = [
    "make_mesh",
    "pipelined_forward",
    "llama_param_specs",
    "opt_param_specs",
    "baichuan_param_specs",
    "mixtral_param_specs",
    "param_specs",
    "shard_params",
    "shard_kv_cache",
    "kv_cache_specs",
]
