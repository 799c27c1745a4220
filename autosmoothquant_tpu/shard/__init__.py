from .mesh import make_mesh
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
    "llama_param_specs",
    "opt_param_specs",
    "baichuan_param_specs",
    "mixtral_param_specs",
    "param_specs",
    "shard_params",
    "shard_kv_cache",
    "kv_cache_specs",
]
