from .mesh import make_mesh
from .sharding import llama_param_specs, shard_params, kv_cache_specs

__all__ = ["make_mesh", "llama_param_specs", "shard_params", "kv_cache_specs"]
