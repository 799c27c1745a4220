from .tree import tree_get, tree_set, tree_update
from .seed import setup_seed

__all__ = ["tree_get", "tree_set", "tree_update", "setup_seed"]
