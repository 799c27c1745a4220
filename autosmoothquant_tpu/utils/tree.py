"""Small helpers for addressing nested-dict parameter pytrees by path.

Paths are tuples of keys, e.g. ("layers", "attn", "q"). Functional models in
this package keep params as plain nested dicts; these helpers give the
quantize/smooth passes a uniform way to read and functionally update leaves
without each model hand-rolling dict plumbing.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence, Tuple


def tree_get(tree: Mapping, path: Sequence[Any]):
    node = tree
    for key in path:
        node = node[key]
    return node


def tree_set(tree: Mapping, path: Sequence[Any], value) -> dict:
    """Return a copy of ``tree`` with the leaf at ``path`` replaced.
    Only the nodes along the path are copied (structural sharing)."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    new = dict(tree)
    new[head] = tree_set(tree[head], rest, value) if rest else value
    return new


def tree_update(tree: Mapping, updates: Sequence[Tuple[Sequence[Any], Any]]) -> dict:
    for path, value in updates:
        tree = tree_set(tree, path, value)
    return tree
