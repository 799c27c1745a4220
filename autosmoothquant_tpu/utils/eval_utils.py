"""Eval misc helpers. ref: utils/eval_utils.py:9-23 (pattern_match,
update_results)."""

from __future__ import annotations

import fnmatch
from typing import Dict, Iterable, List


def pattern_match(patterns: Iterable[str], source_list: Iterable[str]) -> List[str]:
    """fnmatch task-name expansion (ref: eval_utils.py:9-15)."""
    names = set()
    for pattern in patterns:
        for name in fnmatch.filter(source_list, pattern):
            names.add(name)
    return sorted(names)


def update_results(results: Dict, new_result: Dict) -> Dict:
    """Merge nested result dicts (ref: eval_utils.py:17-23)."""
    for key, value in new_result.items():
        if key in results and isinstance(results[key], dict) \
                and isinstance(value, dict):
            update_results(results[key], value)
        else:
            results[key] = value
    return results
