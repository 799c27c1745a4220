"""Layer ignore-pattern matching for fp8 quantization.

ref: quantize/calibration.py:259-278 (get_layers_to_ignore): patterns are
either literal module names or regexes prefixed with "re:"; the default CLI
pattern is "re:.*lm_head" (examples/smoothquant_model.py args). In this
framework lm_head is never quantized by construction; patterns remain useful
to exempt additional projections from fp8 conversion."""

from __future__ import annotations

import re
from typing import Iterable, List, Sequence


def match_ignore_patterns(names: Iterable[str],
                          patterns: Sequence[str]) -> List[str]:
    """Return the subset of ``names`` matching any pattern. "re:<regex>"
    patterns use re.match; other patterns match exactly."""
    out = []
    regexes = []
    literals = set()
    for p in patterns:
        if p.startswith("re:"):
            regexes.append(re.compile(p[len("re:"):]))
        else:
            literals.add(p)
    for name in names:
        if name in literals or any(r.match(name) for r in regexes):
            out.append(name)
    return out


DEFAULT_IGNORE = ("re:.*lm_head",)
