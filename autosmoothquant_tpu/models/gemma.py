"""Gemma family: the llama functional module with load-time folds.

Gemma's deviations from llama all disappear before runtime:
  - RMSNorm computes x * (1 + w): the mapper stores w' = 1 + w, so the
    shared rms_norm (and the fused add+norm+quant kernel) apply unchanged
  - embeddings are scaled by sqrt(hidden): folded into embed.w at load
    (the TIED lm_head is built from the UNSCALED weights first)
  - explicit head_dim (= 256 for gemma-2b, not hidden/heads):
    LlamaConfig.head_dim_override
  - gelu-tanh MLP activation: LlamaConfig.hidden_act (the one runtime
    branch; the silu-fused MLP kernel gates itself off)

Everything else (forward, quantize, smooth, serving, sharding) is the
llama module verbatim.
"""

import sys as _sys

from .llama import *  # noqa: F401,F403
from .registry import register_model as _register

FAMILY = "gemma"

_register("GemmaForCausalLM", FAMILY, _sys.modules[__name__])
