"""autosmoothquant_tpu — a TPU-native SmoothQuant quantization + serving framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
AniZpZ/AutoSmoothQuant (reference at /root/reference, cited per-module as
``ref: file:line``): calibration-driven activation-scale capture, SmoothQuant
scale migration, and W8A8 (INT8 / FP8-e4m3 / FP8-e5m2) inference with
per-tensor or per-token activation granularity selected per projection through
the same ``quant_config.json`` contract as the reference.

Architecture (TPU-first, not a port):
  - ``kernels/``   Pallas MXU int8/fp8 matmul kernels with fused dequant epilogues
  - ``quant/``     pure-math quantization + SmoothQuant transforms over pytrees
  - ``models/``    functional model zoo (Llama, OPT, Baichuan, Mixtral)
  - ``calibrate/`` activation-scale capture via stats-returning forwards
  - ``convert/``   offline calibrate -> smooth -> quantize -> fold pipeline
  - ``shard/``     mesh + NamedSharding tensor/expert parallelism
  - ``serve/``     jitted prefill/decode generation engine with KV cache
  - ``eval/``      WikiText-2 perplexity + lm-eval adapters
"""

__version__ = "0.1.0"
