"""Microbatched pipeline parallelism (shard/pipeline.py): the GPipe schedule
over the "stage" mesh axis must be numerically identical to the plain layer
scan, for every family, with and without quantization, composed with TP/DP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.shard import make_mesh, param_specs, shard_params
from autosmoothquant_tpu.shard.sharding import with_stage_axis
from autosmoothquant_tpu.shard.pipeline import pipelined_forward
from autosmoothquant_tpu.quant.config import QuantConfig


def _llama(l=4):
    from autosmoothquant_tpu.models import llama as M

    cfg = M.LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=l, num_attention_heads=8,
                        num_key_value_heads=4, max_position_embeddings=64)
    return M, "llama", cfg, M.init_params(cfg, jax.random.PRNGKey(0))


def _check(mod, family, cfg, params, qcfg=None, *, stage=4, data=1,
           model=None, b=8, t=12, microbatches=4, tol=1e-4):
    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, size=(b, t)))
    ref = np.asarray(mod.forward_jit(params, ids, cfg, qcfg)[0])
    mesh = make_mesh(data=data, model=model, stage=stage)
    specs = with_stage_axis(param_specs(family, cfg, mesh), mesh,
                            cfg.num_hidden_layers)
    sharded = shard_params(params, mesh, specs)
    got = np.asarray(pipelined_forward(mod, sharded, ids, cfg, qcfg,
                                       mesh=mesh, microbatches=microbatches))
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


def test_llama_pipeline_fp():
    mod, family, cfg, params = _llama()
    _check(mod, family, cfg, params, stage=4, model=2)


def test_llama_pipeline_int8():
    mod, family, cfg, params = _llama()
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 256, size=(2, 16)).astype(np.int32)
             for _ in range(2)]
    qcfg = QuantConfig(type="int8")
    qparams, _ = calibrate_smooth_quantize(mod, params, cfg, qcfg,
                                           lambda: iter(calib))
    _check(mod, family, cfg, qparams, qcfg, stage=2, data=2, model=2)


def test_llama_pipeline_more_microbatches_than_stages():
    mod, family, cfg, params = _llama()
    _check(mod, family, cfg, params, stage=2, model=4, microbatches=8, b=8)


def test_llama_pipeline_no_mesh():
    """Degenerate schedule (no mesh, 1 stage) still equals the plain scan."""
    mod, family, cfg, params = _llama()
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, size=(4, 8)))
    ref = np.asarray(mod.forward_jit(params, ids, cfg)[0])
    got = np.asarray(pipelined_forward(mod, params, ids, cfg,
                                       microbatches=2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_opt_pipeline():
    from autosmoothquant_tpu.models import opt as M

    cfg = M.OPTConfig(vocab_size=256, hidden_size=64, ffn_dim=128,
                      num_hidden_layers=4, num_attention_heads=8,
                      word_embed_proj_dim=64, max_position_embeddings=64)
    params = M.init_params(cfg, jax.random.PRNGKey(1))
    _check(M, "opt", cfg, params, stage=4, model=2)


def test_baichuan_alibi_pipeline():
    from autosmoothquant_tpu.models import baichuan as M

    # hidden_size below the 13B threshold still lets us force ALiBi
    cfg = M.BaichuanConfig(vocab_size=256, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=4,
                           num_attention_heads=8, model_max_length=64,
                           force_position_embedding="ALIBI")
    params = M.init_params(cfg, jax.random.PRNGKey(2))
    _check(M, "baichuan", cfg, params, stage=2, model=4)


def test_mixtral_pipeline():
    from autosmoothquant_tpu.models import mixtral as M

    cfg = M.MixtralConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=96, num_hidden_layers=4,
                          num_attention_heads=8, num_key_value_heads=4,
                          num_local_experts=4, max_position_embeddings=64)
    params = M.init_params(cfg, jax.random.PRNGKey(3))
    _check(M, "mixtral", cfg, params, stage=4, model=2)


def test_ppl_batched_and_pipelined_match_serial():
    """Batched-window and stage-pipelined perplexity must equal the serial
    per-window evaluation (identical math, incl. the ragged tail)."""
    from autosmoothquant_tpu.eval.ppl import perplexity_from_tokens

    mod, family, cfg, params = _llama()
    rng = np.random.default_rng(7)
    stream = rng.integers(0, 256, size=64 * 5).astype(np.int32)  # 5 windows
    ref = perplexity_from_tokens(mod, params, cfg, stream, max_length=64)
    batched = perplexity_from_tokens(mod, params, cfg, stream, max_length=64,
                                     batch_windows=2)
    assert abs(batched - ref) < 1e-3 * ref
    mesh = make_mesh(data=1, model=2, stage=4)
    specs = with_stage_axis(param_specs(family, cfg, mesh),
                            mesh, cfg.num_hidden_layers)
    sharded = shard_params(params, mesh, specs)
    piped = perplexity_from_tokens(mod, sharded, cfg, stream, max_length=64,
                                   mesh=mesh, microbatches=2,
                                   batch_windows=4)
    assert abs(piped - ref) < 1e-3 * ref
