"""Sharded serving: Engine and ContinuousEngine over a device mesh must
produce the same tokens as the single-device path (8-device CPU mesh, the
fake-backend strategy of SURVEY.md §4). This is the serving counterpart of
tests/test_sharding*.py — the engines themselves shard params, pool, and
per-request arrays (VERDICT r1 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.config import QuantConfig
from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig
from autosmoothquant_tpu.serve.batching import ContinuousEngine, Request
from autosmoothquant_tpu.shard import make_mesh

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def quantized():
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    qcfg = QuantConfig(type="int8")
    ones = jnp.ones((cfg.num_hidden_layers,), jnp.float32)
    scales = {k: ones * s for k, s in [
        ("attn_input_scale", 0.05), ("q_output_scale", 0.05),
        ("k_output_scale", 0.05), ("v_output_scale", 0.05),
        ("out_input_scale", 0.05), ("gate_input_scale", 0.05),
        ("down_input_scale", 0.05),
    ]}
    qparams = L.quantize(params, qcfg, scales)
    return cfg, qcfg, qparams


PROMPTS = [[5, 9, 2, 11, 42, 7], [100, 3], [17, 17, 4, 250, 9]]


def _reference_tokens(quantized, kv_dtype=jnp.float32):
    cfg, qcfg, qparams = quantized
    eng = Engine(L, qparams, cfg, qcfg, max_batch=4, max_seq=64,
                 kv_dtype=kv_dtype, compute_dtype=jnp.float32)
    return eng.generate(PROMPTS, GenerationConfig(max_new_tokens=8))


@pytest.mark.parametrize("data,model", [(2, 4), (1, 8), (8, 1)])
def test_engine_sharded_matches_single(quantized, data, model):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized
    expect = _reference_tokens(quantized)
    mesh = make_mesh(data=data, model=model)
    eng = Engine(L, qparams, cfg, qcfg, max_batch=8, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32, mesh=mesh)
    got = eng.generate(PROMPTS, GenerationConfig(max_new_tokens=8))
    assert got == expect


def test_engine_sharded_int8_kv(quantized):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized
    expect = _reference_tokens(quantized, kv_dtype=jnp.int8)
    mesh = make_mesh(data=2, model=4)
    eng = Engine(L, qparams, cfg, qcfg, max_batch=8, max_seq=64,
                 kv_dtype=jnp.int8, compute_dtype=jnp.float32, mesh=mesh)
    got = eng.generate(PROMPTS, GenerationConfig(max_new_tokens=8))
    assert got == expect


def test_engine_param_shardings_override(quantized):
    """Explicit param_shardings spec pytree takes precedence over the family
    default."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized
    from autosmoothquant_tpu.shard.sharding import llama_param_specs

    mesh = make_mesh(data=1, model=8)
    eng = Engine(L, qparams, cfg, qcfg, max_batch=4, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32, mesh=mesh,
                 param_shardings=llama_param_specs(cfg, mesh))
    got = eng.generate(PROMPTS, GenerationConfig(max_new_tokens=8))
    assert got == _reference_tokens(quantized)


def test_continuous_engine_sharded_matches_single(quantized):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized

    def run(mesh):
        eng = ContinuousEngine(L, qparams, cfg, qcfg, max_batch=2, max_seq=64,
                               compute_dtype=jnp.float32, kv_dtype=jnp.float32,
                               steps_per_sync=4, mesh=mesh)
        reqs = [Request(uid=i, prompt=p, max_new_tokens=8)
                for i, p in enumerate(PROMPTS)]
        return eng.run(reqs)

    single = run(None)
    sharded = run(make_mesh(data=1, model=8))
    assert sharded == single


def test_continuous_engine_sharded_int8_kv(quantized):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized
    mesh = make_mesh(data=1, model=8)
    eng = ContinuousEngine(L, qparams, cfg, qcfg, max_batch=2, max_seq=64,
                           compute_dtype=jnp.float32, kv_dtype=jnp.int8,
                           steps_per_sync=4, mesh=mesh)
    reqs = [Request(uid=i, prompt=p, max_new_tokens=8)
            for i, p in enumerate(PROMPTS)]
    out = eng.run(reqs)
    assert all(len(v) == 8 for v in out.values())


def test_engine_stage_sharded_matches_single(quantized):
    """Pipeline-stage placement: layers sharded over the 'stage' axis (the
    device_map='sequential' analog) must not change outputs; composes with
    TP on the model axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized
    expect = _reference_tokens(quantized)
    mesh = make_mesh(stage=2, data=1, model=4)
    eng = Engine(L, qparams, cfg, qcfg, max_batch=4, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32, mesh=mesh)
    got = eng.generate(PROMPTS, GenerationConfig(max_new_tokens=8))
    assert got == expect
    # params really are stage-sharded: a layer weight's sharding spans stage
    w = eng.params["layers"]["attn"]["q"]["w"]
    spec = w.sharding.spec
    assert spec[0] == "stage", spec


def test_stage_only_mesh(quantized):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized
    mesh = make_mesh(stage=2, data=1, model=1, devices=jax.devices()[:2])
    eng = Engine(L, qparams, cfg, qcfg, max_batch=4, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32, mesh=mesh)
    got = eng.generate(PROMPTS, GenerationConfig(max_new_tokens=8))
    assert got == _reference_tokens(quantized)


KERN = dict(
    vocab_size=256, hidden_size=256, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128,
)  # head_dim=64 so the flash-decode kernels' lane constraint holds


@pytest.fixture(scope="module")
def quantized_kern():
    cfg = L.LlamaConfig(**KERN)
    params = L.init_params(cfg, jax.random.PRNGKey(1))
    qcfg = QuantConfig(type="int8")
    ones = jnp.ones((cfg.num_hidden_layers,), jnp.float32)
    scales = {k: ones * s for k, s in [
        ("attn_input_scale", 0.05), ("q_output_scale", 0.05),
        ("k_output_scale", 0.05), ("v_output_scale", 0.05),
        ("out_input_scale", 0.05), ("gate_input_scale", 0.05),
        ("down_input_scale", 0.05),
    ]}
    return cfg, qcfg, L.quantize(params, qcfg, scales)


def test_engine_sharded_fused_block(quantized_kern, monkeypatch):
    """Force-mode fused add+norm+quant under a TP mesh (shard_mapped over
    the row dim) must match the single-device fused path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized_kern
    monkeypatch.setenv("ASQ_FUSED_BLOCK", "force")
    single = Engine(L, qparams, cfg, qcfg, max_batch=4, max_seq=64,
                    kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    expect = single.generate(PROMPTS, GenerationConfig(max_new_tokens=8))
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    eng = Engine(L, qparams, cfg, qcfg, max_batch=4, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32, mesh=mesh)
    got = eng.generate(PROMPTS, GenerationConfig(max_new_tokens=8))
    assert got == expect


def test_continuous_engine_sharded_chunked_prefill(quantized):
    """TP mesh + chunked prefill: the row slice-extend-writeback must
    preserve the pool's head sharding and outputs."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg, qcfg, qparams = quantized
    rng = np.random.default_rng(0)
    long_prompt = rng.integers(1, 250, size=50).tolist()

    def run(mesh, chunk):
        eng = ContinuousEngine(L, qparams, cfg, qcfg, max_batch=2, max_seq=64,
                               compute_dtype=jnp.float32, kv_dtype=jnp.float32,
                               steps_per_sync=4, mesh=mesh, prefill_chunk=chunk)
        reqs = [Request(uid=0, prompt=long_prompt, max_new_tokens=6),
                Request(uid=1, prompt=[5, 4, 3], max_new_tokens=6)]
        return eng.run(reqs)

    plain = run(None, None)
    sharded_chunked = run(make_mesh(data=1, model=8), 32)
    assert sharded_chunked == plain


def test_mixtral_continuous_engine_expert_tensor_sharded():
    """BASELINE config 5's executable stand-in: quantized Mixtral MoE served
    through the CONTINUOUS engine on an expert x tensor mesh — token
    equality with the unmeshed engine under slot churn."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from autosmoothquant_tpu.models import mixtral as M
    from autosmoothquant_tpu.serve.batching import ContinuousEngine

    cfg = M.MixtralConfig(vocab_size=128, hidden_size=64, intermediate_size=96,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, num_local_experts=4,
                          num_experts_per_tok=2, max_position_embeddings=128)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    ones = jnp.ones((cfg.num_hidden_layers,), jnp.float32)
    scales = {
        "attn_input_scale": ones * 0.05, "q_output_scale": ones * 0.05,
        "k_output_scale": ones * 0.05, "v_output_scale": ones * 0.05,
        "out_input_scale": ones * 0.05, "moe_input_scale": ones * 0.05,
        "down_input_scales": jnp.ones(
            (cfg.num_hidden_layers, cfg.num_local_experts), jnp.float32
        ) * 0.05,
    }
    qcfg = QuantConfig(type="int8")
    qparams = M.quantize(params, qcfg, scales)

    specs = [("a", [5, 9, 2, 11], 6), ("b", [100, 3], 6),
             ("c", [17, 17, 4], 5)]

    def run(mesh):
        eng = ContinuousEngine(M, qparams, cfg, qcfg, max_batch=2,
                               max_seq=64, kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32, mesh=mesh)
        for u, p, n in specs:
            eng.submit(u, list(p), max_new_tokens=n)
        return eng.run()

    want = run(None)
    got = run(make_mesh(data=1, expert=2, model=4))
    assert got == want


def test_mixtral_paged_engine_expert_tensor_sharded():
    """BASELINE config 5 on the PAGED engine (r3 verdict item 3): Mixtral
    MoE through block-paged continuous serving on an expert x tensor mesh,
    with copy-free prefix page sharing — token equality with unmeshed."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from autosmoothquant_tpu.models import mixtral as M
    from autosmoothquant_tpu.serve.paged import PagedEngine

    cfg = M.MixtralConfig(vocab_size=128, hidden_size=64, intermediate_size=96,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, num_local_experts=4,
                          num_experts_per_tok=2, max_position_embeddings=128)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    ones = jnp.ones((cfg.num_hidden_layers,), jnp.float32)
    scales = {
        "attn_input_scale": ones * 0.05, "q_output_scale": ones * 0.05,
        "k_output_scale": ones * 0.05, "v_output_scale": ones * 0.05,
        "out_input_scale": ones * 0.05, "moe_input_scale": ones * 0.05,
        "down_input_scales": jnp.ones(
            (cfg.num_hidden_layers, cfg.num_local_experts), jnp.float32
        ) * 0.05,
    }
    qcfg = QuantConfig(type="int8")
    qparams = M.quantize(params, qcfg, scales)

    sysp = [9, 8, 7, 6, 5, 4]
    specs = [("a", sysp + [5, 9, 2, 11], 6), ("b", sysp + [100, 3], 6),
             ("c", [17, 17, 4], 5)]

    def run(mesh):
        eng = PagedEngine(M, qparams, cfg, qcfg, max_batch=2,
                          max_seq=64, block_size=16, kv_dtype=jnp.float32,
                          compute_dtype=jnp.float32, mesh=mesh)
        eng.register_prefix("sys", sysp)
        for u, p, n in specs:
            eng.submit(u, list(p), max_new_tokens=n,
                       prefix="sys" if p[:len(sysp)] == sysp else None)
        return eng.run()

    want = run(None)
    got = run(make_mesh(data=1, expert=2, model=4))
    assert got == want
