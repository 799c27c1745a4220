"""Fused QKV / gate-up decode layout: outputs must match the unfused path
for float, int8 per-tensor, int8 per-token."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.config import QuantConfig

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(2, 16)))
    return cfg, params, ids


def test_float_fused_matches(setup):
    cfg, params, ids = setup
    fused = L.fuse_decode_projections(params)
    assert "qkv" in fused["layers"]["attn"] and "gateup" in fused["layers"]["mlp"]
    a = np.asarray(L.forward_jit(params, ids, cfg)[0])
    b = np.asarray(L.forward_jit(fused, ids, cfg)[0])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gran", ["per-tensor", "per-token"])
def test_int8_fused_matches(setup, gran):
    cfg, params, ids = setup
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    qcfg = QuantConfig(type="int8", qkv=gran, out=gran, fc1=gran, fc2=gran)
    qparams, _ = calibrate_smooth_quantize(L, params, cfg, qcfg,
                                           lambda: [np.asarray(ids)])
    fused = L.fuse_decode_projections(qparams)
    assert fused["layers"]["attn"]["qkv"]["w"].dtype == jnp.int8
    assert fused["layers"]["attn"]["qkv"]["dequant_scale"].shape == (
        cfg.num_hidden_layers,
        (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * cfg.head_dim)
    a = np.asarray(L.forward_jit(qparams, ids, cfg, qcfg)[0])
    b = np.asarray(L.forward_jit(fused, ids, cfg, qcfg)[0])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_decode_with_cache(setup):
    cfg, params, ids = setup
    fused = L.fuse_decode_projections(params)
    step = jax.jit(lambda p, i, c, idx: L.forward(
        p, i, cfg, kv_cache=c, cache_index=idx)[:2])
    c1 = L.init_kv_cache(cfg, 2, 32, jnp.float32)
    c2 = L.init_kv_cache(cfg, 2, 32, jnp.float32)
    h1, c1 = step(params, ids[:, :8], c1, 0)
    h2, c2 = step(fused, ids[:, :8], c2, 0)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)
    h1, _ = step(params, ids[:, 8:9], c1, 8)
    h2, _ = step(fused, ids[:, 8:9], c2, 8)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)


def test_engine_auto_fuses_single_device():
    """Engines fuse q|k|v and gate|up automatically off-mesh; outputs match
    the explicitly-unfused engine."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=128)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    p = np.random.default_rng(0).integers(1, 128, size=9).tolist()
    auto = Engine(L, params, cfg, max_batch=1, max_seq=64,
                  kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    assert "qkv" in auto.params["layers"]["attn"]
    assert "gateup" in auto.params["layers"]["mlp"]
    plain = Engine(L, params, cfg, max_batch=1, max_seq=64,
                   kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                   fuse_projections=False)
    assert "qkv" not in plain.params["layers"]["attn"]
    gc = GenerationConfig(max_new_tokens=8)
    assert auto.generate([p], gc) == plain.generate([p], gc)


def test_engine_keeps_unfused_under_tp():
    import jax
    import jax.numpy as jnp
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.serve.engine import Engine
    from autosmoothquant_tpu.shard import make_mesh

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=128)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(L, params, cfg, max_batch=8, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                 mesh=make_mesh(data=2, model=4))
    assert "qkv" not in eng.params["layers"]["attn"]


def test_fusion_skips_fp8_static_and_stage_mesh():
    """Auto-fusion must not drop fp8-static observer scales, and must not
    fuse under a stage mesh (default specs only know unfused keys)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.serve.engine import maybe_fuse_projections

    cfg = L.LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=64)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    # fake fp8-static markers
    params["layers"]["attn"]["q"]["input_scale"] = jnp.ones((2,))
    out = maybe_fuse_projections(L, params, None, None)
    assert "qkv" not in out["layers"]["attn"]
    with pytest.raises(AssertionError, match="fp8-static"):
        maybe_fuse_projections(L, params, None, True)

    if len(jax.devices()) >= 8:
        from autosmoothquant_tpu.shard import make_mesh

        clean = L.init_params(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(data=1, model=1, stage=2,
                         devices=jax.devices()[:2]) if hasattr(
                             make_mesh, "__call__") else None
        try:
            mesh = make_mesh(stage=2, data=1, model=1,
                             devices=jax.devices()[:2])
        except TypeError:
            mesh = None
        if mesh is not None:
            out2 = maybe_fuse_projections(L, clean, mesh, None)
            assert "qkv" not in out2["layers"]["attn"]


def test_engine_stop_values_share_one_compile():
    """Distinct stop tuples are host-only and must not recompile the decode
    scan (the device config strips them)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=128)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(L, params, cfg, max_batch=1, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    p = np.random.default_rng(0).integers(1, 128, size=9).tolist()
    eng.generate([p], GenerationConfig(max_new_tokens=6, stop=((5, 6),)))
    eng.generate([p], GenerationConfig(max_new_tokens=6, stop=((7,),),
                                       eos_token_id=3))
    assert len(eng._decode) == 1
