"""Runtime flag object (autosmoothquant_tpu/runtime.py): env seeding,
programmatic override, and that gates actually read it (one-process A/B
replacing the fork-per-arm env-var dance)."""

import numpy as np
import jax
import jax.numpy as jnp

from autosmoothquant_tpu import runtime


def test_env_seeds_flags(monkeypatch):
    monkeypatch.setenv("ASQ_INT8_BACKEND", "xla")
    monkeypatch.setenv("ASQ_MOE", "sparse")
    monkeypatch.setenv("ASQ_NO_FLASH", "1")
    f = runtime.Flags.from_env()
    assert f.int8_backend == "xla" and f.moe == "sparse" and f.no_flash


def test_set_flags_rejects_unknown():
    import pytest

    with pytest.raises(AttributeError, match="unknown flag"):
        runtime.set_flags(nonsense="on")


def test_override_restores():
    f = runtime.flags()
    before = f.moe
    with runtime.override(clear_caches=False, moe="dense") as g:
        assert g.moe == "dense" and runtime.flags().moe == "dense"
    assert runtime.flags().moe == before


def test_one_process_ab_changes_traced_behavior():
    """The flag must steer behavior across an override WITHOUT a process
    fork: Mixtral's expert path takes the dense vs sparse branch at trace
    time; both arms run in this one process and agree numerically."""
    from autosmoothquant_tpu.models import mixtral as M
    from autosmoothquant_tpu.quant.config import QuantConfig

    cfg = M.MixtralConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                          num_hidden_layers=1, num_attention_heads=2,
                          num_key_value_heads=1, num_local_experts=2,
                          num_experts_per_tok=1,
                          max_position_embeddings=64)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, size=(1, 8)),
                      jnp.int32)
    outs = {}
    for mode in ("dense", "sparse"):
        with runtime.override(moe=mode):
            h, _, _ = M.forward(params, ids, cfg, None)
            outs[mode] = np.asarray(M.logits(params, h))
    np.testing.assert_allclose(outs["dense"], outs["sparse"],
                               rtol=1e-5, atol=1e-5)


def test_gemm_backend_flag_is_live():
    """int8_matmul consults flags().int8_backend at call time (regression:
    it used to snapshot the env var at import)."""
    from autosmoothquant_tpu.kernels import gemm

    x = jnp.ones((8, 128), jnp.int8)
    w = jnp.ones((128, 128), jnp.int8)
    with runtime.override(clear_caches=False, int8_backend="xla"):
        a = np.asarray(gemm.int8_matmul(x, w))
    # off-TPU "pallas" still falls back to XLA (no TPU) but must not crash
    with runtime.override(clear_caches=False, int8_backend="pallas"):
        b = np.asarray(gemm.int8_matmul(x, w))
    np.testing.assert_array_equal(a, b)
