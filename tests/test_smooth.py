"""SmoothQuant migration math vs NumPy oracle + the invariance property:
smoothing must not change the float function norm(x)*fc (SURVEY.md §4 level 1)."""

import numpy as np
import jax.numpy as jnp

from autosmoothquant_tpu.quant.smooth import (
    SmoothGroup,
    compute_smooth_scale,
    smooth_norm_fcs,
    smooth_params,
)


def rng(seed=0):
    return np.random.default_rng(seed)


def test_scale_formula_matches_reference():
    # s = clamp(act^a / clamp(colmax(|W|),1e-5)^(1-a), 1e-5); ref smooth.py:28-34
    d = 16
    act = np.abs(rng(0).normal(size=d)).astype(np.float32) + 0.1
    w1 = rng(1).normal(size=(d, 32)).astype(np.float32)
    w2 = rng(2).normal(size=(d, 32)).astype(np.float32)
    s = compute_smooth_scale(jnp.asarray(act), [jnp.asarray(w1), jnp.asarray(w2)], alpha=0.5)
    wmax = np.maximum(np.maximum(np.abs(w1).max(1), np.abs(w2).max(1)), 1e-5)
    expected = np.maximum(act**0.5 / wmax**0.5, 1e-5)
    np.testing.assert_allclose(np.asarray(s), expected, rtol=1e-5)


def test_smooth_preserves_function():
    """For RMSNorm: (x_normed * g/s) @ (s*W) == (x_normed * g) @ W."""
    d, out = 32, 24
    g = rng(3).normal(size=d).astype(np.float32)
    w = rng(4).normal(size=(d, out)).astype(np.float32)
    act = np.abs(rng(5).normal(size=d)).astype(np.float32) + 0.5
    new_g, (new_w,), _ = smooth_norm_fcs(jnp.asarray(g), [jnp.asarray(w)], jnp.asarray(act))
    x = rng(6).normal(size=(8, d)).astype(np.float32)
    before = (x * g) @ w
    after = (x * np.asarray(new_g)) @ np.asarray(new_w)
    np.testing.assert_allclose(after, before, rtol=2e-4, atol=2e-4)


def test_smooth_with_bias():
    # OPT LayerNorm path divides bias too (ref smooth.py:36-38)
    d = 8
    g = np.ones(d, np.float32)
    b = rng(7).normal(size=d).astype(np.float32)
    w = rng(8).normal(size=(d, 4)).astype(np.float32)
    act = np.abs(rng(9).normal(size=d)).astype(np.float32) + 0.5
    new_g, (new_w,), new_b = smooth_norm_fcs(
        jnp.asarray(g), [jnp.asarray(w)], jnp.asarray(act), norm_bias=jnp.asarray(b)
    )
    x = rng(10).normal(size=(4, d)).astype(np.float32)
    before = (x * g + b) @ w
    after = (x * np.asarray(new_g) + np.asarray(new_b)) @ np.asarray(new_w)
    np.testing.assert_allclose(after, before, rtol=2e-4, atol=2e-4)


def test_smooth_params_tree():
    d = 8
    params = {
        "ln": {"weight": jnp.ones(d, jnp.float32)},
        "attn": {"q": {"w": jnp.asarray(rng(11).normal(size=(d, 4)), jnp.float32)}},
    }
    scales = {"attn.q": np.abs(rng(12).normal(size=d)).astype(np.float32) + 0.3}
    groups = [
        SmoothGroup(
            norm_path=("ln", "weight"),
            fc_paths=((("attn", "q", "w"))[:],),
            scale_key="attn.q",
        )
    ]
    groups = [
        SmoothGroup(
            norm_path=("ln", "weight"),
            fc_paths=(("attn", "q", "w"),),
            scale_key="attn.q",
        )
    ]
    out = smooth_params(params, scales, groups)
    # function preserved
    x = rng(13).normal(size=(4, d)).astype(np.float32)
    before = (x * np.asarray(params["ln"]["weight"])) @ np.asarray(params["attn"]["q"]["w"])
    after = (x * np.asarray(out["ln"]["weight"])) @ np.asarray(out["attn"]["q"]["w"])
    np.testing.assert_allclose(after, before, rtol=2e-4, atol=2e-4)
    # original untouched (functional)
    np.testing.assert_array_equal(np.asarray(params["ln"]["weight"]), np.ones(d, np.float32))
