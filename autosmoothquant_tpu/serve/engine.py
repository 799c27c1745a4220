"""Generation engine: jitted prefill + single-jit scan decode.

The reference drives generation through HF GenerationMixin (one Python-level
forward per token, ref: examples/test_model.py:51). On TPU, per-step host
dispatch costs ~30-80ms through the runtime, so the whole decode loop runs
on-device inside ONE jitted ``lax.scan`` — tokens stream back only at the
end. Left-padding aligns ragged prompts so every sequence's next slot is
identical; kv_valid masks the pad slots out of attention.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..quant.config import QuantConfig


def mesh_context(mesh):
    """Ambient-mesh context for the jitted stages: under ``set_mesh`` the
    functional model code can see the mesh (models/common.ambient_mesh) and
    shard_map its Pallas kernels per-shard instead of falling back to the
    XLA attention/norm paths."""
    if mesh is None:
        return contextlib.nullcontext()
    return jax.sharding.set_mesh(mesh)


@dataclasses.dataclass
class DraftModel:
    """A cheaper model driving draft-model speculative decoding (fewer
    layers, int4 weights, a distilled checkpoint — any family member with
    the same vocab). Verification keeps outputs bit-identical to plain
    greedy decoding of the target, so the draft is purely a throughput
    knob (serve/speculative.py:speculative_decode_draft)."""

    model: object
    params: object
    cfg: object
    qcfg: Optional[QuantConfig] = None
    compute_dtype: object = None    # defaults to the engine's
    kv_dtype: object = None         # defaults to the engine's


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 20
    temperature: float = 0.0  # 0 => greedy (test_model.py uses greedy)
    top_k: int = 0            # 0 => no top-k filter
    top_p: float = 1.0        # 1 => no nucleus filter
    repetition_penalty: float = 1.0  # 1 => off (HF convention; applies to
    # greedy too — seen tokens' positive logits divide, negative multiply)
    eos_token_id: Optional[int] = None
    # multi-token stop sequences as a TUPLE OF TUPLES of token ids (the
    # config is a static jit argument, so it must stay hashable); output is
    # truncated at the first occurrence, stop tokens stripped
    stop: Optional[tuple] = None
    # also return each emitted token's RAW-model log-probability (the chosen
    # token's log_softmax of the unmodified logits — before temperature/
    # filters/penalty, OpenAI-style)
    return_logprobs: bool = False
    # speculative decoding (greedy only): draft length per verify step and
    # the prompt-lookup match length; 0 disables (serve/speculative.py)
    speculative_gamma: int = 0
    speculative_ngram: int = 3


def _sample(logits_f32, key, gen_cfg: GenerationConfig):
    """logits [B, V] -> token ids [B] (serve/sampling.py, static config)."""
    from .sampling import sample

    return sample(logits_f32, key, gen_cfg.temperature, gen_cfg.top_k,
                  gen_cfg.top_p)


def maybe_fuse_projections(model_mod, params, mesh, fuse,
                           param_shardings=None):
    """Auto-apply the family's decode projection fusion (q|k|v, gate|up —
    4 GEMMs/layer instead of 7) for single-device / data-parallel serving.
    fuse: None = auto, False = never, True = require (asserts fusable).

    Auto skips fusion when: any param-sharding mesh axis is active (model/
    stage/expert — fused sections shard unevenly over TP, and the default
    spec rules only know the unfused keys, so fused weights would silently
    fall through to full replication); the caller passed explicit
    param_shardings (built for the given layout); or the params carry
    fp8-static observer scales (fuse_decode_projections keeps only
    w/dequant_scale/w_scale — frozen input/output scales would be dropped
    and activations silently re-quantized dynamically)."""
    fuser = getattr(model_mod, "fuse_decode_projections", None)
    if fuse is False or fuser is None:
        return params
    attn = params.get("layers", {}).get("attn", {})
    if "qkv" in attn:
        return params  # already fused
    sharded_axes = mesh is not None and any(
        n > 1 for ax, n in dict(mesh.shape).items() if ax != "data")
    static_fp8 = "input_scale" in attn.get("q", {})
    blocker = (("param-sharding mesh axes" if sharded_axes else None)
               or ("explicit param_shardings" if param_shardings is not None
                   else None)
               or ("fp8-static observer scales" if static_fp8 else None))
    if blocker:
        assert fuse is not True, f"fused projections incompatible: {blocker}"
        return params
    return fuser(params)


def _truncate_at_stop(row, stop):
    """Cut at the FIRST occurrence of any stop sequence (stop stripped)."""
    cut = len(row)
    for s in stop:
        s = list(s)
        if not s:
            continue
        for j in range(len(row) - len(s) + 1):
            if row[j:j + len(s)] == s:
                cut = min(cut, j)
                break
    return row[:cut]


class Engine:
    """Generation engine over a functional model family — single-chip or
    sharded over a ``jax.sharding.Mesh``.

    model_mod: models/<family>.py module (forward/logits/init_kv_cache).
    params: float or quantized pytree; qcfg selects the quantized path.

    mesh: optional Mesh with axes data (DP over the batch) and model (TP over
    heads/ffn/vocab; XLA inserts the psums on row-parallel outputs). Params
    are placed with the family's NamedSharding specs at construction; the KV
    cache and every per-request array are sharded in generate(). This is the
    serving analog of the TP/DP plan in SURVEY.md §2.6 (the reference has no
    parallel serving at all — accelerate device_map only, utils/utils.py:43).
    param_shardings: optional spec pytree overriding the family default.
    """

    def __init__(self, model_mod, params, cfg, qcfg: Optional[QuantConfig] = None,
                 *, max_batch: int = 8, max_seq: int = 2048,
                 kv_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                 mesh=None, param_shardings=None, fuse_projections=None,
                 draft: Optional[DraftModel] = None):
        params = maybe_fuse_projections(model_mod, params, mesh,
                                        fuse_projections, param_shardings)
        self.model = model_mod
        self.cfg = cfg
        self.qcfg = qcfg
        self.max_batch = max_batch
        self.max_seq = max_seq
        self.kv_dtype = kv_dtype
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self._prefill = {}
        self._decode = {}
        self._spec = {}
        self._dprefill = {}
        self.draft = draft
        if draft is not None:
            assert draft.cfg.vocab_size == cfg.vocab_size, (
                "draft model must share the target's vocab")
            draft.params = maybe_fuse_projections(
                draft.model, draft.params, mesh, fuse_projections, None)
            if draft.compute_dtype is None:
                draft.compute_dtype = compute_dtype
            if draft.kv_dtype is None:
                draft.kv_dtype = kv_dtype
        if mesh is not None:
            from ..shard.sharding import (
                param_specs as _family_specs, shard_params, with_stage_axis)

            specs = param_shardings
            if specs is None:
                specs = _family_specs(model_mod.FAMILY, cfg, mesh)
                specs = with_stage_axis(specs, mesh, cfg.num_hidden_layers)
            self.params = shard_params(params, mesh, specs)
            if draft is not None:
                dspecs = _family_specs(draft.model.FAMILY, draft.cfg, mesh)
                dspecs = with_stage_axis(dspecs, mesh,
                                         draft.cfg.num_hidden_layers)
                draft.params = shard_params(draft.params, mesh, dspecs)
            self._dp = mesh.shape.get("data", 1)
            assert max_batch % self._dp == 0, (
                f"max_batch={max_batch} must divide the data axis ({self._dp})")
        else:
            self.params = params
            self._dp = 1

    def _put(self, x, spec):
        """Device-put a host array with a per-axis mesh spec (replicated when
        no mesh)."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    # -- jitted stages ------------------------------------------------------

    def _prefill_fn(self, prompt_len: int, padded: bool = True):
        """Left-pad validity rides ``pad_starts`` (valid keys = col >=
        pad_b), not a kv_valid mask — both the unpadded (chunk0) and ragged
        (banded-with-starts) prefills then take the flash kernels instead of
        eager whole-cache attention."""
        key = (prompt_len, padded)
        if key not in self._prefill:
            model, cfg, qcfg, cdt = self.model, self.cfg, self.qcfg, self.compute_dtype

            @jax.jit
            def prefill(params, ids, positions, pads, cache):
                h, cache, _ = model.forward(
                    params, ids, cfg, qcfg, kv_cache=cache, cache_index=0,
                    pad_starts=pads if padded else None,
                    positions=positions, compute_dtype=cdt)
                logits = model.logits(params, h[:, -1:, :])[:, 0]
                return logits, cache

            self._prefill[key] = prefill
        return self._prefill[key]

    def _decode_fn(self, num_steps: int):
        key_cfg = num_steps
        if key_cfg not in self._decode:
            model, cfg, qcfg, cdt = self.model, self.cfg, self.qcfg, self.compute_dtype

            @functools.partial(jax.jit, static_argnames=("gen_cfg",))
            def decode(params, first_logits, cache, kv_valid, start_slot,
                       pad_lens, rng_key, seen, gen_cfg: GenerationConfig):
                rp = gen_cfg.repetition_penalty
                rows = jnp.arange(seen.shape[0])
                rp_vec = jnp.full((seen.shape[0],), rp, jnp.float32)

                def pick(logits, key, seen):
                    raw = logits
                    if rp != 1.0:
                        from .sampling import apply_repetition_penalty

                        logits = apply_repetition_penalty(logits, seen, rp_vec)
                    tok = _sample(logits, key, gen_cfg)
                    if rp != 1.0:
                        seen = seen.at[rows, tok].set(True)
                    if gen_cfg.return_logprobs:
                        lsm = jax.nn.log_softmax(raw.astype(jnp.float32), -1)
                        lp = jnp.take_along_axis(lsm, tok[:, None], 1)[:, 0]
                    else:
                        lp = jnp.zeros(tok.shape, jnp.float32)
                    return tok, seen, lp

                def step(carry, key):
                    tok, cache, kv_valid, slot, seen = carry
                    positions = (slot - pad_lens)[:, None]
                    kv_valid = kv_valid.at[:, slot].set(True)
                    h, cache, _ = model.forward(
                        params, tok[:, None], cfg, qcfg, kv_cache=cache,
                        cache_index=slot, kv_valid=kv_valid,
                        positions=positions, compute_dtype=cdt)
                    logits = model.logits(params, h)[:, 0]
                    next_tok, seen, lp = pick(logits, key, seen)
                    return ((next_tok, cache, kv_valid, slot + 1, seen),
                            (next_tok, lp))

                key0, key_rest = jax.random.split(rng_key)
                tok0, seen, lp0 = pick(first_logits, key0, seen)
                keys = jax.random.split(key_rest, num_steps)
                (_, cache, kv_valid, _, _), (ys, lps) = jax.lax.scan(
                    step, (tok0, cache, kv_valid, start_slot, seen), keys)
                all_toks = jnp.concatenate([tok0[:, None], ys.T], axis=1)
                all_lps = jnp.concatenate([lp0[:, None], lps.T], axis=1)
                return all_toks, all_lps, cache, kv_valid

            self._decode[key_cfg] = decode
        return self._decode[key_cfg]

    def _spec_fn(self, max_new: int, gamma: int, ngram: int):
        key = (max_new, gamma, ngram)
        if key not in self._spec:
            from .speculative import speculative_decode

            model, cfg, qcfg, cdt = (self.model, self.cfg, self.qcfg,
                                     self.compute_dtype)

            @jax.jit
            def spec(params, cache, history, start_lens, pad_lens):
                return speculative_decode(
                    model, params, cfg, qcfg, cache, history, start_lens,
                    pad_lens, max_new=max_new, gamma=gamma, ngram=ngram,
                    compute_dtype=cdt)

            self._spec[key] = spec
        return self._spec[key]

    def _draft_prefill_fn(self, prompt_len: int, padded: bool):
        """Prefill of the DRAFT model's cache over the same padded prompt
        layout as the target's (its logits are unused — the first emitted
        token comes from the target prefill)."""
        key = (prompt_len, padded)
        if key not in self._dprefill:
            d = self.draft

            @jax.jit
            def dprefill(dparams, ids, positions, pads, dcache):
                _, dcache, _ = d.model.forward(
                    dparams, ids, d.cfg, d.qcfg, kv_cache=dcache,
                    cache_index=0, pad_starts=pads if padded else None,
                    positions=positions, compute_dtype=d.compute_dtype)
                return dcache

            self._dprefill[key] = dprefill
        return self._dprefill[key]

    def _spec_draft_fn(self, max_new: int, gamma: int):
        key = ("draft", max_new, gamma)
        if key not in self._spec:
            from .speculative import speculative_decode_draft

            model, cfg, qcfg, cdt = (self.model, self.cfg, self.qcfg,
                                     self.compute_dtype)
            d = self.draft

            @jax.jit
            def spec(params, dparams, cache, dcache, history, start_lens,
                     pad_lens):
                return speculative_decode_draft(
                    model, params, cfg, qcfg, cache,
                    d.model, dparams, d.cfg, d.qcfg, dcache,
                    history, start_lens, pad_lens, max_new=max_new,
                    gamma=gamma, compute_dtype=cdt,
                    draft_compute_dtype=d.compute_dtype)

            self._spec[key] = spec
        return self._spec[key]

    # -- public API ---------------------------------------------------------

    def generate(self, prompts: Sequence[Sequence[int]],
                 gen_cfg: Optional[GenerationConfig] = None,
                 seed: int = 0) -> List[List[int]]:
        """Greedy/sampled continuation for a batch of ragged prompts.
        Returns new tokens per prompt (eos-truncated if configured)."""
        gen_cfg = gen_cfg or GenerationConfig()
        n_real = len(prompts)
        assert n_real <= self.max_batch
        # pad the batch to a data-axis multiple so DP sharding divides evenly
        # (padded rows replicate prompt 0 and are dropped from the results)
        prompts = list(prompts)
        while len(prompts) % self._dp:
            prompts.append(list(prompts[0]))
        b = len(prompts)
        max_len = max(len(p) for p in prompts)
        # capacity guard: cache writes past max_seq would be silently clamped/
        # dropped by dynamic_update_slice / the kv_valid scatter, corrupting
        # generation instead of erroring
        # speculative decoding is plain-greedy only (sampling, repetition
        # penalty, and logprob returns fall back to the scan decode)
        spec = gen_cfg.speculative_gamma if (
            gen_cfg.temperature == 0.0
            and gen_cfg.repetition_penalty == 1.0
            and not gen_cfg.return_logprobs) else 0
        if max_len + gen_cfg.max_new_tokens + spec > self.max_seq:
            raise ValueError(
                f"prompt ({max_len} tokens) + max_new_tokens "
                f"({gen_cfg.max_new_tokens}) (+ speculative window {spec}) "
                f"exceeds max_seq={self.max_seq}; "
                "truncate the prompt or raise max_seq")
        # left-pad to common length so every sequence's next slot == max_len
        ids = np.zeros((b, max_len), np.int32)
        pad_lens = np.zeros((b,), np.int32)
        valid = np.zeros((b, self.max_seq), bool)
        for i, p in enumerate(prompts):
            pad = max_len - len(p)
            ids[i, pad:] = p
            pad_lens[i] = pad
            valid[i, pad:max_len] = True
        positions = np.maximum(
            np.arange(max_len, dtype=np.int32)[None, :] - pad_lens[:, None], 0)

        cache = self.model.init_kv_cache(self.cfg, b, self.max_seq, self.kv_dtype)
        if self.mesh is not None:
            from ..shard.sharding import shard_kv_cache

            cache = shard_kv_cache(cache, self.mesh, self.cfg)
        dp = "data" if self._dp > 1 else None
        with mesh_context(self.mesh):
            first_logits, cache = self._prefill_fn(
                max_len, padded=bool(pad_lens.max() > 0))(
                self.params, self._put(ids, P(dp, None)),
                self._put(positions, P(dp, None)),
                self._put(pad_lens, P(dp)), cache)

            n = gen_cfg.max_new_tokens
            # host-only fields (stop/eos truncation, speculative selection)
            # must not vary the static decode config: each distinct value
            # would recompile the whole multi-step scan
            dev_cfg = dataclasses.replace(
                gen_cfg, stop=None, eos_token_id=None,
                speculative_gamma=0)
            lps = None
            if spec > 0:
                # greedy-exact speculative decode: history holds the padded
                # prompt + the first generated token at slot max_len
                history = jnp.zeros((b, self.max_seq), jnp.int32)
                history = jax.lax.dynamic_update_slice(
                    history, self._put(ids, P(dp, None)), (0, 0))
                tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
                history = history.at[:, max_len].set(tok0)
                if self.draft is not None:
                    d = self.draft
                    dcache = d.model.init_kv_cache(
                        d.cfg, b, self.max_seq, d.kv_dtype)
                    if self.mesh is not None:
                        from ..shard.sharding import shard_kv_cache

                        dcache = shard_kv_cache(dcache, self.mesh, d.cfg)
                    dcache = self._draft_prefill_fn(
                        max_len, padded=bool(pad_lens.max() > 0))(
                        d.params, self._put(ids, P(dp, None)),
                        self._put(positions, P(dp, None)),
                        self._put(pad_lens, P(dp)), dcache)
                    toks, spec_stats = self._spec_draft_fn(n, spec)(
                        self.params, d.params, cache, dcache, history,
                        jnp.full((b,), max_len, jnp.int32),
                        self._put(pad_lens, P(dp)))
                    # [verify rounds, accepted draft tokens] telemetry
                    self.last_spec_stats = np.asarray(
                        jax.device_get(spec_stats)).tolist()
                else:
                    toks = self._spec_fn(n, spec, gen_cfg.speculative_ngram)(
                        self.params, cache, history,
                        jnp.full((b,), max_len, jnp.int32),
                        self._put(pad_lens, P(dp)))
            else:
                if gen_cfg.repetition_penalty != 1.0:
                    seen = np.zeros((b, self.cfg.vocab_size), bool)
                    for i, p in enumerate(prompts):
                        seen[i, list(p)] = True
                else:
                    seen = np.zeros((b, 1), bool)  # dummy (rp is static)
                toks, lps, _, _ = self._decode_fn(n - 1)(
                    self.params, first_logits, cache,
                    self._put(valid, P(dp, None)),
                    jnp.int32(max_len), self._put(pad_lens, P(dp)),
                    jax.random.PRNGKey(seed), self._put(seen, P(dp, None)),
                    dev_cfg)
        out = np.asarray(jax.device_get(toks))
        out_lps = (np.asarray(jax.device_get(lps))
                   if (spec == 0 and gen_cfg.return_logprobs) else None)
        results = []
        for i in range(n_real):
            row = out[i].tolist()
            if gen_cfg.eos_token_id is not None and gen_cfg.eos_token_id in row:
                row = row[: row.index(gen_cfg.eos_token_id)]
            if gen_cfg.stop:
                row = _truncate_at_stop(row, gen_cfg.stop)
            if out_lps is not None:
                results.append((row, out_lps[i, :len(row)].tolist()))
            else:
                results.append(row)
        return results
