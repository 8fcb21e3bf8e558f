"""Jitted autoregressive generation with KV cache.

TPU-native replacement for the reference's ``model.generate`` calls
(tools/eval_longbench.py:337-353, tools/time_func.py:49-58):

  - prompt prefill is right-padded to a 128-multiple bucket so the prefill
    kernel compiles once per bucket, not once per prompt length;
  - the decode step takes the cache index as a traced scalar -> ONE compile
    per cache-size bucket regardless of position;
  - pad slots beyond the live prefix are naturally excluded by the causal mask
    (a query at absolute position t attends keys <= t; stale pad entries sit
    at indices > t until overwritten by generated tokens).

The reference evaluates greedily everywhere (do_sample=False) — Generator is
the parity surface; SamplingGenerator (temperature / top-k / nucleus) and the
int8 KV cache option are beyond-reference serving extensions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import (
    ModelPlan,
    Params,
    default_plan,
    init_kv_cache,
    prefill,
    decode_step,
)

_PREFILL_BUCKET = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Generator:
    """Caches jitted prefill/decode closures per (bucket, cache_len).

    device_loop=True (default) runs the whole decode inside ONE jitted
    lax.while_loop — a single host->TPU dispatch for the entire continuation
    instead of one per token (the per-token python loop is dispatch-latency
    bound: measured 20 tok/s vs hundreds with the device loop on v5e).
    """

    def __init__(self, params: Params, config: ModelConfig, plan: Optional[ModelPlan] = None,
                 device_loop: bool = True, quantized_kv: bool = False):
        self.params = params
        self.config = config
        self.plan = plan or default_plan(config)
        self.device_loop = device_loop
        # int8 KV cache (models.llama.init_kv_cache quantized=True): ~half the
        # KV HBM traffic — the decode bottleneck at long context
        self.quantized_kv = quantized_kv
        self._prefill_fns: Dict[Tuple[int, int], any] = {}
        self._decode_fns: Dict[int, any] = {}
        self._loop_fns: Dict[Tuple[int, int], any] = {}

    def _get_prefill(self, s_pad: int, cache_len: int):
        key = (s_pad, cache_len)
        if key not in self._prefill_fns:
            config, plan = self.config, self.plan

            @jax.jit
            def fn(params, ids, cache):
                return prefill(params, ids, cache, config=config, plan=plan)

            self._prefill_fns[key] = fn
        return self._prefill_fns[key]

    def _get_decode(self, cache_len: int):
        if cache_len not in self._decode_fns:
            config, plan = self.config, self.plan

            @jax.jit
            def fn(params, tok, cache, idx):
                return decode_step(params, tok, cache, idx, config=config, plan=plan)

            self._decode_fns[cache_len] = fn
        return self._decode_fns[cache_len]

    def _get_loop(self, cache_len: int, max_new: int):
        key = (cache_len, max_new)
        if key not in self._loop_fns:
            config, plan = self.config, self.plan

            @jax.jit
            def fn(params, first_tok, start_idx, cache, stop_ids, min_new):
                """Decode up to max_new tokens in one on-device while_loop.

                stop_ids: [4] int32 (pad with -1). Emitted tokens land in a
                fixed [max_new] buffer (-1 padded); a stop token is not emitted.
                """
                out0 = jnp.full((max_new,), -1, jnp.int32)

                def is_stop(tok, n_emitted):
                    return jnp.any(tok == stop_ids) & (n_emitted >= min_new)

                def cond(state):
                    t_rel, tok, cache, out, done = state
                    return (~done) & (t_rel < max_new)

                def body(state):
                    t_rel, tok, cache, out, done = state
                    out = out.at[t_rel].set(tok)
                    logits, cache = decode_step(
                        params, tok[None, None], cache, start_idx + t_rel,
                        config=config, plan=plan,
                    )
                    nxt = jnp.argmax(logits[0, 0]).astype(jnp.int32)
                    return t_rel + 1, nxt, cache, out, is_stop(nxt, t_rel + 1)

                init_done = is_stop(first_tok, 0)
                t_rel, _, _, out, _ = jax.lax.while_loop(
                    cond, body, (jnp.asarray(0, jnp.int32), first_tok, cache, out0, init_done)
                )
                return out, t_rel

            self._loop_fns[key] = fn
        return self._loop_fns[key]

    def greedy(
        self,
        prompt_ids: np.ndarray,
        max_new_tokens: int,
        eos_token_id: Optional[int] = None,
        min_new_tokens: int = 0,
        extra_stop_ids: Optional[List[int]] = None,
    ) -> List[int]:
        """Generate greedily from a single prompt ([S] or [1, S]); returns new ids."""
        ids = np.asarray(prompt_ids).reshape(1, -1).astype(np.int32)
        s = ids.shape[1]
        s_pad = _round_up(max(s, 1), _PREFILL_BUCKET)
        cache_len = _round_up(s + max_new_tokens, _PREFILL_BUCKET)

        padded = np.zeros((1, s_pad), np.int32)
        padded[0, :s] = ids[0]

        cache = init_kv_cache(self.config, batch=1, max_len=cache_len, quantized=self.quantized_kv)
        logits, cache = self._get_prefill(s_pad, cache_len)(self.params, jnp.asarray(padded), cache)
        next_tok = int(jnp.argmax(logits[0, s - 1]))

        if self.device_loop:
            stop = [eos_token_id] if eos_token_id is not None else []
            stop += list(extra_stop_ids or [])
            stop = (stop + [-1] * 4)[:4]
            out, n = self._get_loop(cache_len, max_new_tokens)(
                self.params,
                jnp.asarray(next_tok, jnp.int32),
                jnp.asarray(s, jnp.int32),
                cache,
                jnp.asarray(stop, jnp.int32),
                jnp.asarray(min_new_tokens, jnp.int32),
            )
            n = int(n)
            return np.asarray(out)[:n].tolist()

        return self._python_loop(s, cache_len, next_tok, cache,
                                 set([eos_token_id] if eos_token_id is not None else []) | set(extra_stop_ids or []),
                                 max_new_tokens, min_new_tokens)

    def _python_loop(self, s, cache_len, next_tok, cache, stops, max_new_tokens, min_new_tokens):
        """python-loop fallback (debugging / reference semantics)."""
        out = [next_tok]
        decode = self._get_decode(cache_len)
        tok = jnp.asarray([[next_tok]], jnp.int32)
        for t in range(s, s + max_new_tokens - 1):
            if next_tok in stops and len(out) > min_new_tokens:
                out.pop()  # do not include the stop token
                return out
            logits, cache = decode(self.params, tok, cache, jnp.asarray(t, jnp.int32))
            next_tok = int(jnp.argmax(logits[0, 0]))
            out.append(next_tok)
            tok = jnp.asarray([[next_tok]], jnp.int32)
        if out and out[-1] in stops:
            out.pop()
        return out


    # ------------------------------------------------------------------
    # batched generation (left-padded prompts, per-row stop tracking)
    # ------------------------------------------------------------------

    def _get_batch_loop(self, batch: int, s_pad: int, cache_len: int, max_new: int):
        key = ("batch", batch, s_pad, cache_len, max_new)
        if key not in self._loop_fns:
            config, plan = self.config, self.plan

            @jax.jit
            def fn(params, first_toks, lens, cache, length_mask, stop_ids, min_new):
                """first_toks: [B], lens: [B] real prompt lengths.

                Generated tokens occupy cache slots s_pad + t; RoPE position of
                row b at step t is lens[b] + t (rows are right-aligned)."""
                out0 = jnp.full((batch, max_new), -1, jnp.int32)

                def is_stop(toks, n_emitted):
                    return jnp.any(toks[:, None] == stop_ids[None, :], axis=1) & (n_emitted >= min_new)

                def cond(state):
                    t, toks, cache, out, done = state
                    return (t < max_new) & (~jnp.all(done))

                def body(state):
                    t, toks, cache, out, done = state
                    out = out.at[:, t].set(jnp.where(done, -1, toks))
                    positions = (lens + t)[:, None]
                    logits, cache = decode_step(
                        params, toks[:, None], cache, jnp.asarray(s_pad, jnp.int32) + t,
                        config=config, plan=plan, length_mask=length_mask,
                        positions=positions,
                    )
                    nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                    done_next = done | is_stop(nxt, t + 1)
                    return t + 1, nxt, cache, out, done_next

                init_done = is_stop(first_toks, 0)
                _, _, _, out, _ = jax.lax.while_loop(
                    cond, body, (jnp.asarray(0, jnp.int32), first_toks, cache, out0, init_done)
                )
                return out

            self._loop_fns[key] = fn
        return self._loop_fns[key]

    def greedy_batch(
        self,
        prompts: List[np.ndarray],
        max_new_tokens: int,
        eos_token_id: Optional[int] = None,
        min_new_tokens: int = 0,
        pad_token_id: int = 0,
    ) -> List[List[int]]:
        """Batched greedy generation over variable-length prompts.

        Prompts are LEFT-padded to a common bucket so every row's last real
        token sits in the same slot; per-row RoPE positions start at 0 at each
        row's first real token, and pad slots are masked out of attention.
        The whole continuation decodes in one on-device while_loop.
        """
        b = len(prompts)
        lens = np.asarray([len(np.asarray(p).reshape(-1)) for p in prompts], np.int32)
        max_len = int(lens.max())
        s_pad = _round_up(max_len, _PREFILL_BUCKET)
        cache_len = _round_up(s_pad + max_new_tokens, _PREFILL_BUCKET)

        padded = np.full((b, s_pad), pad_token_id, np.int32)
        positions = np.zeros((b, s_pad), np.int32)
        length_mask = np.zeros((b, cache_len), np.int32)
        length_mask[:, s_pad:] = 1  # generated slots (causality guards the future)
        for i, p in enumerate(prompts):
            ids = np.asarray(p).reshape(-1).astype(np.int32)
            padded[i, s_pad - lens[i]:] = ids
            positions[i, s_pad - lens[i]:] = np.arange(lens[i])
            length_mask[i, s_pad - lens[i]: s_pad] = 1

        cache = init_kv_cache(self.config, batch=b, max_len=cache_len, quantized=self.quantized_kv)
        key = ("bprefill", b, s_pad, cache_len)
        if key not in self._prefill_fns:
            config, plan = self.config, self.plan

            @jax.jit
            def pf(params, ids, cache, length_mask, positions):
                return prefill(params, ids, cache, config=config, plan=plan,
                               length_mask=length_mask, positions=positions)

            self._prefill_fns[key] = pf
        logits, cache = self._prefill_fns[key](
            self.params, jnp.asarray(padded), cache, jnp.asarray(length_mask), jnp.asarray(positions)
        )
        first_toks = jnp.argmax(logits[:, s_pad - 1], axis=-1).astype(jnp.int32)

        stop = ([eos_token_id] if eos_token_id is not None else []) + [-1] * 4
        out = self._get_batch_loop(b, s_pad, cache_len, max_new_tokens)(
            self.params, first_toks, jnp.asarray(lens), cache,
            jnp.asarray(length_mask), jnp.asarray(stop[:4], jnp.int32),
            jnp.asarray(min_new_tokens, jnp.int32),
        )
        out = np.asarray(out)
        results = []
        for i in range(b):
            row = out[i]
            stop_at = np.where(row < 0)[0]
            results.append(row[: stop_at[0]].tolist() if len(stop_at) else row.tolist())
        return results


def topk_topp_filter(
    scaled: jax.Array, ks: jax.Array, top_ps: jax.Array, max_k: int,
    min_ps: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched HF-semantics top-k / nucleus / min-p filter — THE single
    filtering implementation (filter_logits and the paged per-request sampler
    both route here, so semantics cannot drift between serving paths).

    scaled: [B, V] temperature-scaled logits. ks: [B] per-row k (traced;
    0 = no top-k; capped by static max_k, which sizes lax.top_k). top_ps: [B]
    per-row nucleus threshold — keep the smallest prefix of the
    descending-prob distribution covering top_p, always at least one token
    (tokens whose cumulative mass EXCLUDING themselves is already >= top_p
    drop). min_ps (optional, [B], 0 = off): drop tokens whose probability is
    below min_p * max-token-probability, HF MinPLogitsWarper semantics and
    order (temperature -> top_k -> top_p -> min_p; the top token itself
    always survives). Filtered entries become -inf.
    """
    neg = jnp.finfo(jnp.float32).min
    scaled = scaled.astype(jnp.float32)
    vals = jax.lax.top_k(scaled, max_k)[0]  # [B, max_k] descending
    kth = jnp.take_along_axis(vals, jnp.clip(ks[:, None] - 1, 0, max_k - 1), axis=1)
    filt = jnp.where((ks[:, None] > 0) & (scaled < kth), neg, scaled)
    # nucleus: drop tokens whose preceding cumulative mass already covers top_p
    order = jnp.argsort(-filt, axis=-1)
    sorted_l = jnp.take_along_axis(filt, order, axis=-1)
    probs = jax.nn.softmax(sorted_l, axis=-1)
    drop_sorted = (jnp.cumsum(probs, axis=-1) - probs) >= top_ps[:, None]
    inv = jnp.argsort(order, axis=-1)  # scatter the mask back to vocab order
    drop = jnp.take_along_axis(drop_sorted, inv, axis=-1)
    out = jnp.where(drop, neg, filt)
    if min_ps is not None:
        p = jax.nn.softmax(out, axis=-1)
        low = p < min_ps[:, None] * p.max(axis=-1, keepdims=True)
        keep_top = out >= out.max(axis=-1, keepdims=True)  # min_tokens_to_keep=1
        out = jnp.where(low & ~keep_top & (min_ps[:, None] > 0), neg, out)
    return out


def filter_logits(logits: jax.Array, top_k: int, top_p: jax.Array,
                  min_p: jax.Array = 0.0) -> jax.Array:
    """Top-k / nucleus (top-p) / min-p filtering with HF semantics, static
    top_k (0 = off; min_p 0 = off, an fp-exact no-op). Beyond-reference: the
    reference decodes greedily everywhere (do_sample=False); this is the
    serving-side sampler."""
    b, v = logits.shape
    active = 0 < top_k < v
    ks = jnp.full((b,), top_k if active else 0, jnp.int32)
    tps = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
    mps = jnp.broadcast_to(jnp.asarray(min_p, jnp.float32), (b,))
    return topk_topp_filter(logits, ks, tps, max_k=top_k if active else 1,
                            min_ps=mps)


class SamplingGenerator(Generator):
    """Stochastic generation: temperature / top-k / nucleus sampling.

    Same one-dispatch design as the greedy path: the whole continuation runs
    in one jitted lax.while_loop threading a PRNG key (fold_in per step).
    temperature == 0 reduces to greedy argmax.
    """

    def _get_sample_loop(self, cache_len: int, max_new: int, top_k: int, greedy: bool):
        key_ = ("sample", cache_len, max_new, top_k, greedy)
        if key_ not in self._loop_fns:
            config, plan = self.config, self.plan

            @jax.jit
            def fn(params, rng, first_logits, start_idx, cache, stop_ids,
                   temperature, top_p, min_p):
                out0 = jnp.full((max_new,), -1, jnp.int32)

                def pick(logits, step_rng):
                    if greedy:
                        return jnp.argmax(logits).astype(jnp.int32)
                    filt = filter_logits(logits[None, :] / temperature, top_k,
                                         top_p, min_p)
                    return jax.random.categorical(step_rng, filt[0]).astype(jnp.int32)

                def cond(state):
                    t_rel, tok, cache, out, done = state
                    return (~done) & (t_rel < max_new)

                def body(state):
                    t_rel, tok, cache, out, done = state
                    out = out.at[t_rel].set(tok)
                    logits, cache2 = decode_step(
                        params, tok[None, None], cache, start_idx + t_rel,
                        config=config, plan=plan,
                    )
                    nxt = pick(logits[0, 0], jax.random.fold_in(rng, t_rel + 1))
                    return t_rel + 1, nxt, cache2, out, jnp.any(nxt == stop_ids)

                first = pick(first_logits, jax.random.fold_in(rng, 0))
                t_rel, _, _, out, _ = jax.lax.while_loop(
                    cond, body,
                    (jnp.asarray(0, jnp.int32), first, cache, out0,
                     jnp.any(first == stop_ids)),
                )
                return out, t_rel

            self._loop_fns[key_] = fn
        return self._loop_fns[key_]

    def sample(
        self,
        prompt_ids: np.ndarray,
        max_new_tokens: int,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        eos_token_id: Optional[int] = None,
        min_p: float = 0.0,
    ) -> List[int]:
        """Sample a continuation; temperature=0 (or top_k=1) is exact greedy.
        min_p drops tokens below min_p x the top token's probability (HF
        MinPLogitsWarper semantics, applied after top-k/top-p; 0 = off)."""
        ids = np.asarray(prompt_ids).reshape(1, -1).astype(np.int32)
        s = ids.shape[1]
        s_pad = _round_up(max(s, 1), _PREFILL_BUCKET)
        cache_len = _round_up(s + max_new_tokens, _PREFILL_BUCKET)
        padded = np.zeros((1, s_pad), np.int32)
        padded[0, :s] = ids[0]

        cache = init_kv_cache(self.config, batch=1, max_len=cache_len, quantized=self.quantized_kv)
        logits, cache = self._get_prefill(s_pad, cache_len)(self.params, jnp.asarray(padded), cache)

        greedy = temperature == 0.0 or top_k == 1
        stop = ([eos_token_id] if eos_token_id is not None else []) + [-1] * 4
        out, n = self._get_sample_loop(cache_len, max_new_tokens, top_k, greedy)(
            self.params, jax.random.PRNGKey(seed),
            logits[0, s - 1].astype(jnp.float32), jnp.asarray(s, jnp.int32),
            cache, jnp.asarray(stop[:4], jnp.int32),
            jnp.asarray(max(temperature, 1e-6), jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            jnp.asarray(min_p, jnp.float32),
        )
        return np.asarray(out)[: int(n)].tolist()


def greedy_generate(
    params: Params,
    config: ModelConfig,
    prompt_ids: np.ndarray,
    max_new_tokens: int,
    plan: Optional[ModelPlan] = None,
    eos_token_id: Optional[int] = None,
) -> List[int]:
    """One-shot convenience wrapper around :class:`Generator`."""
    return Generator(params, config, plan).greedy(prompt_ids, max_new_tokens, eos_token_id)
