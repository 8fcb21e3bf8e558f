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

Greedy only (the reference evaluates with do_sample=False everywhere).
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
                 device_loop: bool = True):
        self.params = params
        self.config = config
        self.plan = plan or default_plan(config)
        self.device_loop = device_loop
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

        cache = init_kv_cache(self.config, batch=1, max_len=cache_len)
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

        # python-loop fallback (debugging / reference semantics)
        stops = set([eos_token_id] if eos_token_id is not None else []) | set(extra_stop_ids or [])
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
