"""Speculative greedy decoding: draft with a cheaper model, verify with the
target in one multi-token forward.

Beyond-reference serving extension with a natural GRASP twist: the *draft*
model can be the same checkpoint compressed harder (more pruned layers /
lower ranks via core.engine), so the draft shares the target's tokenizer and
distribution for free — no separate small model needed. The reference has no
speculative path (its only generator is HF ``model.generate``,
tools/eval_longbench.py:337-353).

Greedy acceptance rule: draft token i is accepted iff it equals the target's
argmax at that position; the first mismatch is replaced by the target's
argmax and the rest of the chunk is discarded. The emitted stream is
therefore **bit-identical to target-only greedy decoding** — speculation
changes wall-clock, never outputs (property-tested in
tests/test_speculative.py, including draft == target ⇒ every chunk fully
accepted).

TPU-native design: the whole generation runs in ONE jitted
``lax.while_loop`` — per chunk, gamma sequential draft ``decode_step``s, one
(gamma+1)-token target verify through ``_forward_with_cache`` (static
shapes), and pure-jnp acceptance bookkeeping. No host round-trips inside the
loop (the axon tunnel charges ~35-40 ms per dispatch, so host-looped
speculation would forfeit the win). Rejected positions leave stale KV in both
caches; that is safe for the same reason the Generator's pad slots are: the
absolute-position causal mask (models/llama._forward_with_cache) hides slots
beyond each query's position, and the next chunk overwrites them in place.
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
    _forward_with_cache,
    decode_step,
    default_plan,
    init_kv_cache,
    prefill,
)

_BUCKET = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def speculative_accept(
    key: jax.Array, drafts: jax.Array, q_probs: jax.Array, p_probs: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Leviathan et al. rejection step for one chunk — the math that makes
    speculative SAMPLING emit exactly the target distribution.

    drafts: [gamma] draft tokens, d_i sampled from q_probs[i] ([gamma, V]).
    p_probs: [gamma+1, V] target distributions at each position. Draft i is
    accepted with prob min(1, p_i(d_i)/q_i(d_i)); at the first rejection the
    replacement is sampled from norm((p_i - q_i)+); if all gamma are accepted
    a bonus token is sampled from p_gamma. Returns (a, token): number of
    accepted drafts and the correction/bonus token. Pure — Monte-Carlo
    verified against the exact target marginal in tests/test_speculative.py.
    """
    gamma = drafts.shape[0]
    idx = jnp.arange(gamma)
    p_d = p_probs[idx, drafts]
    q_d = q_probs[idx, drafts]
    k_u, k_r = jax.random.split(key)
    u = jax.random.uniform(k_u, (gamma,))
    # strict <: differs from u <= p/q only on measure-zero events for p>0,
    # and closes the u==0.0 leak that would accept a draft with target
    # probability 0 (outside the filtered support)
    ok = u * q_d < p_d
    a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))

    # residual distribution at the rejection point (row a, clamped for a=gamma)
    j = jnp.minimum(a, gamma - 1)
    resid = jnp.clip(p_probs[j] - q_probs[j], 0.0)
    z = jnp.sum(resid)
    resid = jnp.where(z > 0, resid / jnp.maximum(z, 1e-30), p_probs[j])
    final = jnp.where(a == gamma, p_probs[gamma], resid)
    tok = jax.random.categorical(k_r, jnp.log(jnp.maximum(final, 1e-30))).astype(jnp.int32)
    return a, tok


class SpeculativeGenerator:
    """Greedy speculative decoding with draft/target model pairs.

    The target and draft may have different configs/plans (e.g. a
    GRASP-compressed draft of the same family) but must share the vocabulary.
    """

    def __init__(
        self,
        target_params: Params,
        target_config: ModelConfig,
        draft_params: Params,
        draft_config: ModelConfig,
        target_plan: Optional[ModelPlan] = None,
        draft_plan: Optional[ModelPlan] = None,
        gamma: int = 4,
        quantized_kv: bool = False,
    ):
        if target_config.vocab_size != draft_config.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        self.tparams, self.tconfig = target_params, target_config
        self.dparams, self.dconfig = draft_params, draft_config
        self.tplan = target_plan or default_plan(target_config)
        self.dplan = draft_plan or default_plan(draft_config)
        self.gamma = int(gamma)
        # int8 KV for both caches (models.llama.init_kv_cache quantized=True)
        self.quantized_kv = quantized_kv
        self._loop_fns: Dict[Tuple[int, int], any] = {}
        self._prefill_fns: Dict[Tuple[str, int, int], any] = {}
        self.last_stats: Dict[str, float] = {}

    # ------------------------------------------------------------------
    def _get_prefill(self, which: str, s_pad: int, cache_len: int):
        key = (which, s_pad, cache_len)
        if key not in self._prefill_fns:
            config = self.tconfig if which == "t" else self.dconfig
            plan = self.tplan if which == "t" else self.dplan

            @jax.jit
            def fn(params, ids, cache):
                return prefill(params, ids, cache, config=config, plan=plan)

            self._prefill_fns[key] = fn
        return self._prefill_fns[key]

    def _get_loop(self, cache_len: int, max_new: int):
        key = (cache_len, max_new)
        if key not in self._loop_fns:
            tconfig, tplan = self.tconfig, self.tplan
            dconfig, dplan = self.dconfig, self.dplan
            gamma = self.gamma
            buf = max_new + gamma + 1  # chunk may overshoot; trimmed on host

            @jax.jit
            def fn(tparams, dparams, tcache, dcache, first_tok, start_pos, stop_ids):
                """first_tok: the token emitted by target prefill (already
                counted as output); start_pos: its cache slot (= prompt len).
                Returns (out [buf], n_emitted, chunks, accepted)."""
                out0 = jnp.full((buf,), -1, jnp.int32).at[0].set(first_tok)

                def cond(state):
                    n, pos, tok, tcache, dcache, out, done, chunks, acc = state
                    return (~done) & (n < max_new)

                def body(state):
                    n, pos, tok, tcache, dcache, out, done, chunks, acc = state

                    # --- draft phase: gamma+1 sequential single-token steps.
                    # The extra step writes d_gamma's KV into the draft cache
                    # (needed when the whole chunk is accepted: the next chunk
                    # resumes at pos+gamma+1 and must see d_gamma at pos+gamma);
                    # its logits are discarded.
                    def dstep(carry, i):
                        dtok, dcache = carry
                        logits, dcache = decode_step(
                            dparams, dtok[None, None], dcache, pos + i,
                            config=dconfig, plan=dplan,
                        )
                        nxt = jnp.argmax(logits[0, 0]).astype(jnp.int32)
                        return (nxt, dcache), nxt

                    (_, dcache), drafts = jax.lax.scan(
                        dstep, (tok, dcache), jnp.arange(gamma + 1)
                    )
                    drafts = drafts[:gamma]  # d_1..d_gamma

                    # --- target verify: one (gamma+1)-token forward ---
                    verify_in = jnp.concatenate([tok[None], drafts])[None, :]
                    tlogits, tcache = _forward_with_cache(
                        tparams, verify_in, tcache, pos, config=tconfig, plan=tplan,
                    )
                    targets = jnp.argmax(tlogits[0], axis=-1).astype(jnp.int32)  # [gamma+1]

                    # accepted = longest prefix where target agrees with draft
                    matches = (targets[:gamma] == drafts).astype(jnp.int32)
                    a = jnp.sum(jnp.cumprod(matches))  # 0..gamma

                    # emitted chunk: d_1..d_a then the target's correction t_a
                    idx = jnp.arange(gamma + 1)
                    d_ext = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
                    chunk = jnp.where(idx < a, d_ext, targets[jnp.minimum(idx, a)])

                    # stop tokens: cut before the first stop in the chunk
                    is_stop = jnp.any(chunk[:, None] == stop_ids[None, :], axis=1)
                    stop_pos = jnp.argmax(
                        jnp.concatenate([is_stop, jnp.ones((1,), bool)])
                    )  # first True, or gamma+1
                    emit = jnp.minimum(jnp.minimum(a + 1, stop_pos), max_new - n)
                    hit_stop = stop_pos <= a

                    out = jax.lax.dynamic_update_slice(out, chunk, (n,))
                    new_tok = chunk[a]  # t_a: last emitted, not yet consumed
                    return (
                        n + emit,
                        pos + a + 1,
                        new_tok,
                        tcache,
                        dcache,
                        out,
                        hit_stop | (n + emit >= max_new),
                        chunks + 1,
                        acc + a,
                    )

                init_done = jnp.any(first_tok == stop_ids)
                # first_tok occupies out[0]; n starts at 1 (Generator parity:
                # prefill's argmax is the first emitted token)
                n, pos, tok, tcache, dcache, out, done, chunks, acc = jax.lax.while_loop(
                    cond,
                    body,
                    (
                        jnp.asarray(1, jnp.int32),
                        start_pos,
                        first_tok,
                        tcache,
                        dcache,
                        out0,
                        init_done,
                        jnp.asarray(0, jnp.int32),
                        jnp.asarray(0, jnp.int32),
                    ),
                )
                return out, n, chunks, acc

            self._loop_fns[key] = fn
        return self._loop_fns[key]

    # ------------------------------------------------------------------
    def _get_sample_loop(self, cache_len: int, max_new: int, top_k: int):
        key_ = ("sample", cache_len, max_new, top_k)
        if key_ not in self._loop_fns:
            tconfig, tplan = self.tconfig, self.tplan
            dconfig, dplan = self.dconfig, self.dplan
            gamma = self.gamma
            buf = max_new + gamma + 1

            @jax.jit
            def fn(tparams, dparams, tcache, dcache, first_logits, start_pos,
                   stop_ids, rng, temperature, top_p):
                from grasp_tpu.eval.generate import filter_logits

                first_tok = jax.random.categorical(
                    jax.random.fold_in(rng, 0),
                    filter_logits((first_logits / temperature)[None, :], top_k, top_p)[0],
                ).astype(jnp.int32)
                out0 = jnp.full((buf,), -1, jnp.int32).at[0].set(first_tok)

                def cond(state):
                    n, pos, tok, tcache, dcache, out, done, chunks, acc = state
                    return (~done) & (n < max_new)

                def body(state):
                    n, pos, tok, tcache, dcache, out, done, chunks, acc = state
                    ckey = jax.random.fold_in(rng, chunks + 1)

                    # draft phase: sample gamma tokens from the draft's own
                    # filtered distribution, keeping each step's full q_i
                    # (the +1th step only writes d_gamma's KV — see greedy)
                    def dstep(carry, i):
                        dtok, dcache = carry
                        logits, dcache = decode_step(
                            dparams, dtok[None, None], dcache, pos + i,
                            config=dconfig, plan=dplan,
                        )
                        filt = filter_logits(
                            (logits[0, 0].astype(jnp.float32) / temperature)[None, :],
                            top_k, top_p,
                        )[0]
                        nxt = jax.random.categorical(
                            jax.random.fold_in(ckey, 1000 + i), filt
                        ).astype(jnp.int32)
                        return (nxt, dcache), (nxt, jax.nn.softmax(filt))

                    (_, dcache), (drafts_all, q_all) = jax.lax.scan(
                        dstep, (tok, dcache), jnp.arange(gamma + 1)
                    )
                    drafts = drafts_all[:gamma]
                    q_probs = q_all[:gamma]

                    verify_in = jnp.concatenate([tok[None], drafts])[None, :]
                    tlogits, tcache = _forward_with_cache(
                        tparams, verify_in, tcache, pos, config=tconfig, plan=tplan,
                    )
                    p_probs = jax.nn.softmax(
                        filter_logits(tlogits[0].astype(jnp.float32) / temperature,
                                      top_k, top_p),
                        axis=-1,
                    )  # [gamma+1, V]

                    a, corr = speculative_accept(
                        jax.random.fold_in(ckey, 7), drafts, q_probs, p_probs
                    )

                    idx = jnp.arange(gamma + 1)
                    d_ext = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
                    chunk = jnp.where(idx < a, d_ext, corr)

                    is_stop = jnp.any(chunk[:, None] == stop_ids[None, :], axis=1)
                    stop_pos = jnp.argmax(
                        jnp.concatenate([is_stop, jnp.ones((1,), bool)])
                    )
                    emit = jnp.minimum(jnp.minimum(a + 1, stop_pos), max_new - n)
                    hit_stop = stop_pos <= a

                    out = jax.lax.dynamic_update_slice(out, chunk, (n,))
                    return (
                        n + emit, pos + a + 1, chunk[a], tcache, dcache, out,
                        hit_stop | (n + emit >= max_new), chunks + 1, acc + a,
                    )

                init_done = jnp.any(first_tok == stop_ids)
                n, pos, tok, tcache, dcache, out, done, chunks, acc = jax.lax.while_loop(
                    cond, body,
                    (jnp.asarray(1, jnp.int32), start_pos, first_tok, tcache,
                     dcache, out0, init_done, jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32)),
                )
                return out, n, chunks, acc

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
    ) -> List[int]:
        """Speculative SAMPLING (Leviathan et al. rejection scheme): emits
        tokens distributed exactly as target-only temperature/top-k/top-p
        sampling would — the draft only changes wall-clock. temperature=0 or
        top_k=1 routes to the exact greedy path."""
        if max_new_tokens <= 0:
            return []
        if temperature == 0.0 or top_k == 1:
            return self.greedy(prompt_ids, max_new_tokens, eos_token_id)

        ids = np.asarray(prompt_ids).reshape(1, -1).astype(np.int32)
        s = ids.shape[1]
        s_pad = _round_up(max(s, 1), _BUCKET)
        cache_len = _round_up(s + max_new_tokens + self.gamma + 1, _BUCKET)
        padded = np.zeros((1, s_pad), np.int32)
        padded[0, :s] = ids[0]
        jp = jnp.asarray(padded)

        tcache = init_kv_cache(self.tconfig, batch=1, max_len=cache_len,
                               quantized=self.quantized_kv)
        dcache = init_kv_cache(self.dconfig, batch=1, max_len=cache_len,
                               quantized=self.quantized_kv)
        tlogits, tcache = self._get_prefill("t", s_pad, cache_len)(self.tparams, jp, tcache)
        _, dcache = self._get_prefill("d", s_pad, cache_len)(self.dparams, jp, dcache)

        stop = ([eos_token_id] if eos_token_id is not None else []) + [-1] * 4
        out, n, chunks, acc = self._get_sample_loop(cache_len, max_new_tokens, top_k)(
            self.tparams, self.dparams, tcache, dcache,
            tlogits[0, s - 1].astype(jnp.float32), jnp.asarray(s, jnp.int32),
            jnp.asarray(stop[:4], jnp.int32), jax.random.PRNGKey(seed),
            jnp.asarray(max(temperature, 1e-6), jnp.float32),
            jnp.asarray(top_p, jnp.float32),
        )
        n, chunks, acc = int(n), int(chunks), int(acc)
        self.last_stats = {
            "chunks": chunks,
            "drafted": chunks * self.gamma,
            "accepted": acc,
            "acceptance_rate": acc / max(chunks * self.gamma, 1),
            "tokens": n,
            "target_calls": chunks,
        }
        toks = np.asarray(out)[:n]
        if eos_token_id is not None:
            hit = np.where(toks == eos_token_id)[0]
            if len(hit):
                toks = toks[: hit[0]]
        return toks.tolist()

    def greedy(
        self,
        prompt_ids: np.ndarray,
        max_new_tokens: int,
        eos_token_id: Optional[int] = None,
    ) -> List[int]:
        """Greedy generation, bit-identical to the target-only Generator."""
        if max_new_tokens <= 0:
            return []
        ids = np.asarray(prompt_ids).reshape(1, -1).astype(np.int32)
        s = ids.shape[1]
        s_pad = _round_up(max(s, 1), _BUCKET)
        cache_len = _round_up(s + max_new_tokens + self.gamma + 1, _BUCKET)

        padded = np.zeros((1, s_pad), np.int32)
        padded[0, :s] = ids[0]
        jp = jnp.asarray(padded)

        tcache = init_kv_cache(self.tconfig, batch=1, max_len=cache_len,
                               quantized=self.quantized_kv)
        dcache = init_kv_cache(self.dconfig, batch=1, max_len=cache_len,
                               quantized=self.quantized_kv)
        tlogits, tcache = self._get_prefill("t", s_pad, cache_len)(self.tparams, jp, tcache)
        _, dcache = self._get_prefill("d", s_pad, cache_len)(self.dparams, jp, dcache)
        first_tok = jnp.argmax(tlogits[0, s - 1]).astype(jnp.int32)

        stop = ([eos_token_id] if eos_token_id is not None else []) + [-1] * 4
        out, n, chunks, acc = self._get_loop(cache_len, max_new_tokens)(
            self.tparams, self.dparams, tcache, dcache, first_tok,
            jnp.asarray(s, jnp.int32), jnp.asarray(stop[:4], jnp.int32),
        )
        n, chunks, acc = int(n), int(chunks), int(acc)
        self.last_stats = {
            "chunks": chunks,
            "drafted": chunks * self.gamma,
            "accepted": acc,
            "acceptance_rate": acc / max(chunks * self.gamma, 1),
            "tokens": n,
            # target forwards = 1 prefill + 1 verify per chunk; vanilla greedy
            # would have used `n` decode steps
            "target_calls": chunks,
        }
        # the emitted stream never includes a stop token (Generator parity);
        # trim: a stop inside a chunk capped `emit` before it was counted
        toks = np.asarray(out)[:n]
        if eos_token_id is not None:
            hit = np.where(toks == eos_token_id)[0]
            if len(hit):
                toks = toks[: hit[0]]
        return toks.tolist()
