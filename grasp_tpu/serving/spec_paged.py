"""Speculative decoding over the paged continuous-batching engine.

Combines the two serving accelerations that were previously exclusive:
:class:`~grasp_tpu.serving.paged.ServingEngine`'s paged KV + continuous
batching (requests join/retire mid-flight, HBM tracks live tokens) and
:class:`~grasp_tpu.serving.speculative.SpeculativeGenerator`'s draft/verify
speculation (the target model advances gamma+1 tokens per forward instead
of 1).

Design:

  - ONE page allocator: the draft and target have their own page ARRAYS
    (their layer counts/shapes differ — a GRASP-compressed draft has the
    same layout but different projection pytrees) sized identically, and a
    request's page table indexes BOTH pools, so allocation/retirement
    happens once per request (the "shared page pool" of VERDICT #10).
  - batch-level speculation: per macro-step every live row drafts gamma
    tokens (gamma batched single-token paged decodes on the draft pool,
    reusing paged._paged_decode_fn), then the target verifies all rows in
    ONE batched (gamma+1)-token paged forward (`_paged_verify_fn` — the
    multi-token generalization of the decode: scatters the chunk's KV into
    the pages and attends with per-row, per-query validity masks).
  - greedy acceptance (longest prefix where the target argmax equals the
    draft token, then the target's correction) — the emitted stream is
    bit-identical to the non-speculative ServingEngine's greedy output,
    pinned by tests/test_spec_paged.py.
  - rejected positions leave stale KV in both pools; the per-row validity
    mask (slot <= pos) hides them and the next chunk overwrites them in
    place — the same argument as SpeculativeGenerator's dense caches.

Sampled requests speculate too: the draft phase samples each row from its
own filtered draft distribution (per-row temperature/top-k/top-p through the
same ``topk_topp_filter`` every serving path uses) and keeps the per-step
draft probabilities; the verify step then runs the Leviathan et al.
rejection rule per row (``speculative.speculative_accept`` vmapped over the
batch), so every sampled row's stream is distributed EXACTLY as target-only
sampling at its settings — the draft changes wall-clock, never the
distribution (engine-level empirical-distribution test in
tests/test_spec_paged.py). Greedy rows in the same batch keep the
argmax-prefix rule and stay bit-identical to the plain ServingEngine.
PRNG discipline: one fold_in(PRNGKey(seed), macro_step) key per row per
macro-step (draft step i folds 1000+i, acceptance folds 7 — mirroring
SpeculativeGenerator.sample). A sampled row's stream therefore differs
bitwise from the plain engine's one-pick-per-token stream (same exact
distribution); greedy rows are pick-free and unaffected.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import (
    PROJ_ORDER,
    ModelPlan,
    Params,
    _lm_logits,
    apply_rope,
    attn_mlp_residual,
    default_plan,
    embed_lookup,
    proj_apply,
    rms_norm,
    rope_cos_sin,
)
from grasp_tpu.serving.paged import PagePool, ServingEngine, _paged_decode_fn


def _paged_verify_fn(config: ModelConfig, plan: ModelPlan, max_pages_per_seq: int,
                     chunk: int, quantized: bool = False):
    """Batched multi-token paged forward (the speculative verify step).

    (params, toks [B, chunk], k_pages, v_pages, k_scales, v_scales,
     tables [B, P], pos [B], live [B])
      -> (logits [B, chunk, V], k_pages, v_pages, k_scales, v_scales)
    (scale args/returns are None pass-throughs for fp pools, like
    paged._paged_decode_fn's signature).

    pos[b] = cache slot of toks[b, 0]. Writes all `chunk` tokens' K/V into
    the pages, then attends with a per-row validity-and-causality mask
    (slot s visible to query i iff s <= pos + i).

    Attention path MIRRORS the plain engine's decode so greedy speculation
    emits the exact stream the plain engine would: sub-lane head dims on TPU
    go through the chunked variant of our paged kernel
    (ops.pallas_paged64.paged_attention_hd64_chunk — per-row bit-equal to
    the single-query kernel the plain decode runs); everything else takes
    the XLA gather, which is per-position bit-equal to the gather decode.
    quantized pools (int8 pages + per-slot scales) always gather, with the
    decode's exact contraction order: per-key scale commutes out of the
    score contraction, per-value scale folds into the softmax weights, and
    the chunk's K/V quantize per-position exactly like the single-token
    scatter (_quantize_kv is per-(batch, head, position) over hd).
    Exception: hd%128==0 fp models decode through jax's fused kernel, which
    has no multi-query form — their verify gathers, so spec-vs-plain
    identity there holds vs a gather-path plain engine
    (GRASP_PAGED_KERNEL=0), with fp-tie-level divergence possible against
    the kernel path.
    """
    import os

    use_kernel64 = (
        jax.default_backend() == "tpu"
        and config.attn_logit_softcapping is None
        and config.head_dim_ < 128
        and not quantized
        and os.environ.get("GRASP_PAGED64_KERNEL", "1") != "0"
    )

    def _windows_irrelevant(t_max):
        # a window >= the table capacity never masks anything (paged.py)
        return all(
            config.layer_window(li) is None or config.layer_window(li) >= t_max
            for li in range(config.num_hidden_layers))

    def fn(params, toks, k_pages, v_pages, k_scales, v_scales, tables, pos, live):
        L, nkv, num_pages, page_size, hd = k_pages.shape
        b = toks.shape[0]
        nh = config.num_attention_heads
        t_max = max_pages_per_seq * page_size
        use_k64 = use_kernel64 and (
            config.sliding_window is None or _windows_irrelevant(t_max))

        positions = pos[:, None] + jnp.arange(chunk)[None, :]  # [B, chunk]
        cos, sin = rope_cos_sin(positions, hd, config.rope_theta,
                                scaling=config.rope_scaling)

        h = embed_lookup(params, toks, config)  # [B, chunk, d]

        logical = positions // page_size            # [B, chunk]
        offset = positions % page_size
        phys = jnp.take_along_axis(tables, logical, axis=1)  # [B, chunk]
        phys = jnp.where((live > 0)[:, None], phys, 0)

        # mask [B, 1, chunk, t_max]: query i sees slots <= pos + i;
        # one mask per distinct per-layer window (Gemma-2 alternates)
        slot_idx = jnp.arange(t_max)[None, None, :]
        _biases = {}

        def bias_for(w):
            if w not in _biases:
                vis = (slot_idx <= positions[:, :, None]) & (live > 0)[:, None, None]
                if w is not None:  # windowed attention (Mistral / Gemma-2)
                    vis &= slot_idx > positions[:, :, None] - w
                _biases[w] = jnp.where(
                    vis, 0.0, jnp.finfo(jnp.float32).min)[:, None, :, :]
            return _biases[w]

        a_scale = (config.query_pre_attn_scalar ** -0.5
                   if config.query_pre_attn_scalar else 1.0 / np.sqrt(hd))
        a_cap = config.attn_logit_softcapping

        for li in range(config.num_hidden_layers):
            lp = params["layers"][li]
            kinds = dict(zip(PROJ_ORDER, plan[li]))
            bias = bias_for(config.layer_window(li))

            x = rms_norm(h, lp["input_layernorm"]["weight"], config.rms_norm_eps,
                         plus_one=config.norm_plus_one)
            ap = lp["self_attn"]
            q = proj_apply(x, ap["q_proj"], kinds["q_proj"]).reshape(b, chunk, nh, hd).transpose(0, 2, 1, 3)
            k = proj_apply(x, ap["k_proj"], kinds["k_proj"]).reshape(b, chunk, nkv, hd).transpose(0, 2, 1, 3)
            v = proj_apply(x, ap["v_proj"], kinds["v_proj"]).reshape(b, chunk, nkv, hd).transpose(0, 2, 1, 3)
            q, k = apply_rope(q, k, cos, sin)

            # scatter the chunk's K/V: for each (row, i) write [nkv, hd] at
            # (li, :, phys[b,i], offset[b,i]). Flatten (B, chunk) into one
            # advanced-index batch like the single-token decode does.
            pf, of = phys.reshape(-1), offset.reshape(-1)
            if quantized:
                from grasp_tpu.models.llama import _quantize_kv

                k8, ksc = _quantize_kv(k)  # scales [b, nkv, chunk, 1]
                v8, vsc = _quantize_kv(v)
                kw = k8.transpose(0, 2, 1, 3).reshape(b * chunk, nkv, hd)
                vw = v8.transpose(0, 2, 1, 3).reshape(b * chunk, nkv, hd)
                k_pages = k_pages.at[li, :, pf, of, :].set(kw, mode="drop")
                v_pages = v_pages.at[li, :, pf, of, :].set(vw, mode="drop")
                k_scales = k_scales.at[li, :, pf, of, :].set(
                    ksc.transpose(0, 2, 1, 3).reshape(b * chunk, nkv, 1), mode="drop")
                v_scales = v_scales.at[li, :, pf, of, :].set(
                    vsc.transpose(0, 2, 1, 3).reshape(b * chunk, nkv, 1), mode="drop")
            else:
                kw = k.transpose(0, 2, 1, 3).reshape(b * chunk, nkv, hd)
                vw = v.transpose(0, 2, 1, 3).reshape(b * chunk, nkv, hd)
                k_pages = k_pages.at[li, :, pf, of, :].set(
                    kw.astype(k_pages.dtype), mode="drop")
                v_pages = v_pages.at[li, :, pf, of, :].set(
                    vw.astype(v_pages.dtype), mode="drop")

            if use_k64:
                from grasp_tpu.ops.pallas_paged64 import paged_attention_hd64_chunk

                base = jnp.where(live > 0, pos + 1, 1)
                attn = paged_attention_hd64_chunk(
                    q.transpose(0, 2, 1, 3).astype(h.dtype),  # [B, chunk, nh, hd]
                    k_pages[li], v_pages[li], base, tables, scale=a_scale,
                )
                attn = attn.reshape(b, chunk, nh * hd)
            else:
                k_seq = k_pages[li][:, tables].transpose(1, 0, 2, 3, 4).reshape(b, nkv, t_max, hd)
                v_seq = v_pages[li][:, tables].transpose(1, 0, 2, 3, 4).reshape(b, nkv, t_max, hd)
                if quantized:
                    ks_seq = k_scales[li][:, tables].transpose(1, 0, 2, 3, 4).reshape(b, nkv, t_max)
                    vs_seq = v_scales[li][:, tables].transpose(1, 0, 2, 3, 4).reshape(b, nkv, t_max)
                if nh != nkv:
                    k_seq = jnp.repeat(k_seq, nh // nkv, axis=1)
                    v_seq = jnp.repeat(v_seq, nh // nkv, axis=1)
                    if quantized:
                        ks_seq = jnp.repeat(ks_seq, nh // nkv, axis=1)
                        vs_seq = jnp.repeat(vs_seq, nh // nkv, axis=1)

                scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_seq.astype(q.dtype),
                                    preferred_element_type=jnp.float32) * a_scale
                if quantized:  # per-key scale commutes out of the contraction
                    scores = scores * ks_seq[:, :, None, :]
                if a_cap is not None:  # Gemma-2: cap BEFORE the mask
                    scores = a_cap * jnp.tanh(scores / a_cap)
                scores = scores + bias
                probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
                if quantized:  # per-value scale folds into the softmax weights
                    probs = probs * vs_seq[:, :, None, :].astype(q.dtype)
                attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v_seq.astype(q.dtype),
                                  preferred_element_type=q.dtype)
                attn = attn.transpose(0, 2, 1, 3).reshape(b, chunk, nh * hd)
            attn = proj_apply(attn, ap["o_proj"], kinds["o_proj"])
            h = attn_mlp_residual(h, attn, lp, kinds, config)

        h = rms_norm(h, params["norm"]["weight"], config.rms_norm_eps,
                     plus_one=config.norm_plus_one)
        return (_lm_logits(h, params, softcap=config.final_logit_softcapping),
                k_pages, v_pages, k_scales, v_scales)

    donate = (2, 3, 4, 5) if quantized else (2, 3)
    return jax.jit(fn, donate_argnums=donate)


def _draft_multi_fn(config: ModelConfig, plan: ModelPlan, max_pages_per_seq: int,
                    gamma: int, quantized: bool = False):
    """Fused draft phase: gamma+1 single-token paged decodes in ONE jit.

    The unfused loop dispatches gamma+1 separate decode calls with a host
    argmax sync between each (the next draft token feeds the next call);
    per macro-step that is gamma+1 kernel launches and gamma+1 device->host
    round trips. Here the token feedback happens inside a lax.fori_loop —
    the page pools ride the loop carry (XLA aliases carries in place, and
    the top-level jit donates them), and the host syncs ONCE for the [B,
    gamma] draft block. On this container's dispatch tax (~35-40 ms/call)
    that alone is ~4x off the draft phase at gamma=4; on any runtime it
    removes gamma launches and syncs. Per-iteration results are bit-identical
    to the unfused loop (same decode body, same argmax) — pinned by
    tests/test_spec_paged.py::test_fused_draft_matches_unfused.

    Iteration gamma (the last) only lands d_gamma's KV — its argmax is
    dropped, mirroring the unfused loop.

    Returns (drafts [B, gamma], k_pages, v_pages, k_scales, v_scales) —
    scales are None pass-throughs for fp pools, updated arrays for
    quantized (int8) pools, which ride the loop carry like the pages.
    """
    body = _paged_decode_fn(config, plan, max_pages_per_seq,
                            quantized=quantized, raw=True)

    def fn(params, tok0, k_pages, v_pages, k_scales, v_scales, tables, pos0, live):
        b = tok0.shape[0]
        drafts0 = jnp.zeros((b, gamma), jnp.int32)

        def step(i, carry):
            tok, kp, vp, ks, vs, drafts = carry
            logits, kp, vp, ks, vs = body(
                params, tok, kp, vp, ks, vs, tables, pos0 + i, live)
            ntok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # i == gamma is the KV-only landing pass: the write drops
            drafts = jax.lax.dynamic_update_slice(
                drafts, ntok[:, None], (0, jnp.minimum(i, gamma - 1)))
            drafts = jnp.where(i < gamma, drafts, carry[5])
            return (ntok, kp, vp, ks, vs, drafts)

        _, k_pages, v_pages, k_scales, v_scales, drafts = jax.lax.fori_loop(
            0, gamma + 1, step,
            (tok0, k_pages, v_pages, k_scales, v_scales, drafts0))
        return drafts, k_pages, v_pages, k_scales, v_scales

    donate = (2, 3, 4, 5) if quantized else (2, 3)
    return jax.jit(fn, donate_argnums=donate)


def _draft_multi_sampled_fn(config: ModelConfig, plan: ModelPlan,
                            max_pages_per_seq: int, gamma: int, max_k: int,
                            quantized: bool = False):
    """Sampled variant of the fused draft phase.

    Same one-dispatch fori_loop, but each row draws its next draft token from
    its own filtered distribution (per-row temperature/top-k/top-p; greedy
    rows keep the exact argmax of the raw logits) and the per-step filtered
    draft probabilities q_i are captured for the Leviathan acceptance step.
    Returns (drafts [B, gamma], q_probs [B, gamma, V] fp32, k_pages, v_pages).

    keys: [B, 2] uint32 per-row chunk keys (fold_in(PRNGKey(seed),
    macro_step) on the host); draft step i folds 1000+i per row, mirroring
    SpeculativeGenerator._get_sample_loop so single-stream and batched
    speculation share the stream layout.

    Returns (drafts, q_probs, k_pages, v_pages, k_scales, v_scales) — scale
    args/returns are None pass-throughs for fp pools.
    """
    from grasp_tpu.eval.generate import topk_topp_filter

    body = _paged_decode_fn(config, plan, max_pages_per_seq,
                            quantized=quantized, raw=True)
    vocab = config.vocab_size

    def fn(params, tok0, k_pages, v_pages, k_scales, v_scales, tables, pos0,
           live, keys, temps, ks, tps, greedy):
        b = tok0.shape[0]
        drafts0 = jnp.zeros((b, gamma), jnp.int32)
        q0 = jnp.zeros((b, gamma, vocab), jnp.float32)

        def step(i, carry):
            tok, kp, vp, ksc, vsc, drafts, qs = carry
            logits, kp, vp, ksc, vsc = body(
                params, tok, kp, vp, ksc, vsc, tables, pos0 + i, live)
            filt = topk_topp_filter(
                logits.astype(jnp.float32) / temps[:, None], ks, tps, max_k)
            skeys = jax.vmap(lambda kk: jax.random.fold_in(kk, 1000 + i))(keys)
            sampled = jax.vmap(jax.random.categorical)(skeys, filt).astype(jnp.int32)
            ntok = jnp.where(greedy, jnp.argmax(logits, axis=-1).astype(jnp.int32),
                             sampled)
            # i == gamma is the KV-only landing pass: drafts/qs writes drop
            j = jnp.minimum(i, gamma - 1)
            drafts = jax.lax.dynamic_update_slice(drafts, ntok[:, None], (0, j))
            qs = jax.lax.dynamic_update_slice(
                qs, jax.nn.softmax(filt, axis=-1)[:, None, :], (0, j, 0))
            keep = i < gamma
            drafts = jnp.where(keep, drafts, carry[5])
            qs = jnp.where(keep, qs, carry[6])
            return (ntok, kp, vp, ksc, vsc, drafts, qs)

        _, k_pages, v_pages, k_scales, v_scales, drafts, qs = jax.lax.fori_loop(
            0, gamma + 1, step,
            (tok0, k_pages, v_pages, k_scales, v_scales, drafts0, q0))
        return drafts, qs, k_pages, v_pages, k_scales, v_scales

    donate = (2, 3, 4, 5) if quantized else (2, 3)
    return jax.jit(fn, donate_argnums=donate)


def _draft_multi_penalized_fn(config: ModelConfig, plan: ModelPlan,
                              max_pages_per_seq: int, gamma: int, max_k: int,
                              quantized: bool = False):
    """Penalized/guided variant of the fused draft phase.

    Extends ``_draft_multi_sampled_fn`` with the plain engine's full logit
    processing (paged.apply_penalties: logit_bias -> repetition ->
    presence/frequency; then temperature -> top_k -> top_p -> min_p; optional
    grammar mask before everything) applied PER DRAFT STEP with the running
    context: a row's token counts and DFA state advance inside the loop as
    its own draft tokens land, so q_i is the exact processed draft
    conditional given the draft path so far — which is what the Leviathan
    acceptance needs for the emitted stream to be distributed exactly as
    penalized target-only sampling (the verify side recomputes the SAME
    per-position adjustments from the same path; see _accept_penalized_fn).
    Greedy rows argmax the adjusted logits (penalties steer greedy decoding
    too, OpenAI behavior — plain-engine parity). Identity settings reduce
    fp-exactly to the unpenalized sampler's math, so mixed batches never
    perturb plain rows.

    guided args (always passed; a 1-state never-masking table serves
    unguided batches): trans [S, V] int32 token transitions (-1 = reject),
    accept [S] bool, states [B] int32, gflag [B] bool, eosmask [V] bool.
    eos is allowed exactly in accepting states; a starved row force-stops on
    eos; eos picks leave the state unchanged (the host never advances
    through eos either).

    Returns (drafts [B, gamma], q_probs [B, gamma, V] fp32, pools...).
    """
    from grasp_tpu.eval.generate import topk_topp_filter
    from grasp_tpu.serving.paged import apply_penalties

    body = _paged_decode_fn(config, plan, max_pages_per_seq,
                            quantized=quantized, raw=True)
    vocab = config.vocab_size
    neg = jnp.finfo(jnp.float32).min

    def fn(params, tok0, k_pages, v_pages, k_scales, v_scales, tables, pos0,
           live, keys, temps, ks, tps, greedy, counts, bias, biased,
           min_ps, pres, freq, reps, trans, accept, states0, gflag, eosmask):
        b = tok0.shape[0]
        drafts0 = jnp.zeros((b, gamma), jnp.int32)
        q0 = jnp.zeros((b, gamma, vocab), jnp.float32)

        def step(i, carry):
            tok, kp, vp, ksc, vsc, drafts, qs, cnt, st = carry
            logits, kp, vp, ksc, vsc = body(
                params, tok, kp, vp, ksc, vsc, tables, pos0 + i, live)
            adj = apply_penalties(logits, cnt, bias * biased[:, None],
                                  pres, freq, reps)
            rowmask = trans[st] >= 0
            rowmask = rowmask | (eosmask[None, :] & accept[st][:, None])
            starved = ~rowmask.any(axis=-1)
            rowmask = rowmask | (eosmask[None, :] & starved[:, None])
            adj = jnp.where(gflag[:, None] & ~rowmask, neg, adj)
            filt = topk_topp_filter(adj / temps[:, None], ks, tps, max_k,
                                    min_ps=min_ps)
            skeys = jax.vmap(lambda kk: jax.random.fold_in(kk, 1000 + i))(keys)
            sampled = jax.vmap(jax.random.categorical)(skeys, filt).astype(jnp.int32)
            ntok = jnp.where(greedy, jnp.argmax(adj, axis=-1).astype(jnp.int32),
                             sampled)
            # running context: counts/DFA advance by this pick (the verify
            # side replays the identical rollout from the draft block)
            is_eos = eosmask[ntok]
            ns = trans[st, ntok]
            st_next = jnp.where(gflag & ~is_eos & (ns >= 0), ns, st)
            cnt_next = cnt.at[jnp.arange(b), ntok].add(1)
            # i == gamma is the KV-only landing pass: all writes drop
            j = jnp.minimum(i, gamma - 1)
            drafts = jax.lax.dynamic_update_slice(drafts, ntok[:, None], (0, j))
            qs = jax.lax.dynamic_update_slice(
                qs, jax.nn.softmax(filt, axis=-1)[:, None, :], (0, j, 0))
            keep = i < gamma
            drafts = jnp.where(keep, drafts, carry[5])
            qs = jnp.where(keep, qs, carry[6])
            cnt_next = jnp.where(keep, cnt_next, cnt)
            st_next = jnp.where(keep, st_next, st)
            return (ntok, kp, vp, ksc, vsc, drafts, qs, cnt_next, st_next)

        out = jax.lax.fori_loop(
            0, gamma + 1, step,
            (tok0, k_pages, v_pages, k_scales, v_scales, drafts0, q0,
             counts, states0))
        _, k_pages, v_pages, k_scales, v_scales, drafts, qs, _, _ = out
        return drafts, qs, k_pages, v_pages, k_scales, v_scales

    donate = (2, 3, 4, 5) if quantized else (2, 3)
    return jax.jit(fn, donate_argnums=donate)


def _accept_fn(gamma: int, max_k: int):
    """Batched per-row acceptance: greedy rows take the argmax-prefix rule
    (bit-identical to the greedy engine), sampled rows the Leviathan
    rejection rule via the Monte-Carlo-verified ``speculative_accept``
    vmapped over the batch. One jitted call per macro-step.

    (tlogits [B, g+1, V], drafts [B, g], q_probs [B, g, V], keys [B, 2],
     temps/tps [B] fp32, ks [B] i32, greedy [B] bool)
      -> (a [B] accepted counts, corr [B] correction/bonus token,
          targets [B, g+1] argmax — the greedy emission source)
    """
    from grasp_tpu.eval.generate import topk_topp_filter
    from grasp_tpu.serving.speculative import speculative_accept

    @jax.jit
    def fn(tlogits, drafts, q_probs, keys, temps, ks, tps, greedy):
        b, g1, v = tlogits.shape
        targets = jnp.argmax(tlogits, axis=-1).astype(jnp.int32)  # [B, g+1]

        matches = jnp.cumprod(
            (targets[:, :gamma] == drafts).astype(jnp.int32), axis=1)
        a_g = jnp.sum(matches, axis=1)
        corr_g = jnp.take_along_axis(targets, a_g[:, None], axis=1)[:, 0]

        scaled = tlogits.astype(jnp.float32) / temps[:, None, None]
        filt = topk_topp_filter(
            scaled.reshape(b * g1, v),
            jnp.repeat(ks, g1), jnp.repeat(tps, g1), max_k,
        ).reshape(b, g1, v)
        p_probs = jax.nn.softmax(filt, axis=-1)
        akeys = jax.vmap(lambda kk: jax.random.fold_in(kk, 7))(keys)
        a_s, corr_s = jax.vmap(speculative_accept)(akeys, drafts, q_probs, p_probs)

        a = jnp.where(greedy, a_g, a_s)
        corr = jnp.where(greedy, corr_g, corr_s)
        return a, corr, targets

    return fn


def _accept_penalized_fn(gamma: int, max_k: int):
    """Penalized/guided batched acceptance.

    Same contract as ``_accept_fn`` but the target logits at every chunk
    position are processed EXACTLY like the draft side processed its
    proposal distribution at that position: position i's counts are the
    engine counts plus one-hots of d_1..d_i's predecessors along the draft
    path, its DFA state the rollout of the row state through d_1..d_i —
    so p_i and q_i are the same functional of the same context and the
    Leviathan math emits exactly penalized target-only sampling. Greedy
    rows take the argmax-prefix rule over the ADJUSTED logits (bit-identical
    to the penalized plain engine's greedy stream).

    Also returns the per-row updated counts contribution and final DFA
    states are NOT returned — the host recomputes both from the emitted
    chunk (retirement can cut the chunk short).
    """
    from grasp_tpu.eval.generate import topk_topp_filter
    from grasp_tpu.serving.paged import apply_penalties
    from grasp_tpu.serving.speculative import speculative_accept

    neg = jnp.finfo(jnp.float32).min

    @jax.jit
    def fn(tlogits, drafts, q_probs, keys, temps, ks, tps, greedy,
           counts, bias, biased, min_ps, pres, freq, reps,
           trans, accept, states0, gflag, eosmask):
        b, g1, v = tlogits.shape
        # counts along the draft path: position i sees d_1..d_i's prefix
        oh = jax.nn.one_hot(drafts, v, dtype=jnp.int32)            # [B, g, V]
        cum = jnp.concatenate(
            [jnp.zeros((b, 1, v), jnp.int32), jnp.cumsum(oh, axis=1)], axis=1)
        counts_pos = counts[:, None, :] + cum                       # [B, g+1, V]
        lb = (bias * biased[:, None])[:, None, :]                   # [B, 1, V]
        l = tlogits.astype(jnp.float32) + lb
        seen = counts_pos > 0
        r3 = reps[:, None, None]
        pen = jnp.where(l < 0, l * r3, l / r3)
        l = jnp.where(seen, pen, l)
        adj = (l - counts_pos.astype(jnp.float32) * freq[:, None, None]
               - seen * pres[:, None, None])                        # [B, g+1, V]

        # DFA rollout along the draft path (gamma is small and static)
        states = [states0]
        for i in range(gamma):
            d = drafts[:, i]
            ns = trans[states[-1], d]
            ok = gflag & ~eosmask[d] & (ns >= 0)
            states.append(jnp.where(ok, ns, states[-1]))
        st = jnp.stack(states, axis=1)                              # [B, g+1]
        rowmask = trans[st] >= 0                                    # [B, g+1, V]
        rowmask = rowmask | (eosmask[None, None, :] & accept[st][:, :, None])
        starved = ~rowmask.any(axis=-1)
        rowmask = rowmask | (eosmask[None, None, :] & starved[:, :, None])
        adj = jnp.where(gflag[:, None, None] & ~rowmask, neg, adj)

        targets = jnp.argmax(adj, axis=-1).astype(jnp.int32)        # [B, g+1]
        matches = jnp.cumprod(
            (targets[:, :gamma] == drafts).astype(jnp.int32), axis=1)
        a_g = jnp.sum(matches, axis=1)
        corr_g = jnp.take_along_axis(targets, a_g[:, None], axis=1)[:, 0]

        scaled = adj / temps[:, None, None]
        filt = topk_topp_filter(
            scaled.reshape(b * g1, v),
            jnp.repeat(ks, g1), jnp.repeat(tps, g1), max_k,
            min_ps=jnp.repeat(min_ps, g1),
        ).reshape(b, g1, v)
        p_probs = jax.nn.softmax(filt, axis=-1)
        akeys = jax.vmap(lambda kk: jax.random.fold_in(kk, 7))(keys)
        a_s, corr_s = jax.vmap(speculative_accept)(akeys, drafts, q_probs, p_probs)

        a = jnp.where(greedy, a_g, a_s)
        corr = jnp.where(greedy, corr_g, corr_s)
        return a, corr, targets

    return fn


def _commit_counts_fn():
    """One small jit per macro-step: fold the emitted chunk's token counts
    into the engine's [max_batch, V] buffer. toks [B, g+1] padded, nvalid [B]
    = number of real tokens per row (0 for non-live/unpenalized rows)."""

    @jax.jit
    def fn(counts, toks, nvalid):
        b, g1 = toks.shape
        valid = (jnp.arange(g1)[None, :] < nvalid[:, None]).astype(jnp.int32)
        oh = jax.nn.one_hot(toks, counts.shape[-1], dtype=jnp.int32)
        return counts + jnp.einsum("bgv,bg->bv", oh, valid)

    return fn


class SpeculativeServingEngine(ServingEngine):
    """Continuous batching + paged KV + speculation (greedy AND sampled).

    Inherits admission/retirement/page accounting from ServingEngine; the
    target pool is `self.pool` (so _admit prefills the target unchanged) and
    a draft pool rides the SAME page tables. step() advances every live row
    up to gamma+1 tokens. Greedy rows emit the bit-identical ServingEngine
    stream (one caveat: hd%128==0 fp models verify through the gather path
    because jax's fused paged kernel has no multi-query form, so identity
    there is vs a GRASP_PAGED_KERNEL=0 plain engine — see _paged_verify_fn);
    sampled rows emit a stream distributed exactly as target-only per-row
    temperature/top-k/top-p sampling (Leviathan rejection per row) —
    speculation changes wall-clock, never outputs/distributions.
    """

    def __init__(self, params: Params, config: ModelConfig,
                 draft_params: Params, draft_config: ModelConfig,
                 plan: Optional[ModelPlan] = None,
                 draft_plan: Optional[ModelPlan] = None,
                 gamma: int = 4, **kw):
        if config.vocab_size != draft_config.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        if kw.get("prefill_chunk"):
            # this engine's _admit writes the draft prefill immediately after
            # super()._admit returns — it requires whole-prompt admission
            raise ValueError("prefill_chunk is not supported with speculation; "
                             "use ServingEngine")
        super().__init__(params, config, plan=plan, **kw)
        self.gamma = int(gamma)
        self.dparams = draft_params
        self.dconfig = draft_config
        self.dplan = draft_plan or default_plan(draft_config)
        q = self.pool.quantized  # int8 pages + per-slot scales in BOTH pools
        self.dpool = PagePool(draft_config, self.pool.num_pages,
                              self.pool.page_size, quantized=q)
        self.dpool._free = self.pool._free  # ONE allocator: tables index both pools
        # a physical page backs BOTH pools, so it may only be recycled once
        # every future query of target AND draft is masked from it
        def _full_layers(c):  # any full-attention layer reads every slot
            return c.layer_types is not None and any(
                t != "sliding_attention" for t in c.layer_types)

        if (config.sliding_window is None or draft_config.sliding_window is None
                or _full_layers(config) or _full_layers(draft_config)):
            self._window_recycle = None
        else:
            self._window_recycle = max(config.sliding_window,
                                       draft_config.sliding_window)
        # the speculative step() has no ensure/stall dance: keep full upfront
        # allocation, recycling still returns expired pages to the shared pool
        self._lazy_pages = False
        self._dmulti = _draft_multi_fn(draft_config, self.dplan,
                                       self.max_pages_per_seq, int(gamma),
                                       quantized=q)
        self._dmulti_sampled = None  # built on first sampled macro-step
        self._accept = None
        self._dmulti_pen = None      # built on first penalized macro-step
        self._accept_pen = None
        self._commit_counts = None
        self._gtables_cache = None   # (key, trans_dev, accept_dev, offsets)
        self._verify = _paged_verify_fn(config, self.plan, self.max_pages_per_seq,
                                        chunk=self.gamma + 1, quantized=q)
        self._dprefill_fns: Dict[Tuple[int, int], any] = {}
        self.last_stats: Dict[str, float] = {"chunks": 0, "drafted": 0, "accepted": 0}

    def submit(self, prompt_ids, max_new_tokens: int, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 1.0, seed: Optional[int] = None,
               logprobs: int = 0, presence_penalty: float = 0.0,
               frequency_penalty: float = 0.0, repetition_penalty: float = 1.0,
               min_p: float = 0.0,
               logit_bias: Optional[Dict[int, float]] = None,
               guided_regex: Optional[str] = None) -> int:
        """Enqueue a request; sampled rows (temperature > 0) speculate through
        the per-row Leviathan rejection path (exact target distribution, see
        module docstring); greedy rows stay bit-identical to ServingEngine.
        seed=None defaults to the request id (plain-engine semantics).

        Penalties / min_p / logit_bias / guided_regex carry the plain
        engine's semantics: both the draft proposals and the target verify
        distributions are processed per chunk position with the running
        context along the draft path (_draft_multi_penalized_fn /
        _accept_penalized_fn), so penalized sampled rows are distributed
        exactly as penalized target-only sampling and penalized greedy rows
        are bit-identical to the penalized plain engine.

        logprobs is not supported here: the macro-step emits accepted tokens
        in bulk without per-token model distributions — use the plain
        ServingEngine for logprob-reporting requests."""
        if logprobs:
            raise ValueError("logprobs are not supported with speculation; "
                             "use ServingEngine")
        # reserve chunk-overshoot slack: a macro-step may write up to gamma+1
        # positions past the accepted stream before trimming
        prompt = np.asarray(prompt_ids).reshape(-1)
        need = -(-(len(prompt) + max_new_tokens + self.gamma + 1) // self.pool.page_size)
        if need > self.max_pages_per_seq:
            raise ValueError(
                f"request needs {need} pages > max_pages_per_seq={self.max_pages_per_seq}")
        return super().submit(prompt_ids, max_new_tokens, temperature, top_k,
                              top_p, seed,
                              presence_penalty=presence_penalty,
                              frequency_penalty=frequency_penalty,
                              repetition_penalty=repetition_penalty,
                              min_p=min_p, logit_bias=logit_bias,
                              guided_regex=guided_regex)

    # -- admission: also prefill the draft into the same pages ------------
    def _admit(self, req, row):
        """Admit into BOTH pools. The target side reuses ServingEngine's
        (prefix-cache-aware) admission; the draft side mirrors it: a physical
        page backs both pools, and draft KV at position p depends only on
        tokens [0, p] too, so a page shared via the target's content hash
        carries the registering request's IDENTICAL draft KV — the draft
        prefill also skips the prefix and runs only the suffix."""
        need_extra = -(-(len(req.prompt) + req.max_new + self.gamma + 1)
                       // self.pool.page_size)
        adm = self._admit_start(req, row)
        finished = self._admit_chunk(adm)  # prefill_chunk is gated off here
        assert finished, "speculative admission requires whole-prompt prefill"
        # top up the page count for chunk overshoot (super allocated without
        # the slack; tables hold max_pages_per_seq entries either way)
        if len(req.pages) < need_extra:
            req.pages += self.pool.alloc(need_extra - len(req.pages))

        from grasp_tpu.models.llama import _forward_with_cache, init_kv_cache
        from grasp_tpu.serving.paged import _build_gather, _build_scatter

        ps = self.pool.page_size
        s = len(req.prompt)
        s_pad = -(-max(s, 1) // ps) * ps
        prefix_len = adm.prefix_len
        hits = prefix_len // ps
        suf_pad = s_pad - prefix_len
        key = (suf_pad, s_pad)
        if key not in self._dprefill_fns:
            dconfig, dplan = self.dconfig, self.dplan

            @jax.jit
            def fn(params, ids, cache, at):
                return _forward_with_cache(params, ids, cache, at,
                                           config=dconfig, plan=dplan)

            self._dprefill_fns[key] = fn
        padded = np.zeros((1, suf_pad), np.int32)
        padded[0, : s - prefix_len] = req.prompt[prefix_len:]
        # quantized pool: int8 temp cache so the draft prefill attention reads
        # the same quantized K/V its paged decode will (plain-engine parity)
        dcache = init_kv_cache(self.dconfig, batch=1, max_len=s_pad,
                               quantized=self.dpool.quantized)
        if hits:  # gather the shared prefix's DRAFT KV into the temp cache
            gkey = ("dgather", hits, s_pad)
            if gkey not in self._dprefill_fns:
                self._dprefill_fns[gkey] = _build_gather(
                    self.dconfig.num_hidden_layers, self.dpool.quantized,
                    prefix_len)
            dcache = self._primed_call(
                gkey, self._dprefill_fns[gkey], dcache, self.dpool.k_pages,
                self.dpool.v_pages, self.dpool.k_scales, self.dpool.v_scales,
                jnp.asarray(req.pages[:hits], jnp.int32))
        _, dcache = self._primed_call(
            ("dprefill", suf_pad, s_pad), self._dprefill_fns[key],
            self.dparams, jnp.asarray(padded), dcache,
            jnp.asarray(prefix_len, jnp.int32))

        n_pages = s_pad // ps
        skey = ("dscatter", n_pages - hits, s_pad, prefix_len)
        if skey not in self._dprefill_fns:
            self._dprefill_fns[skey] = _build_scatter(
                self.dconfig.num_hidden_layers, self.dpool.quantized, ps,
                n_pages - hits, prefix_len)
        (self.dpool.k_pages, self.dpool.v_pages,
         self.dpool.k_scales, self.dpool.v_scales) = self._primed_call(
            skey, self._dprefill_fns[skey],
            self.dpool.k_pages, self.dpool.v_pages,
            self.dpool.k_scales, self.dpool.v_scales, dcache,
            jnp.asarray(req.pages[hits:n_pages], jnp.int32))

    def _retire(self, req) -> None:
        super()._retire(req)  # single allocator: pages return once, serve both pools

    # -- guided decoding over speculation ----------------------------------
    def _guided_tables(self, reqs):
        """Device DFA tables + per-row states for the live guided rows.

        The speculative draft loop advances grammar states ON DEVICE along
        the draft path, so it needs the token-transition table (not just the
        allow mask the plain sampler uses). Several grammars in one batch
        compose as a block-diagonal union (states offset per grammar) — one
        table serves every row; rows of the same pattern share the block.
        Unguided (or unguided-penalized) batches get a constant 1-state
        never-masking table so the penalized jits keep one shape.

        Returns (trans [S, V] i32 dev, accept [S] bool dev, states [B] i32,
        gflag [B] bool, offsets {id(grammar): state offset}).
        """
        gs: List = []
        for r in reqs:
            if r is not None and r.guided is not None and id(r.guided) not in {
                    id(g) for g in gs}:
                gs.append(r.guided)
        key = tuple(id(g) for g in gs)
        cached = self._gtables_cache
        if cached is None or cached[0] != key:
            V = self.config.vocab_size
            if not gs:
                trans = np.full((1, V), -1, np.int32)
                accept = np.zeros(1, bool)
                offsets: Dict[int, int] = {}
            else:
                n_total = sum(g.n_states for g in gs)
                trans = np.full((n_total, V), -1, np.int32)
                accept = np.zeros(n_total, bool)
                offsets = {}
                off = 0
                for g in gs:
                    t = g.token_trans
                    trans[off:off + g.n_states] = np.where(t >= 0, t + off, -1)
                    accept[off:off + g.n_states] = g.accepting
                    offsets[id(g)] = off
                    off += g.n_states
            cached = (key, jnp.asarray(trans), jnp.asarray(accept), offsets)
            self._gtables_cache = cached
        _, trans_d, accept_d, offsets = cached
        states = np.zeros(self.max_batch, np.int32)
        gflag = np.zeros(self.max_batch, bool)
        for r in reqs:
            if r is not None and r.guided is not None:
                states[r.row] = offsets[id(r.guided)] + r.gstate
                gflag[r.row] = True
        return trans_d, accept_d, states, gflag, offsets

    # -- the speculative macro-step ---------------------------------------
    def step(self) -> None:
        for row in range(self.max_batch):
            if self._live[row] is None and self._pending:
                nxt = self._pending[0]
                need = -(-(len(nxt.prompt) + nxt.max_new + self.gamma + 1)
                         // self.pool.page_size)
                if need > self.pool.free_pages:
                    break
                self._admit(self._pending.pop(0), row)

        live_reqs = [r for r in self._live if r is not None]
        if not live_reqs:
            return

        # emit the token computed by the previous step / prefill
        for r in list(self._live):
            if r is None:
                continue
            tok = int(self._next_tok[r.row])
            if tok in self._eos:
                r.finish = "eos"
                self._retire(r)
            else:
                r.out.append(tok)
                if len(r.out) >= r.max_new:
                    self._retire(r)

        live_reqs = [r for r in self._live if r is not None]
        if not live_reqs:
            return

        tables = np.zeros((self.max_batch, self.max_pages_per_seq), np.int32)
        pos0 = np.zeros(self.max_batch, np.int32)
        live = np.zeros(self.max_batch, np.int32)
        for r in live_reqs:
            tables[r.row, : len(r.pages)] = r.pages
            pos0[r.row] = r.pos
            live[r.row] = 1
        tables_j = jnp.asarray(tables)

        any_pen = any(r.penalized for r in live_reqs)
        any_sampled = any(not r.greedy for r in live_reqs)
        if any_pen:
            # --- penalized/guided macro-step: the draft proposes from the
            # fully-processed per-position distributions (counts/DFA advance
            # along the draft path on device) and the accept step replays the
            # identical processing on the target side ---
            from grasp_tpu.serving.paged import _MAX_TOP_K

            if self._dmulti_pen is None:
                self._dmulti_pen = _draft_multi_penalized_fn(
                    self.dconfig, self.dplan, self.max_pages_per_seq,
                    self.gamma, _MAX_TOP_K, quantized=self.dpool.quantized)
                self._accept_pen = _accept_penalized_fn(self.gamma, _MAX_TOP_K)
                self._commit_counts = _commit_counts_fn()
            if self._counts is None:  # no penalized request admitted yet
                V = self.config.vocab_size
                self._counts = jnp.zeros((self.max_batch, V), jnp.int32)
                self._bias = jnp.zeros((self.max_batch, V), jnp.float32)

            temps = np.ones(self.max_batch, np.float32)
            ks = np.zeros(self.max_batch, np.int32)
            tps = np.ones(self.max_batch, np.float32)
            greedy = np.ones(self.max_batch, bool)
            keys = np.zeros((self.max_batch, 2), np.uint32)
            min_ps = np.zeros(self.max_batch, np.float32)
            pres = np.zeros(self.max_batch, np.float32)
            freq = np.zeros(self.max_batch, np.float32)
            reps = np.ones(self.max_batch, np.float32)
            biased = np.zeros(self.max_batch, np.float32)
            for r in live_reqs:
                row = r.row
                if r.penalized:
                    min_ps[row] = r.min_p
                    pres[row] = r.presence_penalty
                    freq[row] = r.frequency_penalty
                    reps[row] = r.repetition_penalty
                    biased[row] = 1.0 if r.logit_bias else 0.0
                if not r.greedy:
                    greedy[row] = False
                    temps[row] = max(r.temperature, 1e-6)
                    ks[row] = r.top_k
                    tps[row] = r.top_p
                    keys[row] = np.asarray(jax.random.fold_in(
                        jax.random.PRNGKey(r.seed), r.emitted_steps))
                    r.emitted_steps += 1
            trans_d, accept_d, states, gflag, _ = self._guided_tables(live_reqs)
            keys_j, temps_j = jnp.asarray(keys), jnp.asarray(temps)
            ks_j, tps_j = jnp.asarray(ks), jnp.asarray(tps)
            greedy_j = jnp.asarray(greedy)
            pen_args = (jnp.asarray(min_ps), jnp.asarray(pres),
                        jnp.asarray(freq), jnp.asarray(reps))
            g_args = (trans_d, accept_d, jnp.asarray(states),
                      jnp.asarray(gflag), self._eos_mask_dev())
            biased_j = jnp.asarray(biased)

            (drafts_j, q_j, self.dpool.k_pages, self.dpool.v_pages,
             self.dpool.k_scales, self.dpool.v_scales) = self._primed_call(
                ("dmulti_pen", trans_d.shape[0]), self._dmulti_pen,
                self.dparams, jnp.asarray(self._next_tok), self.dpool.k_pages,
                self.dpool.v_pages, self.dpool.k_scales, self.dpool.v_scales,
                tables_j, jnp.asarray(pos0), jnp.asarray(live),
                keys_j, temps_j, ks_j, tps_j, greedy_j,
                self._counts, self._bias, biased_j, *pen_args, *g_args,
            )
            drafts = np.asarray(drafts_j, np.int32)

            verify_in = np.concatenate([self._next_tok[:, None], drafts], axis=1)
            (tlogits, self.pool.k_pages, self.pool.v_pages,
             self.pool.k_scales, self.pool.v_scales) = self._primed_call(
                "verify", self._verify,
                self.params, jnp.asarray(verify_in), self.pool.k_pages,
                self.pool.v_pages, self.pool.k_scales, self.pool.v_scales,
                tables_j, jnp.asarray(pos0), jnp.asarray(live),
            )
            a_j, corr_j, _ = self._accept_pen(
                tlogits, drafts_j, q_j, keys_j, temps_j, ks_j, tps_j, greedy_j,
                self._counts, self._bias, biased_j, *pen_args, *g_args)
            a_arr = np.asarray(a_j, np.int32)
            corr = np.asarray(corr_j, np.int32)

            # commit the emitted chunk's bookkeeping: counts fold in on
            # device; grammar states advance host-side (pick-time semantics —
            # the pending correction token counts/advances too)
            toks_pad = np.zeros((self.max_batch, self.gamma + 1), np.int32)
            nvalid = np.zeros(self.max_batch, np.int32)
            for r in live_reqs:
                row = r.row
                a = int(a_arr[row])
                toks_pad[row, :a] = drafts[row, :a]
                toks_pad[row, a] = corr[row]
                if r.penalized:
                    nvalid[row] = a + 1
                if r.guided is not None:
                    for tok in toks_pad[row, :a + 1]:
                        tok = int(tok)
                        if tok in self._eos:
                            break
                        ns = int(r.guided.token_trans[r.gstate, tok])
                        if ns >= 0:
                            r.gstate = ns
            if nvalid.any():
                self._counts = self._commit_counts(
                    self._counts, jnp.asarray(toks_pad), jnp.asarray(nvalid))
        elif any_sampled:
            # --- sampled draft phase + Leviathan acceptance (both fused) ---
            from grasp_tpu.serving.paged import _MAX_TOP_K

            if self._dmulti_sampled is None:
                self._dmulti_sampled = _draft_multi_sampled_fn(
                    self.dconfig, self.dplan, self.max_pages_per_seq,
                    self.gamma, _MAX_TOP_K, quantized=self.dpool.quantized)
                self._accept = _accept_fn(self.gamma, _MAX_TOP_K)

            temps = np.ones(self.max_batch, np.float32)
            ks = np.zeros(self.max_batch, np.int32)
            tps = np.ones(self.max_batch, np.float32)
            greedy = np.ones(self.max_batch, bool)
            keys = np.zeros((self.max_batch, 2), np.uint32)
            for r in live_reqs:
                if r.greedy:
                    continue
                greedy[r.row] = False
                temps[r.row] = max(r.temperature, 1e-6)
                ks[r.row] = r.top_k
                tps[r.row] = r.top_p
                # one chunk key per macro-step (fold_in per draft pick / accept
                # happens on device); emitted_steps is the stream position
                keys[r.row] = np.asarray(jax.random.fold_in(
                    jax.random.PRNGKey(r.seed), r.emitted_steps))
                r.emitted_steps += 1
            keys_j, temps_j = jnp.asarray(keys), jnp.asarray(temps)
            ks_j, tps_j = jnp.asarray(ks), jnp.asarray(tps)
            greedy_j = jnp.asarray(greedy)

            (drafts_j, q_j, self.dpool.k_pages, self.dpool.v_pages,
             self.dpool.k_scales, self.dpool.v_scales) = self._primed_call(
                "dmulti_sampled", self._dmulti_sampled,
                self.dparams, jnp.asarray(self._next_tok), self.dpool.k_pages,
                self.dpool.v_pages, self.dpool.k_scales, self.dpool.v_scales,
                tables_j, jnp.asarray(pos0), jnp.asarray(live),
                keys_j, temps_j, ks_j, tps_j, greedy_j,
            )
            drafts = np.asarray(drafts_j, np.int32)

            verify_in = np.concatenate([self._next_tok[:, None], drafts], axis=1)
            (tlogits, self.pool.k_pages, self.pool.v_pages,
             self.pool.k_scales, self.pool.v_scales) = self._primed_call(
                "verify", self._verify,
                self.params, jnp.asarray(verify_in), self.pool.k_pages,
                self.pool.v_pages, self.pool.k_scales, self.pool.v_scales,
                tables_j, jnp.asarray(pos0), jnp.asarray(live),
            )
            a_j, corr_j, _ = self._accept(
                tlogits, drafts_j, q_j, keys_j, temps_j, ks_j, tps_j, greedy_j)
            a_arr = np.asarray(a_j, np.int32)
            corr = np.asarray(corr_j, np.int32)
        else:
            # --- greedy draft phase: gamma+1 single-token paged decodes fused
            # into ONE dispatch (lax.fori_loop feeds each argmax into the next
            # step on device; the last iteration only lands d_gamma's KV,
            # mirroring SpeculativeGenerator). One host sync for the block.
            (drafts_j, self.dpool.k_pages, self.dpool.v_pages,
             self.dpool.k_scales, self.dpool.v_scales) = self._primed_call(
                "dmulti", self._dmulti,
                self.dparams, jnp.asarray(self._next_tok), self.dpool.k_pages,
                self.dpool.v_pages, self.dpool.k_scales, self.dpool.v_scales,
                tables_j, jnp.asarray(pos0), jnp.asarray(live),
            )
            drafts = np.asarray(drafts_j, np.int32)

            # --- target verify: one batched (gamma+1)-token paged forward ---
            verify_in = np.concatenate([self._next_tok[:, None], drafts], axis=1)
            (tlogits, self.pool.k_pages, self.pool.v_pages,
             self.pool.k_scales, self.pool.v_scales) = self._primed_call(
                "verify", self._verify,
                self.params, jnp.asarray(verify_in), self.pool.k_pages,
                self.pool.v_pages, self.pool.k_scales, self.pool.v_scales,
                tables_j, jnp.asarray(pos0), jnp.asarray(live),
            )
            targets = np.asarray(jnp.argmax(tlogits, axis=-1), np.int32)  # [B, g+1]
            a_arr = np.zeros(self.max_batch, np.int32)
            corr = np.zeros(self.max_batch, np.int32)
            for r in live_reqs:
                row = r.row
                matches = np.cumprod(targets[row, : self.gamma] == drafts[row])
                a_arr[row] = matches.sum()
                corr[row] = targets[row, a_arr[row]]

        # --- emission per row (host bookkeeping) ---
        self.last_stats["chunks"] += len(live_reqs)
        self.last_stats["drafted"] += len(live_reqs) * self.gamma
        for r in list(self._live):
            if r is None:
                continue
            row = r.row
            a = int(a_arr[row])
            self.last_stats["accepted"] += a
            # emitted this macro-step: verify_in[1..a] (= d_1..d_a, already
            # counted as the NEXT tokens) then the correction/bonus token as
            # the new pending token. verify_in[0] was emitted at step() top.
            chunk = list(drafts[row, :a]) + [int(corr[row])]
            # r.pos currently counts tokens whose KV is final through
            # verify_in[0]; advance past the accepted region
            r.pos += a + 1
            self._recycle_window_pages(r)
            for j, tok in enumerate(chunk):
                is_last = j == len(chunk) - 1
                if is_last:
                    self._next_tok[row] = tok  # pending, emitted next step
                    break
                if tok in self._eos:
                    r.finish = "eos"
                    self._retire(r)
                    break
                r.out.append(tok)
                if len(r.out) >= r.max_new:
                    self._retire(r)
                    break

    @property
    def acceptance_rate(self) -> float:
        return self.last_stats["accepted"] / max(self.last_stats["drafted"], 1)
