"""Paged KV cache + continuous batching for mixed-length serving.

Beyond-reference serving extension (the reference's only generation path is
HF ``model.generate`` one request at a time, tools/eval_longbench.py:337-353).
The dense batched generator (eval/generate.Generator.greedy_batch) allocates
``max_len`` KV per row — mixed-length streams waste HBM and a long request
pins the whole batch. Here KV lives in a global **page pool** per layer:

  - ``k_pages/v_pages: [L, nkv, num_pages, page_size, hd]`` device arrays with
    static shapes (jit-stable regardless of request mix);
  - each sequence owns a **page table** (logical block -> physical page); the
    decode step scatters the new token's K/V into its page slot, then on TPU
    attends through jax's fused paged-attention Pallas kernel (pages + tables
    read inside the kernel — no gathered KV copy, which would cost 2x the KV
    traffic); off-TPU an XLA gather + attention keeps the path portable, and
    both paths are pinned token-identical (`test_paged_attention_kernel_on_tpu`);
  - a free-list allocator recycles pages the moment a request finishes, so
    throughput tracks the *live* token count, not the worst-case batch shape;
  - :class:`ServingEngine` does continuous batching: requests join mid-flight
    (prefill into freshly allocated pages), finished rows retire and free
    their pages, every decode step advances ALL live rows in one jitted call.

Correctness gate: paged decode matches the dense-cache decode bit-for-bit
within fp tolerance on rank-heterogeneous (GRASP-compressed) plans
(tests/test_paged_serving.py).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import (
    PROJ_ORDER,
    ModelPlan,
    Params,
    _forward_with_cache,
    _lm_logits,
    apply_rope,
    attn_mlp_residual,
    default_plan,
    embed_lookup,
    init_kv_cache,
    prefill,
    proj_apply,
    rms_norm,
    rope_cos_sin,
)


class PagePool:
    """Global KV page pool (device) + host-side refcounting allocator.

    quantized=True stores pages int8 with per-(page-slot, head) fp32 absmax
    scales — ~half the KV gather traffic (models.llama int8-KV scheme).

    Pages are refcounted so the prefix cache (ServingEngine prefix_cache=True)
    can share one physical page between requests whose prompts agree on its
    token content: ``lookup_shared`` takes an extra reference, ``free``
    releases one, and a zero-ref page that is *registered* under a content
    hash parks in an LRU "evictable" set instead of the free list — still
    allocatable (``alloc`` evicts least-recently-shared first), but reusable
    as cached KV until pool pressure reclaims it (vLLM-style automatic
    prefix caching, re-designed for jit-static page tables)."""

    def __init__(self, config: ModelConfig, num_pages: int, page_size: int = 128,
                 dtype=None, quantized: bool = False):
        self.config = config
        self.num_pages = num_pages
        self.page_size = page_size
        self.quantized = quantized
        dtype = jnp.int8 if quantized else (dtype or jnp.dtype(config.dtype))
        # layout [L, nkv, P, ps, hd] matches the TPU paged-attention kernel's
        # [num_kv_heads, total_pages, page_size, head_dim] per layer
        shape = (config.num_hidden_layers, config.num_key_value_heads, num_pages,
                 page_size, config.head_dim_)
        self.k_pages = jnp.zeros(shape, dtype)
        self.v_pages = jnp.zeros(shape, dtype)
        if quantized:
            sshape = shape[:-1] + (1,)
            self.k_scales = jnp.ones(sshape, jnp.float32)
            self.v_scales = jnp.ones(sshape, jnp.float32)
        else:
            self.k_scales = self.v_scales = None
        # page 0 is reserved as the null page unallocated table slots point at
        self._free: List[int] = list(range(num_pages - 1, 0, -1))
        self._ref = [0] * num_pages
        # content hash <-> page for the prefix cache; zero-ref registered
        # pages wait here (LRU order) until re-shared or evicted by alloc
        self._hash_to_page: Dict[bytes, int] = {}
        self._page_to_hash: Dict[int, bytes] = {}
        self._evictable: "OrderedDict[int, None]" = OrderedDict()

    def alloc(self, n: int) -> List[int]:
        if n > self.free_pages:
            raise MemoryError(
                f"page pool exhausted: need {n}, have {self.free_pages} free")
        out = []
        for _ in range(n):
            if self._free:
                p = self._free.pop()
            else:  # reclaim the least-recently-shared cached page
                p, _ = self._evictable.popitem(last=False)
                del self._hash_to_page[self._page_to_hash.pop(p)]
            self._ref[p] = 1
            out.append(p)
        return out

    def free(self, pages: List[int]) -> None:
        """Release one reference per page; a zero-ref page returns to the
        free list, unless it is registered in the prefix cache (then it
        parks in the evictable LRU, still counted by free_pages)."""
        for p in pages:
            if p <= 0:
                continue
            self._ref[p] -= 1
            if self._ref[p] > 0:
                continue
            if p in self._page_to_hash:
                self._evictable[p] = None
                self._evictable.move_to_end(p)
            else:
                self._free.append(p)

    def lookup_shared(self, key: bytes) -> Optional[int]:
        """Page registered under `key`, with a new reference taken (the
        caller now co-owns it and must free() it exactly once)."""
        p = self._hash_to_page.get(key)
        if p is None:
            return None
        self._ref[p] += 1
        self._evictable.pop(p, None)
        return p

    def register(self, page: int, key: bytes) -> None:
        """Publish a freshly written full page under its content hash. A key
        that is already cached keeps its existing page (first writer wins —
        both hold identical KV, so either is correct)."""
        if key in self._hash_to_page or page in self._page_to_hash:
            return
        self._hash_to_page[key] = page
        self._page_to_hash[page] = key

    @property
    def free_pages(self) -> int:
        return len(self._free) + len(self._evictable)


def _paged_decode_fn(config: ModelConfig, plan: ModelPlan, max_pages_per_seq: int,
                     quantized: bool = False, raw: bool = False):
    """Build the jitted one-token decode over the page pool.

    raw=True returns the UN-jitted body (no donation) for callers that embed
    the step inside a larger jit — e.g. the speculative engine's fused
    multi-step draft loop (spec_paged._draft_multi_fn).

    (params, toks [B], k_pages, v_pages, [k_scales, v_scales,] tables [B, P],
     pos [B], live [B]) -> (logits [B, V], k_pages, v_pages[, scales...])
    pos[b] = number of tokens already in sequence b's cache (the new token's
    slot). Dead rows (live=0) write into the reserved null page 0 slot 0.
    quantized: int8 pages + per-slot scales (PagePool quantized=True); the
    scales commute out of both attention contractions.

    On TPU the attention runs through jax's fused paged-attention Pallas
    kernel (pages + tables read inside the kernel — no gathered KV copy,
    which costs 2x the KV traffic); elsewhere an XLA gather + attention
    keeps the path portable. GRASP_PAGED_KERNEL=0 forces the XLA path.
    """
    import os

    # a window >= the table capacity never masks anything: slot > pos - w
    # is implied by slot < t_max <= w, so the kernels' [0, pos] span is
    # exactly the windowed visibility and the 1.49x kernel stays usable
    # (e.g. the mistral-7b preset, w=4096, served at t_max 1024)
    def _windows_irrelevant(t_max):
        return all(
            config.layer_window(li) is None or config.layer_window(li) >= t_max
            for li in range(config.num_hidden_layers))

    use_kernel = (
        jax.default_backend() == "tpu"
        # the fused kernels attend to [0, pos] and cannot softcap;
        # capped models take the gather path
        and config.attn_logit_softcapping is None
        # the kernel requires lane-aligned head_dim (probed on v5e: hd=64
        # fails block-shape checks for every head combo; hd=128 works) —
        # LLaMA-2/Mistral/Qwen2 all have hd=128; TinyLlama (hd=64) routes
        # through our own sub-lane kernel below
        and config.head_dim_ % 128 == 0
        and os.environ.get("GRASP_PAGED_KERNEL", "1") != "0"
    )
    # sub-lane head dims (TinyLlama's hd=64): our own paged kernel — pages
    # read in place via scalar-prefetched tables, online softmax across page
    # steps (ops/pallas_paged64.py). fp pools only; int8 keeps the gather.
    use_kernel64 = (
        not use_kernel
        and jax.default_backend() == "tpu"
        and config.attn_logit_softcapping is None
        and config.head_dim_ < 128
        and not quantized
        and os.environ.get("GRASP_PAGED64_KERNEL", "1") != "0"
    )
    # pages_per_compute_block must divide the per-sequence page count
    ppcb = max(d for d in range(1, min(4, max_pages_per_seq) + 1)
               if max_pages_per_seq % d == 0)

    def fn(params, toks, k_pages, v_pages, k_scales, v_scales, tables, pos, live):
        L, nkv, num_pages, page_size, hd = k_pages.shape
        b = toks.shape[0]
        nh = config.num_attention_heads
        t_max = max_pages_per_seq * page_size
        win_ok = config.sliding_window is None or _windows_irrelevant(t_max)
        use_k = use_kernel and win_ok
        use_k64 = use_kernel64 and win_ok

        cos, sin = rope_cos_sin(pos[:, None], hd, config.rope_theta,
                                scaling=config.rope_scaling)  # [B,1,hd]

        h = embed_lookup(params, toks, config)[:, None, :]  # [B,1,d]

        logical_page = pos // page_size
        offset = pos % page_size
        phys = jnp.take_along_axis(tables, logical_page[:, None], axis=1)[:, 0]
        phys = jnp.where(live > 0, phys, 0)  # dead rows scribble on the null page

        # validity of each gathered slot: absolute slot index <= pos (inclusive
        # of the token written this step)
        slot_idx = jnp.arange(t_max)[None, :]
        _biases = {}

        def bias_for(w):  # one mask per distinct per-layer window (Gemma-2)
            if w not in _biases:
                valid = (slot_idx <= pos[:, None]) & (live > 0)[:, None]
                if w is not None:  # windowed attention (Mistral / Gemma-2)
                    valid &= slot_idx > pos[:, None] - w
                _biases[w] = jnp.where(
                    valid, 0.0, jnp.finfo(jnp.float32).min)[:, None, None, :]
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
            q = proj_apply(x, ap["q_proj"], kinds["q_proj"]).reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
            k = proj_apply(x, ap["k_proj"], kinds["k_proj"]).reshape(b, 1, nkv, hd).transpose(0, 2, 1, 3)
            v = proj_apply(x, ap["v_proj"], kinds["v_proj"]).reshape(b, 1, nkv, hd).transpose(0, 2, 1, 3)
            q, k = apply_rope(q, k, cos, sin)

            # scatter this token's K/V into its page slot. NB advanced-index
            # semantics: the scalar li + phys/offset arrays are all advanced
            # indices separated by the head-dim slice, so the broadcast [B]
            # dim lands FIRST — values are [B, nkv, hd].
            if quantized:
                from grasp_tpu.models.llama import _quantize_kv

                k8, ks = _quantize_kv(k)
                v8, vs = _quantize_kv(v)
                k_pages = k_pages.at[li, :, phys, offset, :].set(k8[:, :, 0, :], mode="drop")
                v_pages = v_pages.at[li, :, phys, offset, :].set(v8[:, :, 0, :], mode="drop")
                k_scales = k_scales.at[li, :, phys, offset, :].set(ks[:, :, 0, :], mode="drop")
                v_scales = v_scales.at[li, :, phys, offset, :].set(vs[:, :, 0, :], mode="drop")
            else:
                k_pages = k_pages.at[li, :, phys, offset, :].set(
                    k[:, :, 0, :].astype(k_pages.dtype), mode="drop")
                v_pages = v_pages.at[li, :, phys, offset, :].set(
                    v[:, :, 0, :].astype(v_pages.dtype), mode="drop")

            if use_k64:
                from grasp_tpu.ops.pallas_paged64 import paged_attention_hd64

                lengths = jnp.where(live > 0, pos + 1, 1)
                attn = paged_attention_hd64(
                    q[:, :, 0, :].astype(h.dtype), k_pages[li], v_pages[li],
                    lengths, tables, scale=a_scale,
                )[:, :, None, :]  # [B, nh, 1, hd]
            elif use_k:
                # fused TPU paged attention: reads pages via the page table
                # inside the kernel — no gathered [B, nkv, T, hd] copy
                from jax.experimental.pallas.ops.tpu.paged_attention import (
                    paged_attention,
                )
                from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
                    QuantizedTensor,
                )

                lengths = jnp.where(live > 0, pos + 1, 1)
                if quantized:
                    kp = QuantizedTensor(k_pages[li], k_scales[li] * 127.5)
                    vp = QuantizedTensor(v_pages[li], v_scales[li] * 127.5)
                else:
                    kp, vp = k_pages[li], v_pages[li]
                attn = paged_attention(
                    (q[:, :, 0, :] * a_scale).astype(h.dtype),
                    kp, vp, lengths, tables,
                    pages_per_compute_block=ppcb,
                )[:, None, :, :].transpose(0, 2, 1, 3)  # [B, nh, 1, hd]
            else:
                # XLA gather path (CPU / portability): [nkv, B, pages, ps, hd]
                # -> [B, nkv, T, hd]
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
                    probs = (probs * vs_seq[:, :, None, :].astype(q.dtype))
                attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v_seq.astype(q.dtype),
                                  preferred_element_type=q.dtype)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, nh * hd)
            attn = proj_apply(attn, ap["o_proj"], kinds["o_proj"])
            h = attn_mlp_residual(h, attn, lp, kinds, config)

        h = rms_norm(h, params["norm"]["weight"], config.rms_norm_eps,
                     plus_one=config.norm_plus_one)
        logits = _lm_logits(h, params, softcap=config.final_logit_softcapping)[:, 0, :]
        return logits, k_pages, v_pages, k_scales, v_scales

    if raw:
        return fn
    donate = (2, 3, 4, 5) if quantized else (2, 3)
    return jax.jit(fn, donate_argnums=donate)


_MAX_TOP_K = 64  # static cap sizing the batched per-row top-k (lax.top_k)


def _make_sampler(max_k: int):
    """Batched per-row sampler: rows mix greedy and sampled decoding.

    Per-row temperature / top-k (traced k <= max_k) / top-p with HF
    semantics; greedy rows (temperature 0) take argmax. One jitted call per
    decode step, same dispatch count as the argmax it replaces.
    """

    def pick(logits, keys, temps, ks, top_ps, greedy):
        from grasp_tpu.eval.generate import topk_topp_filter

        scaled = logits.astype(jnp.float32) / temps[:, None]
        filt = topk_topp_filter(scaled, ks, top_ps, max_k)
        sampled = jax.vmap(jax.random.categorical)(keys, filt).astype(jnp.int32)
        return jnp.where(greedy, jnp.argmax(logits, axis=-1).astype(jnp.int32), sampled)

    @jax.jit
    def sample(logits, keys, temps, ks, top_ps, greedy):
        return pick(logits, keys, temps, ks, top_ps, greedy)

    @jax.jit
    def sample_lp(logits, keys, temps, ks, top_ps, greedy):
        """Same token choice (identical math), plus the MODEL's raw
        log-probabilities for the chosen token and the top-_MAX_LOGPROBS
        alternatives (OpenAI `logprobs` semantics: the unfiltered, untempered
        distribution — sampling filters affect the pick, not the report)."""
        toks = pick(logits, keys, temps, ks, top_ps, greedy)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        chosen = jnp.take_along_axis(lp, toks[:, None].astype(jnp.int32), -1)[:, 0]
        top_lps, top_ids = jax.lax.top_k(lp, _MAX_LOGPROBS)
        return toks, chosen, top_ids.astype(jnp.int32), top_lps

    return sample, sample_lp


def apply_penalties(logits, counts, bias, pres, freq, reps):
    """Context-dependent logit adjustments, [B, V] batched:

    - ``bias``: per-row dense logit offsets (OpenAI logit_bias), added first;
    - ``reps``: HF RepetitionPenaltyLogitsProcessor — a SEEN token's
      (post-bias) logit divides by the penalty when >= 0, multiplies when < 0
      (transformers logits_process.py semantics, pinned golden);
    - ``pres``/``freq``: OpenAI presence/frequency — subtract
      pres * [count > 0] + freq * count.

    counts: [B, V] int token counts over prompt + generated tokens (vLLM
    convention). Identity settings (bias 0, rep 1, pres/freq 0) are fp-exact
    no-ops."""
    l = logits.astype(jnp.float32) + bias
    seen = counts > 0
    pen = jnp.where(l < 0, l * reps[:, None], l / reps[:, None])
    l = jnp.where(seen, pen, l)
    return l - counts.astype(jnp.float32) * freq[:, None] - seen * pres[:, None]


def _make_penalized_sampler(max_k: int):
    """Sampler variant with per-row logit_bias, presence/frequency penalties
    (OpenAI semantics), HF repetition_penalty, and min_p — plus the device
    token-count bookkeeping they need.

    counts/bias are [max_batch, V] engine-resident buffers; `rows` maps each
    logits row to its engine row, `upd` masks which picks are real (stalled
    rows must not count a discarded token). Rows at the identity settings
    (bias 0, pres/freq 0, rep 1, min_p 0) reduce EXACTLY to the plain
    sampler's math (x+0, x/1, x-0 are fp-exact), so mixed batches never
    perturb unpenalized requests. Applied before temperature, HF
    processor-then-warper order: bias -> repetition -> presence/frequency ->
    temperature -> top_k -> top_p -> min_p. Greedy rows argmax the ADJUSTED
    logits (penalties steer greedy decoding too, OpenAI behavior).

    An optional trailing [B, V] bool allow-mask (guided decoding) applies
    before everything else: disallowed tokens become -inf for both the
    sample and the greedy argmax; an all-True row is an fp-exact no-op.
    The jit retraces once per arity (with/without the mask).
    """
    neg = jnp.finfo(jnp.float32).min

    def pick(logits, counts, rows, upd, bias, biased, keys, temps, ks, top_ps,
             min_ps, pres, freq, reps, greedy, *guided):
        from grasp_tpu.eval.generate import topk_topp_filter

        # `biased` gates the bias read per row: unlike counts/pres/freq/reps
        # (identity-by-value for plain rows), a STALE bias row from the
        # row's previous tenant is not identity — it must be masked out
        adj = apply_penalties(logits, counts[rows],
                              bias[rows] * biased[:, None], pres, freq, reps)
        if len(guided) == 1:
            # host-built [B, V] allow-mask (fallback: several grammars in
            # one batch)
            adj = jnp.where(guided[0], adj, neg)
        elif len(guided) == 5:
            # device-resident grammar (the common single-grammar batch): the
            # mask derives ON DEVICE from the row states — no [B, V] upload
            # per step through the slow host link. eos is allowed exactly in
            # accepting states; a starved row (no token allowed) force-stops
            # on eos; non-guided rows (gflag 0) are unmasked.
            table, accept, states, gflag, eosmask = guided
            rowmask = table[states]
            rowmask = rowmask | (eosmask[None, :] & accept[states][:, None])
            starved = ~rowmask.any(axis=-1)
            rowmask = rowmask | (eosmask[None, :] & starved[:, None])
            adj = jnp.where(gflag[:, None] & ~rowmask, neg, adj)
        filt = topk_topp_filter(adj / temps[:, None], ks, top_ps, max_k,
                                min_ps=min_ps)
        sampled = jax.vmap(jax.random.categorical)(keys, filt).astype(jnp.int32)
        toks = jnp.where(greedy, jnp.argmax(adj, axis=-1).astype(jnp.int32),
                         sampled)
        counts = counts.at[rows, toks].add(upd)
        return toks, counts

    def sample(logits, counts, rows, upd, bias, biased, keys, temps, ks,
               top_ps, min_ps, pres, freq, reps, greedy, *mask):
        return pick(logits, counts, rows, upd, bias, biased, keys, temps, ks,
                    top_ps, min_ps, pres, freq, reps, greedy, *mask)

    def sample_lp(logits, counts, rows, upd, bias, biased, keys, temps, ks,
                  top_ps, min_ps, pres, freq, reps, greedy, *mask):
        """Penalized pick + the MODEL's raw logprobs (penalties and filters
        affect the pick, never the report — plain-sampler semantics)."""
        toks, counts = pick(logits, counts, rows, upd, bias, biased, keys,
                            temps, ks, top_ps, min_ps, pres, freq, reps,
                            greedy, *mask)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        chosen = jnp.take_along_axis(lp, toks[:, None].astype(jnp.int32), -1)[:, 0]
        top_lps, top_ids = jax.lax.top_k(lp, _MAX_LOGPROBS)
        return toks, counts, chosen, top_ids.astype(jnp.int32), top_lps

    return jax.jit(sample), jax.jit(sample_lp)


class _Request:
    __slots__ = ("rid", "prompt", "pages", "pos", "out", "max_new", "done", "row",
                 "temperature", "top_k", "top_p", "seed", "emitted_steps",
                 "freed_pages", "reserved", "logprobs", "lp",
                 "presence_penalty", "frequency_penalty", "repetition_penalty",
                 "min_p", "logit_bias", "finish", "guided", "gstate")

    def __init__(self, rid, prompt, max_new, temperature=0.0, top_k=0, top_p=1.0,
                 seed=0, logprobs=0, presence_penalty=0.0, frequency_penalty=0.0,
                 repetition_penalty=1.0, min_p=0.0, logit_bias=None):
        self.rid = rid
        self.prompt = np.asarray(prompt).reshape(-1).astype(np.int32)
        self.pages: List[int] = []
        self.pos = 0          # tokens currently in cache
        self.out: List[int] = []
        self.max_new = max_new
        self.done = False
        self.row = -1         # batch slot while live
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.seed = 0 if seed is None else int(seed)
        self.emitted_steps = 0  # PRNG stream position (fold_in per pick)
        self.freed_pages = 0    # leading logical pages recycled (sliding window)
        self.reserved = 0       # pages reserved against the pool (lazy mode)
        self.logprobs = int(logprobs)  # top-N logprobs per token (0 = off)
        self.lp: List[tuple] = []      # (chosen_lp, top_ids, top_lps) per out tok
        self.presence_penalty = float(presence_penalty)
        self.frequency_penalty = float(frequency_penalty)
        self.repetition_penalty = float(repetition_penalty)
        self.min_p = float(min_p)
        self.logit_bias = dict(logit_bias) if logit_bias else None
        self.finish = "length"  # why the request retired: eos/length/cancel
        self.guided = None      # CompiledGrammar (guided decoding) or None
        self.gstate = 0         # current DFA state while guided

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0 or self.top_k == 1

    @property
    def penalized(self) -> bool:
        """Needs the penalized sampler (counts/bias device bookkeeping)."""
        return (self.presence_penalty != 0.0 or self.frequency_penalty != 0.0
                or self.repetition_penalty != 1.0 or self.min_p > 0.0
                or self.logit_bias is not None or self.guided is not None)


def _build_gather(L: int, quant: bool, prefix_len: int):
    """Jitted gather of cached prefix pages into a temp prefill cache."""

    @jax.jit
    def fn(cache, k_pages, v_pages, k_scales, v_scales, sh):
        planes = [("k", k_pages), ("v", v_pages)]
        if quant:
            planes += [("k_scale", k_scales), ("v_scale", v_scales)]
        out = []
        for li in range(L):
            lc = dict(cache[li])
            for nm, pages in planes:
                pk = pages[li][:, sh]  # [nkv, hits, ps, last]
                lc[nm] = lc[nm].at[:, :, :prefix_len].set(
                    pk.reshape(pk.shape[0], prefix_len, pk.shape[-1])[None])
            out.append(lc)
        return out

    return fn


def _build_scatter(L: int, quant: bool, ps: int, n_new: int, prefix_len: int):
    """Jitted scatter of prefilled suffix KV into its pages (pools donated)."""

    def to_pages(arr):
        # suffix slots [prefix_len, s_pad) of [1, nkv, s_pad, last]
        # -> [n_new, nkv, ps, last]: the scalar li + phys array are
        # advanced indices separated by the head slice, so the page
        # dim lands first in the indexed result
        a = arr[0, :, prefix_len:]
        return a.reshape(a.shape[0], n_new, ps, a.shape[-1]).transpose(1, 0, 2, 3)

    def fn(k_pages, v_pages, k_scales, v_scales, cache, phys):
        for li in range(L):
            k_pages = k_pages.at[li, :, phys].set(
                to_pages(cache[li]["k"]).astype(k_pages.dtype))
            v_pages = v_pages.at[li, :, phys].set(
                to_pages(cache[li]["v"]).astype(v_pages.dtype))
            if quant:
                k_scales = k_scales.at[li, :, phys].set(
                    to_pages(cache[li]["k_scale"]))
                v_scales = v_scales.at[li, :, phys].set(
                    to_pages(cache[li]["v_scale"]))
        return k_pages, v_pages, k_scales, v_scales

    return jax.jit(fn, donate_argnums=(0, 1, 2, 3) if quant else (0, 1))


class _Admission:
    """In-progress (possibly chunked) admission: the request, its temp
    prefill cache, and how far the prompt has been prefilled."""

    __slots__ = ("req", "row", "s_pad", "prefix_len", "keys", "cache", "filled")

    def __init__(self, req, row, s_pad, prefix_len, keys, cache):
        self.req = req
        self.row = row
        self.s_pad = s_pad
        self.prefix_len = prefix_len
        self.keys = keys
        self.cache = cache
        self.filled = prefix_len  # tokens already in the temp cache


_MAX_LOGPROBS = 8  # static top-N cap for the logprob-reporting sampler
_MAX_BIAS_ENTRIES = 300  # per-request logit_bias size cap (OpenAI's limit)

# shared across engines (one jit each); the lp variant picks the identical
# token and additionally reports model logprobs
_sample_tokens, _sample_tokens_lp = _make_sampler(_MAX_TOP_K)
_sample_pen, _sample_pen_lp = _make_penalized_sampler(_MAX_TOP_K)


class ServingEngine:
    """Continuous-batching greedy server over the paged KV pool.

    submit() enqueues; step() admits pending requests (prefill into freshly
    allocated pages) and advances every live row one token in a single jitted
    decode; finished requests free their pages immediately. collect() drains
    completed outputs. The decode compiles ONCE per (max_batch,
    max_pages_per_seq) — request churn never recompiles.
    """

    def __init__(self, params: Params, config: ModelConfig, plan: Optional[ModelPlan] = None,
                 num_pages: int = 64, page_size: int = 128, max_batch: int = 8,
                 max_pages_per_seq: int = 8, eos_token_id: Optional[int] = None,
                 quantized_kv: bool = False, prefix_cache: bool = False,
                 prefill_chunk: Optional[int] = None, tokenizer=None):
        if prefill_chunk is not None and (
                prefill_chunk <= 0 or prefill_chunk % page_size):
            raise ValueError(
                f"prefill_chunk={prefill_chunk} must be a positive multiple "
                f"of page_size={page_size}")
        self.params = params
        self.config = config
        self.plan = plan or default_plan(config)
        self.pool = PagePool(config, num_pages, page_size, quantized=quantized_kv)
        self.max_batch = max_batch
        self.max_pages_per_seq = max_pages_per_seq
        # eos_token_id: one id or an iterable of them (LLaMA-3-style models
        # stop on both <|end_of_text|> and <|eot_id|>)
        self.eos = eos_token_id
        if eos_token_id is None:
            self._eos = frozenset()
        elif isinstance(eos_token_id, (int, np.integer)):
            self._eos = frozenset([int(eos_token_id)])
        else:
            self._eos = frozenset(int(t) for t in eos_token_id)
        self._decode = _paged_decode_fn(config, self.plan, max_pages_per_seq,
                                        quantized=quantized_kv)
        self._prefill_fns: Dict[Tuple[int, int], any] = {}
        self._primed: set = set()
        # automatic prefix caching: full prompt pages are content-hashed and
        # shared across requests (refcounted, see PagePool); a hit skips the
        # prefix's prefill compute — only the prompt suffix runs the model
        # (KV at position p depends only on tokens [0, p], so shared pages
        # are bit-identical to recomputed ones). Off by default: sharing
        # keeps zero-ref pages parked in the pool, which changes free-page
        # timing (never correctness).
        self.prefix_cache = bool(prefix_cache)
        self.prefix_tokens_saved = 0  # prefill tokens skipped via cache hits
        self.prefix_tokens_total = 0  # prompt tokens admitted (hit-rate denom)
        # chunked prefill: admission runs the prompt through the model
        # prefill_chunk tokens per step() instead of all at once, so live
        # rows keep decoding while a long prompt admits (no head-of-line
        # blocking). None = whole-prompt admission (one chunk).
        self.prefill_chunk = prefill_chunk
        self._admitting: Dict[int, "_Admission"] = {}  # row -> in-progress
        # per-row token counts + dense logit bias for penalized sampling
        # ([max_batch, V] device buffers), allocated on first penalized
        # request; rows at identity settings never read their (stale) slices
        self._counts = None
        self._bias = None
        # guided decoding: tokenizer gives token -> bytes for the grammar
        # DFA; compiled grammars cache per pattern (serving/guided.py)
        self.tokenizer = tokenizer
        self._grammars: Dict[str, object] = {}
        self._token_bytes = None

        # window used for page recycling (subclasses with a second reader —
        # the speculative draft pool — tighten this to respect both masks).
        # Per-layer alternation (Gemma-2): full-attention layers read every
        # slot, so recycling is only safe when all layers slide
        self._window_recycle = config.sliding_window
        if config.layer_types is not None and any(
                t != "sliding_attention" for t in config.layer_types):
            self._window_recycle = None
        # windowed rows allocate pages lazily (one as the write position
        # enters it) and recycle expired ones, so their live pages stay
        # O(window/page_size) — the rolling-buffer cache. Subclasses whose
        # step() does not implement the ensure/stall dance (the speculative
        # engine) keep full upfront allocation and only recycle.
        self._lazy_pages = self._window_recycle is not None
        # lazy mode reserves each admitted row's PEAK page demand (prompt
        # pages + the in-window band) so the pool is never overcommitted:
        # without the reservation, rows admitted against instantaneous
        # free_pages can exhaust the pool in lockstep before recycling
        # starts and ALL stall — a permanent livelock
        self._reserved_pages = 0
        self._pending: List[_Request] = []
        self._live: List[Optional[_Request]] = [None] * max_batch
        self._finished: List[_Request] = []
        self._next_tok = np.zeros(max_batch, np.int32)
        self._next_lp: List[Optional[tuple]] = [None] * max_batch
        self._rid = 0

    def _bounded_need(self, prompt_len: int, max_new: int) -> int:
        """Peak pages a request can ever hold. Full prompt+generation count,
        or — with lazy alloc + window recycling — the prompt pages plus the
        in-window band (holdings provably never exceed it: the write page
        trails the first unexpired page by < window + page_size slots)."""
        ps = self.pool.page_size
        full = -(-(prompt_len + max_new) // ps)
        if not self._lazy_pages:
            return full
        band = -(-self._window_recycle // ps) + 2
        return min(full, -(-max(prompt_len, 1) // ps) + band)

    # -- public API --------------------------------------------------------
    def submit(self, prompt_ids, max_new_tokens: int, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 1.0, seed: Optional[int] = None,
               logprobs: int = 0, presence_penalty: float = 0.0,
               frequency_penalty: float = 0.0, repetition_penalty: float = 1.0,
               min_p: float = 0.0,
               logit_bias: Optional[Dict[int, float]] = None,
               guided_regex: Optional[str] = None) -> int:
        """Enqueue a request. temperature=0 (default) decodes greedily;
        otherwise temperature/top-k/top-p sampling with a per-request seed —
        rows with different settings batch together in one decode step.

        seed=None defaults to the request id, so an *unseeded* sampled
        request's output depends on its submission order within this engine
        instance. Pass an explicit seed for output that depends only on the
        request itself (docs/serving.md's determinism guarantee).

        logprobs=N (<= _MAX_LOGPROBS) additionally records, per emitted token,
        the MODEL's log-probability of the chosen token and the top-N
        alternatives (raw distribution — sampling filters affect the pick,
        never the report); read them from the request objects returned by
        :meth:`collect_requests`. Token choice is bit-identical with and
        without logprobs.

        presence_penalty / frequency_penalty ([-2, 2], OpenAI semantics:
        subtract pres*[seen] + freq*count), repetition_penalty (> 0, HF
        semantics: seen tokens' logits /p if >= 0 else *p), min_p ([0, 1],
        drop tokens below min_p * top-token probability, after top-k/top-p),
        and logit_bias ({token_id: offset in [-100, 100]}) steer the pick —
        greedy rows argmax the adjusted logits. Counts cover prompt +
        generated tokens (vLLM semantics). Requests at the defaults are
        bit-identical to the plain sampler, even batched with penalized
        rows.

        guided_regex constrains the OUTPUT to (a prefix of) the pattern:
        every step masks to the tokens the grammar DFA can consume, eos is
        allowed exactly in accepting states (serving/guided.py). Needs the
        engine's tokenizer (token -> bytes) and a configured eos. Compiled
        grammars cache per pattern across requests."""
        if top_k > _MAX_TOP_K:
            raise ValueError(f"top_k={top_k} > supported max {_MAX_TOP_K}")
        if not 0 <= logprobs <= _MAX_LOGPROBS:
            raise ValueError(f"logprobs={logprobs} not in [0, {_MAX_LOGPROBS}]")
        if not -2.0 <= presence_penalty <= 2.0:
            raise ValueError(f"presence_penalty={presence_penalty} not in [-2, 2]")
        if not -2.0 <= frequency_penalty <= 2.0:
            raise ValueError(f"frequency_penalty={frequency_penalty} not in [-2, 2]")
        if not repetition_penalty > 0:
            raise ValueError(f"repetition_penalty={repetition_penalty} must be > 0")
        if not 0.0 <= min_p <= 1.0:
            raise ValueError(f"min_p={min_p} not in [0, 1]")
        if logit_bias is not None:
            if len(logit_bias) > _MAX_BIAS_ENTRIES:
                raise ValueError(f"logit_bias has {len(logit_bias)} entries "
                                 f"(max {_MAX_BIAS_ENTRIES})")
            for t, v in logit_bias.items():
                if not (isinstance(t, (int, np.integer))
                        and 0 <= t < self.config.vocab_size):
                    raise ValueError(f"logit_bias token {t!r} out of vocab")
                if not -100.0 <= float(v) <= 100.0:
                    raise ValueError(f"logit_bias value {v} not in [-100, 100]")
        grammar = self._compile_guided(guided_regex) if guided_regex else None
        flat = np.asarray(prompt_ids).reshape(-1)
        if flat.size and (flat.min() < 0 or flat.max() >= self.config.vocab_size):
            # out-of-range ids would silently clamp in the embedding gather
            # and CRASH the penalized path's prompt histogram — reject early
            raise ValueError("prompt token ids must be in [0, "
                             f"{self.config.vocab_size})")
        p_len = len(flat)
        need = -(-(p_len + max_new_tokens) // self.pool.page_size)
        if need > self.max_pages_per_seq:
            raise ValueError(
                f"request needs {need} pages > max_pages_per_seq={self.max_pages_per_seq}")
        peak = self._bounded_need(p_len, max_new_tokens)
        if peak > self.pool.num_pages - 1:  # page 0 is the reserved null page
            raise ValueError(
                f"request needs {peak} pages but the pool only has "
                f"{self.pool.num_pages - 1} allocatable — it could never be "
                "admitted")
        self._rid += 1
        req = _Request(self._rid, prompt_ids, max_new_tokens,
                       temperature, top_k, top_p,
                       self._rid if seed is None else seed,
                       logprobs=logprobs,
                       presence_penalty=presence_penalty,
                       frequency_penalty=frequency_penalty,
                       repetition_penalty=repetition_penalty,
                       min_p=min_p, logit_bias=logit_bias)
        if grammar is not None:
            req.guided = grammar
            req.gstate = grammar.start
        self._pending.append(req)
        return self._rid

    def _guided_dev(self, grammar) -> tuple:
        """Device copies of a grammar's (allowed [S, V], accepting [S])
        tables, uploaded once per grammar and cached on the object."""
        dev = getattr(grammar, "_dev_tables", None)
        if dev is None:
            dev = (jnp.asarray(grammar.allowed), jnp.asarray(grammar.accepting))
            grammar._dev_tables = dev
        return dev

    def _eos_mask_dev(self) -> jax.Array:
        """Cached [V] bool device mask of the engine's stop token ids."""
        if getattr(self, "_eos_mask", None) is None:
            m = np.zeros(self.config.vocab_size, bool)
            for e in self._eos:
                m[e] = True
            self._eos_mask = jnp.asarray(m)
        return self._eos_mask

    def _compile_guided(self, pattern: str):
        """Compile (and cache) a guided-decoding grammar for this engine's
        tokenizer. Raises ValueError on unusable configs/patterns."""
        if self.tokenizer is None:
            raise ValueError("guided_regex needs the engine's tokenizer "
                             "(ServingEngine(tokenizer=...))")
        if not self._eos:
            raise ValueError("guided_regex needs a configured eos_token_id "
                             "(it terminates the match)")
        if pattern not in self._grammars:
            from grasp_tpu.serving.guided import CompiledGrammar, token_bytes_of

            if self._token_bytes is None:
                self._token_bytes = token_bytes_of(self.tokenizer,
                                                   self.config.vocab_size)
            try:
                self._grammars[pattern] = CompiledGrammar(pattern,
                                                          self._token_bytes)
            except ValueError:
                raise
            except Exception as e:  # parser index/overflow slips -> 400s
                raise ValueError(f"bad guided_regex {pattern!r}: "
                                 f"{type(e).__name__}: {e}") from e
        return self._grammars[pattern]

    def cancel(self, rid: int) -> bool:
        """Stop a request early (host-side stop sequences, client abort).

        A pending request finishes empty; a live one retires with whatever it
        has emitted so far (pages freed immediately). Either way it shows up
        in the next collect(). Returns False if the rid is unknown (already
        finished or collected)."""
        for i, r in enumerate(self._pending):
            if r.rid == rid:
                self._pending.pop(i)
                r.done = True
                r.finish = "cancel"
                self._finished.append(r)
                return True
        for row, adm in list(self._admitting.items()):
            if adm.req.rid == rid:  # abort a chunked admission mid-prefill
                del self._admitting[row]
                self._reserved_pages -= adm.req.reserved
                adm.req.reserved = 0
                self.pool.free(adm.req.pages)
                adm.req.pages = []
                adm.req.done = True
                adm.req.finish = "cancel"
                self._finished.append(adm.req)
                return True
        for r in self._live:
            if r is not None and r.rid == rid:
                r.finish = "cancel"
                self._retire(r)
                return True
        return False

    def _pick_tokens(self, logits: jax.Array, reqs: List["_Request"]) -> np.ndarray:
        """Per-row next tokens for `reqs` (row i <- logits[i]).

        When any request wants logprobs the lp-reporting sampler runs instead
        (identical token choice) and the picked token's logprob record parks
        in ``self._next_lp[r.row]`` until step() emits the token. When any
        LIVE request is penalized (penalties / logit_bias / min_p) the
        penalized sampler runs for the whole batch — identity settings
        reduce exactly to the plain math, so plain rows are unaffected."""
        b = logits.shape[0]
        temps = np.ones(b, np.float32)
        ks = np.zeros(b, np.int32)
        tps = np.ones(b, np.float32)
        greedy = np.ones(b, bool)
        keys = np.zeros((b, 2), np.uint32)
        rows = np.zeros(b, np.int32)
        upd = np.zeros(b, np.int32)
        min_ps = np.zeros(b, np.float32)
        pres = np.zeros(b, np.float32)
        freq = np.zeros(b, np.float32)
        reps = np.ones(b, np.float32)
        biased = np.zeros(b, np.float32)
        penalized = False
        for i, r in enumerate(reqs):
            if r is None:
                continue
            rows[i] = r.row
            upd[i] = 1
            greedy[i] = r.greedy
            if r.penalized:
                penalized = True
                min_ps[i] = r.min_p
                pres[i] = r.presence_penalty
                freq[i] = r.frequency_penalty
                reps[i] = r.repetition_penalty
                biased[i] = 1.0 if r.logit_bias else 0.0
            if not r.greedy:
                temps[i] = max(r.temperature, 1e-6)
                ks[i] = r.top_k
                tps[i] = r.top_p
                # legacy uint32[2] keys vmap as plain arrays
                keys[i] = np.asarray(jax.random.fold_in(
                    jax.random.PRNGKey(r.seed), r.emitted_steps))
                r.emitted_steps += 1
        want_lp = any(r is not None and r.logprobs for r in reqs)
        guided = [r if r is not None and r.guided is not None else None
                  for r in reqs]
        if penalized:
            args = (logits, self._counts, jnp.asarray(rows), jnp.asarray(upd),
                    self._bias, jnp.asarray(biased), jnp.asarray(keys),
                    jnp.asarray(temps), jnp.asarray(ks), jnp.asarray(tps),
                    jnp.asarray(min_ps), jnp.asarray(pres), jnp.asarray(freq),
                    jnp.asarray(reps), jnp.asarray(greedy))
            live_guided = [r for r in guided if r is not None]
            if live_guided:
                grammars = {id(r.guided) for r in live_guided}
                if len(grammars) == 1:
                    # fast path: one grammar in the batch — its allow/accept
                    # tables live on device; only the tiny per-row state ids
                    # upload each step (see the sampler's 5-arg guided form)
                    table, accept = self._guided_dev(live_guided[0].guided)
                    states = np.zeros(b, np.int32)
                    gflag = np.zeros(b, bool)
                    for i, r in enumerate(guided):
                        if r is not None:
                            states[i] = r.gstate
                            gflag[i] = True
                    args = args + (table, accept, jnp.asarray(states),
                                   jnp.asarray(gflag), self._eos_mask_dev())
                else:  # several grammars at once: host-built mask fallback
                    mask = np.ones((b, logits.shape[-1]), bool)
                    for i, r in enumerate(guided):
                        if r is None:
                            continue
                        m = r.guided.allowed[r.gstate].copy()
                        acc = bool(r.guided.accepting[r.gstate])
                        for e in self._eos:
                            m[e] = acc
                        if not m.any():
                            # starved state (holey vocab: bytes exist but no
                            # single token fits) — force-stop on eos
                            for e in self._eos:
                                m[e] = True
                        mask[i] = m
                    args = args + (jnp.asarray(mask),)
            if want_lp:
                toks, self._counts, chosen, top_ids, top_lps = _sample_pen_lp(*args)
            else:
                toks, self._counts = _sample_pen(*args)
        else:
            args = (logits, jnp.asarray(keys), jnp.asarray(temps),
                    jnp.asarray(ks), jnp.asarray(tps), jnp.asarray(greedy))
            if want_lp:
                toks, chosen, top_ids, top_lps = _sample_tokens_lp(*args)
            else:
                toks = _sample_tokens(*args)
        if want_lp:
            chosen, top_ids, top_lps = (np.asarray(chosen), np.asarray(top_ids),
                                        np.asarray(top_lps))
            for i, r in enumerate(reqs):
                if r is not None and r.logprobs:
                    k = r.logprobs
                    self._next_lp[r.row] = (float(chosen[i]),
                                            top_ids[i, :k].tolist(),
                                            top_lps[i, :k].tolist())
        toks = np.asarray(toks, np.int32)
        for i, r in enumerate(guided):  # advance the grammar DFA per pick
            if r is None:
                continue
            tok = int(toks[i])
            if tok not in self._eos:
                ns = int(r.guided.token_trans[r.gstate, tok])
                if ns >= 0:  # the mask guarantees this; -1 = forced eos row
                    r.gstate = ns
        return toks

    def has_work(self) -> bool:
        return (bool(self._pending) or bool(self._admitting)
                or any(r is not None for r in self._live))

    def collect_requests(self) -> List["_Request"]:
        """Drain finished requests as objects (out tokens + logprob records)."""
        done, self._finished = self._finished, []
        return done

    def collect(self) -> Dict[int, List[int]]:
        return {r.rid: r.out for r in self.collect_requests()}

    def run(self) -> Dict[int, List[int]]:
        """Drive until all submitted requests finish; return {rid: tokens}."""
        results: Dict[int, List[int]] = {}
        while self.has_work():
            self.step()
            results.update(self.collect())
        return results

    # -- internals ----------------------------------------------------------
    def _primed_call(self, key, fn, *args):
        """Dispatch ``fn(*args)``, AOT-priming it on the first call per key.

        On the axon TPU runtime a jitted fn's compile-dispatch path retains a
        PERSISTENT copy of every large argument (same trap as
        core.engine._prime) — at 7B scale the first decode dispatch would
        double-resident the 12.5 GiB params and OOM the 16 GiB chip.
        ``fn.lower(...).compile()`` populates the dispatch cache first, so the
        actual call is a copy-free cache hit. Priming is best-effort: failures
        fall back to plain dispatch."""
        self._prime(key, fn, *args)
        return fn(*args)

    def _prime(self, key, fn, *args) -> None:
        """AOT compile ``fn`` for ``args``' shapes without executing it."""
        if key not in self._primed:
            self._primed.add(key)
            try:
                fn.lower(*args).compile()
            except Exception:  # pragma: no cover - backend-dependent
                pass

    def warmup(self, prompt_lens=(128, 512, 1024)) -> float:
        """Pre-compile the serving jits before traffic arrives.

        Compiles the batched decode, the samplers, and the prefill +
        page-scatter jits for each prompt-length bucket (rounded up to whole
        pages, capped by the table capacity; with chunked prefill, the chunk
        shape per bucket). First-request latency then drops from the compile
        time (tens of seconds per new shape on a cold cache, minutes through
        a remote-compile tunnel) to the normal admission cost. Returns the
        seconds spent. ``grasp-serve --warmup`` wires this at startup."""
        import time as _time

        t0 = _time.perf_counter()
        ps = self.pool.page_size
        pool = (self.pool.k_pages, self.pool.v_pages,
                self.pool.k_scales, self.pool.v_scales)
        tables = jnp.zeros((self.max_batch, self.max_pages_per_seq), jnp.int32)
        zrow = jnp.zeros((self.max_batch,), jnp.int32)
        self._prime("decode", self._decode, self.params,
                    zrow, *pool, tables, zrow, zrow)

        dtype = jnp.dtype(self.config.dtype)
        for b in {1, self.max_batch}:  # admission pick is b=1; steps b=max
            logits = jnp.zeros((b, self.config.vocab_size), dtype)
            keys = jnp.zeros((b, 2), jnp.uint32)
            f32 = jnp.zeros((b,), jnp.float32)
            i32 = jnp.zeros((b,), jnp.int32)
            flags = jnp.zeros((b,), bool)
            self._prime(("sampler", b), _sample_tokens,
                        logits, keys, f32, i32, f32, flags)

        seen = set()
        for n in prompt_lens:
            s_pad = min(-(-max(int(n), 1) // ps) * ps,
                        self.max_pages_per_seq * ps)
            if s_pad in seen:
                continue
            seen.add(s_pad)
            cache = init_kv_cache(self.config, batch=1, max_len=s_pad,
                                  quantized=self.pool.quantized)
            chunk = min(self.prefill_chunk or s_pad, s_pad)
            ids = jnp.zeros((1, chunk), jnp.int32)
            self._prime(("prefill", chunk, s_pad),
                        self._get_prefill(chunk, s_pad),
                        self.params, ids, cache, jnp.asarray(0, jnp.int32))
            n_pages = s_pad // ps
            self._prime(("scatter", n_pages, s_pad, 0),
                        self._get_scatter(n_pages, s_pad, 0),
                        *pool, cache, jnp.zeros((n_pages,), jnp.int32))
        return _time.perf_counter() - t0

    def _get_prefill(self, s_pad: int, cache_len: int):
        """Prefill jit writing `s_pad` tokens at a TRACED cache offset — one
        compile per (chunk length, cache length) serves every offset, so
        chunked admission and prefix-cache offsets never recompile."""
        key = (s_pad, cache_len)
        if key not in self._prefill_fns:
            config, plan = self.config, self.plan

            @jax.jit
            def fn(params, ids, cache, at):
                return _forward_with_cache(
                    params, ids, cache, at, config=config, plan=plan)

            self._prefill_fns[key] = fn
        return self._prefill_fns[key]

    def _get_gather(self, hits: int, s_pad: int, L: Optional[int] = None,
                    tag: str = "t"):
        """One-dispatch gather of `hits` cached prefix pages into the temp
        prefill cache (the per-layer eager loop would cost ~2L tunnel
        dispatches on axon). L/tag let a subclass build the same op for a
        second pool (the speculative draft)."""
        key = ("gather", tag, hits, s_pad)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = _build_gather(
                L or self.config.num_hidden_layers, self.pool.quantized,
                hits * self.pool.page_size)
        return self._prefill_fns[key]

    def _get_scatter(self, n_new: int, s_pad: int, prefix_len: int,
                     L: Optional[int] = None, tag: str = "t"):
        """One-dispatch scatter of the prefilled suffix KV into its pages
        (donates the pool arrays — no copy, no per-layer dispatch storm)."""
        key = ("scatter", tag, n_new, s_pad, prefix_len)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = _build_scatter(
                L or self.config.num_hidden_layers, self.pool.quantized,
                self.pool.page_size, n_new, prefix_len)
        return self._prefill_fns[key]

    def _page_keys(self, prompt: np.ndarray, n: int) -> List[bytes]:
        """Chained content hashes: key i covers tokens [0, (i+1)*page_size),
        so a hit on page i implies the whole prefix through it matches."""
        ps = self.pool.page_size
        h = hashlib.blake2b(digest_size=16)
        keys = []
        for i in range(n):
            h.update(prompt[i * ps:(i + 1) * ps].tobytes())
            keys.append(h.digest())
        return keys

    def _admit(self, req: _Request, row: int) -> None:
        """Admit `req` into `row`: allocate pages, prefill the prompt, scatter
        its KV into the pages, and activate the row.

        With prefix_cache on, full prompt pages whose chained content hash is
        already pooled are SHARED (refcounted, PagePool.lookup_shared) instead
        of recomputed: the cached prefix KV gathers into the temp cache and
        only the prompt *suffix* runs the model (_forward_with_cache at the
        prefix offset — causal KV at position p depends only on tokens
        [0, p], so shared pages are bit-identical to recomputed ones). The
        last prompt token always prefills: its logits seed the first output
        token. Newly written full pages are published for future requests.

        With prefill_chunk set, only the first chunk runs here; the admission
        parks in self._admitting and step() advances it one chunk per call
        while other rows keep decoding (no head-of-line blocking)."""
        adm = self._admit_start(req, row)
        if not self._admit_chunk(adm):
            self._admitting[row] = adm

    def _admit_start(self, req: _Request, row: int) -> "_Admission":
        ps = self.pool.page_size
        s = len(req.prompt)
        s_pad = -(-max(s, 1) // ps) * ps  # prompt rounded to whole pages
        n_prompt_pages = s_pad // ps

        shared: List[int] = []
        keys: List[bytes] = []
        if self.prefix_cache:
            # only pages fully covered by the prompt can be shared, minus one
            # token so the suffix prefill is never empty; the page decode
            # first writes into (slot s) is private by this bound too
            keys = self._page_keys(req.prompt, (s - 1) // ps)
            for key in keys:
                p = self.pool.lookup_shared(key)
                if p is None:
                    break
                shared.append(p)
            self.prefix_tokens_saved += len(shared) * ps
            self.prefix_tokens_total += s
        hits = len(shared)
        prefix_len = hits * ps

        if self._lazy_pages:
            need_pages = n_prompt_pages  # generation pages alloc'd as reached
        else:
            need_pages = -(-(s + req.max_new) // ps)
        try:
            req.pages = shared + self.pool.alloc(need_pages - hits)
        except MemoryError:
            self.pool.free(shared)  # give back the cache references
            raise
        if self._lazy_pages:
            # reserve the row's peak demand NOW (not at activation): a
            # chunked admission spans steps, and other admissions must see
            # this row's claim on the pool in the meantime
            req.reserved = self._bounded_need(s, req.max_new)
            self._reserved_pages += req.reserved

        if req.penalized:
            # seed the row's device bookkeeping before its first pick:
            # counts = prompt histogram (penalties cover prompt + generated
            # tokens, vLLM semantics), bias = the request's dense offsets
            V = self.config.vocab_size
            if self._counts is None:
                self._counts = jnp.zeros((self.max_batch, V), jnp.int32)
                self._bias = jnp.zeros((self.max_batch, V), jnp.float32)
            hist = np.bincount(req.prompt, minlength=V).astype(np.int32)
            self._counts = self._counts.at[row].set(jnp.asarray(hist))
            b = np.zeros(V, np.float32)
            for t, v in (req.logit_bias or {}).items():
                b[int(t)] = float(v)
            self._bias = self._bias.at[row].set(jnp.asarray(b))

        # quantized pool: prefill over an int8 temp cache so prefill attention
        # reads the SAME quantized K/V the Generator(quantized_kv=True) path
        # does — the pool then receives those int8 values and scales verbatim
        # (requantizing an fp prefill would diverge by int8 noise)
        cache = init_kv_cache(self.config, batch=1, max_len=s_pad,
                              quantized=self.pool.quantized)
        if hits:  # gather the cached prefix KV into the temp cache
            cache = self._primed_call(
                ("gather", hits, s_pad), self._get_gather(hits, s_pad),
                cache, self.pool.k_pages, self.pool.v_pages,
                self.pool.k_scales, self.pool.v_scales,
                jnp.asarray(shared, jnp.int32))
        return _Admission(req, row, s_pad, prefix_len, keys, cache)

    def _admit_chunk(self, adm: "_Admission") -> bool:
        """Advance one prefill chunk; on the final chunk, scatter the prompt
        KV into the pages and activate the row. Returns True when done."""
        req, s = adm.req, len(adm.req.prompt)
        s_pad, f = adm.s_pad, adm.filled
        c = min(self.prefill_chunk or (s_pad - f), s_pad - f)
        chunk = np.zeros((1, c), np.int32)
        n_real = max(0, min(s, f + c) - f)
        if n_real:
            chunk[0, :n_real] = req.prompt[f:f + n_real]
        logits, adm.cache = self._primed_call(
            ("prefill", c, s_pad), self._get_prefill(c, s_pad),
            self.params, jnp.asarray(chunk), adm.cache,
            jnp.asarray(f, jnp.int32))
        adm.filled = f + c
        if adm.filled < s_pad:
            return False
        self._admit_finish(adm, logits, f)
        return True

    def _admit_finish(self, adm: "_Admission", logits, f: int) -> None:
        ps = self.pool.page_size
        req, row = adm.req, adm.row
        s, s_pad, prefix_len = len(req.prompt), adm.s_pad, adm.prefix_len
        hits = prefix_len // ps
        n_prompt_pages = s_pad // ps
        cache = adm.cache

        n_new = n_prompt_pages - hits
        phys = jnp.asarray(req.pages[hits:n_prompt_pages], jnp.int32)
        (self.pool.k_pages, self.pool.v_pages,
         self.pool.k_scales, self.pool.v_scales) = self._primed_call(
            ("scatter", n_new, s_pad, prefix_len),
            self._get_scatter(n_new, s_pad, prefix_len),
            self.pool.k_pages, self.pool.v_pages,
            self.pool.k_scales, self.pool.v_scales, cache, phys)

        if self.prefix_cache:  # publish the newly written full pages
            for j in range(hits, len(adm.keys)):
                self.pool.register(req.pages[j], adm.keys[j])

        adm.cache = None  # release the temp prefill cache
        req.pos = s
        req.row = row
        self._live[row] = req
        # the final chunk [f, s_pad) always contains the last prompt token
        # (s > s_pad - page_size >= f), whose logits seed the first output
        self._next_tok[row] = int(
            self._pick_tokens(logits[:, (s - 1) - f], [req])[0])

    def step(self) -> None:
        # advance in-progress chunked admissions one chunk each (live rows
        # still decode below — long prompts never block the running batch)
        for row, adm in list(self._admitting.items()):
            if self._admit_chunk(adm):
                del self._admitting[row]

        # admit pending requests into free rows (if pages suffice)
        for row in range(self.max_batch):
            if (self._live[row] is None and row not in self._admitting
                    and self._pending):
                nxt = self._pending[0]
                need = self._bounded_need(len(nxt.prompt), nxt.max_new)
                if self._lazy_pages:
                    # admit against UNRESERVED capacity, not instantaneous
                    # free pages: every live row may still grow to its own
                    # reserved peak before recycling catches up
                    if need > (self.pool.num_pages - 1) - self._reserved_pages:
                        break
                elif need > self.pool.free_pages:
                    break  # wait for pages to free up
                self._admit(self._pending.pop(0), row)

        if not any(r is not None for r in self._live):
            return

        # lazy mode: make sure each row's write slot has a page; a row whose
        # allocation must wait for the pool STALLS this step (not emitted,
        # not decoded, not advanced) and retries next step once recycling
        # frees pages — rows free as fast as they allocate in steady state
        stalled = set()
        for r in self._live:
            if r is None:
                continue
            l = r.pos // self.pool.page_size
            while len(r.pages) <= l:
                if self.pool.free_pages == 0:
                    stalled.add(r.rid)
                    break
                r.pages.extend(self.pool.alloc(1))

        # emit the token computed last step (or by prefill), check stops
        for r in list(self._live):
            if r is None or r.rid in stalled:
                continue
            tok = int(self._next_tok[r.row])
            if tok in self._eos:
                r.finish = "eos"
                self._retire(r)  # stop token is not emitted (Generator parity)
            else:
                r.out.append(tok)
                if r.logprobs and self._next_lp[r.row] is not None:
                    r.lp.append(self._next_lp[r.row])

        tables = np.zeros((self.max_batch, self.max_pages_per_seq), np.int32)
        pos = np.zeros(self.max_batch, np.int32)
        live = np.zeros(self.max_batch, np.int32)
        for r in self._live:
            if r is None or r.rid in stalled:
                continue
            tables[r.row, : len(r.pages)] = r.pages
            pos[r.row] = r.pos
            live[r.row] = 1
        if not live.any():
            return

        (logits, self.pool.k_pages, self.pool.v_pages,
         self.pool.k_scales, self.pool.v_scales) = self._primed_call(
            "decode", self._decode,
            self.params, jnp.asarray(self._next_tok), self.pool.k_pages,
            self.pool.v_pages, self.pool.k_scales, self.pool.v_scales,
            jnp.asarray(tables), jnp.asarray(pos), jnp.asarray(live),
        )
        # stalled rows' slots pass None: _pick_tokens must not advance
        # their PRNG stream for a token that is immediately discarded
        # (sampled outputs would then depend on pool pressure)
        nxt = self._pick_tokens(
            logits,
            [None if (r is not None and r.rid in stalled) else r
             for r in self._live])
        for r in list(self._live):
            if r is None or r.rid in stalled:
                continue
            r.pos += 1
            self._recycle_window_pages(r)
            self._next_tok[r.row] = nxt[r.row]
            if len(r.out) >= r.max_new:
                self._retire(r)

    def _recycle_window_pages(self, r: _Request) -> None:
        """Sliding-window models: free physical pages every future query is
        already masked from. With visibility slot > pos - window, logical
        page l (slots [l*ps, (l+1)*ps)) expires once (l+1)*ps - 1 <=
        pos - window; its table entry becomes the null page (reads are
        masked, writes only touch the current position's page). Bounds a
        row's live pages by ~window/page_size + 1 instead of its length —
        the paged analogue of Mistral's rolling-buffer cache."""
        w = self._window_recycle
        if w is None:
            return
        ps = self.pool.page_size
        exp = min(max(0, (r.pos - w + 1) // ps), len(r.pages))
        for l in range(r.freed_pages, exp):
            self.pool.free([r.pages[l]])
            r.pages[l] = 0
        r.freed_pages = max(r.freed_pages, exp)

    def _retire(self, req: _Request) -> None:
        self._reserved_pages -= req.reserved
        req.reserved = 0
        self.pool.free(req.pages)
        req.pages = []
        req.done = True
        self._live[req.row] = None
        self._next_lp[req.row] = None  # don't leak into the row's next tenant
        self._finished.append(req)
