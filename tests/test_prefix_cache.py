"""Automatic prefix caching over the paged KV pool (serving/paged.py).

Requests whose prompts agree on full leading pages share the physical pages
(refcounted), and only the prompt suffix runs the prefill. Correctness gate:
outputs are bit-identical to the dense-cache Generator and to a no-cache
engine, under concurrent sharing, retirement order, eviction pressure, int8
KV pools, and seeded sampling. Beyond-reference serving extension (the
reference's only generation path is HF ``model.generate``,
tools/eval_longbench.py:337-353).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.eval.generate import Generator
from grasp_tpu.models import init_params
from grasp_tpu.serving import ServingEngine

PS = 8  # page size used throughout — small so tiny prompts span pages


@pytest.fixture(scope="module")
def compressed():
    config = ModelConfig.tiny(num_hidden_layers=3)
    engine = GraspEngine(init_params(jax.random.PRNGKey(0), config), config)
    rng = np.random.default_rng(7)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (1, 16))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (1, 16))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))
    return config, engine.params, engine.plan


def _prompt(config, rng, n):
    return rng.integers(1, config.vocab_size, size=(n,)).astype(np.int32)


def _engine(compressed, prefix_cache=True, **kw):
    config, params, plan = compressed
    kw.setdefault("num_pages", 32)
    kw.setdefault("page_size", PS)
    kw.setdefault("max_batch", 2)
    kw.setdefault("max_pages_per_seq", 6)
    return ServingEngine(params, config, plan, prefix_cache=prefix_cache, **kw)


def test_prefix_hit_identity_and_page_reuse(compressed, rng):
    """A repeated prompt reuses the cached pages, skips the prefix prefill,
    and still emits the exact Generator stream."""
    config, params, plan = compressed
    prompt = _prompt(config, rng, 20)  # 2 full pages + a 4-token tail
    gen = Generator(params, config, plan)
    want = gen.greedy(prompt, 5)

    srv = _engine(compressed)
    r1 = srv.submit(prompt, 5)
    got1 = srv.run()
    assert got1[r1] == want
    assert srv.prefix_tokens_saved == 0  # cold cache

    cached = dict(srv.pool._hash_to_page)
    assert len(cached) == 2  # the two full prompt pages published

    r2 = srv.submit(prompt, 5)
    got2 = srv.run()
    assert got2[r2] == want
    assert srv.prefix_tokens_saved == 2 * PS  # both full pages were hits
    # the hit reused the registered physical pages, not fresh ones
    assert set(cached.values()) <= set(srv.pool._hash_to_page.values())


def test_shared_prefix_different_suffixes(compressed, rng):
    """Prompts that agree on leading pages but diverge later share exactly
    the agreed pages; every output matches the no-cache engine."""
    config, params, plan = compressed
    head = _prompt(config, rng, 2 * PS)
    p1 = np.concatenate([head, _prompt(config, rng, 5)])
    p2 = np.concatenate([head, _prompt(config, rng, 9)])
    gen = Generator(params, config, plan)
    want = [gen.greedy(p, 6) for p in (p1, p2)]

    srv = _engine(compressed)
    rids = [srv.submit(p, 6) for p in (p1, p2)]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w
    # p1 admitted first (cold), p2 hit the two shared head pages even while
    # p1 was still live (same-step admission, refcounted sharing)
    assert srv.prefix_tokens_saved == 2 * PS


def test_refcount_outlives_first_owner(compressed, rng):
    """Retiring the request that created the shared pages must not free them
    under the later request still reading them."""
    config, params, plan = compressed
    head = _prompt(config, rng, 2 * PS)
    p_short = np.concatenate([head, _prompt(config, rng, 2)])
    p_long = np.concatenate([head, _prompt(config, rng, 3)])
    gen = Generator(params, config, plan)
    want_short = gen.greedy(p_short, 2)   # retires quickly
    want_long = gen.greedy(p_long, 12)    # keeps reading the shared pages

    srv = _engine(compressed)
    r_s = srv.submit(p_short, 2)
    r_l = srv.submit(p_long, 12)
    got = srv.run()
    assert got[r_s] == want_short
    assert got[r_l] == want_long
    # all pages recycled or parked in the (still allocatable) cache
    assert srv.pool.free_pages == srv.pool.num_pages - 1


def test_eviction_under_pool_pressure(compressed, rng):
    """Distinct prompts churning through a small pool evict least-recently-
    shared cached pages instead of failing; outputs stay exact."""
    config, params, plan = compressed
    gen = Generator(params, config, plan)
    srv = _engine(compressed, num_pages=8, max_batch=1, max_pages_per_seq=4)
    for i in range(6):
        p = _prompt(config, np.random.default_rng(100 + i), 2 * PS + 3)
        rid = srv.submit(p, 4)
        assert srv.run()[rid] == gen.greedy(p, 4)
    # pool never leaked: every page is free or evictable cache
    assert srv.pool.free_pages == srv.pool.num_pages - 1
    # and the cache is bounded by the physical pool
    assert len(srv.pool._hash_to_page) <= srv.pool.num_pages - 1


def test_prefix_cache_quantized_kv(compressed, rng):
    """int8 KV pools share quantized pages (values AND scales) bit-exactly."""
    config, params, plan = compressed
    prompt = _prompt(config, rng, 2 * PS + 5)
    gen = Generator(params, config, plan, quantized_kv=True)
    want = gen.greedy(prompt, 6)

    srv = _engine(compressed, quantized_kv=True)
    r1 = srv.submit(prompt, 6)
    assert srv.run()[r1] == want
    r2 = srv.submit(prompt, 6)
    assert srv.run()[r2] == want
    assert srv.prefix_tokens_saved == 2 * PS


def test_sampled_output_unchanged_by_cache(compressed, rng):
    """An explicit seed gives the same sampled stream with and without the
    prefix cache (sharing changes compute, never KV content)."""
    config, params, plan = compressed
    prompt = _prompt(config, rng, 2 * PS + 4)
    kw = dict(temperature=0.8, top_k=8, seed=123)

    plain = _engine(compressed, prefix_cache=False)
    r = plain.submit(prompt, 6, **kw)
    want = plain.run()[r]

    srv = _engine(compressed)
    r1 = srv.submit(prompt, 6, **kw)
    assert srv.run()[r1] == want
    r2 = srv.submit(prompt, 6, **kw)
    assert srv.run()[r2] == want  # via cache hit
    assert srv.prefix_tokens_saved == 2 * PS


def test_speculative_prefix_cache(compressed, rng):
    """The speculative engine shares pages too: the draft pool's prefix KV
    gathers from the shared pages, both models skip the prefix prefill, and
    the greedy stream stays bit-identical to the plain ServingEngine."""
    config, params, plan = compressed
    from grasp_tpu.serving.spec_paged import SpeculativeServingEngine

    head = _prompt(config, rng, 2 * PS)
    p1 = np.concatenate([head, _prompt(config, rng, 3)])
    p2 = np.concatenate([head, _prompt(config, rng, 6)])
    gen = Generator(params, config, plan)
    want = [gen.greedy(p, 6) for p in (p1, p2)]

    spec = SpeculativeServingEngine(params, config, params, config, plan=plan,
                                    draft_plan=plan, num_pages=32, page_size=PS,
                                    max_batch=2, max_pages_per_seq=8,
                                    prefix_cache=True)
    rids = [spec.submit(p, 6) for p in (p1, p2)]
    got = spec.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w
    assert spec.prefix_tokens_saved == 2 * PS  # p2 hit p1's head pages
    # repeat after retirement: the cache survives its creator
    r3 = spec.submit(p1, 6)
    assert spec.run()[r3] == want[0]
    assert spec.prefix_tokens_saved == 4 * PS


def test_short_prompt_never_shares(compressed, rng):
    """Prompts shorter than one page (or exactly one page) keep every page
    private — the last prompt token must always prefill."""
    config, params, plan = compressed
    gen = Generator(params, config, plan)
    for n in (3, PS):  # partial page; exact page boundary
        p = _prompt(config, np.random.default_rng(50 + n), n)
        want = gen.greedy(p, 4)
        srv = _engine(compressed)
        r1 = srv.submit(p, 4)
        assert srv.run()[r1] == want
        r2 = srv.submit(p, 4)
        assert srv.run()[r2] == want
        assert srv.prefix_tokens_saved == 0
